"""Grid Linear (TIN) interpolation — GDALGridLinear (alg/gdalgrid.cpp
:1407, gdal_alg.h:447): build a Delaunay triangulation of the scatter
points, locate each grid node's containing facet, interpolate from its
barycentric coordinates; nodes outside the hull get nodata (the
radius=0 convention).

Spark shape: the triangulation is a GLOBAL small model — the reference
itself builds ONE in-memory triangulation of all points
(GDALTriangulationCreateDelaunay) before gridding, so the points table
is the broadcast side by the algorithm's own nature. The driver
collects the points ONCE (deterministic order), runs Bowyer-Watson,
and broadcasts (vertices, values, triangles); each tile interpolates
its own pixels vectorized — pixels (the big side) never leave their
task, and the shuffle volume is zero beyond the broadcast. For point
sets beyond driver memory a block-Delaunay + seam merge would replace
the build step; the apply stays identical.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .gridding import GRID_SCHEMA


def delaunay(px: np.ndarray, py: np.ndarray) -> np.ndarray:
    """(m, 3) vertex-index triangles of the Delaunay triangulation —
    Bowyer-Watson with a super-triangle, deterministic in the input
    order. O(n * cavity) per insertion; meant for the broadcast-sized
    point sets GDALGrid itself holds in memory."""
    n = len(px)
    if n < 3:
        return np.empty((0, 3), dtype=np.int64)
    cx = (px.min() + px.max()) / 2.0
    cy = (py.min() + py.max()) / 2.0
    span = max(px.max() - px.min(), py.max() - py.min(), 1.0) * 1000.0
    vx = np.concatenate([px, [cx - span, cx + span, cx]])
    vy = np.concatenate([py, [cy - span, cy - span, cy + span]])
    s0, s1, s2 = n, n + 1, n + 2
    tris = [(s0, s1, s2)]

    def circum_ok(t, x, y):
        # True when (x, y) is inside t's circumcircle (in-circle det)
        a, b, c = t
        ax, ay = vx[a] - x, vy[a] - y
        bx, by = vx[b] - x, vy[b] - y
        cx_, cy_ = vx[c] - x, vy[c] - y
        det = (
            (ax * ax + ay * ay) * (bx * cy_ - cx_ * by)
            - (bx * bx + by * by) * (ax * cy_ - cx_ * ay)
            + (cx_ * cx_ + cy_ * cy_) * (ax * by - bx * ay)
        )
        # orientation of t (CCW positive) fixes the det sign
        o = (vx[b] - vx[a]) * (vy[c] - vy[a]) - (vy[b] - vy[a]) * (vx[c] - vx[a])
        return det * np.sign(o) > 0

    for p in range(n):
        x, y = float(px[p]), float(py[p])
        bad = [t for t in tris if circum_ok(t, x, y)]
        if not bad:
            continue
        edges: dict = {}
        for t in bad:
            for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                k = (min(e), max(e))
                if k in edges:
                    del edges[k]
                else:
                    edges[k] = e
        tris = [t for t in tris if t not in set(map(tuple, bad))]
        for e in edges.values():
            tris.append((e[0], e[1], p))
    out = [t for t in tris if max(t) < n]
    if not out:
        return np.empty((0, 3), dtype=np.int64)
    # canonical order: sorted vertex triples, lexsorted
    arr = np.sort(np.asarray(out, dtype=np.int64), axis=1)
    order = np.lexsort((arr[:, 2], arr[:, 1], arr[:, 0]))
    return arr[order]


def barycentric_interp(tris: np.ndarray, tx: np.ndarray, ty: np.ndarray,
                       tz: np.ndarray, qx: np.ndarray, qy: np.ndarray,
                       eps: float = 1e-9) -> np.ndarray:
    """Interpolate query points against a triangle set: first triangle
    (in canonical order) whose barycentric coords are all >= -eps wins;
    NaN outside every triangle. Vectorized per triangle over the
    queries inside its bbox."""
    out = np.full(qx.shape, np.nan)
    todo = np.ones(qx.shape, dtype=bool)
    for a, b, c in tris:
        if not todo.any():
            break
        x1, y1, x2, y2, x3, y3 = tx[a], ty[a], tx[b], ty[b], tx[c], ty[c]
        xmin, xmax = min(x1, x2, x3), max(x1, x2, x3)
        ymin, ymax = min(y1, y2, y3), max(y1, y2, y3)
        m = todo & (qx >= xmin - eps) & (qx <= xmax + eps) \
            & (qy >= ymin - eps) & (qy <= ymax + eps)
        if not m.any():
            continue
        det = (y2 - y3) * (x1 - x3) + (x3 - x2) * (y1 - y3)
        if abs(det) < 1e-300:
            continue
        l1 = ((y2 - y3) * (qx[m] - x3) + (x3 - x2) * (qy[m] - y3)) / det
        l2 = ((y3 - y1) * (qx[m] - x3) + (x1 - x3) * (qy[m] - y3)) / det
        l3 = 1.0 - l1 - l2
        ins = (l1 >= -eps) & (l2 >= -eps) & (l3 >= -eps)
        if not ins.any():
            continue
        idx = np.nonzero(m)
        sel = tuple(i[ins] for i in idx)
        out[sel] = l1[ins] * tz[a] + l2[ins] * tz[b] + l3[ins] * tz[c]
        todo[sel] = False
    return out


def grid_linear(points: DataFrame, val_col: str, ntx: int, nty: int,
                tile_px: int, x0: float = -180.0, y_top: float = 85.0,
                extent_x: float = 360.0, extent_y: float = 170.0,
                order_col: str = "doc_id") -> DataFrame:
    """GDALGridLinear over the engine's grid scaffold: per-pixel rows
    (gx, gy, value), NULL outside the convex hull. `order_col` fixes
    the driver-side collect order so the triangulation (and thus any
    boundary tie) is deterministic."""
    rx = extent_x / (ntx * tile_px)
    ry = extent_y / (nty * tile_px)
    pdf = (
        points.select(order_col, "lon", "lat", F.col(val_col).alias("_v"))
        .orderBy(order_col)
        .toPandas()
    )
    px = pdf["lon"].to_numpy(np.float64)
    py = pdf["lat"].to_numpy(np.float64)
    pz = pdf["_v"].to_numpy(np.float64)
    tris = delaunay(px, py)
    spark = points.sparkSession
    bc = spark.sparkContext.broadcast((tris, px, py, pz))

    tiles = spark.range(0, ntx * nty, 1).select(
        (F.col("id") % ntx).cast("int").alias("tile_x"),
        (F.col("id") / ntx).cast("int").alias("tile_y"),
    )

    def kern(key, kdf: pd.DataFrame) -> pd.DataFrame:
        tris_, px_, py_, pz_ = bc.value
        tx, ty = int(key[0]), int(key[1])
        gx = tx * tile_px + np.arange(tile_px)
        gy = ty * tile_px + np.arange(tile_px)
        plon = x0 + (gx + 0.5) * rx
        plat = y_top - (gy + 0.5) * ry
        QX = np.repeat(plon[None, :], tile_px, axis=0).ravel()
        QY = np.repeat(plat[:, None], tile_px, axis=1).ravel()
        val = barycentric_interp(tris_, px_, py_, pz_, QX, QY)
        GX = np.tile(gx, (tile_px, 1)).ravel()
        GY = np.repeat(gy, tile_px)
        return pd.DataFrame(
            {"gx": GX.astype(np.int32), "gy": GY.astype(np.int32), "value": val}
        )

    return tiles.groupBy("tile_x", "tile_y").applyInPandas(kern, schema=GRID_SCHEMA)
