"""Grid / interpolation: scattered points -> raster (gdal_grid).

The reference's gridding engine (alg/gdalgrid.cpp) evaluates, per
output pixel, a metric over the source points within a search radius —
IDW (GDALGridInverseDistanceToAPower, gdal_alg.h:438-451), accelerated
by a quadtree over points (gdalgrid.cpp:1689) and threads (:1686).

Spark restatement (the classic halo/bin-replication pattern):

  1. each point is assigned to every output TILE whose search
     neighborhood it can influence — pure column math (sequence +
     explode over the <= 3x3 covered tile range, bounded because
     radius <= tile size). This is the quadtree probe inverted:
     instead of each pixel searching the tree, each point broadcasts
     itself to the tiles that would find it.
  2. groupBy(tile) + applyInPandas: one numpy kernel computes the whole
     tile's pixel grid against its gathered points (vectorized
     (pixels x points) distance matrix).

Shuffle volume = points x small replication factor — independent of
pixel count; pixel work never leaves its task. At 10^12 points the
shuffle partitioner is the tile id, so skewed point clusters can be
salted per tile (same pattern as the PIP join's hot cells).

IDW semantics match GDALGridInverseDistanceToAPower with smoothing=0:
value = sum(v_i / d_i^power) / sum(1 / d_i^power) over points with
d_i <= radius; an exact hit (d == 0) returns that point's value;
pixels with no point in radius get nodata (NULL here).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IDW_SCHEMA = T.StructType(
    [
        T.StructField("gx", T.IntegerType()),
        T.StructField("gy", T.IntegerType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def idw_grid(
    points: DataFrame,
    val_col: str,
    ntx: int,
    nty: int,
    tile_px: int,
    x0: float = -180.0,
    y_top: float = 85.0,
    extent_x: float = 360.0,
    extent_y: float = 170.0,
    radius: float = 30.0,
    power: float = 2.0,
) -> DataFrame:
    """IDW-interpolate `points` (lon/lat + val_col) onto an
    (ntx*tile_px) x (nty*tile_px) north-up grid. Returns per-pixel rows
    (gx, gy, value) with NULL where no point lies within `radius`
    (planar lon/lat distance). Requires radius <= tile extent so the
    3x3 tile neighborhood is sufficient."""
    rx = extent_x / (ntx * tile_px)
    ry = extent_y / (nty * tile_px)
    tile_w = rx * tile_px
    tile_h = ry * tile_px
    if radius > min(tile_w, tile_h):
        raise ValueError("radius must be <= one tile extent")

    lon, lat = F.col("lon"), F.col("lat")
    tx_lo = F.greatest(F.lit(0), F.floor((lon - radius - x0) / tile_w).cast("int"))
    tx_hi = F.least(F.lit(ntx - 1), F.floor((lon + radius - x0) / tile_w).cast("int"))
    ty_lo = F.greatest(F.lit(0), F.floor((F.lit(y_top) - lat - radius) / tile_h).cast("int"))
    ty_hi = F.least(F.lit(nty - 1), F.floor((F.lit(y_top) - lat + radius) / tile_h).cast("int"))

    cand = (
        points.select(lon, lat, F.col(val_col).alias("_v"),
                      tx_lo.alias("_txl"), tx_hi.alias("_txh"),
                      ty_lo.alias("_tyl"), ty_hi.alias("_tyh"))
        .filter((F.col("_txh") >= F.col("_txl")) & (F.col("_tyh") >= F.col("_tyl")))
        .select(
            "lon", "lat", "_v",
            F.explode(F.sequence("_txl", "_txh")).alias("tile_x"),
            F.col("_tyl"), F.col("_tyh"),
        )
        .select(
            "lon", "lat", "_v", "tile_x",
            F.explode(F.sequence("_tyl", "_tyh")).alias("tile_y"),
        )
    )

    # one NULL marker row per tile: tiles with no candidate points must
    # still emit their pixels (value NULL), matching the rest of the
    # grid suite
    spark = points.sparkSession
    seeds = spark.range(0, ntx * nty, 1).select(
        F.lit(None).cast("double").alias("lon"),
        F.lit(None).cast("double").alias("lat"),
        F.lit(None).cast("double").alias("_v"),
        (F.col("id") % ntx).cast("int").alias("tile_x"),
        (F.col("id") / ntx).cast("int").alias("tile_y"),
    )
    cand = cand.unionByName(seeds)

    def kern(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.dropna(subset=["lon"])
        tx, ty = int(key[0]), int(key[1])
        gx = tx * tile_px + np.arange(tile_px)
        gy = ty * tile_px + np.arange(tile_px)
        if len(pdf) == 0:  # seed-only tile: no points in reach
            GX = np.tile(gx, (tile_px, 1)).ravel()
            GY = np.repeat(gy, tile_px)
            return pd.DataFrame(
                {"gx": GX.astype(np.int32), "gy": GY.astype(np.int32),
                 "value": np.full(tile_px * tile_px, np.nan)}
            )
        plon = x0 + (gx + 0.5) * rx
        plat = y_top - (gy + 0.5) * ry
        PX = np.repeat(plon[None, :], tile_px, axis=0).ravel()
        PY = np.repeat(plat[:, None], tile_px, axis=1).ravel()
        sl = pdf["lon"].to_numpy(np.float64)
        sa = pdf["lat"].to_numpy(np.float64)
        sv = pdf["_v"].to_numpy(np.float64)
        d2 = (PX[:, None] - sl[None, :]) ** 2 + (PY[:, None] - sa[None, :]) ** 2
        inr = d2 <= radius * radius
        with np.errstate(divide="ignore", invalid="ignore"):
            w = np.where(inr, 1.0 / d2 ** (power / 2.0), 0.0)
        den = w.sum(axis=1)
        num = (w * sv[None, :]).sum(axis=1)
        with np.errstate(invalid="ignore"):
            val = np.where(den > 0, num / den, np.nan)
        # exact hits (d == 0): weight is inf -> take that point's value
        hit = np.where(inr & (d2 == 0.0))
        if len(hit[0]):
            val[hit[0]] = sv[hit[1]]
        GX = np.tile(gx, (tile_px, 1)).ravel()
        GY = np.repeat(gy, tile_px)
        return pd.DataFrame(
            {"gx": GX.astype(np.int32), "gy": GY.astype(np.int32), "value": val}
        )

    return cand.groupBy("tile_x", "tile_y").applyInPandas(kern, schema=IDW_SCHEMA)


GRID_SCHEMA = IDW_SCHEMA


def grid_interpolate(
    points: DataFrame,
    val_col: str,
    ntx: int,
    nty: int,
    tile_px: int,
    algorithm: str = "invdist",
    x0: float = -180.0,
    y_top: float = 85.0,
    extent_x: float = 360.0,
    extent_y: float = 170.0,
    radius: float = 30.0,
    power: float = 2.0,
    max_points: int = 12,
    radius2: float | None = None,
    angle: float = 0.0,
) -> DataFrame:
    """gdal_grid algorithm suite over the same bin-replication plan as
    idw_grid (alg/gdal_alg.h:438-451):

      invdist   GDALGridInverseDistanceToAPower (== idw_grid)
      invdistnn GDALGridInverseDistanceToAPowerNearestNeighbor — IDW
                over only the `max_points` nearest in-radius points
      nearest   GDALGridNearestNeighbor — value of the closest point
                in radius
      average   GDALGridMovingAverage — mean of points in radius
      count / minimum / maximum / range
                GDALGridDataMetric{Count,Minimum,Maximum,Range}
      average_distance      GDALGridDataMetricAverageDistance — mean
                node-to-point distance over points in radius
      average_distance_pts  GDALGridDataMetricAverageDistancePts —
                mean pairwise distance among the points in radius

    Linear (TIN) interpolation needs a GLOBAL Delaunay triangulation —
    see tin.grid_linear (broadcast small-model plan, like the
    reference's own in-memory GDALTriangulation).

    `radius2`/`angle` select the reference's rotated elliptical search
    window (radius1/radius2/angle options; test at
    alg/gdalgrid.cpp:142-176): rotate the node->point offset by
    `angle` degrees and keep points with
    r2^2*rx^2 + r1^2*ry^2 <= r1^2*r2^2. The default (radius2=None)
    keeps the circular window. Candidate pruning uses the ellipse's
    bounding circle max(radius, radius2).
    """
    if algorithm == "invdist" and radius2 is None:
        return idw_grid(points, val_col, ntx, nty, tile_px, x0, y_top,
                        extent_x, extent_y, radius, power)
    if algorithm == "invdist":
        raise ValueError("elliptical invdist: use invdistnn or metrics")
    if algorithm not in ("nearest", "average", "count", "minimum",
                        "maximum", "range", "average_distance",
                        "average_distance_pts", "invdistnn"):
        raise ValueError(f"unknown grid algorithm {algorithm!r}")

    rx = extent_x / (ntx * tile_px)
    ry = extent_y / (nty * tile_px)
    tile_w = rx * tile_px
    tile_h = ry * tile_px
    rprune = radius if radius2 is None else max(radius, radius2)
    if rprune > min(tile_w, tile_h):
        raise ValueError("radius must be <= one tile extent")

    lon, lat = F.col("lon"), F.col("lat")
    tx_lo = F.greatest(F.lit(0), F.floor((lon - rprune - x0) / tile_w).cast("int"))
    tx_hi = F.least(F.lit(ntx - 1), F.floor((lon + rprune - x0) / tile_w).cast("int"))
    ty_lo = F.greatest(F.lit(0), F.floor((F.lit(y_top) - lat - rprune) / tile_h).cast("int"))
    ty_hi = F.least(F.lit(nty - 1), F.floor((F.lit(y_top) - lat + rprune) / tile_h).cast("int"))
    cand = (
        points.select(lon, lat, F.col(val_col).alias("_v"),
                      tx_lo.alias("_txl"), tx_hi.alias("_txh"),
                      ty_lo.alias("_tyl"), ty_hi.alias("_tyh"))
        .filter((F.col("_txh") >= F.col("_txl")) & (F.col("_tyh") >= F.col("_tyl")))
        .select("lon", "lat", "_v",
                F.explode(F.sequence("_txl", "_txh")).alias("tile_x"),
                F.col("_tyl"), F.col("_tyh"))
        .select("lon", "lat", "_v", "tile_x",
                F.explode(F.sequence("_tyl", "_tyh")).alias("tile_y"))
    )
    # one NULL marker row per tile: tiles with no candidate points must
    # still emit their pixels (count = 0 / value NULL)
    spark = points.sparkSession
    seeds = spark.range(0, ntx * nty, 1).select(
        F.lit(None).cast("double").alias("lon"),
        F.lit(None).cast("double").alias("lat"),
        F.lit(None).cast("double").alias("_v"),
        (F.col("id") % ntx).cast("int").alias("tile_x"),
        (F.col("id") / ntx).cast("int").alias("tile_y"),
    )
    cand = cand.unionByName(seeds)

    def kern(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.dropna(subset=["lon"])
        tx, ty = int(key[0]), int(key[1])
        gx = tx * tile_px + np.arange(tile_px)
        gy = ty * tile_px + np.arange(tile_px)
        if len(pdf) == 0:  # seed-only tile: no points in reach
            GX = np.tile(gx, (tile_px, 1)).ravel()
            GY = np.repeat(gy, tile_px)
            val = (
                np.zeros(tile_px * tile_px)
                if algorithm == "count"
                else np.full(tile_px * tile_px, np.nan)
            )
            return pd.DataFrame(
                {"gx": GX.astype(np.int32), "gy": GY.astype(np.int32), "value": val}
            )
        plon = x0 + (gx + 0.5) * rx
        plat = y_top - (gy + 0.5) * ry
        PX = np.repeat(plon[None, :], tile_px, axis=0).ravel()
        PY = np.repeat(plat[:, None], tile_px, axis=1).ravel()
        sl = pdf["lon"].to_numpy(np.float64)
        sa = pdf["lat"].to_numpy(np.float64)
        sv = pdf["_v"].to_numpy(np.float64)
        d2 = (PX[:, None] - sl[None, :]) ** 2 + (PY[:, None] - sa[None, :]) ** 2
        if radius2 is None:
            inr = d2 <= radius * radius
        else:
            # rotated-ellipse membership, op-for-op the reference's
            # test (alg/gdalgrid.cpp:166-176); offsets are point-node
            dx = sl[None, :] - PX[:, None]
            dy = sa[None, :] - PY[:, None]
            r1sq = radius * radius
            r2sq = radius2 * radius2
            if angle != 0.0:
                c1 = math.cos(math.radians(angle))
                c2 = math.sin(math.radians(angle))
                dx, dy = dx * c1 + dy * c2, dy * c1 - dx * c2
            inr = r2sq * dx * dx + r1sq * dy * dy <= r1sq * r2sq
        any_ = inr.any(axis=1)
        if algorithm == "nearest":
            dmask = np.where(inr, d2, np.inf)
            val = np.where(any_, sv[np.argmin(dmask, axis=1)], np.nan)
        elif algorithm == "average":
            cnt = inr.sum(axis=1)
            val = np.where(
                cnt > 0,
                np.where(inr, sv[None, :], 0.0).sum(axis=1) / np.maximum(cnt, 1),
                np.nan,
            )
        elif algorithm == "count":
            val = inr.sum(axis=1).astype(np.float64)
        elif algorithm == "average_distance":
            cnt = inr.sum(axis=1)
            dsum = np.where(inr, np.sqrt(d2), 0.0).sum(axis=1)
            val = np.where(cnt > 0, dsum / np.maximum(cnt, 1), np.nan)
        elif algorithm == "average_distance_pts":
            # mean pairwise distance among each pixel's in-radius set:
            # S = m D m^T over the point-point distance matrix D,
            # pair count = k^2 - k (each unordered pair twice)
            k = inr.sum(axis=1)
            D = np.sqrt(
                (sl[:, None] - sl[None, :]) ** 2
                + (sa[:, None] - sa[None, :]) ** 2
            )
            S = ((inr.astype(np.float64) @ D) * inr).sum(axis=1)
            denom = k * k - k
            val = np.where(denom > 0, S / np.maximum(denom, 1), np.nan)
        elif algorithm == "invdistnn":
            # GDALGridInverseDistanceToAPowerNearestNeighbor
            # (alg/gdalgrid.cpp GDALGridInverseDistanceToAPointsNearest
            # family): IDW restricted to the max_points nearest
            # in-radius points. Rank ties break on (d2, lon, lat) —
            # mirrored exactly by the oracle's ROW_NUMBER ordering.
            P, n = d2.shape
            dmask = np.where(inr, d2, np.inf)
            order = np.lexsort(
                (
                    np.broadcast_to(sa[None, :], (P, n)),
                    np.broadcast_to(sl[None, :], (P, n)),
                    dmask,
                )
            )[:, :max_points]
            dsel = np.take_along_axis(dmask, order, axis=1)
            vsel = np.take_along_axis(
                np.broadcast_to(sv[None, :], (P, n)), order, axis=1
            )
            ok = np.isfinite(dsel)
            with np.errstate(divide="ignore", invalid="ignore"):
                w = np.where(ok, 1.0 / dsel ** (power / 2.0), 0.0)
            den = w.sum(axis=1)
            num = (w * np.where(ok, vsel, 0.0)).sum(axis=1)
            with np.errstate(invalid="ignore"):
                val = np.where(den > 0, num / den, np.nan)
            hit = np.where(ok & (dsel == 0.0))
            if len(hit[0]):
                val[hit[0]] = vsel[hit]
        elif algorithm == "minimum":
            val = np.where(any_, np.where(inr, sv[None, :], np.inf).min(axis=1), np.nan)
        elif algorithm == "maximum":
            val = np.where(any_, np.where(inr, sv[None, :], -np.inf).max(axis=1), np.nan)
        else:  # range
            mn = np.where(inr, sv[None, :], np.inf).min(axis=1)
            mx = np.where(inr, sv[None, :], -np.inf).max(axis=1)
            val = np.where(any_, mx - mn, np.nan)
        GX = np.tile(gx, (tile_px, 1)).ravel()
        GY = np.repeat(gy, tile_px)
        return pd.DataFrame(
            {"gx": GX.astype(np.int32), "gy": GY.astype(np.int32), "value": val}
        )

    return cand.groupBy("tile_x", "tile_y").applyInPandas(kern, schema=GRID_SCHEMA)
