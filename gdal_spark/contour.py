"""Contour: marching-squares iso-line extraction over the tile table
(the reference's GDALContourGenerate, alg/contour.cpp:310 +
alg/marching_squares/). Per 2x2 pixel cell, the standard 16-case table
with linear edge interpolation; saddles disambiguated by the cell
center mean.

Distributed shape: every tile computes the cells whose TOP-LEFT pixel
it owns; the right/bottom halo strips (1 px) come from the same
neighbor-strip exchange the focal DEM ops use, so border cells between
tiles are computed exactly once, by the tile that owns their top-left
corner. Cells that would extend past the global raster edge are
dropped (no pixels beyond the edge — GDAL generates contours only
between real pixel centers).

Output: per (tile, level): segment count and total polyline length (in
pixel units). Stitching segments into connected polylines is a
per-region local pass on top (future work); the segment field is the
distributed core and is what the length/count goldens verify.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .raster import _neighbor_strips
from .tiling import _decode

CONTOUR_SCHEMA = T.StructType(
    [
        T.StructField("tile_x", T.IntegerType()),
        T.StructField("tile_y", T.IntegerType()),
        T.StructField("level", T.DoubleType()),
        T.StructField("n_segments", T.LongType()),
        T.StructField("length", T.DoubleType()),
    ]
)

# case -> list of (edge_i, edge_j) segments; edges 0=top 1=right 2=bottom 3=left
_CASES = {
    1: [(3, 0)], 2: [(0, 1)], 3: [(3, 1)], 4: [(1, 2)],
    6: [(0, 2)], 7: [(3, 2)], 8: [(2, 3)], 9: [(0, 2)],
    11: [(1, 2)], 12: [(1, 3)], 13: [(0, 1)], 14: [(3, 0)],
}


def cell_segments(A, B, C, D, level):
    """Vectorized marching squares over flat corner arrays (A=TL, B=TR,
    C=BR, D=BL). Returns (count, length) arrays per cell."""
    with np.errstate(divide="ignore", invalid="ignore"):
        t_top = (level - A) / (B - A)
        t_right = (level - B) / (C - B)
        t_bot = (level - D) / (C - D)
        t_left = (level - A) / (D - A)
    # edge crossing coordinates (x, y) in cell-local units
    ex = np.stack([t_top, np.ones_like(A), t_bot, np.zeros_like(A)])
    ey = np.stack([np.zeros_like(A), t_right, np.ones_like(A), t_left])

    bits = (
        (A >= level).astype(np.int64)
        + 2 * (B >= level).astype(np.int64)
        + 4 * (C >= level).astype(np.int64)
        + 8 * (D >= level).astype(np.int64)
    )
    count = np.zeros(A.shape, dtype=np.int64)
    length = np.zeros(A.shape, dtype=np.float64)

    def add(mask, e1, e2):
        if not mask.any():
            return
        dx = ex[e1][mask] - ex[e2][mask]
        dy = ey[e1][mask] - ey[e2][mask]
        count[mask] += 1
        length[mask] += np.sqrt(dx * dx + dy * dy)

    for case, segs in _CASES.items():
        m = bits == case
        for e1, e2 in segs:
            add(m, e1, e2)
    # saddles: center mean decides the pairing
    center = (A + B + C + D) / 4.0
    for case in (5, 10):
        m = bits == case
        if not m.any():
            continue
        hi = m & (center >= level)
        lo = m & ~ (center >= level)
        if case == 5:  # TL+BR above
            add(hi, 0, 1)
            add(hi, 2, 3)
            add(lo, 3, 0)
            add(lo, 1, 2)
        else:  # TR+BL above
            add(hi, 3, 0)
            add(hi, 1, 2)
            add(lo, 0, 1)
            add(lo, 2, 3)
    return count, length


def contour(tiles: DataFrame, levels: list[float]) -> DataFrame:
    """Iso-line segment count + length per (tile, level)."""
    strips = _neighbor_strips(tiles).groupBy("dst_tx", "dst_ty").agg(
        F.collect_list(F.struct("dx", "dy", "strip")).alias("halo")
    )
    j = tiles.join(
        strips,
        (tiles.tile_x == strips.dst_tx) & (tiles.tile_y == strips.dst_ty),
        "left",
    ).drop("dst_tx", "dst_ty")

    def run(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = _decode(r.data, r.dtype, r.height, r.width).astype(np.float64)
                H, W = arr.shape
                right = bottom = corner = None
                if r.halo is not None:
                    for s in r.halo:
                        piece = np.frombuffer(s["strip"], dtype=np.float64)
                        if s["dx"] == 1 and s["dy"] == 0:
                            right = piece
                        elif s["dx"] == 0 and s["dy"] == 1:
                            bottom = piece
                        elif s["dx"] == 1 and s["dy"] == 1:
                            corner = piece[0]
                # extended array: (H+1, W+1) where the extra row/col are
                # the neighbors' first pixels; NaN where no neighbor ->
                # those cells produce no crossings (NaN compares False)
                ext = np.full((H + 1, W + 1), np.nan)
                ext[:H, :W] = arr
                if right is not None:
                    ext[:H, W] = right
                if bottom is not None:
                    ext[H, :W] = bottom
                if corner is not None:
                    ext[H, W] = corner
                A = ext[:-1, :-1].ravel()
                B = ext[:-1, 1:].ravel()
                C = ext[1:, 1:].ravel()
                D = ext[1:, :-1].ravel()
                valid = ~(np.isnan(A) | np.isnan(B) | np.isnan(C) | np.isnan(D))
                for lv in levels:
                    cnt, ln = cell_segments(A[valid], B[valid], C[valid], D[valid], lv)
                    rows.append(
                        {
                            "tile_x": int(r.tile_x), "tile_y": int(r.tile_y),
                            "level": float(lv),
                            "n_segments": int(cnt.sum()),
                            "length": float(ln.sum()),
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in CONTOUR_SCHEMA.fields])

    return j.mapInPandas(run, schema=CONTOUR_SCHEMA)


def contour_totals(tiles: DataFrame, levels: list[float]) -> DataFrame:
    """Global per-level totals (the classic partial+final aggregate)."""
    per_tile = contour(tiles, levels)
    return per_tile.groupBy("level").agg(
        F.sum("n_segments").alias("n_segments"),
        F.sum("length").alias("length"),
    )
