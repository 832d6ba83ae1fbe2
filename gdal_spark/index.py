"""Broadcast cell-cover spatial index.

Plays the role of the reference's spatial indexes — the shapefile .qix
quadtree probe (gdal/ogr/ogrsf_frmts/shape/ogrshapelayer.cpp:541,621-668)
and the in-memory CPLQuadTree (gdal/port/cpl_quad_tree.cpp:149) — but
re-expressed for Spark's execution model:

  zone polygons (small side) -> every geodetic grid cell their dilated
  bbox touches -> ONE row per cell with all candidate zones packed as
  flat parallel primitive arrays (Arrow-friendly; rings flattened with
  an offsets array).

The big documents side joins this cover table 1:1 on its point's cell id
via a broadcast hash join: candidate pruning costs zero shuffle and adds
zero row duplication. The exact predicate then runs vectorized in a
pandas UDF (joins.py), reproducing OGRLayer::FilterGeometry's staged
test (generic/ogrlayer.cpp:1357: bbox reject :1377-1382, exact
Intersects :1449-1462).

Scale: cover size ~= 4-9 rows per zone; 10^4 zones -> ~10 MB broadcast.
At 10^6+ zones, shard the cover by cell range and use a shuffle join on
cell_id instead (same schema) — the API stays identical.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import geomlite as G
from .cells import geo_cell_xy, pack_geo_cell

COVER_SCHEMA = T.StructType(
    [
        T.StructField("cell_id", T.LongType(), False),
        T.StructField("cand_zone_id", T.ArrayType(T.LongType()), False),
        T.StructField("cand_eas_id", T.ArrayType(T.LongType()), False),
        T.StructField("cand_xmin", T.ArrayType(T.DoubleType()), False),
        T.StructField("cand_ymin", T.ArrayType(T.DoubleType()), False),
        T.StructField("cand_xmax", T.ArrayType(T.DoubleType()), False),
        T.StructField("cand_ymax", T.ArrayType(T.DoubleType()), False),
        T.StructField("cand_ring_x", T.ArrayType(T.DoubleType()), False),
        T.StructField("cand_ring_y", T.ArrayType(T.DoubleType()), False),
        T.StructField("cand_ring_len", T.ArrayType(T.IntegerType()), False),
    ]
)


def auto_level(n_zones: int) -> int:
    """Index level with cell pitch ~ half the zone pitch: candidates per
    cell stay O(1) regardless of zone count."""
    g = max(1, int(round(math.sqrt(n_zones))))
    return min(14, max(3, int(math.ceil(math.log2(g))) + 1))


def build_zone_cover(
    zones: pd.DataFrame, level: int, dilation: float = 0.011
) -> pd.DataFrame:
    """Driver-side cover build (zones are the broadcast side by design).

    dilation expands each zone bbox by the maximum document-geometry
    radius (0.01 deg polygon buffer + grid slack) so a document whose
    own polygon straddles a cell border still finds every zone it can
    intersect in its center cell's candidate list.

    Candidates within a cell are sorted by zone_id — "first match" is
    then simply element 1, reproducing OGR SQL's one-to-first-match
    LEFT JOIN determinism (ogr_sql_dialect.rst:483-490).
    """
    cells: dict[int, list[int]] = {}
    for idx, row in enumerate(zones.itertuples(index=False)):
        x0, y0 = row.xmin - dilation, row.ymin - dilation
        x1, y1 = row.xmax + dilation, row.ymax + dilation
        cx0, cy0 = geo_cell_xy(x0, y0, level)
        cx1, cy1 = geo_cell_xy(x1, y1, level)
        for cx in range(cx0, cx1 + 1):
            for cy in range(cy0, cy1 + 1):
                cells.setdefault(pack_geo_cell(cx, cy, level), []).append(idx)

    zid = zones["zone_id"].to_numpy()
    eas = zones["eas_id"].to_numpy()
    xmin = zones["xmin"].to_numpy()
    ymin = zones["ymin"].to_numpy()
    xmax = zones["xmax"].to_numpy()
    ymax = zones["ymax"].to_numpy()
    xs_list = zones["xs"].tolist()
    ys_list = zones["ys"].tolist()

    rows = []
    for cell_id, idxs in cells.items():
        idxs = sorted(idxs, key=lambda k: int(zid[k]))
        ring_x: list[float] = []
        ring_y: list[float] = []
        ring_len: list[int] = []
        for k in idxs:
            ring_x.extend(xs_list[k])
            ring_y.extend(ys_list[k])
            ring_len.append(len(xs_list[k]))
        rows.append(
            {
                "cell_id": cell_id,
                "cand_zone_id": [int(zid[k]) for k in idxs],
                "cand_eas_id": [int(eas[k]) for k in idxs],
                "cand_xmin": [float(xmin[k]) for k in idxs],
                "cand_ymin": [float(ymin[k]) for k in idxs],
                "cand_xmax": [float(xmax[k]) for k in idxs],
                "cand_ymax": [float(ymax[k]) for k in idxs],
                "cand_ring_x": ring_x,
                "cand_ring_y": ring_y,
                "cand_ring_len": ring_len,
            }
        )
    return pd.DataFrame(rows)


def cover_df(spark: SparkSession, zones: pd.DataFrame, level: int,
             dilation: float = 0.011) -> DataFrame:
    pdf = build_zone_cover(zones, level, dilation)
    return spark.createDataFrame(pdf, schema=COVER_SCHEMA)


# ---------------------------------------------------------------- numpy side
def _eval_candidate_pairs(
    px, py, gxs, gys, cand_zone_id, cand_eas_id, cand_bbox,
    cand_ring_x, cand_ring_y, cand_ring_len,
):
    """Shared core: flatten (doc, candidate) pairs, run the staged test,
    return (doc_idx, zone_id, eas_id) arrays of the HIT pairs only."""
    B = len(px)
    ncand = np.array([0 if c is None else len(c) for c in cand_zone_id], dtype=np.int64)
    empty = (np.empty(0, np.int64),) * 3
    if int(ncand.sum()) == 0:
        return empty

    doc_idx = np.repeat(np.arange(B), ncand)
    zid = np.concatenate([np.asarray(c, dtype=np.int64) for c in cand_zone_id if c is not None and len(c)])
    eas = np.concatenate([np.asarray(c, dtype=np.int64) for c in cand_eas_id if c is not None and len(c)])
    bxmin, bymin, bxmax, bymax = (
        np.concatenate([np.asarray(c, dtype=np.float64) for c in col if c is not None and len(c)])
        for col in cand_bbox
    )

    glen = np.array([len(a) for a in gxs], dtype=np.int64)
    dxmin = np.array([a.min() if len(a) else np.nan for a in gxs])
    dxmax = np.array([a.max() if len(a) else np.nan for a in gxs])
    dymin = np.array([a.min() if len(a) else np.nan for a in gys])
    dymax = np.array([a.max() if len(a) else np.nan for a in gys])

    keep = (
        (dxmax[doc_idx] >= bxmin)
        & (dxmin[doc_idx] <= bxmax)
        & (dymax[doc_idx] >= bymin)
        & (dymin[doc_idx] <= bymax)
    )
    if not keep.any():
        return empty

    ring_lens = np.concatenate([np.asarray(c, dtype=np.int64) for c in cand_ring_len if c is not None and len(c)])
    flat_x = np.concatenate([np.asarray(c, dtype=np.float64) for c in cand_ring_x if c is not None and len(c)])
    flat_y = np.concatenate([np.asarray(c, dtype=np.float64) for c in cand_ring_y if c is not None and len(c)])
    ring_off = np.concatenate([[0], np.cumsum(ring_lens)])[:-1]

    sel = np.where(keep)[0]
    Lmax = int(ring_lens[sel].max())
    take = ring_off[sel, None] + np.minimum(np.arange(Lmax)[None, :], ring_lens[sel, None] - 1)
    RX = flat_x[take]
    RY = flat_y[take]
    RL = ring_lens[sel]
    d_of_pair = doc_idx[sel]

    pt_pair = glen[d_of_pair] == 1
    hits = np.zeros(len(sel), dtype=bool)
    if pt_pair.any():
        pp = np.where(pt_pair)[0]
        hits[pp] = G.pip_pairs(
            px[d_of_pair[pp]], py[d_of_pair[pp]], RX[pp], RY[pp], RL[pp]
        )
    poly_rows = np.where(~pt_pair)[0]
    if len(poly_rows):
        hits[poly_rows] = G.intersects_pairs(
            [gxs[d_of_pair[r]] for r in poly_rows],
            [gys[d_of_pair[r]] for r in poly_rows],
            RX[poly_rows],
            RY[poly_rows],
            RL[poly_rows],
        )
    hit_pairs = sel[hits]
    return doc_idx[hit_pairs], zid[hit_pairs], eas[hit_pairs]


def first_match_np(
    px, py, gxs, gys, cand_zone_id, cand_eas_id, cand_bbox,
    cand_ring_x, cand_ring_y, cand_ring_len,
):
    """Fast path for OGR first-match semantics: per doc the hit with the
    LOWEST zone_id, -1 sentinel when none — flat int64 outputs, no
    per-row Python objects (this is the benchmark hot loop)."""
    B = len(px)
    zone_out = np.full(B, -1, dtype=np.int64)
    eas_out = np.full(B, -1, dtype=np.int64)
    doc_idx, zid, eas = _eval_candidate_pairs(
        px, py, gxs, gys, cand_zone_id, cand_eas_id, cand_bbox,
        cand_ring_x, cand_ring_y, cand_ring_len,
    )
    if len(doc_idx):
        order = np.lexsort((zid, doc_idx))  # by doc, then zone_id asc
        d_sorted = doc_idx[order]
        first = np.ones(len(order), dtype=bool)
        first[1:] = d_sorted[1:] != d_sorted[:-1]
        zone_out[d_sorted[first]] = zid[order][first]
        eas_out[d_sorted[first]] = eas[order][first]
    return zone_out, eas_out


def match_candidates_np(
    px: np.ndarray,
    py: np.ndarray,
    gxs: list[np.ndarray],
    gys: list[np.ndarray],
    cand_zone_id: list,
    cand_eas_id: list,
    cand_bbox: tuple[list, list, list, list],
    cand_ring_x: list,
    cand_ring_y: list,
    cand_ring_len: list,
) -> list[list[tuple[int, int]]]:
    """Vectorized exact-match over a batch of documents with packed
    candidates. Returns, per doc, the ordered list of matching
    (zone_id, eas_id) — empty when no zone intersects.

    Stage structure mirrors FilterGeometry (ogrlayer.cpp:1357):
      1. candidate cells (caller's broadcast join) — quadtree analog
      2. bbox reject (:1377-1382) — vectorized over all (doc,cand) pairs
      3. exact intersects (:1449-1462) — pip_pairs / intersects_pairs
    """
    B = len(px)
    out: list[list[tuple[int, int]]] = [[] for _ in range(B)]
    doc_idx, zid, eas = _eval_candidate_pairs(
        px, py, gxs, gys, cand_zone_id, cand_eas_id, cand_bbox,
        cand_ring_x, cand_ring_y, cand_ring_len,
    )
    order = np.lexsort((zid, doc_idx))
    for k in order:
        out[int(doc_idx[k])].append((int(zid[k]), int(eas[k])))
    return out
