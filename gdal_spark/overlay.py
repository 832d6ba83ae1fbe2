"""Overlay (layer-algebra) joins: Clip / Intersection / Erase / Identity.

The reference implements these as index-nested-loop joins with per-pair
GEOS geometry ops (generic/ogrlayer.cpp — Intersection :2062 with
envelope prefilter :2128-2139 and per-feature spatial-filter pushdown
:2142-2146; Clip :3820; Erase :4079; Identity :3183). Restated for
Spark:

  zones (method layer, small) -> broadcast PackedCover (index.py)
  docs  (input layer, huge)   -> ONE vectorized pandas UDF per doc
  batch: cell lookup -> bbox reject -> Sutherland-Hodgman clip of the
  doc polygon against each candidate zone ring -> piece areas

No shuffle, no row duplication (pieces are exploded AFTER the UDF from
an in-row array). The clip kernel is vectorized over (doc, zone) pairs:
Python loops run only over clip edges and vertex slots (bounded, tiny),
mirroring geomlite's discipline.

Semantics vs the reference:
  intersection — every intersecting (doc, zone) pair with attrs from
    both sides and the piece geometry's area (ogrlayer.cpp:2198,2217-2222)
  clip — docs cut to the union of zones, attrs of docs only
    (:3820); with disjoint zones the clipped area = sum of piece areas
  erase — doc area minus the zone-covered area (:4079); exact for
    disjoint zones (the engine's zone grids are non-overlapping)
  identity — doc split by zones, keeping all of the doc (:3183):
    intersection pieces plus the uncovered remainder with NULL zone

Clip-side geometry: the fast path clips with Sutherland-Hodgman
(convex zones); `intersection_general` handles arbitrary concave /
multi-ring polygons via the signed-triangle decomposition kernel
(area-exact for any simple polygon pair), and `intersection_pieces`
reassembles actual piece geometries. GDAL reaches the same semantics
through GEOS.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import index as IX
from .cells import np_geo_cell


# ----------------------------------------------------- vectorized S-H clip
def clip_convex_pairs(
    sx: np.ndarray, sy: np.ndarray, slen: np.ndarray,
    cx: np.ndarray, cy: np.ndarray, clen: np.ndarray,
):
    """Sutherland-Hodgman over N pairs at once.

    sx/sy: (N, Ls) padded subject rings (open, CCW or CW), slen true lengths.
    cx/cy: (N, Lc) padded CONVEX clip rings, clen true lengths.
    Returns (ox, oy, olen): padded clipped rings, olen==0 when empty.

    Vectorized over pairs; loops over clip edges (<= Lc) and vertex
    slots (<= Ls + Lc) only. Clip ring orientation is normalized to CCW
    via the signed area so the inside test is consistent.
    """
    N, Ls = sx.shape
    Lc = cx.shape[1]
    # 2*Ls + Lc bounds per-pass growth even for concave subjects (each
    # subject edge emits at most its endpoint + one crossing per pass);
    # the convex-subject bound Ls + Lc + 1 would overflow on concave input
    Lout = 2 * Ls + Lc

    # normalize clip rings to CCW (signed shoelace >= 0)
    rows = np.arange(N)
    nxt = lambda i, ln: np.minimum(i + 1, ln - 1) * 0 + (i + 1) % np.maximum(ln, 1)  # noqa: E731
    signed2 = np.zeros(N)
    for i in range(Lc):
        act = i < clen
        j = (i + 1) % np.maximum(clen, 1)
        signed2 += np.where(act, cx[rows, np.minimum(i, Lc - 1)] * cy[rows, j]
                            - cx[rows, j] * cy[rows, np.minimum(i, Lc - 1)], 0.0)
    flip = signed2 < 0
    if flip.any():
        cx = cx.copy()
        cy = cy.copy()
        for k in np.where(flip)[0]:
            L = int(clen[k])
            cx[k, :L] = cx[k, :L][::-1]
            cy[k, :L] = cy[k, :L][::-1]

    cur_x = np.zeros((N, Lout))
    cur_y = np.zeros((N, Lout))
    cur_x[:, :Ls] = sx
    cur_y[:, :Ls] = sy
    cur_len = slen.astype(np.int64).copy()

    for e in range(Lc):
        e_act = (e < clen) & (cur_len >= 3)
        if not e_act.any():
            cur_len = np.where(cur_len < 3, 0, cur_len)
            break
        # clip edge (A -> B), CCW so inside = left of the edge
        ax = cx[rows, np.minimum(e, clen - 1)]
        ay = cy[rows, np.minimum(e, clen - 1)]
        j = (e + 1) % np.maximum(clen, 1)
        bx = cx[rows, j]
        by = cy[rows, j]
        ex_, ey_ = bx - ax, by - ay

        out_x = np.zeros((N, Lout))
        out_y = np.zeros((N, Lout))
        out_n = np.zeros(N, dtype=np.int64)
        Lmax = int(cur_len.max()) if len(cur_len) else 0
        for i in range(Lmax):
            v_act = e_act & (i < cur_len)
            if not v_act.any():
                break
            # each slot emits <= 2 vertices; fail loudly (instead of
            # corrupting memory) if a pathological ring would overflow
            if int(out_n.max()) + 2 > Lout:
                raise ValueError(
                    "clip_convex_pairs: ring growth exceeds the 2*Ls+Lc "
                    "buffer — subject ring too concave for this kernel"
                )
            ip = np.where(i == 0, cur_len - 1, i - 1)  # previous vertex
            px = cur_x[rows, np.minimum(i, Lout - 1)]
            py = cur_y[rows, np.minimum(i, Lout - 1)]
            qx = cur_x[rows, np.clip(ip, 0, Lout - 1)]
            qy = cur_y[rows, np.clip(ip, 0, Lout - 1)]
            side_p = ex_ * (py - ay) - ey_ * (px - ax)  # >=0 -> inside
            side_q = ex_ * (qy - ay) - ey_ * (qx - ax)
            in_p = side_p >= 0
            in_q = side_q >= 0
            crossing = v_act & (in_p != in_q)
            with np.errstate(divide="ignore", invalid="ignore"):
                t = np.where(crossing, side_q / (side_q - side_p), 0.0)
            ix_ = qx + t * (px - qx)
            iy_ = qy + t * (py - qy)
            # emit intersection point when the edge crosses
            emit1 = crossing
            out_x[rows[emit1], out_n[emit1]] = ix_[emit1]
            out_y[rows[emit1], out_n[emit1]] = iy_[emit1]
            out_n += emit1
            # emit current vertex when inside
            emit2 = v_act & in_p
            out_x[rows[emit2], out_n[emit2]] = px[emit2]
            out_y[rows[emit2], out_n[emit2]] = py[emit2]
            out_n += emit2
        keep_old = ~e_act
        cur_x = np.where(keep_old[:, None], cur_x, out_x)
        cur_y = np.where(keep_old[:, None], cur_y, out_y)
        cur_len = np.where(keep_old, cur_len, out_n)

    cur_len = np.where(cur_len < 3, 0, cur_len)
    return cur_x, cur_y, cur_len


def shoelace_pairs(ox: np.ndarray, oy: np.ndarray, olen: np.ndarray) -> np.ndarray:
    """|signed area| per padded ring row (0 where olen==0)."""
    N, L = ox.shape
    rows = np.arange(N)
    s = np.zeros(N)
    for i in range(L):
        act = i < olen
        if not act.any():
            break
        j = (i + 1) % np.maximum(olen, 1)
        s += np.where(act, ox[rows, i] * oy[rows, j] - ox[rows, j] * oy[rows, i], 0.0)
    return np.abs(s) / 2.0


# -------------------------------------------------------------- the kernel
def _clip_candidates(cov: IX.PackedCover, level: int,
                     x0, x1, y0, y1) -> list[list[dict]]:
    """Per doc-square, the list of {zone_id, eas_id, area} for every
    zone whose clip piece is non-empty. Candidate generation = the same
    staged pattern as the PIP join (cell lookup -> bbox reject), then
    the exact op is the S-H clip instead of the PIP predicate."""
    B = len(x0)
    lon = (x0 + x1) / 2.0
    lat = (y0 + y1) / 2.0
    cell = np_geo_cell(lon, lat, level)

    pos = np.searchsorted(cov.cells, cell)
    pos_c = np.minimum(pos, max(len(cov.cells) - 1, 0))
    found = (len(cov.cells) > 0) & (cov.cells[pos_c] == cell)
    start = np.where(found, cov.off[pos_c], 0)
    end = np.where(found, cov.off[pos_c + 1], 0)
    ncand = end - start
    total = int(ncand.sum())
    out: list[list[dict]] = [[] for _ in range(B)]
    if total == 0:
        return out

    doc_idx = np.repeat(np.arange(B), ncand)
    cum0 = np.cumsum(ncand) - ncand
    within = np.arange(total) - np.repeat(cum0, ncand)
    z = cov.cand_zone[np.repeat(start, ncand) + within].astype(np.int64)

    keep = (
        (x1[doc_idx] >= cov.zxmin[z]) & (x0[doc_idx] <= cov.zxmax[z])
        & (y1[doc_idx] >= cov.zymin[z]) & (y0[doc_idx] <= cov.zymax[z])
    )
    sel = np.where(keep)[0]
    if len(sel) == 0:
        return out
    d = doc_idx[sel]
    zs = z[sel]

    # subject: the doc squares (4 vertices)
    sx = np.stack([x0[d], x1[d], x1[d], x0[d]], axis=1)
    sy = np.stack([y0[d], y0[d], y1[d], y1[d]], axis=1)
    slen = np.full(len(sel), 4, dtype=np.int64)
    # clip: zone rings gathered from the cover
    rl = cov.ring_len[zs]
    Lmax = int(rl.max())
    take = cov.ring_off[zs, None] + np.minimum(np.arange(Lmax)[None, :], rl[:, None] - 1)
    cxr = cov.ring_x[take]
    cyr = cov.ring_y[take]

    ox, oy, olen = clip_convex_pairs(sx, sy, slen, cxr, cyr, rl)
    area = shoelace_pairs(ox, oy, olen)
    hit = area > 0.0
    cols = np.arange(ox.shape[1])
    act = cols[None, :] < olen[:, None]
    bx0 = np.where(act, ox, np.inf).min(axis=1)
    bx1 = np.where(act, ox, -np.inf).max(axis=1)
    by0 = np.where(act, oy, np.inf).min(axis=1)
    by1 = np.where(act, oy, -np.inf).max(axis=1)
    for k in np.where(hit)[0]:
        out[int(d[k])].append(
            {
                "zone_id": int(cov.zone_id[zs[k]]),
                "eas_id": int(cov.eas_id[zs[k]]),
                "area": float(area[k]),
                "px0": float(bx0[k]), "px1": float(bx1[k]),
                "py0": float(by0[k]), "py1": float(by1[k]),
            }
        )
    for lst in out:
        lst.sort(key=lambda r: r["zone_id"])
    return out


_PIECES = T.ArrayType(
    T.StructType(
        [
            T.StructField("zone_id", T.LongType()),
            T.StructField("eas_id", T.LongType()),
            T.StructField("area", T.DoubleType()),
            T.StructField("px0", T.DoubleType()),
            T.StructField("px1", T.DoubleType()),
            T.StructField("py0", T.DoubleType()),
            T.StructField("py1", T.DoubleType()),
        ]
    )
)


def _pieces_udf(zindex: IX.ZoneIndex):
    bc, level = zindex.bc, zindex.level

    @F.pandas_udf(_PIECES)
    def pieces(
        x0: pd.Series, x1: pd.Series, y0: pd.Series, y1: pd.Series
    ) -> pd.Series:
        cov = bc.value
        return pd.Series(
            _clip_candidates(
                cov, level,
                x0.to_numpy(np.float64), x1.to_numpy(np.float64),
                y0.to_numpy(np.float64), y1.to_numpy(np.float64),
            )
        )

    return pieces


def _with_pieces(docs: DataFrame, zindex: IX.ZoneIndex) -> DataFrame:
    """docs needs box columns x0/x1/y0/y1 (axis-aligned doc geometry).
    Adds `_pieces`: the per-zone clip results as an in-row array."""
    u = _pieces_udf(zindex)
    return docs.withColumn(
        "_pieces", u(F.col("x0"), F.col("x1"), F.col("y0"), F.col("y1"))
    )


def intersection(docs: DataFrame, zindex: IX.ZoneIndex) -> DataFrame:
    """Every intersecting (doc, zone) pair: attrs from both + piece area
    (generic/ogrlayer.cpp:2062). Non-intersecting docs drop out."""
    j = _with_pieces(docs, zindex).select("*", F.explode("_pieces").alias("_p"))
    return (
        j.withColumn("zone_id", F.col("_p.zone_id"))
        .withColumn("eas_id", F.col("_p.eas_id"))
        .withColumn("piece_area", F.col("_p.area"))
        .drop("_pieces", "_p")
    )


def clip(docs: DataFrame, zindex: IX.ZoneIndex) -> DataFrame:
    """Docs cut to the union of zones, doc attrs only (:3820). With
    disjoint zones, area(A ∩ union B) = sum of per-zone piece areas."""
    j = _with_pieces(docs, zindex)
    return (
        j.withColumn(
            "clip_area",
            F.aggregate("_pieces", F.lit(0.0), lambda a, p: a + p["area"]),
        )
        .filter(F.size("_pieces") > 0)
        .drop("_pieces")
    )


def erase(docs: DataFrame, zindex: IX.ZoneIndex) -> DataFrame:
    """Doc area minus zone-covered area (:4079); every doc kept (0 when
    fully covered) — exact for disjoint zones."""
    j = _with_pieces(docs, zindex)
    doc_area = (F.col("x1") - F.col("x0")) * (F.col("y1") - F.col("y0"))
    covered = F.aggregate("_pieces", F.lit(0.0), lambda a, p: a + p["area"])
    return j.withColumn(
        "erase_area", F.greatest(F.lit(0.0), doc_area - covered)
    ).drop("_pieces")


def identity(docs: DataFrame, zindex: IX.ZoneIndex) -> DataFrame:
    """Doc split by zones keeping all of the doc (:3183): intersection
    pieces plus a NULL-zone remainder row when part is uncovered."""
    j = _with_pieces(docs, zindex)
    doc_area = (F.col("x1") - F.col("x0")) * (F.col("y1") - F.col("y0"))
    covered = F.aggregate("_pieces", F.lit(0.0), lambda a, p: a + p["area"])
    rem = F.greatest(F.lit(0.0), doc_area - covered)
    # append the remainder as a NULL-zone piece when meaningfully > 0
    # (tolerance mirrors KEEP_LOWER_DIMENSION_GEOMETRIES pruning of
    # degenerate slivers, ogrlayer.cpp:2016-2037)
    with_rem = F.when(
        rem > F.lit(1e-9),
        F.concat(
            F.col("_pieces"),
            F.array(
                F.struct(
                    F.lit(None).cast("long").alias("zone_id"),
                    F.lit(None).cast("long").alias("eas_id"),
                    rem.alias("area"),
                    F.lit(None).cast("double").alias("px0"),
                    F.lit(None).cast("double").alias("px1"),
                    F.lit(None).cast("double").alias("py0"),
                    F.lit(None).cast("double").alias("py1"),
                )
            ),
        ),
    ).otherwise(F.col("_pieces"))
    ex = j.withColumn("_pieces", with_rem).select(
        "*", F.explode("_pieces").alias("_p")
    )
    return (
        ex.withColumn("zone_id", F.col("_p.zone_id"))
        .withColumn("eas_id", F.col("_p.eas_id"))
        .withColumn("piece_area", F.col("_p.area"))
        .drop("_pieces", "_p")
    )


# ------------------------------------------------- union / symdiff / update
def rect_union_area(x0, x1, y0, y1) -> float:
    """Exact area of a union of axis-aligned rectangles: x sweep with
    per-strip y interval union. O(n^2) per group — groups are the
    pieces of ONE zone, bounded by zone fan-in, not table size."""
    x0 = np.asarray(x0, dtype=np.float64)
    x1 = np.asarray(x1, dtype=np.float64)
    y0 = np.asarray(y0, dtype=np.float64)
    y1 = np.asarray(y1, dtype=np.float64)
    xs = np.unique(np.concatenate([x0, x1]))
    total = 0.0
    for i in range(len(xs) - 1):
        a, b = xs[i], xs[i + 1]
        if b <= a:
            continue
        sel = (x0 < b) & (x1 > a)
        if not sel.any():
            continue
        iv = sorted(zip(y0[sel].tolist(), y1[sel].tolist()))
        cov = 0.0
        cur0, cur1 = iv[0]
        for s, e in iv[1:]:
            if s > cur1:
                cov += cur1 - cur0
                cur0, cur1 = s, e
            else:
                cur1 = max(cur1, e)
        cov += cur1 - cur0
        total += (b - a) * cov
    return float(total)


def _zones_meta_df(spark, zindex: IX.ZoneIndex) -> DataFrame:
    """Per-zone metadata table rebuilt from the broadcast cover (the
    cover is the zone table's packed form — rebuilding keeps the two
    legs reading the SAME source of truth)."""
    cov = zindex.bc.value
    pdf = pd.DataFrame(
        {
            "zone_id": cov.zone_id.astype(np.int64),
            "eas_id": cov.eas_id.astype(np.int64),
            "zx0": cov.zxmin, "zx1": cov.zxmax,
            "zy0": cov.zymin, "zy1": cov.zymax,
        }
    )
    return spark.createDataFrame(pdf)


_ZCOV_SCHEMA = T.StructType(
    [
        T.StructField("zone_id", T.LongType()),
        T.StructField("covered", T.DoubleType()),
    ]
)


def _zone_covered(docs_pieces: DataFrame) -> DataFrame:
    """(zone_id, covered): area of the UNION of doc∩zone pieces per
    zone. Distributed: explode pieces to a narrow (zone_id, bbox)
    projection, shuffle on zone_id, exact rect-union per group. Doc
    squares overlap each other, so summing piece areas would
    overcount — this is the union-of-rectangles leg GDAL gets from
    GEOS UnionCascaded (ogrlayer.cpp:2408 Union's method-side
    remainder). Requires axis-aligned pieces (rect zones), matching
    the module's documented geometry restriction."""
    ex = docs_pieces.select(F.explode("_pieces").alias("_p")).select(
        F.col("_p.zone_id").alias("zone_id"),
        F.col("_p.px0").alias("px0"), F.col("_p.px1").alias("px1"),
        F.col("_p.py0").alias("py0"), F.col("_p.py1").alias("py1"),
    )

    def per_zone(key, pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            [{
                "zone_id": int(key[0]),
                "covered": rect_union_area(
                    pdf["px0"], pdf["px1"], pdf["py0"], pdf["py1"]
                ),
            }]
        )

    return ex.groupBy("zone_id").applyInPandas(per_zone, schema=_ZCOV_SCHEMA)


def _doc_legs(j: DataFrame, id_col: str):
    doc_area = (F.col("x1") - F.col("x0")) * (F.col("y1") - F.col("y0"))
    covered = F.aggregate("_pieces", F.lit(0.0), lambda a, p: a + p["area"])
    rem = F.greatest(F.lit(0.0), doc_area - covered)
    inter = j.select("*", F.explode("_pieces").alias("_p")).select(
        F.col(id_col).alias("doc_id"),
        F.col("_p.zone_id").alias("zone_id"),
        F.col("_p.eas_id").alias("eas_id"),
        F.col("_p.area").alias("piece_area"),
    )
    doc_rem = j.select(
        F.col(id_col).alias("doc_id"),
        F.lit(None).cast("long").alias("zone_id"),
        F.lit(None).cast("long").alias("eas_id"),
        rem.alias("piece_area"),
    ).filter(F.col("piece_area") > 1e-9)
    return inter, doc_rem


def _zone_legs(spark, j: DataFrame, zindex: IX.ZoneIndex,
               full: bool) -> DataFrame:
    zm = _zones_meta_df(spark, zindex)
    zarea = (F.col("zx1") - F.col("zx0")) * (F.col("zy1") - F.col("zy0"))
    if full:
        rem = zarea
        out = zm
    else:
        cov = _zone_covered(j)
        out = zm.join(cov, "zone_id", "left")
        rem = F.greatest(F.lit(0.0), zarea - F.coalesce("covered", F.lit(0.0)))
    return out.select(
        F.lit(None).cast("long").alias("doc_id"),
        F.col("zone_id"),
        F.col("eas_id"),
        rem.alias("piece_area"),
    ).filter(F.col("piece_area") > 1e-9)


def union_overlay(docs: DataFrame, zindex: IX.ZoneIndex,
                  id_col: str = "doc_id") -> DataFrame:
    """OGR Union (generic/ogrlayer.cpp:2408): A∩B pieces with attrs
    from both, A-not-B remainders (NULL method attrs), and B-not-A
    remainders (NULL input attrs). The method-side remainder subtracts
    the UNION of overlapping input pieces (rect sweep), not their
    sum."""
    spark = docs.sparkSession
    j = _with_pieces(docs, zindex)
    inter, doc_rem = _doc_legs(j, id_col)
    zone_rem = _zone_legs(spark, j, zindex, full=False)
    return inter.unionByName(doc_rem).unionByName(zone_rem)


def sym_difference(docs: DataFrame, zindex: IX.ZoneIndex,
                   id_col: str = "doc_id") -> DataFrame:
    """OGR SymDifference (ogrlayer.cpp:2838): A-not-B plus B-not-A —
    Union without the intersection leg."""
    spark = docs.sparkSession
    j = _with_pieces(docs, zindex)
    _, doc_rem = _doc_legs(j, id_col)
    zone_rem = _zone_legs(spark, j, zindex, full=False)
    return doc_rem.unionByName(zone_rem)


def update(docs: DataFrame, zindex: IX.ZoneIndex,
           id_col: str = "doc_id") -> DataFrame:
    """OGR Update (ogrlayer.cpp:3528): input features with the
    method-covered part erased, plus the method features whole."""
    spark = docs.sparkSession
    j = _with_pieces(docs, zindex)
    _, doc_rem = _doc_legs(j, id_col)
    zone_full = _zone_legs(spark, j, zindex, full=True)
    return doc_rem.unionByName(zone_full)


# --------------------------------------------------- general-geometry path
def intersection_general(docs: DataFrame, zones_pdf: pd.DataFrame,
                         id_col: str = "doc_id",
                         wkt_col: str = "geom_wkt") -> DataFrame:
    """Overlay intersection for ARBITRARY polygons — concave rings and
    holes on either side — via the geometry.py triangle kernel
    (ear-clip both sides once, batched triangle x triangle convex
    clips, signed areas make holes exact). The zone side triangulates
    ONCE on the driver and broadcasts (same small-model pattern as the
    packed cover); documents carry WKT (or WKB) and triangulate per
    row inside the Arrow batch.

    This is the general path of ogrlayer.cpp:2062's GEOS-backed
    Intersection; the convex fast path (intersection/clip/erase/...)
    remains the vectorized kernel of choice for rect/convex layers.
    """
    from . import geometry as GM

    spark = docs.sparkSession
    metas = []
    for r in zones_pdf.itertuples(index=False):
        g = GM.parse_wkt(r.geom_wkt)
        t, s = g.signed_tris()
        xs, ys = g.all_points()
        metas.append(
            (int(r.zone_id), t, s,
             float(xs.min()), float(xs.max()), float(ys.min()), float(ys.max()))
        )
    bc = spark.sparkContext.broadcast(metas)

    PIECES = T.ArrayType(
        T.StructType(
            [
                T.StructField("zone_id", T.LongType()),
                T.StructField("area", T.DoubleType()),
            ]
        )
    )

    @F.pandas_udf(PIECES)
    def pieces(wkt: pd.Series) -> pd.Series:
        zs = bc.value
        out = []
        for w in wkt:
            if w is None:
                out.append([])
                continue
            g = GM.geom_of(w)
            dt, ds = g.signed_tris()
            if len(dt) == 0:
                out.append([])
                continue
            dx0 = float(dt[:, :, 0].min())
            dx1 = float(dt[:, :, 0].max())
            dy0 = float(dt[:, :, 1].min())
            dy1 = float(dt[:, :, 1].max())
            hits = []
            for zid, zt, zsn, zx0, zx1, zy0, zy1 in zs:
                if dx1 < zx0 or dx0 > zx1 or dy1 < zy0 or dy0 > zy1:
                    continue
                a = GM.intersection_area_tris(dt, ds, zt, zsn)
                if a > 1e-9:
                    hits.append({"zone_id": zid, "area": float(a)})
            hits.sort(key=lambda h: h["zone_id"])
            out.append(hits)
        return pd.Series(out)

    ex = docs.withColumn("_p", F.explode(pieces(F.col(wkt_col))))
    return (
        ex.withColumn("zone_id", F.col("_p.zone_id"))
        .withColumn("piece_area", F.col("_p.area"))
        .drop("_p")
    )


def intersection_pieces(docs: DataFrame, zones_pdf: pd.DataFrame,
                        id_col: str = "doc_id",
                        wkt_col: str = "geom_wkt") -> DataFrame:
    """Overlay intersection for ARBITRARY polygons returning the REAL
    piece geometry (canonical WKT) per (doc, zone) pair — the full
    GEOS-parity path of ogrlayer.cpp:2062 / ogrgeometry.cpp:4240.
    Same broadcast small-model plan as intersection_general (zones
    parse once on the driver, travel as a broadcast variable; docs
    never shuffle), with the boundary-classification boolean kernel
    per candidate pair after a bbox prefilter."""
    from . import boolean as BO
    from . import geometry as GM

    spark = docs.sparkSession
    metas = []
    for r in zones_pdf.itertuples(index=False):
        g = GM.parse_wkt(r.geom_wkt)
        xs, ys = g.all_points()
        metas.append(
            (int(r.zone_id), g,
             float(xs.min()), float(xs.max()), float(ys.min()), float(ys.max()))
        )
    bc = spark.sparkContext.broadcast(metas)

    PIECES = T.ArrayType(
        T.StructType(
            [
                T.StructField("zone_id", T.LongType()),
                T.StructField("wkt", T.StringType()),
                T.StructField("area", T.DoubleType()),
            ]
        )
    )

    @F.pandas_udf(PIECES)
    def pieces(wkt: pd.Series) -> pd.Series:
        zs = bc.value
        out = []
        for w in wkt:
            if w is None:
                out.append([])
                continue
            g = GM.geom_of(w)
            xs, ys = g.all_points()
            if len(xs) == 0:
                out.append([])
                continue
            dx0, dx1 = float(xs.min()), float(xs.max())
            dy0, dy1 = float(ys.min()), float(ys.max())
            hits = []
            for zid, zg, zx0, zx1, zy0, zy1 in zs:
                if dx1 < zx0 or dx0 > zx1 or dy1 < zy0 or dy0 > zy1:
                    continue
                ps = BO.polygon_boolean(g, zg, "intersection")
                a = sum(
                    abs(GM.signed_area(r[:, 0], r[:, 1]))
                    * (1.0 if i == 0 else -1.0)
                    for rings in ps for i, r in enumerate(rings)
                )
                if ps and a > 1e-9:
                    hits.append({"zone_id": zid,
                                 "wkt": BO.canonical_wkt(ps),
                                 "area": float(a)})
            hits.sort(key=lambda h: h["zone_id"])
            out.append(hits)
        return pd.Series(out)

    ex = docs.withColumn("_p", F.explode(pieces(F.col(wkt_col))))
    return (
        ex.withColumn("zone_id", F.col("_p.zone_id"))
        .withColumn("piece_wkt", F.col("_p.wkt"))
        .withColumn("piece_area", F.col("_p.area"))
        .drop("_p")
    )
