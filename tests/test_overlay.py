"""Overlay-algebra golden tests: vectorized Sutherland-Hodgman clip
kernel and the clip/intersection/erase/identity operators vs a
closed-form rect-intersection oracle (zones are axis-aligned rects, doc
squares axis-aligned — exact areas are products of interval overlaps)."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from gdal_spark import derived as DRV
from gdal_spark import overlay as OV
from gdal_spark.index import zone_index
from gdal_spark.overlay import clip_convex_pairs, shoelace_pairs


def _ring(xs, ys, L):
    rx = np.zeros((1, L))
    ry = np.zeros((1, L))
    rx[0, : len(xs)] = xs
    ry[0, : len(ys)] = ys
    return rx, ry, np.array([len(xs)], dtype=np.int64)


def test_sh_clip_basic_overlap():
    # unit square [0,1]^2 clipped by rect [0.5, 2] x [0.25, 2] -> 0.5*0.75
    sx, sy, slen = _ring([0, 1, 1, 0], [0, 0, 1, 1], 8)
    cx, cy, clen = _ring([0.5, 2, 2, 0.5], [0.25, 0.25, 2, 2], 8)
    ox, oy, olen = clip_convex_pairs(sx, sy, slen, cx, cy, clen)
    assert olen[0] >= 4
    assert abs(shoelace_pairs(ox, oy, olen)[0] - 0.375) < 1e-12


def test_sh_clip_disjoint_and_contained():
    sx = np.array([[0.0, 1, 1, 0], [0.0, 1, 1, 0]])
    sy = np.array([[0.0, 0, 1, 1], [0.0, 0, 1, 1]])
    slen = np.array([4, 4], dtype=np.int64)
    # pair 0: clip far away -> empty; pair 1: clip contains subject
    cx = np.array([[5.0, 6, 6, 5], [-1.0, 2, 2, -1]])
    cy = np.array([[5.0, 5, 6, 6], [-1.0, -1, 2, 2]])
    clen = np.array([4, 4], dtype=np.int64)
    ox, oy, olen = clip_convex_pairs(sx, sy, slen, cx, cy, clen)
    areas = shoelace_pairs(ox, oy, olen)
    assert olen[0] == 0 and areas[0] == 0.0
    assert abs(areas[1] - 1.0) < 1e-12


def test_sh_clip_cw_clip_ring_normalized():
    # clockwise clip ring must be auto-normalized to CCW
    sx, sy, slen = _ring([0, 1, 1, 0], [0, 0, 1, 1], 8)
    cx, cy, clen = _ring([0.5, 0.5, 2, 2], [2, 0, 0, 2], 8)  # CW order
    ox, oy, olen = clip_convex_pairs(sx, sy, slen, cx, cy, clen)
    assert abs(shoelace_pairs(ox, oy, olen)[0] - 0.5) < 1e-12


def _docs_squares(spark, n=300):
    base = spark.range(n).select(F.col("id").alias("doc_id"))
    return DRV.with_derived_squares(base)


def _oracle_pieces(n=300, g=8):
    zones = DRV.rect_zone_grid(g)
    k, m = 2654435761, 4294967296
    ids = np.arange(n, dtype=np.int64)
    lon = -180.0 + (ids * k % m).astype(np.float64) * 360.0 / m
    lat = -85.0 + ((ids + 1) * k % m).astype(np.float64) * 170.0 / m
    half = 0.2 + 0.8 * ((ids + 2) * k % m).astype(np.float64) / m
    rows = []
    for i in range(n):
        x0, x1 = lon[i] - half[i], lon[i] + half[i]
        y0, y1 = lat[i] - half[i], lat[i] + half[i]
        for z in zones.itertuples(index=False):
            w = min(x1, z.xmax) - max(x0, z.xmin)
            h = min(y1, z.ymax) - max(y0, z.ymin)
            if w > 0 and h > 0:
                rows.append((i, z.zone_id, w * h))
    return pd.DataFrame(rows, columns=["doc_id", "zone_id", "area"])


def test_overlay_intersection_golden(spark):
    docs = _docs_squares(spark)
    zidx = zone_index(spark, DRV.rect_zone_grid(8), dilation=1.02)
    got = (
        OV.intersection(docs, zidx)
        .select("doc_id", "zone_id", "piece_area")
        .toPandas()
        .sort_values(["doc_id", "zone_id"])
        .reset_index(drop=True)
    )
    exp = _oracle_pieces().sort_values(["doc_id", "zone_id"]).reset_index(drop=True)
    assert len(got) == len(exp)
    assert (got["doc_id"].to_numpy() == exp["doc_id"].to_numpy()).all()
    assert (got["zone_id"].to_numpy() == exp["zone_id"].to_numpy()).all()
    assert np.allclose(got["piece_area"], exp["area"], rtol=1e-9, atol=1e-12)


def test_overlay_erase_plus_clip_is_doc_area(spark):
    docs = _docs_squares(spark)
    zidx = zone_index(spark, DRV.rect_zone_grid(8), dilation=1.02)
    e = OV.erase(docs, zidx).select("doc_id", "erase_area", "x0", "x1", "y0", "y1")
    c = OV.clip(docs, zidx).select("doc_id", "clip_area")
    pdf = e.join(c, "doc_id", "left").fillna({"clip_area": 0.0}).toPandas()
    doc_area = (pdf["x1"] - pdf["x0"]) * (pdf["y1"] - pdf["y0"])
    assert np.allclose(pdf["erase_area"] + pdf["clip_area"], doc_area, rtol=1e-9)


def test_overlay_identity_pieces_sum(spark):
    docs = _docs_squares(spark, n=150)
    zidx = zone_index(spark, DRV.rect_zone_grid(8), dilation=1.02)
    pdf = OV.identity(docs, zidx).select(
        "doc_id", "zone_id", "piece_area", "x0", "x1", "y0", "y1"
    ).toPandas()
    tot = pdf.groupby("doc_id")["piece_area"].sum()
    one = pdf.drop_duplicates("doc_id").set_index("doc_id")
    doc_area = (one["x1"] - one["x0"]) * (one["y1"] - one["y0"])
    assert np.allclose(tot, doc_area.loc[tot.index], rtol=1e-9)
