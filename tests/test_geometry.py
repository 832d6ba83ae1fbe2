"""General-geometry kernel goldens: concave polygons, holes, WKB
round-trips, constructive ops, and the predicate truth table —
closed-form expected values throughout."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gdal_spark import geometry as GM

L_SHAPE = "POLYGON((0 0, 4 0, 4 1, 1 1, 1 3, 0 3))"  # area 4+2 = 6... (4*1 + 1*2)
SQUARE = "POLYGON((0 0, 2 0, 2 2, 0 2))"
DONUT = "POLYGON((0 0, 4 0, 4 4, 0 4), (1 1, 3 1, 3 3, 1 3))"  # 16 - 4


def test_concave_area_and_triangulation():
    g = GM.parse_wkt(L_SHAPE)
    assert g.area() == pytest.approx(6.0)
    t, s = g.signed_tris()
    assert GM.tris_area(t) == pytest.approx(6.0)  # ear clip partitions exactly


def test_hole_area():
    assert GM.parse_wkt(DONUT).area() == pytest.approx(12.0)


def test_concave_intersection_area():
    a = GM.parse_wkt(L_SHAPE)
    b = GM.parse_wkt(SQUARE)
    # L ∩ [0,2]^2: bottom bar [0,2]x[0,1]=2 plus stem [0,1]x[1,2]=1
    assert GM.intersection_area(a, b) == pytest.approx(3.0)


def test_hole_intersection_area():
    d = GM.parse_wkt(DONUT)
    b = GM.parse_wkt(SQUARE)
    # [0,2]^2 ∩ donut: 4 - ([1,2]x[1,2] hole part) = 3
    assert GM.intersection_area(d, b) == pytest.approx(3.0)


def test_wkb_roundtrip():
    for wkt in (L_SHAPE, SQUARE, DONUT, "POINT(1.5 -2.5)",
                "LINESTRING(0 0, 1 1, 2 0)",
                "MULTIPOLYGON(((0 0, 1 0, 1 1, 0 1)), ((2 2, 3 2, 3 3, 2 3)))"):
        g = GM.parse_wkt(wkt)
        g2 = GM.parse_wkb(GM.to_wkb(g))
        assert g2.kind == g.kind
        assert g2.area() == pytest.approx(g.area())
        # big-endian input parses too
        if g.kind == "point":
            import struct
            xs, ys = g.parts[0]
            be = struct.pack(">BI2d", 0, 1, xs[0], ys[0])
            gb = GM.parse_wkb(be)
            assert gb.parts[0][0][0] == xs[0]


def test_centroid():
    cx, cy = GM.centroid(GM.parse_wkt(SQUARE))
    assert (cx, cy) == (pytest.approx(1.0), pytest.approx(1.0))
    cx, cy = GM.centroid(GM.parse_wkt(DONUT))
    assert (cx, cy) == (pytest.approx(2.0), pytest.approx(2.0))
    # L-shape closed form: moments of the two rectangles
    cx, cy = GM.centroid(GM.parse_wkt(L_SHAPE))
    assert cx == pytest.approx((4 * 1 * 2.0 + 1 * 2 * 0.5) / 6.0)
    assert cy == pytest.approx((4 * 1 * 0.5 + 1 * 2 * 2.0) / 6.0)


def test_convex_hull_and_simplify():
    h = GM.convex_hull(GM.parse_wkt(L_SHAPE))
    # hull of the L = pentagon (0,0),(4,0),(4,1),(1,3),(0,3): area 9
    assert h.area() == pytest.approx(9.0)
    s = GM.simplify(GM.parse_wkt("LINESTRING(0 0, 1 0.001, 2 0)"), 0.01)
    assert len(s.parts[0][0]) == 2


def test_buffer():
    g = GM.parse_wkt("POINT(0 0)")
    b = GM.buffer_geom(g, 2.0, quadsegs=30)
    n = 120
    exact = 0.5 * n * 4.0 * np.sin(2 * np.pi / n)  # inscribed n-gon
    assert b.area() == pytest.approx(exact, rel=1e-12)
    sq = GM.buffer_geom(GM.parse_wkt(SQUARE), 1.0, quadsegs=30)
    # Minkowski sum: 4 + perimeter*1 + pi*1^2 (n-gon arcs slightly less)
    assert sq.area() == pytest.approx(4 + 8 + np.pi, rel=1e-3)


def test_predicates_truth_table():
    A = GM.parse_wkt(SQUARE)                                   # [0,2]^2
    B = GM.parse_wkt("POLYGON((1 1, 3 1, 3 3, 1 3))")          # overlaps A
    C = GM.parse_wkt("POLYGON((2 0, 4 0, 4 2, 2 2))")          # touches A at x=2
    D = GM.parse_wkt("POLYGON((0.5 0.5, 1 0.5, 1 1, 0.5 1))")  # inside A
    E = GM.parse_wkt("POLYGON((10 10, 11 10, 11 11, 10 11))")  # far away

    assert GM.intersects(A, B) and GM.overlaps(A, B)
    assert not GM.contains(A, B) and not GM.equals(A, B)
    assert GM.touches(A, C) and GM.intersects(A, C) and not GM.overlaps(A, C)
    assert GM.contains(A, D) and GM.within(D, A) and not GM.touches(A, D)
    assert GM.disjoint(A, E) and not GM.intersects(A, E)
    assert GM.equals(A, GM.parse_wkt("POLYGON((2 0, 2 2, 0 2, 0 0))"))
    line = GM.parse_wkt("LINESTRING(-1 1, 3 1)")
    assert GM.crosses(line, A) and GM.crosses(A, line)
    assert not GM.crosses(A, B)


def test_make_valid_orientation():
    g = GM.parse_wkt("POLYGON((0 0, 0 2, 2 2, 2 0), (0.5 0.5, 1 0.5, 1 1, 0.5 1))")
    v = GM.make_valid(g)
    ext = v.parts[0][0]
    hole = v.parts[0][1]
    assert GM.signed_area(*ext) > 0      # exterior CCW
    assert GM.signed_area(*hole) < 0     # hole CW
    assert v.area() == pytest.approx(4 - 0.25)


def test_column_api(spark):
    from gdal_spark.functions import geometry as SG

    pdf = pd.DataFrame(
        {
            "wkt": [L_SHAPE, SQUARE, DONUT],
            "other": [SQUARE, SQUARE, SQUARE],
        }
    )
    df = spark.createDataFrame(pdf)
    got = (
        df.select(
            SG.st_area("wkt").alias("a"),
            SG.st_intersection_area("wkt", "other").alias("ia"),
            SG.st_contains("other", "wkt").alias("c"),
            SG.st_aswkb("wkt").alias("wkb"),
        )
        .toPandas()
    )
    assert got["a"].tolist() == pytest.approx([6.0, 4.0, 12.0])
    assert got["ia"].tolist() == pytest.approx([3.0, 4.0, 3.0])
    assert got["c"].tolist() == [False, True, False]
    # WKB column feeds back through the same functions
    df2 = spark.createDataFrame(got[["wkb"]])
    a2 = df2.select(SG.st_area("wkb").alias("a")).toPandas()["a"].tolist()
    assert a2 == pytest.approx([6.0, 4.0, 12.0])


def test_line_inside_polygon_intersects():
    # ADVICE r2: a LINESTRING strictly inside a polygon never touches
    # the boundary; intersects must still be True (GEOS semantics).
    line = GM.geom_of("LINESTRING (2 2, 5 5)")
    poly = GM.geom_of("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    assert GM.intersects(line, poly)
    assert GM.intersects(poly, line)
    assert not GM.disjoint(line, poly)
    out = GM.geom_of("LINESTRING (20 20, 25 25)")
    assert not GM.intersects(out, poly)


def test_is_valid_shape():
    assert GM.is_valid_shape(GM.geom_of(SQUARE))
    assert GM.is_valid_shape(GM.geom_of(DONUT))
    assert GM.is_valid_shape(GM.geom_of("POINT (1 2)"))
    # bowtie: non-adjacent edges properly cross
    bow = GM.geom_of("POLYGON ((0 0, 2 2, 2 0, 0 2, 0 0))")
    assert not GM.is_valid_shape(bow)
    # degenerate ring: collapses to < 3 distinct vertices
    deg = GM.geom_of("POLYGON ((0 0, 1 1, 1 1, 0 0, 0 0))")
    assert not GM.is_valid_shape(deg)


def test_union_cascaded_and_normalize():
    mp = GM.parse_wkt(
        "MULTIPOLYGON(((0 0, 6 0, 6 6, 0 6, 0 0)),"
        " ((4 4, 10 4, 10 10, 4 10, 4 4)))"
    )
    u = GM.union_cascaded(mp)
    assert u.kind == "polygon"
    assert u.area() == pytest.approx(68.0)
    # normalize: CW rotated ring -> canonical CCW starting at lexic min
    g = GM.parse_wkt("POLYGON((5 0, 5 5, 0 5, 0 0, 5 0))")
    assert GM.to_wkt(GM.normalize(g), 0) == "POLYGON((0 0, 5 0, 5 5, 0 5, 0 0))"


def test_force_conversions():
    p = GM.parse_wkt(SQUARE)
    mp = GM.force_multipolygon(p)
    assert mp.kind == "multipolygon" and len(mp.parts) == 1
    assert GM.force_polygon(mp).kind == "polygon"
    assert GM.force_polygon(p).kind == "polygon"  # no-op


def test_simplify_preserve_topology_never_collapses():
    s = GM.parse_wkt("POLYGON((0 0, 4 0.01, 8 0, 8 8, 0 8, 0 0))")
    sp = GM.simplify_preserve_topology(s, 1e6)
    assert all(len(r[0]) >= 3 for r in sp.parts[0])
    assert GM.is_valid_shape(sp)


def test_segmentize_and_explode():
    from gdal_spark.geometry import (
        explode_parts, parse_wkt, segmentize, to_wkt,
    )

    g = segmentize(parse_wkt("LINESTRING (0 0, 3 4)"), 1.0)
    xs, ys = g.parts[0]
    assert len(xs) == 6  # ceil(5/1)=5 segments
    assert np.allclose(np.hypot(np.diff(xs), np.diff(ys)), 1.0)
    # polygon ring densified, stays closed-ring form
    p = segmentize(parse_wkt("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"), 1.0)
    assert abs(p.area() - 4.0) < 1e-12
    m = parse_wkt(
        "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)),"
        " ((2 0, 4 0, 4 2, 2 2, 2 0)))"
    )
    parts = explode_parts(m)
    assert [round(p.area(), 6) for p in parts] == [1.0, 4.0]
    assert all(p.kind == "polygon" for p in parts)


def test_wrapdateline():
    from gdal_spark.geometry import parse_wkt, wrapdateline_parts

    # dateline hop in wrapped coordinates
    parts = wrapdateline_parts(parse_wkt("LINESTRING (170 0, -170 10)"))
    assert len(parts) == 2
    (x0, y0), (x1, y1) = parts[0].parts[0], parts[1].parts[0]
    assert x0[-1] == 180.0 and x1[0] == -180.0
    assert abs(y0[-1] - 5.0) < 1e-12  # cut midpoint
    # unwrapped polygon crossing
    parts = wrapdateline_parts(
        parse_wkt("POLYGON ((175 0, 185 0, 185 10, 175 10, 175 0))")
    )
    assert sorted(round(p.area(), 6) for p in parts) == [50.0, 50.0]
    for p in parts:
        xs = np.concatenate([r[0] if isinstance(r, tuple) else r[:, 0]
                             for r in p.parts[0]])
        assert xs.min() >= -180.0 and xs.max() <= 180.0
    # no-op on a line away from the dateline
    parts = wrapdateline_parts(parse_wkt("LINESTRING (10 0, 20 5)"))
    assert len(parts) == 1
