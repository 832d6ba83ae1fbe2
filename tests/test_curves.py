"""Curve geometry types (ogr_core.h:349-398) + MakeValid re-noding:
WKT/WKB parsing of CircularString / CompoundCurve / CurvePolygon /
MultiCurve / MultiSurface / PolyhedralSurface / TIN / Triangle with
Z/M variants, 4-degree linearization (curveToLineString /
OGR_ARC_STEPSIZE), and the even-odd bowtie reassembly
(ogrgeometry.cpp:3695)."""

import math
import struct

import numpy as np

from gdal_spark import geometry as GM


def _length(g):
    xs, ys = g.parts[0]
    return float(np.hypot(np.diff(xs), np.diff(ys)).sum())


def test_circularstring_half_circle():
    g = GM.parse_wkt("CIRCULARSTRING(0 0, 1 1, 2 0)")
    assert g.kind == "linestring"
    xs, ys = g.parts[0]
    # endpoints exact, 4-deg steps over a 180-deg sweep -> 46 points
    assert (xs[0], ys[0], xs[-1], ys[-1]) == (0.0, 0.0, 2.0, 0.0)
    assert len(xs) == 46
    assert abs(_length(g) - math.pi) < 0.01
    # all points on the unit circle around (1, 0)
    np.testing.assert_allclose(np.hypot(xs - 1.0, ys), 1.0, rtol=1e-12)


def test_circularstring_collinear_degrades_to_lines():
    g = GM.parse_wkt("CIRCULARSTRING(0 0, 1 0, 2 0)")
    xs, ys = g.parts[0]
    assert len(xs) == 3 and (ys == 0).all()


def test_compoundcurve_stitches():
    g = GM.parse_wkt("COMPOUNDCURVE(CIRCULARSTRING(0 0, 1 1, 2 0), (2 0, 4 0))")
    xs, ys = g.parts[0]
    assert xs[0] == 0.0 and xs[-1] == 4.0
    # no duplicated junction vertex
    assert ((np.diff(xs) != 0) | (np.diff(ys) != 0)).all()


def test_curvepolygon_full_circle_area():
    g = GM.parse_wkt("CURVEPOLYGON(CIRCULARSTRING(0 0, 2 2, 4 0, 2 -2, 0 0))")
    assert g.kind == "polygon"
    assert abs(g.area() - math.pi * 4) < 0.02  # r=2 disk, 4-deg chords
    assert GM.is_valid_shape(g)


def test_curvepolygon_compound_ring_half_disk():
    g = GM.parse_wkt(
        "CURVEPOLYGON(COMPOUNDCURVE(CIRCULARSTRING(0 0, 1 1, 2 0), (2 0, 0 0)))"
    )
    assert abs(g.area() - math.pi / 2) < 0.01


def test_multicurve_multisurface_tin_triangle():
    mc = GM.parse_wkt("MULTICURVE((0 0, 1 1), CIRCULARSTRING(0 0, 1 1, 2 0))")
    assert mc.kind == "multilinestring" and len(mc.parts) == 2
    ms = GM.parse_wkt(
        "MULTISURFACE(CURVEPOLYGON(CIRCULARSTRING(0 0, 2 2, 4 0, 2 -2, 0 0)),"
        " ((10 10, 11 10, 11 11, 10 11, 10 10)))"
    )
    assert ms.kind == "multipolygon" and len(ms.parts) == 2
    assert abs(ms.area() - (math.pi * 4 + 1.0)) < 0.02
    tri = GM.parse_wkt("TRIANGLE((0 0, 1 0, 0 1, 0 0))")
    assert tri.kind == "polygon" and tri.area() == 0.5
    tin = GM.parse_wkt("TIN(((0 0, 1 0, 0 1, 0 0)), ((1 0, 1 1, 0 1, 1 0)))")
    assert tin.kind == "multipolygon" and abs(tin.area() - 1.0) < 1e-12


def test_wkt_z_m_variants():
    assert list(GM.parse_wkt("POINT Z (1 2 3)").zs) == [3.0]
    assert list(GM.parse_wkt("POINT ZM (1 2 3 4)").zs) == [3.0]
    assert GM.parse_wkt("POINT M (1 2 9)").zs is None  # M is not Z
    assert list(GM.parse_wkt("LINESTRING(0 0 5, 1 1 6)").zs) == [5.0, 6.0]
    assert GM.to_wkt(GM.parse_wkt("POINT Z (1 2 3)"), 1) == "POINT Z (1.0 2.0 3.0)"


def test_wkb_iso_z_and_25d_and_srid():
    # ISO +1000 Z point
    g = GM.parse_wkb(struct.pack("<BI3d", 1, 1001, 1.0, 2.0, 3.0))
    assert g.kind == "point" and list(g.zs) == [3.0]
    # legacy wkb25DBit
    g2 = GM.parse_wkb(struct.pack("<BI3d", 1, 0x80000001, 1.0, 2.0, 3.0))
    assert list(g2.zs) == [3.0]
    # EWKB SRID flag skipped
    g3 = GM.parse_wkb(struct.pack("<BII2d", 1, 0x20000001, 4326, 7.0, 8.0))
    assert g3.parts[0][0][0] == 7.0
    # big-endian ISO ZM linestring
    be = struct.pack(">BII", 0, 3002, 2) + struct.pack(">8d", 0, 0, 5, 9,
                                                       1, 1, 6, 9)
    g4 = GM.parse_wkb(be)
    assert g4.kind == "linestring" and list(g4.zs) == [5.0, 6.0]


def test_wkb_curve_types():
    cs = struct.pack("<BII6d", 1, 8, 3, 0, 0, 1, 1, 2, 0)
    g = GM.parse_wkb(cs)
    assert abs(_length(g) - math.pi) < 0.01
    # curvepolygon with a circularstring ring
    ring = struct.pack("<BII10d", 1, 8, 5, 0, 0, 2, 2, 4, 0, 2, -2, 0, 0)
    gp = GM.parse_wkb(struct.pack("<BII", 1, 10, 1) + ring)
    assert gp.kind == "polygon" and abs(gp.area() - math.pi * 4) < 0.02
    # compoundcurve = circularstring + linestring
    lseg = struct.pack("<BII4d", 1, 2, 2, 2, 0, 4, 0)
    cc = struct.pack("<BII", 1, 9, 2) + cs + lseg
    gc = GM.parse_wkb(cc)
    assert gc.parts[0][0][-1] == 4.0
    # multisurface of two curvepolygons
    ms = struct.pack("<BII", 1, 12, 1) + struct.pack("<BII", 1, 10, 1) + ring
    assert GM.parse_wkb(ms).kind == "multipolygon"


def test_makevalid_bowtie_renodes():
    g = GM.parse_wkt("POLYGON((0 0, 2 2, 2 0, 0 2, 0 0))")
    assert not GM.is_valid_shape(g)
    v = GM.make_valid(g)
    assert v.kind == "multipolygon" and len(v.parts) == 2
    assert abs(v.area() - 2.0) < 1e-9
    assert GM.is_valid_shape(v)


def test_makevalid_valid_input_fast_path():
    g = GM.parse_wkt("POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))")
    v = GM.make_valid(g)
    assert v.kind == "polygon" and v.area() == 16.0


def test_makevalid_self_overlap_even_odd():
    # ring that double-covers the middle square: even-odd removes it
    g = GM.parse_wkt("POLYGON((0 0, 3 0, 3 3, 1 3, 1 1, 2 1, 2 2, 0 2, 0 0))")
    v = GM.make_valid(g)
    assert GM.is_valid_shape(v)
    assert abs(v.area() - 7.0) < 1e-9
