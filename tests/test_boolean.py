"""Geometry-valued boolean ops (boolean.py) — verified against the
triangle-kernel areas (an independent computation) and by point
membership sampling, plus topology goldens for shared-edge / pinch /
hole cases."""

import numpy as np
import pytest

from gdal_spark import geometry as GM
from gdal_spark.boolean import boolean_wkt, canonical_wkt, polygon_boolean

L = "POLYGON((0 0, 10 0, 10 5, 5 5, 5 10, 0 10, 0 0))"
SQ = "POLYGON((3 3, 8 3, 8 8, 3 8, 3 3))"
STAR = "POLYGON((0 5, 2 2, 5 0, 2 -2, 0 -5, -2 -2, -5 0, -2 2, 0 5))"
BOX = "POLYGON((-3 -3, 3 -3, 3 3, -3 3, -3 -3))"
DONUT = "POLYGON((0 0, 12 0, 12 12, 0 12, 0 0),(4 4, 8 4, 8 8, 4 8, 4 4))"
PLATE = "POLYGON((2 2, 10 2, 10 10, 2 10, 2 2))"
MP = ("MULTIPOLYGON(((0 0, 4 0, 4 4, 0 4, 0 0)),"
      " ((6 0, 10 0, 10 4, 6 4, 6 0)))")
BAND = "POLYGON((2 1, 8 1, 8 3, 2 3, 2 1))"


def _area(polys):
    t = 0.0
    for rings in polys:
        for i, r in enumerate(rings):
            a = abs(GM.signed_area(r[:, 0], r[:, 1]))
            t += a if i == 0 else -a
    return t


@pytest.mark.parametrize("wa,wb", [
    (L, SQ), (STAR, BOX), (DONUT, PLATE), (MP, BAND),
])
def test_boolean_areas_match_triangle_kernel(wa, wb):
    a, b = GM.parse_wkt(wa), GM.parse_wkt(wb)
    ia = GM.intersection_area(a, b)
    expect = {
        "intersection": ia,
        "union": a.area() + b.area() - ia,
        "difference": a.area() - ia,
        "symdifference": a.area() + b.area() - 2 * ia,
    }
    for op, e in expect.items():
        got = _area(polygon_boolean(a, b, op))
        assert got == pytest.approx(e, abs=1e-8), op


@pytest.mark.parametrize("wa,wb", [(L, SQ), (STAR, BOX), (DONUT, PLATE)])
def test_boolean_membership_sampling(wa, wb):
    a, b = GM.parse_wkt(wa), GM.parse_wkt(wb)
    rng = np.random.RandomState(7)
    pts = rng.uniform(-6, 13, size=(300, 2))
    results = {
        op: GM.parse_wkt(boolean_wkt(a, b, op))
        for op in ("intersection", "union", "difference")
        if boolean_wkt(a, b, op) != "POLYGON EMPTY"
    }
    for x, y in pts:
        # skip points within eps of any input boundary (open/closed
        # boundary membership is not part of the contract)
        near = False
        for g in (a, b):
            x0, y0, x1, y1 = g.boundary_segments()
            dx, dy = x1 - x0, y1 - y0
            L2 = dx * dx + dy * dy
            t = np.clip(((x - x0) * dx + (y - y0) * dy) / np.maximum(L2, 1e-300), 0, 1)
            d2 = (x0 + t * dx - x) ** 2 + (y0 + t * dy - y) ** 2
            if d2.min() < 1e-6:
                near = True
        if near:
            continue
        ia = GM._point_in(a, x, y)
        ib = GM._point_in(b, x, y)
        want = {"intersection": ia and ib, "union": ia or ib,
                "difference": ia and not ib}
        for op, w in want.items():
            got = op in results and GM._point_in(results[op], x, y)
            assert got == w, (op, x, y)


def test_shared_edge_and_pinch_topology():
    a = GM.parse_wkt("POLYGON((0 0, 10 0, 10 10, 0 10, 0 0))")
    adj = GM.parse_wkt("POLYGON((10 0, 20 0, 20 10, 10 10, 10 0))")
    assert boolean_wkt(a, adj, "intersection") == "POLYGON EMPTY"
    assert boolean_wkt(a, adj, "union") == \
        "POLYGON((0 0, 20 0, 20 10, 0 10, 0 0))"
    corner = GM.parse_wkt("POLYGON((10 10, 20 10, 20 20, 10 20, 10 10))")
    u = boolean_wkt(a, corner, "union")
    assert u.startswith("MULTIPOLYGON")  # pinch splits, like GEOS


def test_hole_topologies():
    donut = GM.parse_wkt(DONUT)
    plate = GM.parse_wkt(PLATE)
    inter = boolean_wkt(donut, plate, "intersection")
    # plate covers the hole: result keeps it as an interior ring
    assert inter == ("POLYGON((2 2, 10 2, 10 10, 2 10, 2 2), "
                     "(4 4, 4 8, 8 8, 8 4, 4 4))")
    plug = GM.parse_wkt("POLYGON((5 5, 7 5, 7 7, 5 7, 5 5))")
    assert boolean_wkt(donut, plug, "intersection") == "POLYGON EMPTY"
    u = boolean_wkt(donut, plug, "union")
    assert u.startswith("MULTIPOLYGON")  # island inside the hole
    # subtracting an inner square creates a hole
    a = GM.parse_wkt("POLYGON((0 0, 10 0, 10 10, 0 10, 0 0))")
    inner = GM.parse_wkt("POLYGON((2 2, 4 2, 4 4, 2 4, 2 2))")
    d = boolean_wkt(a, inner, "difference")
    assert d == ("POLYGON((0 0, 10 0, 10 10, 0 10, 0 0), "
                 "(2 2, 2 4, 4 4, 4 2, 2 2))")


def test_identical_and_disjoint():
    a = GM.parse_wkt(SQ)
    assert boolean_wkt(a, a, "difference") == "POLYGON EMPTY"
    assert boolean_wkt(a, a, "intersection") == canonical_wkt(
        polygon_boolean(a, a, "union"))
    far = GM.parse_wkt("POLYGON((100 100, 101 100, 101 101, 100 101, 100 100))")
    assert boolean_wkt(a, far, "intersection") == "POLYGON EMPTY"
    assert boolean_wkt(a, far, "union").startswith("MULTIPOLYGON")


def test_column_api_boolean(spark):
    import pandas as pd

    from gdal_spark.functions import geometry as SG

    pdf = pd.DataFrame({"wa": [L, STAR], "wb": [SQ, BOX]})
    df = spark.createDataFrame(pdf)
    got = df.select(
        SG.st_intersection("wa", "wb").alias("i"),
        SG.st_union_geom("wa", "wb").alias("u"),
        SG.st_difference("wa", "wb").alias("d"),
        SG.st_symdifference("wa", "wb").alias("s"),
    ).toPandas()
    for k, (wa, wb) in enumerate([(L, SQ), (STAR, BOX)]):
        a, b = GM.parse_wkt(wa), GM.parse_wkt(wb)
        assert got["i"][k] == boolean_wkt(a, b, "intersection")
        assert got["u"][k] == boolean_wkt(a, b, "union")
        assert got["d"][k] == boolean_wkt(a, b, "difference")
        assert got["s"][k] == boolean_wkt(a, b, "symdifference")


def test_overlay_pieces_wkb_input(spark):
    """SURVEY §1.1 declares WKB canonical: the general overlay path
    must accept a BINARY geometry column end-to-end."""
    import pandas as pd

    from gdal_spark import overlay as OV

    docs = spark.createDataFrame(
        pd.DataFrame({
            "doc_id": [1, 2],
            "geom_wkt": [GM.to_wkb(GM.parse_wkt(L)),
                         GM.to_wkb(GM.parse_wkt(PLATE))],
        })
    )
    zones = pd.DataFrame({"zone_id": [7], "geom_wkt": [SQ]})
    out = OV.intersection_pieces(docs, zones).toPandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert out["zone_id"].tolist() == [7, 7]
    a, b = GM.parse_wkt(L), GM.parse_wkt(SQ)
    assert out["piece_wkt"][0] == boolean_wkt(a, b, "intersection")
    assert out["piece_area"][0] == pytest.approx(GM.intersection_area(a, b))
