"""Ring tracing goldens: single pixel, L-shape, donut hole, diagonal
pinch — hand-verifiable WKT — plus the distributed e2e invariant
shoelace(polygon with holes) == npix for every region."""

import numpy as np
import pytest

from gdal_spark.polygonize import (boundary_edges_for_mask, polygonize_wkt,
                                   rings_to_wkt, trace_rings)


def _wkt_of_mask(mask):
    return rings_to_wkt(trace_rings(boundary_edges_for_mask(mask)))


def _area_of_wkt(wkt):
    from gdal_spark.geometry import parse_wkt

    return parse_wkt(wkt).area()


def test_single_pixel():
    m = np.zeros((3, 3), dtype=bool)
    m[1, 1] = True
    wkt = _wkt_of_mask(m)
    assert wkt == "POLYGON((1 1, 2 1, 2 2, 1 2, 1 1))"


def test_l_shape():
    m = np.zeros((4, 5), dtype=bool)
    m[0, :4] = True   # bar
    m[1:3, 0] = True  # stem
    wkt = _wkt_of_mask(m)
    assert _area_of_wkt(wkt) == pytest.approx(6.0)
    assert wkt.count("(") == 2  # single ring


def test_donut_hole():
    m = np.ones((5, 5), dtype=bool)
    m[2, 2] = False
    wkt = _wkt_of_mask(m)
    assert wkt.count("(") == 3  # exterior + 1 hole
    assert _area_of_wkt(wkt) == pytest.approx(24.0)


def test_diagonal_pinch():
    # two diagonal pixels of the same region joined elsewhere:
    # X X .
    # X . .
    # X X X   <- connected; plus a separate diagonal touch at (2,1)-(1,2)?
    m = np.array(
        [[1, 1, 0],
         [1, 0, 1],
         [1, 1, 1]], dtype=bool
    )
    # (0..) region is 4-connected and touches itself nowhere; (1,2) pixel
    # connects via (2,2). The vertex at (2,2)/(1,1) corner is a pinch.
    wkt = _wkt_of_mask(m)
    assert _area_of_wkt(wkt) == pytest.approx(7.0)


def test_polygonize_wkt_e2e(spark):
    from gdal_spark import derived as DRV
    from gdal_spark import raster as RST
    from gdal_spark.geometry import parse_wkt
    from gdal_spark.index import zone_index
    from gdal_spark.polygonize import polygonize

    zidx = zone_index(spark, DRV.rect_zone_grid(8))
    burned = RST.rasterize_zones(spark, zidx, 2, 2, tile_px=64)
    rows = polygonize_wkt(burned).collect()
    base = polygonize(burned).collect()
    assert len(rows) == len(base)
    # multiset of (value, npix) matches the region table
    assert sorted((r["value"], r["npix"]) for r in rows) == sorted(
        (r["value"], r["npix"]) for r in base
    )
    for r in rows:
        g = parse_wkt(r["wkt"])
        assert g.area() == pytest.approx(float(r["npix"])), r["wkt"][:80]
