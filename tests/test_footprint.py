"""gdal_footprint unit tests (apps/gdal_footprint.cpp semantics):
multi-band combine union/intersection, min_ring_area filtering, and
the georef vertex transform — on hand-built tile tables."""

import numpy as np
import pandas as pd

from gdal_spark import synth
from gdal_spark.footprint import _transform_wkt, footprint, valid_mask


def _tiles(spark, arrs_by_band, nodata=0.0, tile_px=8):
    rows = []
    for band, arr in arrs_by_band.items():
        rows.append({
            "raster_id": "t", "band": band, "zoom": 0,
            "tile_x": 0, "tile_y": 0, "width": tile_px, "height": tile_px,
            "dtype": "uint8", "nodata": nodata, "crs": "EPSG:3857",
            "geotransform": [0.0, 1.0, 0.0, 0.0, 0.0, -1.0],
            "data": arr.astype(np.uint8).tobytes(),
        })
    return spark.createDataFrame(pd.DataFrame(rows), schema=synth.TILE_SCHEMA)


def test_combine_union_vs_intersection(spark):
    a = np.zeros((8, 8), np.uint8)
    b = np.zeros((8, 8), np.uint8)
    a[0:4, :] = 7   # band 1 valid in the top half
    b[2:6, :] = 7   # band 2 valid in the middle band
    t = _tiles(spark, {1: a, 2: b})
    uni = valid_mask(t, combine="union").collect()[0]
    ins = valid_mask(t, combine="intersection").collect()[0]
    mu = np.frombuffer(uni["data"], np.uint8).reshape(8, 8)
    mi = np.frombuffer(ins["data"], np.uint8).reshape(8, 8)
    assert (mu[0:6] == 255).all() and (mu[6:] == 0).all()
    assert (mi[2:4] == 255).all() and (mi[0:2] == 0).all() and (mi[4:] == 0).all()


def test_min_ring_area_drops_hole_then_polygon(spark):
    arr = np.full((8, 8), 9, np.uint8)
    arr[3, 3] = 0              # 1-px hole
    arr[0, 7] = 9              # stays: part of the big region
    t = _tiles(spark, {1: arr})
    # no filter: one polygon with one hole
    r = footprint(t).collect()
    assert len(r) == 1 and r[0]["wkt"].count("(") == 3  # outer + hole + wrap
    # hole (area 1) dropped at threshold 2
    r = footprint(t, min_ring_area=2.0).collect()
    assert len(r) == 1 and r[0]["wkt"].count("(") == 2
    # whole polygon (area 63) dropped at threshold 100
    assert footprint(t, min_ring_area=100.0).count() == 0


def test_georef_transform_and_pixel_default(spark):
    arr = np.zeros((8, 8), np.uint8)
    arr[2:4, 2:5] = 1
    t = _tiles(spark, {1: arr})
    pix = footprint(t).collect()[0]["wkt"]
    assert "POLYGON" in pix and "2 2" in pix
    geo = footprint(t, gt=(100.0, 0.5, 0.0, 50.0, 0.0, -0.5)).collect()[0]["wkt"]
    assert "101 49" in geo  # (2,2) -> (100+1, 50-1)


def test_transform_wkt_multipolygon_roundtrip():
    m = "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 6 5, 6 6, 5 6, 5 5)))"
    out = _transform_wkt(m, (0, 1, 0, 0, 0, 1), 0.0, 7)
    assert out == ("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), "
                   "((5 5, 6 5, 6 6, 5 6, 5 5)))")
