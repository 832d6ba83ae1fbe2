"""gdalinfo/ogrinfo report tests (apps/gdalinfo_lib.cpp GDALInfo,
apps/ogrinfo.cpp ReportOnLayer)."""

import numpy as np

from gdal_spark import info, synth
from gdal_spark.synth import tile_pixels_np


def test_gdalinfo_shape_and_stats(spark):
    tiles = synth.tiles_src_df(spark, 2, 2)
    [r] = info.gdalinfo(tiles).collect()
    assert (r.size_x, r.size_y) == (512, 512)
    assert r.dtype == "uint8" and r.crs == "EPSG:3857" and r.tiles == 4
    # origin = top-left tile's geotransform origin
    assert abs(r.origin_x - (-20037508.342789244)) < 1e-6
    assert r.pixel_size_y < 0
    full = np.vstack([
        np.hstack([tile_pixels_np(tx, ty) for tx in range(2)])
        for ty in range(2)]).astype(np.float64)
    assert r["count"] == full.size
    assert r["min"] == full.min() and r["max"] == full.max()
    assert abs(r.mean - full.mean()) < 1e-9
    assert abs(r.stddev - full.std()) < 1e-9


def test_gdalinfo_no_stats(spark):
    tiles = synth.tiles_src_df(spark, 1, 1)
    [r] = info.gdalinfo(tiles, stats=False).collect()
    assert (r.size_x, r.size_y) == (256, 256)
    assert "mean" not in r.asDict()


def test_ogrinfo_extent_and_types(spark):
    df = spark.createDataFrame(
        [(1, "POINT (1 2)"), (2, "POINT (-3 10)"),
         (3, "POLYGON ((0 0, 4 0, 4 4, 0 0))")],
        "fid long, geom_wkt string")
    [r] = info.ogrinfo(df).collect()
    assert r.feature_count == 3
    assert (r.xmin, r.ymin, r.xmax, r.ymax) == (-3.0, 0.0, 4.0, 10.0)
    assert r.geometry_type == "POINT,POLYGON"


def test_ogrinfo_no_geometry(spark):
    df = spark.createDataFrame([(1,), (2,)], "v long")

    [r] = info.ogrinfo(df).collect()
    assert r.feature_count == 2 and r.geometry_type == "NONE"


def test_ogrinfo_fields(spark):
    df = spark.createDataFrame(
        [(1, "POINT (0 0)", "x", 2.5, 7)],
        "fid long, geom_wkt string, name string, score double, n int")
    rows = {r.name: r.type for r in info.ogrinfo_fields(df).collect()}
    assert rows == {"name": "String", "score": "Real", "n": "Integer"}


def test_ogrinfo_scientific_notation(spark):
    df = spark.createDataFrame(
        [(1, "POINT (1e2 -2.5e-1)")], "fid long, geom_wkt string")
    [r] = info.ogrinfo(df).collect()
    assert r.xmax == 100.0 and r.ymin == -0.25
