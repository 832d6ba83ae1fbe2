"""GDALTransformGeolocations (alg/gdaltransformgeolocs.cpp)."""

import numpy as np
import pytest

from gdal_spark import geoloc, synth
from gdal_spark.crs import webmerc_forward_np
from gdal_spark.tiling import _decode


def _t(x, y, z):
    gx, gy = webmerc_forward_np(x, y)
    return gx, gy


def test_bands_transformed_in_place(spark):
    src = synth.lonlat_bands_df(spark, 2, 2)
    out = geoloc.transform_geolocations(src, _t)
    got = {(r.band, r.tile_x, r.tile_y):
           _decode(r.data, r.dtype, r.height, r.width)
           for r in out.collect()}
    lon, lat = synth.lonlat_bands_np(2, 2)
    gx, gy = webmerc_forward_np(lon, lat)
    for (b, tx, ty), arr in got.items():
        exp = (gx if b == 1 else gy)[ty * 256:(ty + 1) * 256,
                                     tx * 256:(tx + 1) * 256]
        assert np.array_equal(arr, exp)


def test_z_passthrough_and_extra_band(spark):
    from pyspark.sql import functions as F

    # a third, non-location band must pass through untouched
    src = synth.lonlat_bands_df(spark, 1, 1, tile_px=32)
    extra = src.filter("band = 1").withColumn("band", F.lit(3).cast("int"))
    out = geoloc.transform_geolocations(src.unionByName(extra), _t)
    rows = {r.band: _decode(r.data, r.dtype, r.height, r.width)
            for r in out.collect()}
    lon, lat = synth.lonlat_bands_np(1, 1, tile_px=32)
    gx, _ = webmerc_forward_np(lon, lat)
    assert np.array_equal(rows[1], gx)
    assert np.array_equal(rows[3], lon)  # untouched


def test_missing_location_band_raises(spark):
    src = synth.lonlat_bands_df(spark, 1, 1, tile_px=16).filter("band = 1")
    with pytest.raises(Exception, match="missing X/Y location bands"):
        geoloc.transform_geolocations(src, _t).collect()
