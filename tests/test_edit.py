"""gdal_edit / gdalmove metadata edits (osgeo_utils/gdal_edit.py,
gdalmove.py)."""

import math

import pytest
from pyspark.sql import functions as F

from gdal_spark import synth
from gdal_spark.edit import gdal_edit, gdalmove


def _grid(spark, ntx, nty, x0, y0, res):
    tiles = synth.tiles_src_df(spark, ntx, nty)
    px = (F.col("tile_x") * F.col("width")).cast("double")
    py = (F.col("tile_y") * F.col("height")).cast("double")
    return tiles.withColumn(
        "geotransform",
        F.array(F.lit(x0) + px * F.lit(res), F.lit(res), F.lit(0.0),
                F.lit(y0) - py * F.lit(res), F.lit(0.0), F.lit(-res)),
    )


def test_exclusive_options(spark):
    t = _grid(spark, 1, 1, 0.0, 0.0, 1.0)
    with pytest.raises(ValueError):
        gdal_edit(t, 256, 256, a_ullr=(0, 0, 1, 1), tr=(1.0, -1.0))
    with pytest.raises(ValueError):
        gdal_edit(t, 256, 256, nodata=1.0, unset_nodata=True)


def test_a_ullr_and_nodata(spark):
    t = _grid(spark, 2, 2, 0.0, 0.0, 1.0)
    out = gdal_edit(t, 512, 512, a_ullr=(-10.0, 10.0, 10.0, -10.0),
                    nodata=3.0)
    r = {(x.tile_x, x.tile_y): x for x in out.collect()}
    g = r[(1, 1)]["geotransform"]
    assert g[0] == -10.0 + 256 * (20.0 / 512)
    assert g[3] == 10.0 + 256 * (-20.0 / 512)
    assert r[(0, 0)]["nodata"] == 3.0


def test_tr_preserves_origin(spark):
    t = _grid(spark, 2, 1, 100.0, 50.0, 0.25)
    out = gdal_edit(t, 512, 256, tr=(1.0, -1.0))
    r = {(x.tile_x, x.tile_y): x["geotransform"] for x in out.collect()}
    assert r[(0, 0)][0] == 100.0 and r[(0, 0)][1] == 1.0
    assert r[(1, 0)][0] == 100.0 + 256.0  # recomposed with new res


def test_gdalmove_corners_exact(spark):
    from gdal_spark.cells import ORIGIN_SHIFT

    res = 2.0 * ORIGIN_SHIFT / 512.0
    t = _grid(spark, 2, 2, -ORIGIN_SHIFT, ORIGIN_SHIFT, res)
    out = gdalmove(t, 512, 512)
    g = {(x.tile_x, x.tile_y): x["geotransform"] for x in out.collect()}
    g00 = g[(0, 0)]
    # UL corner must be exact at the fit points: lon(-shift) == -180
    assert g00[0] == pytest.approx(-180.0, abs=1e-9)
    assert g00[3] == pytest.approx(
        (2.0 * math.atan(math.exp(math.pi)) - math.pi / 2) * 180.0 / math.pi,
        abs=1e-9,
    )
    # row-skew terms are exactly zero for an axis-aligned source
    assert g00[2] == 0.0 and g00[4] == 0.0
