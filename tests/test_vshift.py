"""GDALApplyVerticalShiftGrid semantics (alg/gdalapplyverticalshiftgrid.cpp)."""

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gdal_spark import synth, tiling, vshift
from gdal_spark.tiling import _decode

RES = 2 * math.pi * 6378137 / 256 / (2**12)
X0 = -math.pi * 6378137
YTOP = X0 + 2 * 256 * RES


def _run(spark, **kw):
    tiles = synth.tiles_src_df(spark, 2, 2)
    grid = synth.vshift_grid_df(spark, (X0, YTOP), RES * 2)
    out = vshift.apply_vertical_shift_grid(
        tiles, grid, src_origin=(X0, YTOP), src_res=RES,
        src_tiles_x=2, src_tiles_y=2,
        grid_origin=(X0, YTOP), grid_res=RES * 2, **kw)
    return {(r["tile_x"], r["tile_y"]):
            _decode(r["data"], r["dtype"], r["height"], r["width"])
            for r in out.collect()}


def test_forward_matches_numpy_replay(spark):
    import localref

    got = _run(spark)
    src = localref.global_mosaic(2, 2).astype(np.float64)
    gv = synth.vshift_grid_np().astype(np.float64)
    g = localref._warp_global(gv, X0, YTOP, 2 * RES, X0, YTOP, RES,
                              512, 512, "bilinear")
    g = localref._gdal_cast_local(g, "float32").astype(np.float64)
    want = ((src + g)).astype(np.float32)
    for (tx, ty), arr in got.items():
        np.testing.assert_array_equal(
            arr, want[ty * 256:(ty + 1) * 256, tx * 256:(tx + 1) * 256])


def test_inverse_and_units(spark):
    fwd = _run(spark)
    inv = _run(spark, inverse=True, src_unit_to_meter=2.0,
               dst_unit_to_meter=0.5)
    import localref

    src = localref.global_mosaic(2, 2).astype(np.float64)
    gv = synth.vshift_grid_np().astype(np.float64)
    g = localref._warp_global(gv, X0, YTOP, 2 * RES, X0, YTOP, RES,
                              512, 512, "bilinear")
    g = localref._gdal_cast_local(g, "float32").astype(np.float64)
    want = ((src * 2.0 - g) / 0.5).astype(np.float32)
    arr = inv[(0, 0)]
    np.testing.assert_array_equal(arr, want[:256, :256])
    assert not np.array_equal(fwd[(0, 0)], arr)


def test_missing_grid_under_valid_source_raises(spark):
    # shrink the grid to cover only the top-left source tile: the
    # warp fills the rest with grid nodata, which must hard-fail like
    # the reference's CE_Failure on +Inf (not silently pass nodata)
    tiles = synth.tiles_src_df(spark, 2, 2)
    grid = synth.vshift_grid_df(spark, (X0, YTOP), RES)  # 256px, 1/4 area
    out = vshift.apply_vertical_shift_grid(
        tiles, grid, src_origin=(X0, YTOP), src_res=RES,
        src_tiles_x=2, src_tiles_y=2,
        grid_origin=(X0, YTOP), grid_res=RES)
    with pytest.raises(Exception, match="Missing vertical grid value"):
        out.collect()


def test_nodata_passthrough(spark):
    # hand-build a 1-tile source whose nodata value (7) appears in-band
    px = synth.tile_pixels_np(0, 0)
    base = spark.range(0, 1, 1, 1)

    def gen(batches):
        for pdf in batches:
            if len(pdf):
                yield pd.DataFrame({
                    "raster_id": "nd", "band": np.int32(1),
                    "zoom": np.int32(12),
                    "tile_x": np.int32(0), "tile_y": np.int32(0),
                    "width": np.int32(256), "height": np.int32(256),
                    "dtype": "uint8", "nodata": 7.0, "crs": "EPSG:3857",
                    "geotransform": [[X0, RES, 0.0, YTOP, 0.0, -RES]],
                    "data": [px.tobytes()],
                })

    src = base.mapInPandas(gen, schema=synth.TILE_SCHEMA)
    grid = synth.vshift_grid_df(spark, (X0, YTOP), RES)
    out = vshift.apply_vertical_shift_grid(
        src, grid, src_origin=(X0, YTOP), src_res=RES,
        src_tiles_x=1, src_tiles_y=1,
        grid_origin=(X0, YTOP), grid_res=RES)
    r = out.collect()[0]
    arr = _decode(r["data"], r["dtype"], r["height"], r["width"])
    mask = px == 7
    assert mask.any()
    assert np.all(arr[mask] == 7.0)
    assert not np.any(arr[~mask] == 7.0)
