"""gdal_calc textual expressions: ast whitelist + vectorized eval."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark.calc import compile_calc, gdal_calc


def test_compile_and_run():
    run = compile_calc("A*2 + where(B > 1, 10, 0)", ["A", "B"])
    a = np.array([[1.0, 2.0]])
    b = np.array([[0.0, 5.0]])
    assert (run({"A": a, "B": b}) == [[2.0, 14.0]]).all()


def test_scalar_result_broadcasts():
    run = compile_calc("3.5", ["A"])
    out = run({"A": np.zeros((2, 2))})
    assert out.shape == (2, 2) and (out == 3.5).all()


def test_whitelist_rejects():
    with pytest.raises(ValueError):
        compile_calc("__import__('os')", ["A"])
    with pytest.raises(ValueError):
        compile_calc("A.sum()", ["A"])
    with pytest.raises(ValueError):
        compile_calc("open('x')", ["A"])
    with pytest.raises(ValueError):
        compile_calc("C + 1", ["A"])
    with pytest.raises(ValueError):
        compile_calc("where(A, x=1, y=2)", ["A"])


def test_gdal_calc_tiles(spark):
    from gdal_spark import synth
    from gdal_spark.tiling import _decode

    a = synth.tiles_src_df(spark, 2, 2)
    b = synth.dome_tiles_df(spark, 2, 2, 256).withColumn("zoom", F.lit(12))
    out = gdal_calc({"A": a, "B": b}, "A + B*0.0")
    rows = {(r.tile_x, r.tile_y): r for r in out.collect()}
    arr = _decode(rows[(0, 0)].data, rows[(0, 0)].dtype, 256, 256)
    assert np.array_equal(arr, synth.tile_pixels_np(0, 0).astype(np.float64))
