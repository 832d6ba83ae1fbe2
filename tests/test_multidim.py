"""Multidim GetView slicing model (multidim.py)."""

import numpy as np
from pyspark.sql import functions as F

from gdal_spark.multidim import MDArray, mdarray_from_fn


def _np_equiv(shape, fn):
    idx = np.indices(shape)
    return fn(*idx)


def test_get_view_matches_numpy(spark):
    arr = mdarray_from_fn(
        spark, [("i", 6), ("j", 5), ("k", 4)],
        F.col("i") * 100 + F.col("j") * 10 + F.col("k"),
    )
    ref = _np_equiv((6, 5, 4), lambda i, j, k: i * 100 + j * 10 + k)

    v = arr.get_view("[1:5:2, ::2, 3]")
    exp = ref[1:5:2, ::2, 3]
    assert v.shape == exp.shape
    got = v.to_rows().toPandas().sort_values(["i", "j"]).reset_index(drop=True)
    flat = np.full(exp.shape, -1)
    flat[got["i"], got["j"]] = got["value"]
    assert np.array_equal(flat, exp)

    # negative index + chained brackets + transpose
    v2 = arr.get_view("[-2][1:4]").transpose([1, 0])
    exp2 = ref[-2, 1:4].T  # dims now (k=4, j=3)
    assert v2.shape == (4, 3)
    got2 = v2.to_rows().toPandas()
    flat2 = np.full((4, 3), -1)
    flat2[got2["k"], got2["j"]] = got2["value"]
    assert np.array_equal(flat2, exp2)


def test_view_prunes_scan(spark):
    arr = mdarray_from_fn(
        spark, [("i", 100), ("j", 100)], F.col("i") + F.col("j")
    )
    v = arr.get_view("[5:6, 7:8]")
    rows = v.to_rows().collect()
    assert len(rows) == 1 and rows[0]["value"] == 12
    plan = v.to_rows()._jdf.queryExecution().executedPlan().toString()
    assert "Filter" in plan  # the slice reaches the plan as a filter


def test_mask_and_statistics(spark):
    import numpy as np
    from pyspark.sql import functions as F
    from gdal_spark.multidim import mdarray_from_fn

    arr = mdarray_from_fn(
        spark, [("i", 6), ("j", 5)],
        ((F.col("i") * 7 + F.col("j")) % 11).cast("double"))
    a = (np.arange(6)[:, None] * 7 + np.arange(5)[None, :]) % 11
    # mask: 0 at the nodata sentinel
    m = {(r["i"], r["j"]): r["value"]
         for r in arr.mask(0.0).to_rows().collect()}
    for i in range(6):
        for j in range(5):
            assert m[(i, j)] == (0 if a[i, j] == 0 else 1)
    # statistics: population stddev over non-nodata values
    row = arr.statistics(nodata=0.0).collect()[0]
    v = a[a != 0].astype(float)
    assert row["vmin"] == v.min() and row["vmax"] == v.max()
    assert abs(row["mean"] - v.mean()) < 1e-12
    assert abs(row["std"] - v.std()) < 1e-12
    assert row["valid_count"] == int((a != 0).sum())


def test_as_classic_dataset_roundtrip(spark):
    import numpy as np
    from pyspark.sql import functions as F
    from gdal_spark import tiling
    from gdal_spark.multidim import mdarray_from_fn

    arr = mdarray_from_fn(
        spark, [("y", 40), ("x", 48)],
        (F.col("y") * 100 + F.col("x")).cast("double"))
    tiles = arr.as_classic_dataset(tile_px=16, nodata=-1.0)
    rows = {(r["tile_y"], r["tile_x"]):
            np.frombuffer(r["data"], dtype=r["dtype"]).reshape(16, 16)
            for r in tiles.collect()}
    assert len(rows) == (40 // 16 + 1) * (48 // 16)
    assert rows[(0, 0)][3, 5] == 305.0
    assert rows[(2, 1)][1, 2] == (32 + 1) * 100 + (16 + 2)
    # edge tile padded with nodata below row 40
    assert rows[(2, 0)][9, 0] == -1.0
