"""Proximity golden test: distributed sparse-target halo version vs
single-node brute force over the assembled mosaic."""

import numpy as np
from pyspark.sql import Row

from gdal_spark import raster as R
from gdal_spark.synth import TILE_SCHEMA


def _tiles_df(spark, mosaic, tile):
    H, W = mosaic.shape
    rows = []
    for ty in range(H // tile):
        for tx in range(W // tile):
            sub = mosaic[ty * tile : (ty + 1) * tile, tx * tile : (tx + 1) * tile]
            rows.append(
                Row(
                    raster_id="r", band=1, zoom=0, tile_x=tx, tile_y=ty,
                    width=tile, height=tile, dtype="int32", nodata=-1.0,
                    crs="", geotransform=[0.0, 1.0, 0.0, 0.0, 0.0, -1.0],
                    data=bytearray(sub.astype(np.int32).tobytes()),
                )
            )
    return spark.createDataFrame(rows, schema=TILE_SCHEMA)


def test_proximity_matches_bruteforce(spark):
    rng = np.random.RandomState(7)
    m = np.zeros((64, 64), dtype=np.int64)
    ys, xs = rng.randint(0, 64, 12), rng.randint(0, 64, 12)
    m[ys, xs] = 9  # sparse targets
    maxdist = 20.0
    out = R.proximity(_tiles_df(spark, m, 32), [9], maxdist).collect()
    got = np.zeros((64, 64))
    for r in out:
        arr = np.frombuffer(r["data"], dtype=np.float64).reshape(32, 32)
        got[r["tile_y"] * 32 : (r["tile_y"] + 1) * 32,
            r["tile_x"] * 32 : (r["tile_x"] + 1) * 32] = arr
    # brute force
    py, px = np.mgrid[0:64, 0:64]
    d2 = np.full((64, 64), np.inf)
    for y, x in zip(ys, xs):
        d2 = np.minimum(d2, (px - x) ** 2 + (py - y) ** 2)
    exp = np.where(d2 <= maxdist**2, np.sqrt(d2), -1.0)
    assert np.allclose(got, exp)


def test_proximity_no_targets(spark):
    m = np.zeros((32, 32), dtype=np.int64)
    out = R.proximity(_tiles_df(spark, m, 32), [9], 10.0).collect()
    arr = np.frombuffer(out[0]["data"], dtype=np.float64)
    assert (arr == -1.0).all()
