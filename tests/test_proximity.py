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


def _assemble(out, tile, n):
    got = np.zeros((n, n))
    for r in out:
        arr = np.frombuffer(r["data"], dtype=np.float64).reshape(tile, tile)
        got[r["tile_y"] * tile : (r["tile_y"] + 1) * tile,
            r["tile_x"] * tile : (r["tile_x"] + 1) * tile] = arr
    return got


def _brute(m, tval, maxdist):
    H, W = m.shape
    ty_, tx_ = np.nonzero(m == tval)
    yy, xx = np.mgrid[0:H, 0:W]
    best = np.full((H, W), np.inf)
    for i in range(len(tx_)):
        best = np.minimum(
            best, (xx - tx_[i]) ** 2 + (yy - ty_[i]) ** 2
        )
    return np.where(best <= maxdist * maxdist, np.sqrt(best), -1.0)


def test_proximity_full_multi_tile_hops(spark):
    """Targets only in one corner tile of a 4x4 grid: distances cross
    up to 3 tile hops, forcing multiple doubling rounds."""
    m = np.zeros((128, 128), dtype=np.int64)
    m[2, 3] = 9
    m[10, 25] = 9
    out = R.proximity_full(_tiles_df(spark, m, 32), [9], maxdist=300.0).collect()
    got = _assemble(out, 32, 128)
    assert np.allclose(got, _brute(m, 9, 300.0))


def test_proximity_full_unbounded_and_capped(spark):
    rng = np.random.RandomState(3)
    m = np.zeros((128, 128), dtype=np.int64)
    ys, xs = rng.randint(0, 128, 5), rng.randint(0, 128, 5)
    m[ys, xs] = 7
    tiles = _tiles_df(spark, m, 32)
    # unbounded: every pixel reaches some target
    got = _assemble(R.proximity_full(tiles, [7], maxdist=None).collect(), 32, 128)
    exp = _brute(m, 7, 1e9)
    assert np.allclose(got, exp)
    # capped below a tile-crossing distance: nodata beyond
    got2 = _assemble(R.proximity_full(tiles, [7], maxdist=40.0).collect(), 32, 128)
    assert np.allclose(got2, _brute(m, 7, 40.0))
