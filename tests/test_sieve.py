"""Sieve filter golden tests: small regions merge into their largest
neighbour, progressively, including regions crossing tile borders."""

import numpy as np
from pyspark.sql import Row

from gdal_spark.polygonize import sieve
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


def _assemble(rows, tile):
    n = int(max(r["tile_x"] for r in rows)) + 1
    m = int(max(r["tile_y"] for r in rows)) + 1
    out = np.zeros((m * tile, n * tile))
    for r in rows:
        arr = np.frombuffer(r["data"], dtype=np.float64).reshape(tile, tile)
        out[r["tile_y"] * tile : (r["tile_y"] + 1) * tile,
            r["tile_x"] * tile : (r["tile_x"] + 1) * tile] = arr
    return out


def test_sieve_removes_small_regions(spark):
    m = np.zeros((32, 32), dtype=np.int64)
    m[2:4, 2:4] = 5              # 4 px — below threshold, inside bg
    m[10:20, 10:20] = 7          # 100 px — stays
    m[14:16, 14:16] = 9          # 4 px inside the 7-region
    out = sieve(_tiles_df(spark, m, 16), threshold=10).collect()
    got = _assemble(out, 16)
    assert (got[2:4, 2:4] == 0).all()      # merged into background
    assert (got[14:16, 14:16] == 7).all()  # merged into surrounding 7
    assert (got[10:14, 10:20] == 7).all()
    assert got.sum() == 7.0 * 100


def test_sieve_cross_tile_region_survives(spark):
    m = np.zeros((32, 32), dtype=np.int64)
    m[14:18, 12:20] = 3  # 32 px crossing both tile borders
    out = sieve(_tiles_df(spark, m, 16), threshold=20).collect()
    got = _assemble(out, 16)
    assert (got[14:18, 12:20] == 3).all()  # 32 px >= 20: kept


def test_sieve_chain_merge(spark):
    # a small region whose only neighbour is another small region:
    # after the first merges, the combined one exceeds the threshold
    m = np.zeros((16, 16), dtype=np.int64)
    m[0:2, 0:3] = 4   # 6 px
    m[2:4, 0:3] = 4   # same value, connected -> actually one region of 12
    out = sieve(_tiles_df(spark, m, 16), threshold=10).collect()
    got = _assemble(out, 16)
    assert (got[0:4, 0:3] == 4).all()  # 12 px >= 10: kept
