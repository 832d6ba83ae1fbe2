"""Polygonize golden tests: distributed per-tile CCL + border stitch
must equal single-node CCL over the assembled mosaic (same region
multiset), plus a hand-built case with known regions."""

import numpy as np
import pandas as pd
from pyspark.sql import Row

from gdal_spark.polygonize import polygonize, tile_ccl
from gdal_spark.synth import TILE_SCHEMA


def _tiles_df(spark, mosaic: np.ndarray, tile: int):
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


def _oracle_regions(mosaic: np.ndarray):
    labels = tile_ccl(mosaic.astype(np.float64))
    out = []
    for lab in np.unique(labels):
        m = labels == lab
        ys, xs = np.where(m)
        out.append(
            (float(mosaic[ys[0], xs[0]]), int(m.sum()),
             int(xs.min()), int(ys.min()), int(xs.max()), int(ys.max()))
        )
    return sorted(out)


def test_polygonize_matches_single_node(spark):
    g = np.add.outer(np.arange(64), np.arange(64)) // 16  # diagonal bands
    got = polygonize(_tiles_df(spark, g, 32)).toPandas()
    got_set = sorted(
        (float(r.value), int(r.npix), int(r.xmin), int(r.ymin), int(r.xmax), int(r.ymax))
        for r in got.itertuples(index=False)
    )
    assert got_set == _oracle_regions(g)


def test_polygonize_known_regions(spark):
    m = np.zeros((32, 32), dtype=np.int64)
    m[4:12, 4:28] = 5          # one rectangle crossing the tile border
    m[20:28, 2:6] = 7          # small rect in left tile
    got = polygonize(_tiles_df(spark, m, 16)).toPandas()
    by_val = {float(r.value): r for r in got.itertuples(index=False)}
    assert by_val[5.0].npix == 8 * 24
    assert (by_val[5.0].xmin, by_val[5.0].xmax) == (4, 27)
    assert by_val[7.0].npix == 8 * 4
    # background is 4-connected around the rectangles -> one region
    assert by_val[0.0].npix == 32 * 32 - 8 * 24 - 8 * 4
    assert len(got) == 3


def test_polygonize_checkerboard_no_merge(spark):
    m = (np.add.outer(np.arange(8), np.arange(8)) % 2).astype(np.int64)
    got = polygonize(_tiles_df(spark, m, 4)).toPandas()
    # 4-connectivity: every pixel its own region
    assert len(got) == 64
    assert (got["npix"] == 1).all()


def test_polygonize_8conn_checkerboard(spark):
    from gdal_spark.polygonize import polygonize
    from gdal_spark.synth import checker_tiles_df

    tiles = checker_tiles_df(spark, 2, 2, tile_px=64, cell=16)
    four = polygonize(tiles, connect=4).toPandas()
    eight = polygonize(tiles, connect=8).toPandas()
    # 8x8 board: 64 squares under 4-conn, 2 colors under 8-conn
    assert len(four) == 64
    assert len(eight) == 2
    assert sorted(eight.npix) == [8192, 8192]
    assert set(eight.value) == {0.0, 1.0}


def test_tile_ccl_8conn_diagonal():
    import numpy as np

    from gdal_spark.polygonize import tile_ccl

    arr = np.array([[1, 0], [0, 1]], dtype=np.float64)
    l4 = tile_ccl(arr, connect=4)
    l8 = tile_ccl(arr, connect=8)
    assert l4[0, 0] != l4[1, 1] and l4[0, 1] != l4[1, 0]
    assert l8[0, 0] == l8[1, 1] and l8[0, 1] == l8[1, 0]
