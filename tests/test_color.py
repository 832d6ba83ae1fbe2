"""Median-cut + dither golden tests: a 4-color image recovers its 4
colors exactly; dithering a flat region of a palette color maps every
pixel to that palette index with zero error."""

import numpy as np
from pyspark.sql import Row

from gdal_spark.color import dither, median_cut_palette
from gdal_spark.synth import TILE_SCHEMA

COLORS = np.array([[250, 10, 10], [10, 250, 10], [10, 10, 250], [200, 200, 0]])


def _rgb_tiles(spark, rgb: np.ndarray, tile: int):
    H, W, _ = rgb.shape
    rows = []
    for ty in range(H // tile):
        for tx in range(W // tile):
            for band in (1, 2, 3):
                sub = rgb[ty * tile : (ty + 1) * tile, tx * tile : (tx + 1) * tile, band - 1]
                rows.append(
                    Row(
                        raster_id="rgb", band=band, zoom=0, tile_x=tx, tile_y=ty,
                        width=tile, height=tile, dtype="uint8", nodata=-1.0,
                        crs="", geotransform=[0.0, 1.0, 0.0, 0.0, 0.0, -1.0],
                        data=bytearray(sub.astype(np.uint8).tobytes()),
                    )
                )
    return spark.createDataFrame(rows, schema=TILE_SCHEMA)


def _quadrant_image(n=32):
    img = np.zeros((n, n, 3), dtype=np.uint8)
    h = n // 2
    img[:h, :h] = COLORS[0]
    img[:h, h:] = COLORS[1]
    img[h:, :h] = COLORS[2]
    img[h:, h:] = COLORS[3]
    return img


def test_median_cut_recovers_colors(spark):
    tiles = _rgb_tiles(spark, _quadrant_image(), 16)
    pal = median_cut_palette(tiles, n_colors=4, stride=2)
    got = {tuple(c) for c in pal.tolist()}
    assert got == {tuple(c) for c in COLORS.tolist()}


def test_dither_exact_colors(spark):
    img = _quadrant_image()
    tiles = _rgb_tiles(spark, img, 16)
    pal = median_cut_palette(tiles, n_colors=4, stride=2)
    out = dither(tiles, pal).collect()
    assert len(out) == 4
    for r in out:
        idx = np.frombuffer(r["data"], dtype=np.uint8).reshape(16, 16)
        rec = pal[idx]
        exp = img[r["tile_y"] * 16 : (r["tile_y"] + 1) * 16,
                  r["tile_x"] * 16 : (r["tile_x"] + 1) * 16]
        assert np.array_equal(rec, exp)  # zero quantization error
