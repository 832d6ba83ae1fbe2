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


def _bin_mid(c: np.ndarray) -> np.ndarray:
    # a single-bin box's palette entry per gdalmediancut.cpp:578-580
    b = c.astype(np.int64) >> 3
    return ((b + b) * 8) // 2


def test_median_cut_recovers_colors(spark):
    tiles = _rgb_tiles(spark, _quadrant_image(), 16)
    pal = median_cut_palette(tiles, n_colors=4)
    got = {tuple(c) for c in pal.tolist()}
    # the 5-bit histogram quantizes each flat color to its bin midpoint
    assert got == {tuple(_bin_mid(c).tolist()) for c in COLORS}


def test_dither_flat_regions(spark):
    img = _quadrant_image()
    tiles = _rgb_tiles(spark, img, 16)
    pal = median_cut_palette(tiles, n_colors=4)
    out = dither(tiles, pal).collect()
    assert len(out) == 4
    for r in out:
        idx = np.frombuffer(r["data"], dtype=np.uint8).reshape(16, 16)
        rec = pal[idx].astype(np.int64)
        exp = img[r["tile_y"] * 16 : (r["tile_y"] + 1) * 16,
                  r["tile_x"] * 16 : (r["tile_x"] + 1) * 16].astype(np.int64)
        # every flat region maps to its own (bin-quantized) palette
        # entry — residual is the sub-bin error, < 8 per channel
        assert len(np.unique(idx)) == 1
        assert np.abs(rec - exp).max() < 8


def test_dither_c_kernel_matches_python():
    """The compiled hot path and the pure-Python fallback must agree
    bit-for-bit (worst case: random noise, maximal memo misses)."""
    import gdal_spark.color as C

    fn = C._get_dither_c()
    if fn is None:
        import pytest

        pytest.skip("no C compiler available in this environment")
    rng = np.random.RandomState(7)
    rgb = rng.randint(0, 256, size=(64, 64, 3), dtype=np.uint8)
    pal = rng.randint(0, 256, size=(8, 3), dtype=np.uint8)
    out_c = C.dither_tile(rgb, pal)
    saved, saved_t = C._dither_c, C._dither_c_tried
    try:
        C._dither_c, C._dither_c_tried = None, True
        out_py = C.dither_tile(rgb, pal)
    finally:
        C._dither_c, C._dither_c_tried = saved, saved_t
    assert np.array_equal(out_c, out_py)
