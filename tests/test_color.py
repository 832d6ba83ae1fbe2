"""Median-cut + dither golden tests: a 4-color image recovers its 4
colors exactly; dithering a flat region of a palette color maps every
pixel to that palette index with zero error."""

import numpy as np
from pyspark.sql import Row
from pyspark.sql import functions as F

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


def _grey_tiles(spark, grey: np.ndarray, tile: int, nodata: float = -1.0):
    H, W = grey.shape
    rows = []
    for ty in range(H // tile):
        for tx in range(W // tile):
            sub = grey[ty * tile:(ty + 1) * tile, tx * tile:(tx + 1) * tile]
            rows.append(
                Row(
                    raster_id="grey", band=1, zoom=0, tile_x=tx, tile_y=ty,
                    width=tile, height=tile, dtype="uint8", nodata=nodata,
                    crs="", geotransform=[0.0, 1.0, 0.0, 0.0, 0.0, -1.0],
                    data=bytearray(sub.astype(np.uint8).tobytes()),
                )
            )
    return spark.createDataFrame(rows, schema=TILE_SCHEMA)


def _merged_planes(out_rows, tile, H, W):
    planes = {b: np.zeros((H, W), dtype=np.uint8) for b in (1, 2, 3, 4)}
    seen = set()
    for r in out_rows:
        arr = np.frombuffer(bytes(r["data"]), dtype=np.uint8).reshape(tile, tile)
        planes[r["band"]][r["tile_y"] * tile:(r["tile_y"] + 1) * tile,
                          r["tile_x"] * tile:(r["tile_x"] + 1) * tile] = arr
        seen.add(r["band"])
    return planes, seen


def test_hsv_merge_matches_localref(spark):
    """Distributed hsv_merge == the sequential reference mirror on a
    noise image (hsv_merge.py:48-110 formula parity, incl. grey
    pixels where s=0 and channel ties)."""
    import localref
    from gdal_spark.color import hsv_merge

    rng = np.random.RandomState(3)
    rgb = rng.randint(0, 256, size=(32, 32, 3), dtype=np.uint8)
    rgb[:4, :4] = 77  # grey pixels: s == 0 path
    rgb[4:8, :4, 0] = rgb[4:8, :4, 1]  # r==g tie
    grey = rng.randint(0, 256, size=(32, 32), dtype=np.uint8)
    out = hsv_merge(_rgb_tiles(spark, rgb, 16), _grey_tiles(spark, grey, 16))
    planes, seen = _merged_planes(out.collect(), 16, 32, 32)
    assert seen == {1, 2, 3}
    exp = localref.hsv_merge_np(
        [rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]], grey)
    for b in (1, 2, 3):
        assert np.array_equal(planes[b], exp[b - 1])


def test_hsv_merge_nodata_keeps_color_v(spark):
    """Grey nodata pixels keep the color raster's own V
    (hsv_merge.py:210-214)."""
    import localref
    from gdal_spark.color import hsv_merge

    rng = np.random.RandomState(4)
    rgb = rng.randint(0, 256, size=(16, 16, 3), dtype=np.uint8)
    grey = np.full((16, 16), 99, dtype=np.uint8)
    grey[:8] = 0  # nodata half
    out = hsv_merge(_rgb_tiles(spark, rgb, 16),
                    _grey_tiles(spark, grey, 16, nodata=0.0), nodata=0.0)
    planes, _ = _merged_planes(out.collect(), 16, 16, 16)
    exp = localref.hsv_merge_np(
        [rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]], grey, nodata=0.0)
    for b in (1, 2, 3):
        assert np.array_equal(planes[b], exp[b - 1])
    # nodata rows re-encode the original color exactly when cast back
    v_orig = rgb.max(axis=-1)
    top = np.stack([planes[b][:8] for b in (1, 2, 3)], axis=-1)
    assert np.array_equal(top.max(axis=-1), v_orig[:8])


def test_hsv_merge_alpha_passthrough(spark):
    """A 4th (alpha) color band passes through untouched
    (hsv_merge.py:228-233)."""
    from gdal_spark.color import hsv_merge

    rng = np.random.RandomState(5)
    rgb = rng.randint(0, 256, size=(16, 16, 3), dtype=np.uint8)
    alpha = rng.randint(0, 256, size=(16, 16), dtype=np.uint8)
    ct = _rgb_tiles(spark, rgb, 16)
    at = _grey_tiles(spark, alpha, 16).withColumn(
        "band", F.lit(4)).withColumn("raster_id", F.lit("rgb"))
    grey = rng.randint(0, 256, size=(16, 16), dtype=np.uint8)
    out = hsv_merge(ct.unionByName(at), _grey_tiles(spark, grey, 16))
    planes, seen = _merged_planes(out.collect(), 16, 16, 16)
    assert seen == {1, 2, 3, 4}
    assert np.array_equal(planes[4], alpha)
