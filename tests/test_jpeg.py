"""Baseline JPEG codec (jpeg.py, ITU-T T.81 re-implementation of what
gdal/frmts/jpeg/jpgdataset.cpp gets from libjpeg): roundtrip accuracy,
determinism, restart intervals, real-fixture decode, and the
MBTiles/GPKG tile-pyramid integration."""

import os

import numpy as np
import pytest

from gdal_spark.jpeg import decode_image, decode_jpeg, encode_jpeg


def _smooth_rgb(h=64, w=64):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([(xx * 2) % 200, (yy * 3) % 200, (xx + yy) % 200],
                    axis=2).astype(np.uint8)


def test_flat_block_exact():
    img = np.full((16, 24), 130, np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(img, 90)), img)


def test_smooth_rgb_high_quality_tight():
    img = _smooth_rgb()
    out = decode_jpeg(encode_jpeg(img, 95))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


def test_non_multiple_of_8_dims():
    img = (np.add.outer(np.arange(50) * 3, np.arange(70) * 2)
           % 200).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, 95))
    assert out.shape == (50, 70)
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 1.0


def test_deterministic():
    img = _smooth_rgb(40, 56)
    assert encode_jpeg(img, 80) == encode_jpeg(img, 80)


def test_restart_intervals_do_not_change_pixels():
    img = _smooth_rgb(64, 72)
    plain = decode_jpeg(encode_jpeg(img, 90))
    for ri in (1, 3, 8, 100):
        assert np.array_equal(
            plain, decode_jpeg(encode_jpeg(img, 90, restart=ri)))


def test_quality_monotone_size():
    img = _smooth_rgb()
    sizes = [len(encode_jpeg(img, q)) for q in (10, 50, 90)]
    assert sizes[0] < sizes[1] < sizes[2]


def test_decode_image_sniffs_magic():
    from gdal_spark.png import encode_png

    img = np.full((8, 8), 42, np.uint8)
    assert np.array_equal(decode_image(encode_png(img)), img)
    assert decode_image(encode_jpeg(img, 95)).shape == (8, 8)
    with pytest.raises(NotImplementedError):
        decode_image(b"RIFFxxxxWEBP")


def test_progressive_rejected():
    img = np.zeros((8, 8), np.uint8)
    b = bytearray(encode_jpeg(img))
    i = b.find(b"\xff\xc0")
    b[i + 1] = 0xC2  # flip SOF0 -> SOF2
    with pytest.raises(NotImplementedError, match="SOF2"):
        decode_jpeg(bytes(b))


REF = "/root/reference/autotest/gdrivers/data/jpeg"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference data absent")
def test_decodes_real_libjpeg_files():
    """Files produced by libjpeg (the reference's decoder), incl. a
    4:2:0-subsampled photo — parse + decode must succeed with
    plausible statistics (our IDCT/upsample differ from libjpeg by
    design, so no exact pixel oracle here)."""
    img = decode_jpeg(open(f"{REF}/albania.jpg", "rb").read())
    assert img.shape == (260, 361, 3)
    assert 60 < img.mean() < 120
    assert img.std() > 10
    g = decode_jpeg(open(f"{REF}/byte_with_xmp.jpg", "rb").read())
    assert g.shape == (20, 20)
    rgb = decode_jpeg(open(f"{REF}/rgbsmall_rgb.jpg", "rb").read())
    assert rgb.shape == (50, 50, 3)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference data absent")
def test_corrupt_files_raise():
    for f in ("bogus.jpg", "byte_corrupted.jpg", "byte_corrupted2.jpg"):
        with pytest.raises(Exception):
            decode_jpeg(open(f"{REF}/{f}", "rb").read())


# --------------------------------------------------- Spark integration
def test_mbtiles_jpeg_roundtrip(spark, tmp_path):
    """format=jpg pyramid: distributed encode -> sqlite -> distributed
    decode equals the sequential decode(encode(tile)) oracle."""
    from gdal_spark import mbtiles, synth

    src = synth.tiles_src_df(spark, 2, 2)
    path = str(tmp_path / "rt.mbtiles")
    n = mbtiles.write_mbtiles(src, path, name="jt", tile_format="jpg",
                              quality=85)
    assert n == 4
    back = mbtiles.read_mbtiles(spark, path, raster_id="jt")
    got = {(r.tile_x, r.tile_y): np.frombuffer(r.data, np.uint8)
           .reshape(256, 256) for r in back.collect()}
    assert len(got) == 4
    for tx in range(2):
        for ty in range(2):
            exp = decode_jpeg(
                encode_jpeg(synth.tile_pixels_np(tx, ty), 85))
            assert np.array_equal(got[(tx, ty)], exp)


def test_gpkg_mixed_format_tiles(spark, tmp_path):
    """GPKG pyramid written as JPEG reads back via the per-blob magic
    sniff (gpkg spec allows mixed formats within one table)."""
    from gdal_spark import gpkg, synth

    src = synth.tiles_src_df(spark, 2, 1)
    path = str(tmp_path / "t.gpkg")
    gpkg.write_gpkg_tiles(src, path, table="jt", tile_format="jpg",
                          quality=85)
    back = gpkg.read_gpkg_tiles(spark, path, table="jt")
    got = {(r.tile_x, r.tile_y): np.frombuffer(r.data, np.uint8)
           .reshape(256, 256) for r in back.collect()}
    assert len(got) == 2
    for tx in range(2):
        exp = decode_jpeg(encode_jpeg(synth.tile_pixels_np(tx, 0), 85))
        assert np.array_equal(got[(tx, 0)], exp)
