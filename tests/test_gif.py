"""GIF driver (gdal_spark/gif.py; reference gdal/frmts/gif/
gifdataset.cpp + the GIF89a spec): LZW codec closure, frame-parallel
scan, interlace undo, palette expand, multi-frame subdataset naming,
world-file georeferencing."""

import struct

import numpy as np
import pytest

from gdal_spark import gif as GIF
from gdal_spark import synth


def test_lzw_codec_closure():
    rng = np.random.default_rng(2)
    for mcs, n in ((2, 50), (8, 5000), (8, 70000)):
        idx = rng.integers(0, 1 << mcs, size=n).astype(np.uint8)
        enc = GIF._lzw_encode_gif(idx, mcs)
        dec = GIF._lzw_decode_gif(enc, mcs, n)
        np.testing.assert_array_equal(dec, idx)


def test_lzw_low_entropy_forces_width_growth():
    # long runs grow the table deep into 10-12 bit codes
    idx = np.repeat(np.arange(16, dtype=np.uint8), 6000)
    enc = GIF._lzw_encode_gif(idx, 8)
    dec = GIF._lzw_decode_gif(enc, 8, idx.size)
    np.testing.assert_array_equal(dec, idx)
    assert len(enc) < idx.size // 4      # actually compresses


def test_write_read_roundtrip(spark, tmp_path):
    src = synth.tiles_src_df(spark, 2, 2)
    path = str(tmp_path / "rt.gif")
    info = GIF.write_gif(src, path)
    assert (info["width"], info["height"]) == (512, 512)
    back = GIF.read_gif(spark, path, raster_id="byte_like")
    rows = back.collect()
    assert len(rows) == 1
    got = np.frombuffer(rows[0].data, np.uint8).reshape(512, 512)
    want = np.zeros((512, 512), np.uint8)
    for r in src.collect():
        a = np.frombuffer(r.data, np.uint8).reshape(256, 256)
        want[r.tile_y * 256:(r.tile_y + 1) * 256,
             r.tile_x * 256:(r.tile_x + 1) * 256] = a
    np.testing.assert_array_equal(got, want)
    # world file carried the geotransform
    gt = src.select("geotransform").first()[0]
    np.testing.assert_allclose(rows[0].geotransform, gt)


def _raw_gif(path, frames, *, palette_bits=8, interlace=False):
    """Hand-assembled multi-frame GIF for reader tests."""
    W = max(f.shape[1] for f in frames)
    H = max(f.shape[0] for f in frames)
    with open(path, "wb") as f:
        f.write(b"GIF89a")
        f.write(struct.pack("<HHBBB", W, H,
                            0x80 | ((palette_bits - 1) & 7), 0, 0))
        pal = np.repeat(np.arange(256, dtype=np.uint8), 3)
        f.write(pal.tobytes())
        for img in frames:
            h, w = img.shape
            ifl = 0x40 if interlace else 0
            f.write(b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, ifl))
            rows = img
            if interlace:
                order = np.concatenate(
                    [np.arange(s, h, j)
                     for s, j in GIF._INTERLACE_PASSES])
                rows = img[order]
            f.write(b"\x08")
            enc = GIF._lzw_encode_gif(np.ascontiguousarray(rows), 8)
            for p in range(0, len(enc), 255):
                c = enc[p:p + 255]
                f.write(bytes([len(c)]) + c)
            f.write(b"\x00")
        f.write(b"\x3b")


def test_interlaced_read(spark, tmp_path):
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, size=(23, 17)).astype(np.uint8)
    path = str(tmp_path / "il.gif")
    _raw_gif(path, [img], interlace=True)
    rows = GIF.read_gif(spark, path).collect()
    got = np.frombuffer(rows[0].data, np.uint8).reshape(23, 17)
    np.testing.assert_array_equal(got, img)


def test_multiframe_and_expand(spark, tmp_path):
    rng = np.random.default_rng(4)
    f0 = rng.integers(0, 256, size=(8, 8)).astype(np.uint8)
    f1 = rng.integers(0, 256, size=(8, 8)).astype(np.uint8)
    path = str(tmp_path / "mf.gif")
    _raw_gif(path, [f0, f1])
    rows = GIF.read_gif(spark, path, raster_id="anim").collect()
    ids = sorted(r.raster_id for r in rows)
    assert ids == ["anim", "anim:1"]

    rgb = GIF.read_gif(spark, path, raster_id="anim",
                       expand="rgb").collect()
    assert len(rgb) == 6
    one = [r for r in rgb if r.raster_id == "anim" and r.band == 2][0]
    # identity grayscale palette: every expanded band equals the index
    np.testing.assert_array_equal(
        np.frombuffer(one.data, np.uint8).reshape(8, 8), f0)

    pal = GIF.gif_palette(path)
    assert list(pal.columns) == ["idx", "red", "green", "blue"]
    assert pal["red"].tolist() == list(range(256))
