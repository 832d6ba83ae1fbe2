"""BMP driver tests (frmts/bmp/bmpdataset.cpp,
autotest/gdrivers/bmp.py)."""

import struct

import numpy as np
import pandas as pd
import pytest

from gdal_spark import bmp, synth


def _tiles_from_np(spark, arrs_by_band, gt, tile_px=4, raster_id="bmp"):
    rows = []
    h, w = next(iter(arrs_by_band.values())).shape
    for band, a in arrs_by_band.items():
        for ty in range(0, (h + tile_px - 1) // tile_px):
            for tx in range(0, (w + tile_px - 1) // tile_px):
                sub = a[ty * tile_px:(ty + 1) * tile_px,
                        tx * tile_px:(tx + 1) * tile_px]
                rows.append({
                    "raster_id": raster_id, "band": band, "zoom": 0,
                    "tile_x": tx, "tile_y": ty,
                    "width": sub.shape[1], "height": sub.shape[0],
                    "dtype": "uint8", "nodata": float("nan"), "crs": "",
                    "geotransform": [gt[0] + tx * tile_px * gt[1], gt[1],
                                     0.0, gt[3] + ty * tile_px * gt[5],
                                     0.0, gt[5]],
                    "data": sub.astype(np.uint8).tobytes(),
                })
    return spark.createDataFrame(pd.DataFrame(rows), schema=synth.TILE_SCHEMA)


def _assemble(df, nbands, h, w, tile_px=4):
    out = {b: np.zeros((h, w), dtype=np.uint8)
           for b in range(1, nbands + 1)}
    for r in df.collect():
        a = np.frombuffer(r.data, dtype=np.uint8).reshape(r.height, r.width)
        out[r.band][r.tile_y * tile_px:r.tile_y * tile_px + r.height,
                    r.tile_x * tile_px:r.tile_x * tile_px + r.width] = a
    return out


def _hand_bmp8(w, h, img, pal=None):
    """Bottom-up 8-bit BMP built by hand for reader ground truth."""
    stride = (w + 3) & ~3
    off = 14 + 40 + 256 * 4
    body = bytearray()
    for y in range(h - 1, -1, -1):
        row = img[y].tobytes()
        body += row + b"\0" * (stride - len(row))
    hdr = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    hdr += struct.pack("<IiihhIIiiII", 40, w, h, 1, 8, 0, len(body),
                       2835, 2835, 256, 0)
    quads = bytearray()
    for i in range(256):
        r, g, b = (pal[i] if pal is not None else (i, i, i))
        quads += bytes((b, g, r, 0))
    return bytes(hdr) + bytes(quads) + bytes(body)


def test_reader_hand_built_bottom_up(spark, tmp_path):
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (5, 7)).astype(np.uint8)
    p = str(tmp_path / "hand.bmp")
    open(p, "wb").write(_hand_bmp8(7, 5, img))
    hdr = bmp.parse_bmp(p)
    assert hdr["nrows"] == 5 and hdr["ncols"] == 7
    assert hdr["stride"] == 8 and not hdr["top_down"]
    got = _assemble(bmp.read_bmp(spark, p, tile_px=4), 1, 5, 7)
    np.testing.assert_array_equal(got[1], img)
    pal = bmp.read_bmp_palette(p)
    assert len(pal) == 256 and pal["r"].tolist() == list(range(256))


def test_roundtrip_8bit_edge_tiles(spark, tmp_path):
    rng = np.random.RandomState(11)
    h, w = 6, 10
    img = rng.randint(0, 256, (h, w)).astype(np.uint8)
    gt = [100.0, 2.0, 0.0, 80.0, 0.0, -2.0]
    src = _tiles_from_np(spark, {1: img}, gt)
    p = str(tmp_path / "rt8.bmp")
    bmp.write_bmp(src, p, tile_px=4)
    got = _assemble(bmp.read_bmp(spark, p, tile_px=4), 1, h, w)
    np.testing.assert_array_equal(got[1], img)
    # world file round-trips the geotransform
    back = bmp.read_bmp(spark, p, tile_px=4)
    r00 = [r for r in back.collect()
           if r.tile_x == 0 and r.tile_y == 0][0]
    assert list(r00.geotransform) == gt


def test_roundtrip_24bit_bgr_order(spark, tmp_path):
    rng = np.random.RandomState(5)
    h, w = 6, 9
    bands = {b: rng.randint(0, 256, (h, w)).astype(np.uint8)
             for b in (1, 2, 3)}
    src = _tiles_from_np(spark, bands, [0.0, 1.0, 0.0, 6.0, 0.0, -1.0])
    p = str(tmp_path / "rt24.bmp")
    bmp.write_bmp(src, p, tile_px=4)
    hdr = bmp.parse_bmp(p)
    assert hdr["bits"] == 24 and hdr["nbands"] == 3
    # on-disk pixel 0 of the TOP image row is at the LAST scanline,
    # bytes B,G,R (bmpdataset.cpp :392)
    raw = open(p, "rb").read()
    row0 = raw[hdr["data_offset"] + (h - 1) * hdr["stride"]:]
    assert row0[0] == bands[3][0, 0]  # B
    assert row0[1] == bands[2][0, 0]  # G
    assert row0[2] == bands[1][0, 0]  # R
    got = _assemble(bmp.read_bmp(spark, p, tile_px=4), 3, h, w)
    for b in (1, 2, 3):
        np.testing.assert_array_equal(got[b], bands[b])


def test_sub_byte_unpack_1_and_4bit(spark, tmp_path):
    # 1-bit: 10 px -> 2 bytes/row, high bit first
    rows = np.array([[0b10110010, 0b11000000]], dtype=np.uint8)
    out = bmp._unpack_sub_byte(rows, 1, 10)
    assert out.tolist() == [[1, 0, 1, 1, 0, 0, 1, 0, 1, 1]]
    # 4-bit: high nibble is the left pixel
    rows = np.array([[0xAB, 0xC0]], dtype=np.uint8)
    out = bmp._unpack_sub_byte(rows, 4, 3)
    assert out.tolist() == [[0xA, 0xB, 0xC]]


def test_rle_rejected(tmp_path):
    p = str(tmp_path / "rle.bmp")
    hdr = b"BM" + struct.pack("<IHHI", 200, 0, 0, 54)
    hdr += struct.pack("<IiihhIIiiII", 40, 4, 4, 1, 8, 1, 0, 0, 0, 0, 0)
    open(p, "wb").write(hdr + b"\0" * 64)
    with pytest.raises(NotImplementedError):
        bmp.parse_bmp(p)
