"""JPEG-in-TIFF (compression 7, libtiff tif_jpeg.c incl. the tag-347
shared-tables form) and the floating-point predictor (3, Adobe TIFF
TN3 / libtiff tif_predict.c) on the distributed GeoTIFF scan.
Fixtures are hand-assembled minimal TIFFs — the byte layouts come
from the TIFF 6.0 spec, written here by the test itself."""

import struct
import zlib

import numpy as np
import pytest

from gdal_spark.geotiff import read_geotiff
from gdal_spark.jpeg import decode_jpeg, encode_jpeg


def _tiff(path, w, h, data_bytes, *, comp=1, pred=1, spp=1, bits=8,
          sample_format=1, jpeg_tables=None):
    """Minimal single-strip little-endian classic TIFF."""
    tags = [
        (256, 3, 1, w), (257, 3, 1, h),
        (259, 3, 1, comp),
        (262, 3, 1, 6 if (comp == 7 and spp == 3) else 1),
        (277, 3, 1, spp), (278, 3, 1, h),
    ]
    extra = b""
    extra_off = {}

    def defer(tag, typ, payload, count=None):
        extra_off[tag] = (typ, count if count is not None else
                          len(payload), len(extra))
        return payload

    # bits-per-sample: inline when spp<=2 (SHORT fits 2/tag)
    if spp <= 2:
        tags.append((258, 3, 1, bits))
    if pred != 1:
        tags.append((317, 3, 1, pred))
    if sample_format != 1:
        tags.append((339, 3, 1, sample_format))

    ntags = len(tags) + 2 + (1 if spp > 2 else 0) + \
        (1 if jpeg_tables else 0)
    hdr_len = 8
    ifd_len = 2 + 12 * ntags + 4
    pos = hdr_len + ifd_len
    blobs = []
    if spp > 2:
        tags.append((258, 3, spp, pos))
        blobs.append(struct.pack("<%dH" % spp, *([bits] * spp)))
        pos += len(blobs[-1])
    if jpeg_tables:
        tags.append((347, 7, len(jpeg_tables), pos))
        blobs.append(jpeg_tables)
        pos += len(jpeg_tables)
    tags.append((273, 4, 1, pos))           # strip offset
    tags.append((279, 4, 1, len(data_bytes)))
    blobs.append(data_bytes)

    tags.sort()
    out = bytearray(b"II*\x00" + struct.pack("<I", 8))
    out += struct.pack("<H", len(tags))
    for tag, typ, cnt, val in tags:
        out += struct.pack("<HHI", tag, typ, cnt)
        if typ == 3 and cnt == 1:
            out += struct.pack("<HH", val, 0)
        else:
            out += struct.pack("<I", val)
    out += struct.pack("<I", 0)
    for b in blobs:
        out += b
    with open(path, "wb") as f:
        f.write(out)


def _fp_predict(arr: np.ndarray) -> bytes:
    """Encode predictor-3 rows: byte-plane split (big-endian) then
    horizontal byte differencing."""
    h, w = arr.shape
    item = arr.dtype.itemsize
    be = arr.astype(arr.dtype.newbyteorder(">"))
    rows = be.view(np.uint8).reshape(h, w, item).transpose(0, 2, 1) \
        .reshape(h, w * item)
    diff = rows.astype(np.int16)
    diff[:, 1:] -= rows[:, :-1].astype(np.int16)
    return (diff & 0xFF).astype(np.uint8).tobytes()


def _collect(spark, path):
    df = read_geotiff(spark, path)
    return {(r.band, r.tile_x, r.tile_y):
            np.frombuffer(r.data, dtype=r.dtype).reshape(r.height, r.width)
            for r in df.collect()}


def test_fp_predictor_deflate(spark, tmp_path):
    rng = np.random.default_rng(7)
    arr = rng.normal(size=(5, 7)).astype(np.float32)
    raw = _fp_predict(arr)
    path = str(tmp_path / "fp.tif")
    _tiff(path, 7, 5, zlib.compress(raw), comp=8, pred=3, bits=32,
          sample_format=3)
    tiles = _collect(spark, path)
    np.testing.assert_array_equal(tiles[(1, 0, 0)], arr)


def test_fp_predictor_float64_lzw_roundtrip_values(spark, tmp_path):
    rng = np.random.default_rng(11)
    arr = (rng.random((3, 4)) * 1000).astype(np.float64)
    raw = _fp_predict(arr)
    path = str(tmp_path / "fp64.tif")
    _tiff(path, 4, 3, zlib.compress(raw), comp=8, pred=3, bits=64,
          sample_format=3)
    tiles = _collect(spark, path)
    np.testing.assert_array_equal(tiles[(1, 0, 0)], arr)


def _split_jpeg(blob: bytes) -> tuple[bytes, bytes]:
    """(tables SOI..EOI, abbreviated image SOI..) — the tag-347 split
    libtiff writes: DQT/DHT into JPEGTables, the rest per strip."""
    segs, pos = [], 2
    while pos < len(blob):
        assert blob[pos] == 0xFF
        m = blob[pos + 1]
        if m == 0xDA:                       # SOS: rest is entropy data
            segs.append(("scan", blob[pos:]))
            break
        ln = int.from_bytes(blob[pos + 2:pos + 4], "big")
        segs.append((m, blob[pos:pos + 2 + ln]))
        pos += 2 + ln
    tables = b"\xff\xd8" + b"".join(
        s for m, s in segs if m in (0xDB, 0xC4)) + b"\xff\xd9"
    body = b"\xff\xd8" + b"".join(
        s for m, s in segs if m not in (0xDB, 0xC4))
    return tables, body


def test_jpeg_in_tiff_gray(spark, tmp_path):
    rng = np.random.default_rng(3)
    img = (rng.random((16, 16)) * 255).astype(np.uint8)
    blob = encode_jpeg(img, quality=90)
    want = decode_jpeg(blob)
    path = str(tmp_path / "jg.tif")
    _tiff(path, 16, 16, blob, comp=7, spp=1)
    tiles = _collect(spark, path)
    np.testing.assert_array_equal(tiles[(1, 0, 0)], want)


def test_jpeg_in_tiff_rgb_shared_tables(spark, tmp_path):
    rng = np.random.default_rng(5)
    img = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
    blob = encode_jpeg(img, quality=85)
    want = decode_jpeg(blob)
    tables, body = _split_jpeg(blob)
    path = str(tmp_path / "jc.tif")
    _tiff(path, 16, 16, body, comp=7, spp=3, jpeg_tables=tables)
    tiles = _collect(spark, path)
    got = np.stack([tiles[(b, 0, 0)] for b in (1, 2, 3)], axis=-1)
    np.testing.assert_array_equal(got, want)


def _rt_tiles(spark, src_df, path, quality):
    from gdal_spark.geotiff import write_geotiff_jpeg

    info = write_geotiff_jpeg(src_df, path, quality=quality)
    assert info["tiles"] >= 1
    return _collect(spark, path)


def test_jpeg_tiff_writer_roundtrip_gray(spark, tmp_path):
    from gdal_spark import synth

    src = synth.tiles_src_df(spark, 2, 2)
    path = str(tmp_path / "wj.tif")
    tiles = _rt_tiles(spark, src, path, 90)
    # expected: decode(encode(tile)) of the same deterministic pixels
    for r in src.collect():
        a = np.frombuffer(r.data, np.uint8).reshape(r.height, r.width)
        want = decode_jpeg(encode_jpeg(a, quality=90))
        np.testing.assert_array_equal(
            tiles[(1, r.tile_x, r.tile_y)], want)


def test_jpeg_tiff_writer_roundtrip_rgb(spark, tmp_path):
    from pyspark.sql import functions as F

    from gdal_spark import synth

    b1 = synth.tiles_src_df(spark, 1, 2)
    src = b1
    for b in (2, 3):
        src = src.unionByName(
            b1.withColumn("band", F.lit(b).cast("int")))
    path = str(tmp_path / "wj3.tif")
    tiles = _rt_tiles(spark, src, path, 85)
    for r in b1.collect():
        a = np.frombuffer(r.data, np.uint8).reshape(r.height, r.width)
        img = np.stack([a, a, a], axis=-1)
        want = decode_jpeg(encode_jpeg(img, quality=85))
        got = np.stack(
            [tiles[(b, r.tile_x, r.tile_y)] for b in (1, 2, 3)], -1)
        np.testing.assert_array_equal(got, want)
