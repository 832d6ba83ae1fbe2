"""DTED + SRTMHGT driver tests (gdal_spark/dted.py).

Reference behavior: gdal/frmts/dted/dted_api.c (signed-magnitude
column profiles, UHL/DSI/ACC headers), dted_create.c (header bytes);
gdal/frmts/srtmhgt/srtmhgtdataset.cpp (filename georeferencing, size
schema); autotest/gdrivers/dted.py, srtmhgt.py.
"""

import numpy as np
import pytest

from gdal_spark import dted, synth


def _assemble(rows, n, tile_px, dtype=np.int16):
    g = np.zeros((n, n), dtype=dtype)
    for r in rows:
        t = np.frombuffer(r.data, dtype=dtype).reshape(r.height, r.width)
        g[r.tile_y * tile_px:r.tile_y * tile_px + r.height,
          r.tile_x * tile_px:r.tile_x * tile_px + r.width] = t
    return g


def test_dms_field_roundtrip():
    for ang, is_lat in [(-80, False), (43, True), (0, True), (-1, True),
                        (179, False), (-179, False)]:
        f = dted._dms_field(ang, is_lat)
        assert dted._parse_dms(f.encode()) == ang


def test_profile_codec_negative_and_checksum():
    plane = synth.dem_pixels_np(0, 0, 33, 57)
    raw = dted._encode_profiles(plane, 0)
    assert raw[0] == 0xAA
    back = dted._decode_profiles(raw, 33, 57, 0, verify_checksum=True)
    np.testing.assert_array_equal(back, plane)
    # corrupt a data byte -> checksum catches it
    bad = bytearray(raw)
    bad[10] ^= 0x01
    with pytest.raises(ValueError, match="checksum"):
        dted._decode_profiles(bytes(bad), 33, 57, 0, verify_checksum=True)


def test_two_complement_repair():
    # a small negative written as two's complement decodes as a huge
    # signed-magnitude negative (< -16000), which the dted_api.c :644
    # heuristic repairs back to the intended value
    ny = 4
    plane = np.array([100, -5, -3, 7], dtype=np.int16).reshape(ny, 1)
    raw = bytearray(dted._encode_profiles(plane, 0))
    # overwrite the image-row-1 sample (-5; profiles are bottom-to-top,
    # so profile slot ny-1-1 = 2) with two's complement -200 = 0xFF38:
    # signed-magnitude reading gives -32568 -> repaired to -200
    tc = int(np.int16(-200).astype(np.uint16))
    off = 8 + 2 * 2
    raw[off] = (tc >> 8) & 0xFF
    raw[off + 1] = tc & 0xFF
    back = dted._decode_profiles(bytes(raw), 1, ny, 0,
                                 verify_checksum=False)
    assert back[1, 0] == -200


def test_dted_roundtrip(spark, tmp_path):
    src = synth.dem_tiles_df(spark, 121, tile_px=64)
    p = str(tmp_path / "n43w080.dt0")
    dted.write_dted(src, p, level=0, tile_px=64)
    hdr = dted.parse_dted_header(p)
    assert (hdr["nx"], hdr["ny"]) == (121, 121)
    assert int(round(hdr["px"] * 36000)) == 300  # 30 arcsec = level 0
    rows = dted.read_dted(spark, p, tile_px=64,
                          verify_checksum=True).collect()
    got = _assemble(rows, 121, 64)
    np.testing.assert_array_equal(got, synth.dem_pixels_np(0, 0, 121, 121))
    # georef: UL corner half a pixel out from the SW-origin cell frame
    r00 = [r for r in rows if r.tile_x == 0 and r.tile_y == 0][0]
    assert abs(r00.geotransform[0] - (-80 - 0.5 / 120)) < 1e-9
    assert abs(r00.geotransform[3] - (44 + 0.5 / 120)) < 1e-9
    assert r00.nodata == -32767.0


def test_dted_skips_vol_hdr_records(spark, tmp_path):
    src = synth.dem_tiles_df(spark, 121, tile_px=64)
    p = str(tmp_path / "n43w080.dt0")
    dted.write_dted(src, p, tile_px=64)
    wrapped = str(tmp_path / "wrapped.dt0")
    with open(p, "rb") as f:
        body = f.read()
    with open(wrapped, "wb") as f:
        f.write(b"VOL" + b" " * 77 + b"HDR" + b" " * 77 + body)
    hdr = dted.parse_dted_header(wrapped)
    assert hdr["data_off"] == 160 + 3428
    rows = dted.read_dted(spark, wrapped, tile_px=64).collect()
    got = _assemble(rows, 121, 64)
    np.testing.assert_array_equal(got, synth.dem_pixels_np(0, 0, 121, 121))


def test_srtmhgt_roundtrip(spark, tmp_path):
    src = synth.dem_tiles_df(spark, 1201, tile_px=256)
    p = str(tmp_path / "N43W080.hgt")
    dted.write_srtmhgt(src, p, tile_px=256)
    import os
    assert os.path.getsize(p) == 1201 * 1201 * 2
    rows = dted.read_srtmhgt(spark, p, tile_px=256).collect()
    got = _assemble(rows, 1201, 256)
    np.testing.assert_array_equal(got,
                                  synth.dem_pixels_np(0, 0, 1201, 1201))
    r00 = [r for r in rows if r.tile_x == 0 and r.tile_y == 0][0]
    assert abs(r00.geotransform[0] - (-80 - 0.5 / 1200)) < 1e-12
    assert abs(r00.geotransform[3] - (44 + 0.5 / 1200)) < 1e-12
    assert r00.nodata == -32768.0


def test_srtmhgt_filename_must_match_cell(spark, tmp_path):
    src = synth.dem_tiles_df(spark, 1201, tile_px=256)
    with pytest.raises(ValueError, match="N43W080"):
        dted.write_srtmhgt(src, str(tmp_path / "N00E000.hgt"),
                           tile_px=256)


def test_srtmhgt_name_parse():
    assert dted.parse_hgt_name("/x/N43W080.hgt") == (43, -80)
    assert dted.parse_hgt_name("s01e072.hgt") == (-1, 72)
    with pytest.raises(ValueError):
        dted.parse_hgt_name("whatever.hgt")


def test_scan_plans_map_only(spark, tmp_path):
    """Both scans must be map-only over descriptor rows: the only
    exchange allowed is the KB-sized descriptor RoundRobin, never a
    key shuffle of pixel data."""
    src = synth.dem_tiles_df(spark, 121, tile_px=64)
    p = str(tmp_path / "n43w080.dt0")
    dted.write_dted(src, p, tile_px=64)
    plan = dted.read_dted(spark, p)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "hashpartitioning" not in plan

    src2 = synth.dem_tiles_df(spark, 1201, tile_px=256)
    p2 = str(tmp_path / "N43W080.hgt")
    dted.write_srtmhgt(src2, p2, tile_px=256)
    plan2 = dted.read_srtmhgt(spark, p2)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "hashpartitioning" not in plan2
