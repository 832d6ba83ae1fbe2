"""Surfer GSBG/GS7BG, Idrisi RST, and ERMapper ERS driver tests
(frmts/gsg/gsbgdataset.cpp, gs7bgdataset.cpp,
frmts/idrisi/IdrisiDataset.cpp, frmts/ers/ersdataset.cpp)."""

import struct

import numpy as np
import pandas as pd
import pytest

from gdal_spark import ers, gsg, idrisi, synth

TP = 4


def _tiles_from_np(spark, arrs_by_band, gt, dtype, nodata=float("nan"),
                   raster_id="img", crs=""):
    rows = []
    h, w = next(iter(arrs_by_band.values())).shape
    for band, a in arrs_by_band.items():
        for ty in range(0, (h + TP - 1) // TP):
            for tx in range(0, (w + TP - 1) // TP):
                sub = a[ty * TP:(ty + 1) * TP, tx * TP:(tx + 1) * TP]
                rows.append({
                    "raster_id": raster_id, "band": band, "zoom": 0,
                    "tile_x": tx, "tile_y": ty,
                    "width": sub.shape[1], "height": sub.shape[0],
                    "dtype": dtype, "nodata": nodata, "crs": crs,
                    "geotransform": [gt[0] + tx * TP * gt[1], gt[1], 0.0,
                                     gt[3] + ty * TP * gt[5], 0.0, gt[5]],
                    "data": sub.astype(dtype).tobytes(),
                })
    return spark.createDataFrame(pd.DataFrame(rows), schema=synth.TILE_SCHEMA)


def _assemble(df, nbands, h, w, dtype):
    out = {b: np.zeros((h, w), dtype=dtype) for b in range(1, nbands + 1)}
    for r in df.collect():
        a = np.frombuffer(r.data, dtype=np.dtype(r.dtype)).reshape(
            r.height, r.width)
        out[r.band][r.tile_y * TP:r.tile_y * TP + r.height,
                    r.tile_x * TP:r.tile_x * TP + r.width] = a
    return out


# ------------------------------------------------------------------ Surfer
@pytest.mark.parametrize("variant", ["gsbg", "gs7bg"])
def test_surfer_roundtrip(spark, variant, tmp_path):
    rng = np.random.RandomState(2)
    h, w = 6, 9
    dtype = "float32" if variant == "gsbg" else "float64"
    img = rng.uniform(-50, 50, (h, w)).astype(dtype)
    img[2, 3] = gsg.GSBG_NODATA  # one blank cell
    gt = [10.0, 2.0, 0.0, 40.0, 0.0, -2.0]
    src = _tiles_from_np(spark, {1: img}, gt, dtype,
                         nodata=gsg.GSBG_NODATA)
    p = str(tmp_path / f"g.{variant}")
    wr = gsg.write_gsbg if variant == "gsbg" else gsg.write_gs7bg
    rd = gsg.read_gsbg if variant == "gsbg" else gsg.read_gs7bg
    wr(src, p, tile_px=TP)
    hdr = (gsg.parse_gsbg if variant == "gsbg" else gsg.parse_gs7bg)(p)
    assert hdr["nrows"] == h and hdr["ncols"] == w
    # geotransform survives the node-coordinate (center) convention
    np.testing.assert_allclose(hdr["geotransform"], gt, rtol=1e-12)
    # header z-range excludes the blank
    real = img[img != np.float32(gsg.GSBG_NODATA)] if dtype == "float32" \
        else img[img != gsg.GSBG_NODATA]
    np.testing.assert_allclose([hdr["zmin"], hdr["zmax"]],
                               [real.min(), real.max()], rtol=1e-6)
    got = _assemble(rd(spark, p, tile_px=TP), 1, h, w, dtype)
    np.testing.assert_array_equal(got[1], img)


def test_gsbg_on_disk_layout_bottom_up(spark, tmp_path):
    img = np.arange(12, dtype=np.float32).reshape(3, 4)
    src = _tiles_from_np(spark, {1: img}, [0, 1, 0, 3, 0, -1], "float32")
    p = str(tmp_path / "l.grd")
    gsg.write_gsbg(src, p, tile_px=TP)
    raw = open(p, "rb").read()
    assert raw[:4] == b"DSBB"
    assert struct.unpack_from("<hh", raw, 4) == (4, 3)
    # first stored row is the BOTTOM image row
    first = np.frombuffer(raw[56:56 + 16], dtype="<f4")
    np.testing.assert_array_equal(first, img[2])


# ------------------------------------------------------------------ Idrisi
@pytest.mark.parametrize("dtype", ["uint8", "int16", "float32"])
def test_rst_roundtrip_single_band(spark, dtype, tmp_path):
    rng = np.random.RandomState(4)
    h, w = 6, 10
    img = rng.uniform(-100, 100, (h, w)).astype(dtype) \
        if dtype != "uint8" else rng.randint(0, 255, (h, w)).astype(dtype)
    gt = [5.0, 0.5, 0.0, 20.0, 0.0, -0.5]
    src = _tiles_from_np(spark, {1: img}, gt, dtype, nodata=-1.0)
    p = str(tmp_path / "r.rst")
    idrisi.write_rst(src, p, tile_px=TP)
    hdr = idrisi.parse_rdc(open(str(tmp_path / "r.rdc")).read())
    assert hdr["dtype"] == dtype
    np.testing.assert_allclose(hdr["geotransform"], gt, rtol=1e-12)
    assert hdr["nodata"] == -1.0
    got = _assemble(idrisi.read_rst(spark, p, tile_px=TP), 1, h, w, dtype)
    np.testing.assert_array_equal(got[1], img)


def test_rst_rgb24_band_order(spark, tmp_path):
    rng = np.random.RandomState(6)
    h, w = 5, 6
    bands = {b: rng.randint(0, 256, (h, w)).astype(np.uint8)
             for b in (1, 2, 3)}
    src = _tiles_from_np(spark, bands, [0, 1, 0, 5, 0, -1], "uint8")
    p = str(tmp_path / "c.rst")
    idrisi.write_rst(src, p, tile_px=TP)
    # on disk: pixel (0,0) of the TOP row at offset 0 is B,G,R
    raw = open(p, "rb").read()
    assert raw[0] == bands[3][0, 0]
    assert raw[1] == bands[2][0, 0]
    assert raw[2] == bands[1][0, 0]
    got = _assemble(idrisi.read_rst(spark, p, tile_px=TP), 3, h, w,
                    np.uint8)
    for b in (1, 2, 3):
        np.testing.assert_array_equal(got[b], bands[b])


# --------------------------------------------------------------------- ERS
def test_ers_header_parse_nested():
    flat = ers.parse_ers_header(
        'DatasetHeader Begin\n'
        '\tVersion = "6.4"\n'
        '\tByteOrder = LSBFirst\n'
        '\tRasterInfo Begin\n'
        '\t\tCellType = IEEE4ByteReal\n'
        '\t\tNrOfLines = 4\n'
        '\t\tNrOfCellsPerLine = 7\n'
        '\t\tNrOfBands = 2\n'
        '\t\tNullCellValue = -99\n'
        '\t\tCellInfo Begin\n'
        '\t\t\tXdimension = 30\n'
        '\t\t\tYdimension = 30\n'
        '\t\tCellInfo End\n'
        '\t\tRegistrationCoord Begin\n'
        '\t\t\tEastings = 500000\n'
        '\t\t\tNorthings = 4000000\n'
        '\t\tRegistrationCoord End\n'
        '\tRasterInfo End\n'
        'DatasetHeader End\n')
    hdr, _ = ers._layout_from_header(flat, "/tmp/x.ers")
    assert hdr["dtype"] == "float32" and hdr["nbands"] == 2
    assert hdr["interleave"] == "bil" and hdr["nodata"] == -99.0
    assert hdr["geotransform"] == [500000.0, 30.0, 0.0,
                                   4000000.0, 0.0, -30.0]


def test_ers_roundtrip_two_band(spark, tmp_path):
    rng = np.random.RandomState(8)
    h, w = 6, 9
    bands = {1: rng.randint(-999, 999, (h, w)).astype(np.int16),
             2: rng.randint(-999, 999, (h, w)).astype(np.int16)}
    gt = [300.0, 10.0, 0.0, 900.0, 0.0, -10.0]
    src = _tiles_from_np(spark, bands, gt, "int16", nodata=-999.0)
    p = str(tmp_path / "t.ers")
    meta = ers.write_ers(src, p, tile_px=TP)
    assert meta["data_path"] == str(tmp_path / "t")
    back = ers.read_ers(spark, p, tile_px=TP)
    got = _assemble(back, 2, h, w, np.int16)
    np.testing.assert_array_equal(got[1], bands[1])
    np.testing.assert_array_equal(got[2], bands[2])
    r = back.first()
    assert r.nodata == -999.0
    r00 = [x for x in back.collect()
           if x.tile_x == 0 and x.tile_y == 0 and x.band == 1][0]
    assert list(r00.geotransform) == gt
