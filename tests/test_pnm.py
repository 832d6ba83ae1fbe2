"""PNM binary P5/P6 driver (gdal_spark/pnm.py; reference
gdal/frmts/raw/pnmdataset.cpp, autotest/gdrivers/pnm.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark import pnm, synth


def _mosaic(rows, nb):
    out = {}
    for r in rows:
        out[(r.band, r.tile_x, r.tile_y)] = np.frombuffer(
            r.data, np.dtype(r.dtype)).reshape(r.height, r.width)
    return out


def test_pgm_roundtrip(spark, tmp_path):
    src = synth.tiles_src_df(spark, 2, 2)
    path = str(tmp_path / "g.pgm")
    info = pnm.write_pnm(src, path)
    assert info["bands"] == 1 and info["maxval"] == 255
    with open(path, "rb") as f:
        assert f.read(2) == b"P5"
    back = pnm.read_pnm(spark, path, raster_id="byte_like", zoom=12)
    want = _mosaic(src.collect(), 1)
    got = _mosaic(back.collect(), 1)
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_array_equal(got[k], want[k])


def test_ppm_rgb_roundtrip(spark, tmp_path):
    rgb = None
    for band, seed in ((1, 1), (2, 9), (3, 17)):
        b = synth.tiles_src_df(spark, 1, 1, seed=seed).withColumn(
            "band", F.lit(band).cast("int"))
        rgb = b if rgb is None else rgb.unionByName(b)
    path = str(tmp_path / "c.ppm")
    info = pnm.write_pnm(rgb, path)
    assert info["bands"] == 3
    back = pnm.read_pnm(spark, path, raster_id="byte_like", zoom=12)
    want = _mosaic(rgb.collect(), 3)
    got = _mosaic(back.collect(), 3)
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_array_equal(got[k], want[k])
    # world file roundtrip
    gt = rgb.select("geotransform").first()[0]
    np.testing.assert_allclose(back.select("geotransform").first()[0], gt)


def test_pgm_16bit_big_endian(spark, tmp_path):
    # hand-written 16-bit PGM: BE samples per the spec
    arr = (np.arange(12, dtype=np.uint16) * 1000).reshape(3, 4)
    path = str(tmp_path / "d.pgm")
    with open(path, "wb") as f:
        f.write(b"P5\n# comment\n4 3\n65535\n")
        f.write(arr.astype(">u2").tobytes())
    back = pnm.read_pnm(spark, path).collect()
    got = np.frombuffer(back[0].data, np.dtype(back[0].dtype)).reshape(3, 4)
    np.testing.assert_array_equal(got, arr)
    assert back[0].dtype == "uint16"
