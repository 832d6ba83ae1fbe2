"""SAGA (.sgrd/.sdat) and Erdas LAN drivers vs the reference's own
fixtures and expected checksums (autotest/gdrivers/saga.py:44 -> 108,
lan.py:41,50 -> 10), plus sink roundtrips."""

import os

import numpy as np
import pytest

from gdal_spark import geomlite as G
from gdal_spark import lan, saga, synth

DATA = "/root/reference/autotest/gdrivers/data"
have_ref = os.path.isdir(DATA)


def _one(rows, band=1):
    r = [x for x in rows if x.band == band]
    assert len(r) == 1
    return np.frombuffer(r[0].data, np.dtype(r[0].dtype)).reshape(
        r[0].height, r[0].width)


@pytest.mark.skipif(not have_ref, reason="no reference fixtures")
def test_saga_4bytefloat_checksum_108(spark):
    rows = saga.read_saga(spark, f"{DATA}/saga/4byteFloat.sdat").collect()
    a = _one(rows)
    assert a.dtype == np.float32 and a.shape == (10, 10)
    assert G.gdal_checksum(a) == 108     # autotest saga.py:44
    # POSITION_* are centers: xmin 333.3 cs 10 -> origin 328.3
    gt = rows[0].geotransform
    np.testing.assert_allclose(gt, [328.3, 10, 0, 650.5, 0, -10])


@pytest.mark.skipif(not have_ref, reason="no reference fixtures")
def test_lan_8bit_checksum_10(spark):
    rows = lan.read_lan(spark, f"{DATA}/lan/fakelan.lan").collect()
    a = _one(rows)
    assert a.shape == (2, 2)
    assert G.gdal_checksum(a) == 10      # autotest lan.py:41


@pytest.mark.skipif(not have_ref, reason="no reference fixtures")
def test_lan_4bit_checksum_10(spark):
    rows = lan.read_lan(spark, f"{DATA}/lan/fakelan4bit.lan").collect()
    a = _one(rows)
    assert a.shape == (2, 2)
    assert G.gdal_checksum(a) == 10      # autotest lan.py:50


def test_saga_roundtrip(spark, tmp_path):
    src = synth.tiles_src_df(spark, 2, 2)
    base = str(tmp_path / "rt.sgrd")
    info = saga.write_saga(src, base)
    assert info["width"] == 512
    back = saga.read_saga(spark, base, raster_id="byte_like", zoom=12)
    want = {(r.tile_x, r.tile_y):
            np.frombuffer(r.data, np.uint8).reshape(r.height, r.width)
            for r in src.collect()}
    got = {(r.tile_x, r.tile_y):
           np.frombuffer(r.data, np.dtype(r.dtype)).reshape(
               r.height, r.width)
           for r in back.collect()}
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_array_equal(got[k], want[k])
    # header center-vs-corner closure
    gt_src = src.select("geotransform").first()[0]
    gt_back = back.filter("tile_x=0 and tile_y=0") \
        .select("geotransform").first()[0]
    np.testing.assert_allclose(gt_back, gt_src, rtol=0, atol=1e-6)


def test_lan_roundtrip(spark, tmp_path):
    src = synth.tiles_src_df(spark, 2, 2)
    path = str(tmp_path / "rt.lan")
    info = lan.write_lan(src, path)
    assert info["bands"] == 1
    back = lan.read_lan(spark, path, raster_id="byte_like", zoom=12)
    want = {(r.tile_x, r.tile_y):
            np.frombuffer(r.data, np.uint8).reshape(r.height, r.width)
            for r in src.collect()}
    got = {(r.tile_x, r.tile_y):
           np.frombuffer(r.data, np.dtype(r.dtype)).reshape(
               r.height, r.width)
           for r in back.collect()}
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_array_equal(got[k], want[k])
    gt_src = src.select("geotransform").first()[0]
    gt_back = back.select("geotransform").first()[0]
    # float32 header storage: web-mercator origins lose sub-meter bits
    np.testing.assert_allclose(gt_back[:2], gt_src[:2], rtol=1e-6)
