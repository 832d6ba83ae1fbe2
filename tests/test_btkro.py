"""BT and KRO drivers: roundtrips + layout assertions (reference
frmts/raw/btdataset.cpp column-major bottom-up grid, krodataset.cpp
big-endian BIP)."""

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark import btkro, synth


def _grid(rows, band=1):
    rows = [r for r in rows if r.band == band]
    ntx = max(r.tile_x for r in rows) + 1
    nty = max(r.tile_y for r in rows) + 1
    g = {(r.tile_x, r.tile_y): np.frombuffer(
        r.data, np.dtype(r.dtype)).reshape(r.height, r.width)
        for r in rows}
    return np.vstack([np.hstack([g[(tx, ty)] for tx in range(ntx)])
                      for ty in range(nty)])


def test_bt_roundtrip_and_layout(spark, tmp_path):
    # int16 tile table from the synth bytes
    rows = []
    for r in synth.tiles_src_df(spark, 2, 2).collect():
        d = r.asDict()
        a = np.frombuffer(r.data, np.uint8).astype(np.int16)
        d["dtype"] = "int16"
        d["data"] = a.tobytes()
        rows.append(d)
    src = spark.createDataFrame(rows, synth.tiles_src_df(
        spark, 1, 1).schema)
    path = str(tmp_path / "rt.bt")
    btkro.write_bt(src, path)
    # header + column-major bottom-up check
    hdr = open(path, "rb").read(256 + 8)
    assert hdr.startswith(b"binterr1.3")
    W, H = struct.unpack_from("<ii", hdr, 10)
    assert (W, H) == (512, 512)
    back = btkro.read_bt(spark, path, raster_id="byte_like", zoom=12)
    want = _grid(src.collect())
    got = _grid(back.collect())
    np.testing.assert_array_equal(got, want)
    gt_src = src.select("geotransform").first()[0]
    gt_back = back.filter("tile_x=0 and tile_y=0") \
        .select("geotransform").first()[0]
    np.testing.assert_allclose(gt_back, gt_src, rtol=0, atol=1e-6)


def test_kro_roundtrip_rgb(spark, tmp_path):
    rgb = None
    for band, seed in ((1, 1), (2, 9), (3, 17)):
        b = synth.tiles_src_df(spark, 1, 1, seed=seed).withColumn(
            "band", F.lit(band).cast("int"))
        rgb = b if rgb is None else rgb.unionByName(b)
    path = str(tmp_path / "rt.kro")
    info = btkro.write_kro(rgb, path)
    assert info["bands"] == 3 and info["depth"] == 8
    assert open(path, "rb").read(4) == b"KRO\x01"
    back = btkro.read_kro(spark, path, raster_id="byte_like", zoom=12)
    for band in (1, 2, 3):
        np.testing.assert_array_equal(
            _grid(back.collect(), band), _grid(rgb.collect(), band))


def test_kro_uint16_bigendian(spark, tmp_path):
    # hand-written 16-bit KRO: BE samples per the reference
    a = (np.arange(12, dtype=np.uint16) * 999).reshape(3, 4)
    path = str(tmp_path / "w.kro")
    with open(path, "wb") as f:
        f.write(b"KRO\x01" + struct.pack(">4I", 4, 3, 16, 1))
        f.write(a.astype(">u2").tobytes())
    back = btkro.read_kro(spark, path).collect()
    got = np.frombuffer(back[0].data, np.dtype(back[0].dtype)
                        ).reshape(3, 4)
    np.testing.assert_array_equal(got, a)
