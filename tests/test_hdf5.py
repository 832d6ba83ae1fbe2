"""HDF5 container + netCDF-4 layer: metadata walk, contiguous and
chunked layouts, attributes, edge chunks, CF unpack, distributed scan
vs numpy.

Reference: frmts/hdf5/hdf5dataset.cpp, frmts/netcdf (NC4 cases in
autotest/gdrivers/netcdf.py); on-disk layout per the public HDF5 File
Format Specification (v0 superblock).
"""

import numpy as np
import pytest

from gdal_spark import hdf5


def _arr(shape, dtype="f4"):
    n = int(np.prod(shape))
    return (np.arange(n, dtype=np.float64) % 97 - 11).astype(
        dtype).reshape(shape)


def test_contiguous_roundtrip_meta(tmp_path):
    p = str(tmp_path / "c.h5")
    a = _arr((7, 11), "i4")
    hdf5.write_hdf5(p, [{"name": "grid", "data": a,
                         "attrs": {"units": "m", "k": 2.5}}],
                    root_attrs={"title": "toy"})
    m = hdf5.parse_hdf5(p)
    d = m["datasets"]["grid"]
    assert d["shape"] == (7, 11)
    assert d["dtype"] == np.dtype("i4")
    assert d["attrs"]["units"] == "m"
    assert d["attrs"]["k"] == 2.5
    assert m["root_attrs"]["title"] == "toy"
    kind, addr, size = d["layout"]
    assert kind == "contiguous" and size == 7 * 11 * 4
    with open(p, "rb") as f:
        f.seek(addr)
        back = np.frombuffer(f.read(size), dtype="i4").reshape(7, 11)
    np.testing.assert_array_equal(back, a)


def test_chunked_edge_chunks(tmp_path):
    p = str(tmp_path / "k.h5")
    a = _arr((10, 13), "f8")
    hdf5.write_hdf5(p, [{"name": "v", "data": a, "chunks": (4, 5)}])
    m = hdf5.parse_hdf5(p)
    kind, cdims, entries = m["datasets"]["v"]["layout"]
    assert kind == "chunked" and cdims == (4, 5)
    assert len(entries) == 3 * 3          # ceil(10/4) x ceil(13/5)
    # reassemble sequentially
    out = np.zeros((12, 15))
    with open(p, "rb") as f:
        for origin, addr, nbytes, _fmask in entries:
            f.seek(addr)
            block = np.frombuffer(f.read(nbytes), dtype="f8"
                                  ).reshape(4, 5)
            out[origin[0]:origin[0] + 4, origin[1]:origin[1] + 5] = block
    np.testing.assert_array_equal(out[:10, :13], a)


def test_multiple_datasets_sorted_names(tmp_path):
    p = str(tmp_path / "m.h5")
    hdf5.write_hdf5(p, [{"name": n, "data": _arr((3,), "u2")}
                        for n in ["zeta", "alpha", "mid"]])
    m = hdf5.parse_hdf5(p)
    assert sorted(m["datasets"]) == ["alpha", "mid", "zeta"]


def test_int_dtypes(tmp_path):
    for dt in ["i1", "u1", "i2", "u2", "i4", "u4", "i8", "f4", "f8"]:
        p = str(tmp_path / f"t_{dt}.h5")
        hdf5.write_hdf5(p, [{"name": "x", "data": _arr((5,), dt)}])
        assert hdf5.parse_hdf5(p)["datasets"]["x"]["dtype"] == \
            np.dtype(dt)


def test_not_hdf5():
    with pytest.raises(ValueError):
        hdf5.parse_hdf5(b"PK\x03\x04" + b"\x00" * 200)


def test_distributed_scan_contiguous(spark, tmp_path):
    p = str(tmp_path / "s.h5")
    a = _arr((50, 17), "f4")
    hdf5.write_hdf5(p, [{"name": "v", "data": a,
                         "attrs": {"DIMENSION_NAMES": "y,x"}}])
    md = hdf5.read_hdf5_array(spark, p, "v", strip_elems=200)
    assert [d for d, _ in md.dims] == ["y", "x"]
    pdf = md.df.toPandas()
    assert len(pdf) == 50 * 17
    got = np.zeros((50, 17))
    got[pdf["y"], pdf["x"]] = pdf["value"]
    np.testing.assert_array_equal(got, a.astype("f8"))


def test_distributed_scan_chunked_unpack(spark, tmp_path):
    p = str(tmp_path / "u.h5")
    raw = (np.arange(9 * 14) % 51).astype("i2").reshape(9, 14)
    raw[0, 3] = -99
    hdf5.write_hdf5(p, [{"name": "t", "data": raw, "chunks": (4, 6),
                         "attrs": {"scale_factor": 0.5,
                                   "add_offset": 10.0,
                                   "_FillValue": np.int16(-99),
                                   "DIMENSION_NAMES": "a,b"}}])
    md = hdf5.read_hdf5_array(spark, p, "t")
    pdf = md.df.toPandas()
    assert len(pdf) == 9 * 14
    fillrow = pdf[(pdf["a"] == 0) & (pdf["b"] == 3)]
    assert fillrow["value"].isna().all()
    other = pdf[(pdf["a"] == 2) & (pdf["b"] == 5)]["value"].iloc[0]
    assert other == raw[2, 5] * 0.5 + 10.0


def test_netcdf4_layer(spark, tmp_path):
    p = str(tmp_path / "n.nc"
            )
    a = _arr((6, 8), "f8")
    hdf5.write_netcdf4(p, [{"name": "temp", "dims": [("y", 6), ("x", 8)],
                            "data": a, "dtype": "f8",
                            "atts": {"units": "K"}}],
                       global_atts={"Conventions": "CF-1.8"})
    m = hdf5.parse_hdf5(p)
    assert m["root_attrs"]["Conventions"] == "CF-1.8"
    assert m["root_attrs"]["_NCProperties"].startswith("version=2")
    assert m["datasets"]["y"]["attrs"]["CLASS"] == "DIMENSION_SCALE"
    md = hdf5.read_netcdf4(spark, p, "temp")
    assert [d for d, _ in md.dims] == ["y", "x"]
    pdf = md.df.toPandas()
    got = np.zeros((6, 8))
    got[pdf["y"], pdf["x"]] = pdf["value"]
    np.testing.assert_array_equal(got, a)


def test_gzip_shuffle_roundtrip(tmp_path):
    p = str(tmp_path / "z.h5")
    a = _arr((30, 40), "i4")
    hdf5.write_hdf5(p, [{"name": "v", "data": a, "chunks": (16, 16),
                         "compression": "gzip", "shuffle": True}])
    m = hdf5.parse_hdf5(p)
    d = m["datasets"]["v"]
    assert d["filters"] == [(hdf5.H5Z_SHUFFLE, [4]),
                            (hdf5.H5Z_DEFLATE, [6])]
    # compressed chunks are smaller than raw
    raw_chunk = 16 * 16 * 4
    assert all(nb < raw_chunk for _o, _a, nb, _f in d["layout"][2])
    # sequential decode matches
    out = np.zeros((32, 48), dtype="i4")
    with open(p, "rb") as f:
        for o, addr, nb, fm in d["layout"][2]:
            f.seek(addr)
            blk = hdf5._decode_chunk(f.read(nb), d["filters"], 4, fm)
            out[o[0]:o[0] + 16, o[1]:o[1] + 16] = np.frombuffer(
                blk, dtype="i4").reshape(16, 16)
    np.testing.assert_array_equal(out[:30, :40], a)


def test_filter_pipeline_v2_parse():
    v1 = hdf5._filter_message([(hdf5.H5Z_SHUFFLE, [8]),
                               (hdf5.H5Z_DEFLATE, [4])])
    assert hdf5._parse_filters(v1) == [(2, [8]), (1, [4])]
    # hand-build a v2 pipeline message (libhdf5 1.8+ emits these)
    import struct
    v2 = struct.pack("<BB", 2, 1) + struct.pack("<HHHH", 1, 0, 1, 1) \
        + struct.pack("<I", 9)
    assert hdf5._parse_filters(v2) == [(1, [9])]


def test_unknown_filter_rejected(spark, tmp_path):
    p = str(tmp_path / "bad.h5")
    hdf5.write_hdf5(p, [{"name": "v", "data": _arr((4, 4), "f4"),
                         "chunks": (4, 4), "compression": "gzip"}])
    raw = bytearray(open(p, "rb").read())
    # patch the deflate filter id (1) to an unregistered id (32000):
    # locate the full 8-byte pipeline message header (type 0x000B,
    # size 24 = one-filter v1 body) to avoid raw-data false positives
    import struct

    hdr = struct.pack("<HHB3x", 0x000B, 24, 0)
    k = raw.find(hdr)
    assert k > 0
    fid_off = k + 8 + 8
    assert struct.unpack_from("<H", raw, fid_off)[0] == 1
    struct.pack_into("<H", raw, fid_off, 32000)
    m = hdf5.parse_hdf5(bytes(raw))
    with pytest.raises(NotImplementedError):
        hdf5.read_hdf5_array(spark, None, "v", meta=m)


def test_netcdf4_compressed(spark, tmp_path):
    p = str(tmp_path / "c.nc")
    a = _arr((20, 25), "f8")
    hdf5.write_netcdf4(p, [{"name": "q", "dims": [("y", 20), ("x", 25)],
                            "data": a, "dtype": "f8", "chunks": (8, 8),
                            "compression": "gzip", "shuffle": True}])
    md = hdf5.read_netcdf4(spark, p, "q")
    pdf = md.df.toPandas()
    got = np.zeros((20, 25))
    got[pdf["y"], pdf["x"]] = pdf["value"]
    np.testing.assert_array_equal(got, a)
