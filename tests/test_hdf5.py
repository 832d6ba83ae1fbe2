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
        for origin, addr, nbytes in entries:
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


def test_filtered_chunk_rejected(tmp_path):
    # write a chunked file, then flip a filter mask bit: the reader
    # must refuse rather than return garbage
    p = str(tmp_path / "f.h5")
    hdf5.write_hdf5(p, [{"name": "v", "data": _arr((4, 4), "f4"),
                         "chunks": (4, 4)}])
    raw = bytearray(open(p, "rb").read())
    k = raw.find(b"TREE", 96)
    while raw[k + 4] != 1:                 # find the type-1 node
        k = raw.find(b"TREE", k + 1)
    raw[k + 24 + 4] = 1                    # filter mask of chunk 0
    import struct
    with pytest.raises(NotImplementedError):
        m = hdf5.parse_hdf5(bytes(raw))
