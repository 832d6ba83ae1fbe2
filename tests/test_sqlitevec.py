"""SQLite / Spatialite vector driver: blob codec structural walk,
catalog discovery, distributed rowid-window scan roundtrip.

Reference: ogr/ogrsf_frmts/sqlite/ogrsqlitelayer.cpp
(ImportSpatiaLiteGeometry / ExportSpatiaLiteGeometry),
autotest/ogr/ogr_sqlite.py.
"""

import sqlite3
import struct

import pytest

from gdal_spark import geometry, sqlitevec


WKTS = [
    "POINT (1.5 -2.25)",
    "LINESTRING (0 0, 1 1, 2 0.5)",
    "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))",
    "MULTIPOINT ((1 2), (3 4))",
    "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3, 4 4))",
    "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 6 5, 6 6, 5 6, 5 5)))",
]


@pytest.mark.parametrize("wkt", WKTS)
def test_blob_codec_roundtrip(wkt):
    wkb = geometry.to_wkb(geometry.parse_wkt(wkt))
    blob = sqlitevec.wkb_to_spatialite(wkb, 4326)
    assert blob[0] == 0x00 and blob[-1] == 0xFE and blob[38] == 0x7C
    srid, back = sqlitevec.spatialite_to_wkb(blob)
    assert srid == 4326
    assert geometry.to_wkt(geometry.parse_wkb(back)) == \
        geometry.to_wkt(geometry.parse_wkb(wkb))


def test_blob_mbr():
    wkb = geometry.to_wkb(geometry.parse_wkt("LINESTRING (0 -3, 5 7)"))
    blob = sqlitevec.wkb_to_spatialite(wkb, 31370)
    mbr = struct.unpack_from("<4d", blob, 6)
    assert mbr == (0.0, -3.0, 5.0, 7.0)
    assert struct.unpack_from("<i", blob, 2)[0] == 31370


def test_blob_big_endian_decode():
    # hand-build a BE Spatialite point blob: the reader must honor
    # the header endian byte for every field
    body = struct.pack(">I2d", 1, 3.5, -1.25)
    blob = (b"\x00\x00" + struct.pack(">i", 2154)
            + struct.pack(">4d", 3.5, -1.25, 3.5, -1.25)
            + b"\x7c" + body + b"\xfe")
    srid, wkb = sqlitevec.spatialite_to_wkb(blob)
    assert srid == 2154
    assert geometry.to_wkt(geometry.parse_wkb(wkb)) == geometry.to_wkt(
        geometry.parse_wkt("POINT (3.5 -1.25)"))


def test_blob_rejects_garbage():
    with pytest.raises(ValueError):
        sqlitevec.spatialite_to_wkb(b"\x01" * 50)


def test_write_read_roundtrip(spark, tmp_path):
    import pandas as pd

    p = str(tmp_path / "layers.sqlite")
    pdf = pd.DataFrame({
        "name": [f"f{k}" for k in range(300)],
        "score": [k * 0.5 for k in range(300)],
        "wkt": [f"POINT ({k * 0.01} {k * -0.02})" for k in range(300)],
    })
    n = sqlitevec.write_sqlite(spark.createDataFrame(pdf), p,
                               table="pts", geometry_type="POINT",
                               srid=3857)
    assert n == 300
    assert sqlitevec.list_layers(p) == ["pts"]
    out = sqlitevec.read_sqlite(spark, p, "pts", rows_per_batch=64) \
        .toPandas().sort_values("fid").reset_index(drop=True)
    assert len(out) == 300
    assert list(out.columns) == ["fid", "name", "score", "wkt"]
    assert out["wkt"].iloc[10] == geometry.to_wkt(
        geometry.parse_wkt(pdf["wkt"].iloc[10]), prec=12)
    assert out["score"].iloc[299] == 149.5


def test_plain_attribute_table(spark, tmp_path):
    p = str(tmp_path / "plain.sqlite")
    con = sqlite3.connect(p)
    con.execute("CREATE TABLE t (a INTEGER, b TEXT)")
    con.executemany("INSERT INTO t VALUES (?, ?)",
                    [(k, f"v{k}") for k in range(10)])
    con.commit()
    con.close()
    out = sqlitevec.read_sqlite(spark, p).toPandas()
    assert len(out) == 10 and "wkt" not in out.columns
    assert sorted(out["a"]) == list(range(10))


def test_srid_carried(spark, tmp_path):
    p = str(tmp_path / "srid.sqlite")
    import pandas as pd
    pdf = pd.DataFrame({"wkt": ["POINT (1 2)"]})
    sqlitevec.write_sqlite(spark.createDataFrame(pdf), p, table="g",
                           srid=2056)
    con = sqlite3.connect(p)
    row = con.execute("SELECT srid FROM geometry_columns "
                      "WHERE f_table_name='g'").fetchone()
    con.close()
    assert row[0] == 2056
