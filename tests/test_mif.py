"""MapInfo MIF/MID driver tests (gdal_spark/mif.py).

Reference: ogr/ogrsf_frmts/mitab/mitab_miffile.cpp,
mitab_feature_mif.cpp; autotest/ogr/ogr_mitab.py.
"""

import numpy as np
import pytest

from gdal_spark import mif


def _df(spark):
    rows = [
        ("POINT (10.5 42.49223523773254)", "doc1", 7, 0.25),
        ("LINESTRING (0 0, 1.5 2.25, 3 4)", "doc2", -3, 1.5),
        ('MULTILINESTRING ((0 0, 1 1), (2 2, 3 3, 4 4))',
         "doc 'x', y", 0, None),
        ("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0),"
         " (2 2, 3 2, 3 3, 2 2))", "holes", 99, -2.75),
        (None, "nogeom", 5, 3.0),
    ]
    return rows, spark.createDataFrame(
        rows, "wkt string, name string, k long, v double")


def test_roundtrip(spark, tmp_path):
    rows, df = _df(spark)
    base = str(tmp_path / "layer")
    mif.write_mif(df, base)
    r = mif.read_mif(spark, base + ".mif").orderBy("fid").collect()
    assert [b.wkt for b in r] == [a[0] for a in rows]
    assert [b.name for b in r] == [a[1] for a in rows]
    assert [b.k for b in r] == [a[2] for a in rows]
    assert [b.v for b in r] == [a[3] for a in rows]


def test_schema_from_header(spark, tmp_path):
    _, df = _df(spark)
    base = str(tmp_path / "layer")
    mif.write_mif(df, base)
    schema, cols, delim = mif.mif_schema(base + ".mif")
    assert [c[0] for c in cols] == ["name", "k", "v"]
    assert [c[1] for c in cols] == ["Char(254)", "Integer", "Float"]
    assert delim == ","
    assert schema["k"].dataType.typeName() == "long"
    assert schema["v"].dataType.typeName() == "double"


def test_precision_shortest_roundtrip(spark, tmp_path):
    """The round-4 lesson: coordinates survive the text loop exactly
    (shortest-round-trip formatting, no %.10g truncation)."""
    vals = [42.49223523773253, -0.1, 1e-9, 123456.789012345]
    df = spark.createDataFrame(
        [(f"POINT ({v} {v / 3.0})", i) for i, v in enumerate(vals)],
        "wkt string, i long")
    base = str(tmp_path / "prec")
    mif.write_mif(df, base)
    r = mif.read_mif(spark, base + ".mif").orderBy("i").collect()
    for row, v in zip(r, vals):
        x, y = row.wkt[len("POINT ("):-1].split()
        assert float(x) == v and float(y) == v / 3.0


def test_style_clauses_and_line_record(spark, tmp_path):
    """Hand-written MIF (tab delimiter default, LINE record, trailing
    SYMBOL/PEN clauses) — reader grammar beyond what our writer
    emits."""
    p = tmp_path / "hand.mif"
    p.write_text(
        "VERSION 300\n"
        "COLUMNS 2\n"
        "  nm Char(10)\n"
        "  q Integer\n"
        "DATA\n"
        "POINT 1 2\n"
        "    SYMBOL (34,0,12)\n"
        "LINE 0 0 5 5\n"
        "    PEN (1,2,0)\n"
        "REGION 1\n"
        "  3\n"
        "0 0\n"
        "4 0\n"
        "0 4\n"
        "    BRUSH (2,16777215)\n")
    (tmp_path / "hand.mid").write_text('"a"\t1\n"b"\t2\n"c"\t3\n')
    r = mif.read_mif(spark, str(p)).orderBy("fid").collect()
    assert r[0].wkt == "POINT (1 2)" and r[0].mif_style == "SYMBOL (34,0,12)"
    assert r[1].wkt == "LINESTRING (0 0, 5 5)"
    assert r[1].mif_style == "PEN (1,2,0)"
    # implicit ring closure
    assert r[2].wkt == "POLYGON ((0 0, 4 0, 0 4, 0 0))"
    assert [x.nm for x in r] == ["a", "b", "c"] and r[2].q == 3


def test_file_parallel_directory(spark, tmp_path):
    _, df = _df(spark)
    for i in range(3):
        mif.write_mif(df, str(tmp_path / f"part{i}"))
    out = mif.read_mif(spark, str(tmp_path))
    assert out.count() == 15
    assert out.select("file").distinct().count() == 3
    plan = out._jdf.queryExecution().executedPlan().toString()
    # descriptor repartition only — no data-side exchange
    assert plan.count("Exchange") <= 1


def test_quote_guard(spark, tmp_path):
    df = spark.createDataFrame([("POINT (0 0)", 'has "quote"')],
                               "wkt string, name string")
    with pytest.raises(ValueError, match="quote"):
        mif.write_mif(df, str(tmp_path / "bad"))


def test_parallel_directory_sink(spark, tmp_path):
    """write_mif_dir: one complete pair per partition, no driver
    bytes; read_mif consumes the directory as one layer."""
    rows, df = _df(spark)
    out = str(tmp_path / "fleet")
    mif.write_mif_dir(df.repartition(3), out)
    import os
    mifs = sorted(f for f in os.listdir(out) if f.endswith(".mif"))
    assert 1 <= len(mifs) <= 3
    for m in mifs:
        assert os.path.exists(os.path.join(out, m[:-4] + ".mid"))
    back = mif.read_mif(spark, out)
    assert back.count() == 5
    got = {(r.wkt, r.name, r.k, r.v) for r in back.collect()}
    assert got == {tuple(r) for r in rows}
