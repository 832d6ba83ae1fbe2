"""PGDump sink tests (ogr/ogrsf_frmts/pgdump/ogrpgdumplayer.cpp)."""

import os

from pyspark.sql import functions as F

from gdal_spark import pgdump


def _fixture(spark):
    rows = [
        (1, "plain", 3.5, "POINT (10 20)"),
        (2, "tab\there", -1.0, "POINT (30 -40)"),
        (3, "line\nbreak and back\\slash", 0.0, None),
        (4, None, None, "POINT (0 0)"),
        (5, "cr\rchar and \\t literal", 2.25, "POINT (-180 85)"),
    ]
    return spark.createDataFrame(
        rows, "fid long, name string, score double, wkt string")


def test_directory_roundtrip(spark, tmp_path):
    df = _fixture(spark)
    path = str(tmp_path / "dump_dir")
    pgdump.write_pgdump(df, path, "places", geom_col="wkt", srid=4326)
    assert os.path.exists(os.path.join(path, "00_prologue.sql"))
    assert os.path.exists(os.path.join(path, "zz_epilogue.sql"))
    back = pgdump.read_pgdump(spark, path)
    got = back.select("fid", "name", "score",
                      pgdump.hexewkb_to_wkt("wkt").alias("wkt")) \
        .orderBy("fid").collect()
    want = df.orderBy("fid").collect()
    from gdal_spark import geometry as G
    norm = lambda w: None if w is None else G.to_wkt(G.parse_wkt(w))  # noqa: E731
    for g, w in zip(got, want):
        assert (g.fid, g.name, g.score) == (w.fid, w.name, w.score)
        assert g.wkt == norm(w.wkt)


def test_single_file_is_valid_script(spark, tmp_path):
    df = _fixture(spark)
    path = str(tmp_path / "dump.sql")
    pgdump.write_pgdump(df, path, "places", geom_col="wkt",
                        single_file=True)
    text = open(path).read()
    assert 'CREATE TABLE "places"' in text
    assert "AddGeometryColumn('','places','wkt',4326,'POINT',2)" in text
    assert text.count("\\.") == 1
    assert 'USING GIST ("wkt")' in text
    # escaped control chars never appear raw inside the COPY body
    body = text.split("FROM STDIN;\n")[1].split("\\.")[0]
    assert "\r" not in body
    back = pgdump.read_pgdump(spark, path)
    assert back.count() == 5


def test_hexewkb_srid_flag(spark):
    df = spark.range(1).select(F.lit("POINT (1 2)").alias("w"))
    h = df.select(pgdump.wkt_to_hexewkb("w", srid=3857).alias("h")).first().h
    # byte order 01, type 00000020 (LE 01000020 = point | SRID flag),
    # srid 3857 = 0x0F11
    assert h.startswith("0101000020110F0000")
    wkt = df.select(pgdump.hexewkb_to_wkt(
        pgdump.wkt_to_hexewkb("w", srid=3857)).alias("t")).first().t
    assert wkt == "POINT(1.0000000 2.0000000)"  # engine canonical form


def test_null_handling(spark, tmp_path):
    df = spark.createDataFrame([(1, None)], "fid long, name string")
    path = str(tmp_path / "n.sql")
    pgdump.write_pgdump(df, path, "t", single_file=True)
    assert "\t\\N" in open(path).read()
    r = pgdump.read_pgdump(spark, path).first()
    assert r.fid == 1 and r.name is None


def test_body_formatting_is_jvm_side(spark):
    """Scalar-only dumps must not spawn Python workers: the body plan
    has no Python eval nodes (geometry is the only pandas UDF)."""
    df = _fixture(spark).select("fid", "name", "score")
    body = pgdump._body_lines(df, ["fid", "name", "score"], None, 0)
    plan = body._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Arrow" not in plan
