"""Textual OGR SQL dialect: parser + semantics end-to-end."""

import pandas as pd
import pytest

from gdal_spark.ogr_sql_exec import execute_ogr_sql


@pytest.fixture()
def layers(spark):
    poly = spark.createDataFrame(
        pd.DataFrame(
            {
                "fid": [1, 2, 3, 4, 5],
                "prfedea": ["AA1", "aa1", "BB2", "CC3", "CC3"],
                "eas_id": [158, 165, 170, 179, 185],
                "area": [5268.8, 1634.5, 5268.8, 100.0, 9999.9],
            }
        )
    )
    other = spark.createDataFrame(
        pd.DataFrame({"eas_id": [158, 158, 170], "tag": ["x", "y", "z"]})
    )
    return {"poly": poly, "other": other}


def test_where_ci_eq_and_orderby(spark, layers):
    out = execute_ogr_sql(
        spark,
        "SELECT fid, prfedea FROM poly WHERE prfedea = 'aa1' ORDER BY fid",
        layers,
    ).collect()
    assert [r["fid"] for r in out] == [1, 2]  # ci '='


def test_inequality_stays_sensitive(spark, layers):
    out = execute_ogr_sql(
        spark, "SELECT fid FROM poly WHERE prfedea < 'BB2'", layers
    ).collect()
    # case-sensitive '<': 'AA1' < 'BB2' only ('aa1' > 'BB2' in ASCII)
    assert sorted(r["fid"] for r in out) == [1]


def test_aggregates_and_arith(spark, layers):
    row = execute_ogr_sql(
        spark,
        "SELECT COUNT(*) AS n, MIN(eas_id) AS mn, MAX(area) / 2 AS half FROM poly",
        layers,
    ).collect()[0]
    assert (row["n"], row["mn"]) == (5, 158)
    assert row["half"] == pytest.approx(9999.9 / 2)


def test_first_match_left_join(spark, layers):
    out = execute_ogr_sql(
        spark,
        "SELECT fid, tag FROM poly LEFT JOIN other ON poly.eas_id = other.eas_id "
        "ORDER BY fid",
        layers,
    ).collect()
    tags = [r["tag"] for r in out]
    # eas 158 has TWO matches -> exactly one row, first in FID order ('x')
    assert len(out) == 5
    assert tags[0] == "x" and tags[2] == "z" and tags[1] is None


def test_distinct_ci_in_between_like_limit(spark, layers):
    vals = [r[0] for r in execute_ogr_sql(
        spark, "SELECT DISTINCT prfedea FROM poly", layers
    ).collect()]
    assert sorted(vals) == ["AA1", "BB2", "CC3"]  # first spelling kept
    out = execute_ogr_sql(
        spark,
        "SELECT fid FROM poly WHERE eas_id IN (158, 170) OR area BETWEEN 90 AND 110",
        layers,
    ).collect()
    assert sorted(r["fid"] for r in out) == [1, 3, 4]
    out2 = execute_ogr_sql(
        spark,
        "SELECT fid FROM poly WHERE prfedea ILIKE 'aa%' ORDER BY fid DESC LIMIT 1",
        layers,
    ).collect()
    assert out2[0]["fid"] == 2


def test_in_list_negative_literals(spark, layers):
    # ADVICE r2: 'x IN (-1, 2)' must parse the unary minus
    out = execute_ogr_sql(
        spark,
        "SELECT fid FROM poly WHERE fid - 2 IN (-1, 2)",
        layers,
    ).collect()
    assert sorted(r["fid"] for r in out) == [1, 4]


def test_summary_aggregates(spark, layers):
    out = execute_ogr_sql(
        spark,
        "SELECT COUNT(*) AS n, COUNT(DISTINCT eas_id) AS ne, "
        "MIN(area) AS mn, MAX(area) AS mx, SUM(area) AS s FROM poly",
        layers,
    ).collect()[0]
    assert out["n"] == 5 and out["ne"] == 5
    assert out["mn"] == 100.0 and out["mx"] == 9999.9


def test_union_all_and_cast(spark, layers):
    out = execute_ogr_sql(
        spark,
        "SELECT fid, CAST(area AS integer) AS a FROM poly WHERE area > 6000 "
        "UNION ALL SELECT fid, eas_id AS a FROM poly WHERE fid = 1",
        layers,
    ).collect()
    assert sorted((r["fid"], r["a"]) for r in out) == [(1, 158), (5, 9999)]


def test_modulo_and_cast_geometry(spark, layers):
    out = execute_ogr_sql(
        spark, "SELECT fid, fid % 3 AS m FROM poly ORDER BY fid", layers
    ).collect()
    assert [r["m"] for r in out] == [1, 2, 0, 1, 2]
    g = spark.createDataFrame(
        [("POLYGON((5 0, 5 5, 0 5, 0 0, 5 0))",)], ["wkt"]
    )
    out2 = execute_ogr_sql(
        spark, "SELECT CAST(wkt AS geometry) AS geom FROM g", {"g": g}
    ).collect()
    assert out2[0]["geom"] == (
        "POLYGON((0.0000000 0.0000000, 5.0000000 0.0000000, "
        "5.0000000 5.0000000, 0.0000000 5.0000000, 0.0000000 0.0000000))"
    )


def test_hstore_get_value_textual(spark):
    from gdal_spark.ogr_sql_exec import execute_ogr_sql

    hs = spark.createDataFrame(
        [(1, '"name"=>"alpha", "rk"=>"3"'), (2, '"name"=>"beta"')],
        ["fid", "hs"],
    )
    out = execute_ogr_sql(
        spark,
        "SELECT fid, HSTORE_GET_VALUE(hs, 'name') AS nm, "
        "HSTORE_GET_VALUE(hs, 'rk') AS rk FROM h ORDER BY fid",
        {"h": hs},
    ).collect()
    assert [(r["nm"], r["rk"]) for r in out] == [("alpha", "3"), ("beta", None)]


def test_hstore_nonliteral_key_rejected(spark):
    from gdal_spark.ogr_sql_exec import execute_ogr_sql

    hs = spark.createDataFrame([(1, '"a"=>"b"')], ["fid", "hs"])
    with pytest.raises(ValueError):
        execute_ogr_sql(
            spark, "SELECT HSTORE_GET_VALUE(hs, fid) AS v FROM h", {"h": hs}
        )


def test_execute_sqlite_sql_windows_and_st(spark):
    """The SQLite-dialect path: GROUP BY + window + ST_Area in one
    statement (capabilities the OGR dialect lacks)."""
    from gdal_spark.ogr_sql_exec import execute_sqlite_sql

    g = spark.createDataFrame(
        [
            ("a", "POLYGON((0 0, 2 0, 2 2, 0 2, 0 0))"),
            ("a", "POLYGON((0 0, 1 0, 1 1, 0 1, 0 0))"),
            ("b", "POLYGON((0 0, 3 0, 3 3, 0 3, 0 0))"),
        ],
        ["grp", "geom"],
    )
    out = execute_sqlite_sql(
        spark,
        "SELECT grp, COUNT(*) AS n, SUM(ST_Area(geom)) AS a, "
        "RANK() OVER (ORDER BY COUNT(*) DESC, grp) AS rnk "
        "FROM g GROUP BY grp",
        {"g": g},
    ).collect()
    rows = {r["grp"]: (r["n"], r["a"], r["rnk"]) for r in out}
    assert rows["a"] == (2, 5.0, 1)
    assert rows["b"] == (1, 9.0, 2)


def test_like_escape(spark):
    import pandas as pd

    from gdal_spark.ogr_sql_exec import execute_ogr_sql

    df = spark.createDataFrame(
        pd.DataFrame({"fid": [1, 2, 3],
                      "s": ["100%", "100x", "10o%"]})
    )
    out = execute_ogr_sql(
        spark, "SELECT fid FROM t WHERE s LIKE '100!%' ESCAPE '!'",
        {"t": df},
    ).collect()
    assert sorted(r["fid"] for r in out) == [1]  # literal %, not wildcard
