"""OGR SQL semantic-shim golden cases (FIXTURES.md golden #6) — small
hand-curated expectations mirroring autotest/ogr/ogr_sql_test.py idioms."""

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from gdal_spark import ogrsql as Q


def _layer(spark):
    rows = [
        Row(fid=1, name="Alpha", val=10, ts=datetime.datetime(2024, 1, 1, 0, 0, 0)),
        Row(fid=2, name="ALPHA", val=20, ts=datetime.datetime(2024, 1, 3, 0, 0, 0)),
        Row(fid=3, name="beta", val=30, ts=datetime.datetime(2024, 1, 5, 0, 0, 0)),
        Row(fid=4, name="Beta_x", val=40, ts=datetime.datetime(2024, 1, 7, 0, 0, 0)),
        Row(fid=5, name=None, val=50, ts=datetime.datetime(2024, 1, 9, 0, 0, 0)),
    ]
    return spark.createDataFrame(rows)


def test_ci_eq_vs_case_sensitive_lt(spark):
    """'=' case-insensitive; '<' case-sensitive (ogr_sql_dialect.rst:261-275)."""
    df = _layer(spark)
    assert df.filter(Q.ci_eq("name", "alpha")).count() == 2
    assert df.filter(F.col("name") == "alpha").count() == 0
    # '<' stays binary/case-sensitive: 'Beta_x' < 'beta' (uppercase B sorts first)
    assert df.filter(F.col("name") < "beta").count() == 3


def test_like_ilike(spark):
    """LIKE case-sensitive since GDAL 3.1; ILIKE insensitive
    (swq_op_general.cpp:56; ogr_sql_dialect.rst:277-299)."""
    df = _layer(spark)
    assert df.filter(Q.ogr_like("name", "Alp%")).count() == 1
    assert df.filter(Q.ogr_ilike("name", "alp%")).count() == 2
    assert df.filter(Q.ogr_like("name", "Beta!_%", escape="!")).count() == 1


def test_distinct_ci_keeps_first_spelling(spark):
    """DISTINCT case-insensitive, first-seen spelling wins (swq.cpp:342-386)."""
    df = _layer(spark)
    got = sorted(
        r[0] for r in Q.distinct_ci(df.filter(F.col("name").isNotNull()), "name", "fid").collect()
    )
    assert got == ["Alpha", "Beta_x", "beta"]


def test_first_match_left_join(spark):
    """One row per primary row, FIRST matching secondary, NULLs when none
    (ogr_gensql.cpp:1292-1323; ogr_sql_dialect.rst:483-490)."""
    left = spark.createDataFrame([Row(k=1, a="x"), Row(k=2, a="y"), Row(k=3, a="z")])
    right = spark.createDataFrame(
        [Row(k=1, rfid=11, b="first"), Row(k=1, rfid=12, b="second"), Row(k=2, rfid=21, b="only")]
    )
    got = (
        Q.first_match_left_join(left, right, "k", right_order="rfid")
        .orderBy("k")
        .collect()
    )
    assert len(got) == 3
    assert got[0]["b"] == "first"
    assert got[1]["b"] == "only"
    assert got[2]["b"] is None


def test_substr_negative_start(spark):
    """SUBSTR 1-based with negative start (ogr_sql_dialect.rst:153-168)."""
    df = spark.createDataFrame([Row(s="ABCDEF")])
    assert df.select(Q.substr_ogr("s", 2, 3).alias("r")).first()["r"] == "BCD"
    assert df.select(Q.substr_ogr("s", -2).alias("r")).first()["r"] == "EF"


def test_hstore_get_value(spark):
    df = spark.createDataFrame([Row(h='"a"=>"x", "b"=>"y"'), Row(h="k=>v"), Row(h="")])
    got = df.select(Q.hstore_get_value("h", "b").alias("r")).collect()
    assert [r["r"] for r in got] == ["y", None, None]
    assert df.select(Q.hstore_get_value("h", "k").alias("r")).collect()[1]["r"] == "v"


def test_summary_aggregates_and_avg_timestamp(spark):
    """SUMMARY_RECORD: COUNT/MIN/MAX/AVG/SUM in one all-aggregate select;
    AVG(datetime) via unix seconds (ogr_gensql.cpp:1010-1027)."""
    df = _layer(spark)
    r = df.agg(
        F.count("*").alias("cnt"),
        F.count_distinct(F.lower("name")).alias("cnt_distinct"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
        F.avg("val").alias("avg_val"),
        F.sum("val").alias("sum_val"),
        Q.avg_timestamp("ts").alias("avg_ts"),
    ).first()
    assert (r["cnt"], r["cnt_distinct"], r["min_val"], r["max_val"]) == (5, 3, 10, 50)
    assert (r["avg_val"], r["sum_val"]) == (30.0, 150)
    assert r["avg_ts"] == datetime.datetime(2024, 1, 5, 0, 0, 0)


def test_union_all_superset_schema(spark):
    """UNION ALL with differing schemas -> superset, NULL-filled
    (ogr_sql_dialect.rst:492-513)."""
    a = spark.createDataFrame([Row(x=1, y="a")])
    b = spark.createDataFrame([Row(x=2, z=9.5)])
    got = Q.union_all_layers([a, b], layer_names=["la", "lb"]).orderBy("x").collect()
    assert set(got[0].asDict().keys()) == {"x", "y", "z", "layer_name"}
    assert got[0]["z"] is None and got[1]["y"] is None
    assert [r["layer_name"] for r in got] == ["la", "lb"]


def test_extent(spark):
    df = spark.createDataFrame(
        [Row(lon=-10.0, lat=5.0), Row(lon=20.0, lat=-3.0), Row(lon=0.0, lat=8.0)]
    )
    r = Q.extent(df).first()
    assert (r["xmin"], r["ymin"], r["xmax"], r["ymax"]) == (-10.0, -3.0, 20.0, 8.0)


def test_first_match_join_strategy(spark):
    """VERDICT r1 #6 done-criterion: the default no longer forces a
    broadcast — strategy is explicit via the tri-state option."""
    import pandas as pd
    from pyspark.sql import functions as F

    from gdal_spark.ogrsql import first_match_left_join

    left = spark.createDataFrame(pd.DataFrame({"k": range(200), "a": range(200)}))
    right = spark.createDataFrame(
        pd.DataFrame({"k": [i % 50 for i in range(400)], "fid": range(400)})
    )
    plan_b = first_match_left_join(
        left, right, "k", right_order="fid", broadcast=True
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan_b
    plan_s = first_match_left_join(
        left, right, "k", right_order="fid", broadcast=False
    )._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan_s and "BroadcastHashJoin" not in plan_s
