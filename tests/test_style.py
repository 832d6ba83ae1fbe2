"""OGR feature-style strings (ogr/ogr_featurestyle.h): regexp column
extractor, full parser (quoted values, escapes, repeated tools), size
units, and the OGR_STYLE special field resolving a layer's _style."""

import json

from pyspark.sql import functions as F

from gdal_spark.style import (
    ogr_style_parse,
    parse_style,
    style_param,
    style_size,
)


def test_parse_style_basic():
    got = parse_style("PEN(c:#FF0000,w:2px);BRUSH(fc:#0000FF)")
    assert [t["tool"] for t in got] == ["PEN", "BRUSH"]
    assert got[0]["params"] == {"c": "#FF0000", "w": "2px"}
    assert got[1]["params"] == {"fc": "#0000FF"}


def test_parse_style_quoted_and_escaped():
    got = parse_style(
        'LABEL(f:"Arial, Bold",s:12pt,t:"he said \\"hi\\", twice")'
    )
    assert got[0]["params"]["f"] == "Arial, Bold"
    assert got[0]["params"]["t"] == 'he said "hi", twice'
    assert got[0]["params"]["s"] == "12pt"


def test_parse_style_repeated_tools_and_empty():
    got = parse_style("PEN(c:#111111);PEN(c:#222222,w:1g)")
    assert len(got) == 2 and got[1]["params"]["w"] == "1g"
    assert parse_style(None) == [] and parse_style("") == []


def test_style_size_units():
    assert style_size("2px") == (2.0, "px")
    assert style_size("12.5pt") == (12.5, "pt")
    assert style_size("3g") == (3.0, "g")
    assert style_size("7") == (7.0, "px")
    assert style_size("bogus") is None


def test_style_param_column_and_json_udf(spark):
    df = spark.createDataFrame(
        [(1, 'PEN(c:#FF0000,w:2px);LABEL(f:"A, B",s:9pt,t:x)'), (2, None)],
        ["id", "style"],
    )
    row = df.filter("id = 1").select(
        style_param("style", "PEN", "c").alias("c"),
        style_param("style", "PEN", "w").alias("w"),
        style_param("style", "LABEL", "s").alias("s"),
        ogr_style_parse(F.col("style")).alias("js"),
    ).collect()[0]
    assert row["c"] == "#FF0000" and row["w"] == "2px" and row["s"] == "9pt"
    js = json.loads(row["js"])
    assert js[1]["params"]["f"] == "A, B"
    assert df.filter("id = 2").select(
        ogr_style_parse(F.col("style")).alias("js")
    ).collect()[0]["js"] is None


def test_ogr_style_special_field_resolves_layer_style(spark):
    from gdal_spark.ogr_sql_exec import execute_ogr_sql

    lay = spark.createDataFrame(
        [(1, "PEN(c:#AA0000)"), (2, None)], ["fid0", "_style"]
    )
    out = execute_ogr_sql(
        spark,
        "SELECT fid0, OGR_STYLE AS st FROM docs ORDER BY fid0",
        {"docs": lay},
    ).collect()
    assert out[0]["st"] == "PEN(c:#AA0000)" and out[1]["st"] is None
    # and without a _style column the field stays NULL
    lay2 = spark.createDataFrame([(1,)], ["fid0"])
    out2 = execute_ogr_sql(
        spark, "SELECT fid0, OGR_STYLE AS st FROM docs", {"docs": lay2}
    ).collect()
    assert out2[0]["st"] is None
