"""ogrmerge field strategies (osgeo_utils/ogrmerge.py): Union /
Intersection / FirstLayer schemas, NULL fill, provenance column, and
the no-shuffle plan shape."""

import pandas as pd
import pytest

from gdal_spark.ogrmerge import ogr_merge


def _layers(spark):
    a = spark.createDataFrame(pd.DataFrame(
        {"fid": [1, 2], "name": ["a", "b"], "pop": [10, 20]}))
    b = spark.createDataFrame(pd.DataFrame(
        {"fid": [3], "name": ["c"], "area": [1.5]}))
    return [("da", "la", a), ("db", "lb", b)]


def test_union_strategy_fills_nulls(spark):
    out = ogr_merge(_layers(spark), "Union",
                    src_layer_field_name="src").orderBy("fid")
    assert out.columns == ["fid", "name", "pop", "area", "src"]
    rows = out.collect()
    assert rows[0]["pop"] == 10 and rows[0]["area"] is None
    assert rows[2]["pop"] is None and rows[2]["area"] == 1.5
    assert rows[0]["src"] == "da/la" and rows[2]["src"] == "db/lb"


def test_intersection_and_firstlayer(spark):
    out = ogr_merge(_layers(spark), "Intersection")
    assert out.columns == ["fid", "name"]
    assert out.count() == 3
    out = ogr_merge(_layers(spark), "FirstLayer")
    assert out.columns == ["fid", "name", "pop"]
    assert [r["pop"] for r in out.orderBy("fid").collect()] == [10, 20, None]


def test_src_content_template_and_bad_strategy(spark):
    out = ogr_merge(_layers(spark), "Union", src_layer_field_name="s",
                    src_layer_field_content="{LAYER_NAME}")
    assert sorted({r["s"] for r in out.collect()}) == ["la", "lb"]
    with pytest.raises(ValueError):
        ogr_merge(_layers(spark), "Merge")


def test_merge_is_shuffle_free(spark):
    out = ogr_merge(_layers(spark), "Union")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
