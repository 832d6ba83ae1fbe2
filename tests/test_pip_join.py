"""E2E golden test for the PIP spatial join (FIXTURES.md golden #1, #3).

Semantics under test = OGRLayer::FilterGeometry staged predicate
(gdal/ogr/ogrsf_frmts/generic/ogrlayer.cpp:1357) with OGR SQL LEFT JOIN
row shape (ogr_sql_dialect.rst:483-490): exactly one output row per doc,
NULL zone columns when nothing intersects.
"""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from gdal_spark import synth
from gdal_spark.joins import pip_join, pip_join_full

from .oracle import pip_oracle, span_tuples

N_DOCS = 2000
N_ZONES = 16


def _result(spark, mode):
    docs = synth.documents_df(spark, N_DOCS)
    zones = synth.zones_np(N_ZONES)
    out = pip_join_full(spark, docs, zones, mode=mode)
    return out.select("doc_id", "zone_id", "eas_id", "spans").toPandas()


def test_pip_join_first_match_golden(spark):
    got = _result(spark, "first").sort_values("doc_id").reset_index(drop=True)
    exp = (
        pip_oracle(synth.documents_np(N_DOCS), synth.zones_np(N_ZONES), "first")
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(got) == N_DOCS == len(exp)
    pd.testing.assert_frame_equal(
        got[["doc_id", "zone_id", "eas_id"]].astype({"zone_id": "float64", "eas_id": "float64"}),
        exp[["doc_id", "zone_id", "eas_id"]].astype({"zone_id": "float64", "eas_id": "float64"}),
    )
    # some docs match and some don't (NULL leg is exercised)
    assert got["zone_id"].notna().sum() > 0.5 * N_DOCS
    assert got["zone_id"].isna().sum() > 0


def test_pip_join_all_mode_golden(spark):
    got = (
        _result(spark, "all")[["doc_id", "zone_id", "eas_id"]]
        .sort_values(["doc_id", "zone_id"])
        .reset_index(drop=True)
    )
    exp = (
        pip_oracle(synth.documents_np(N_DOCS), synth.zones_np(N_ZONES), "all")
        .sort_values(["doc_id", "zone_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"zone_id": "float64", "eas_id": "float64"}),
        exp.astype({"zone_id": "float64", "eas_id": "float64"}),
    )


def test_span_order_invariance_through_join(spark):
    """Per-doc ordered (kind, text, media_ref, offset) must equal the
    generation sequence after the join (SURVEY.md §1.1 invariant)."""
    got = _result(spark, "first")
    exp = synth.documents_np(N_DOCS).set_index("doc_id")
    for _, row in got.iterrows():
        assert span_tuples(row["spans"]) == span_tuples(exp.loc[row["doc_id"], "spans"])


def test_pip_join_plan_has_no_shuffle(spark):
    """The join must compile to a single map stage: the spatial index
    rides a broadcast VARIABLE (not even a join node), so the physical
    plan has no Exchange of any kind and exactly one Arrow Python eval
    (the fused parse+locate+match UDF)."""
    docs = synth.documents_df(spark, 100)
    zones = synth.zones_np(N_ZONES)
    out = pip_join_full(spark, docs, zones, mode="first")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert plan.count("ArrowEvalPython") == 1


def test_pip_join_jvm_engine_parity(spark):
    """engine='auto' (pure-JVM Catalyst leg for points + Arrow leg for
    the polygon minority, jvmpip.py) must produce IDENTICAL rows to the
    default Arrow kernel in both modes — the ray cast is
    expression-for-expression the same IEEE-754 arithmetic, so this is
    exact equality, not approximate."""
    docs = synth.documents_df(spark, N_DOCS)
    zones = synth.zones_np(N_ZONES)
    from gdal_spark.index import zone_index

    zidx = zone_index(spark, zones)
    for mode in ("first", "all"):
        cols = ["doc_id", "lon", "lat", "zone_id", "eas_id"]
        a = sorted(map(tuple, pip_join(docs, zidx, mode=mode, engine="arrow").select(*cols).collect()))
        b = sorted(map(tuple, pip_join(docs, zidx, mode=mode, engine="auto").select(*cols).collect()))
        assert a == b
        assert len(a) >= N_DOCS


def test_pip_points_jvm_no_python_in_plan(spark):
    """The JVM leg's physical plan must contain no Python/Arrow eval
    node — that is its entire reason to exist."""
    from gdal_spark import derived as DRV
    from gdal_spark import jvmpip
    from gdal_spark.index import zone_index

    docs = spark.range(0, 1000).select(
        (F.col("id")).alias("doc_id")
    )
    docs = DRV.with_derived_points(docs)
    zidx = zone_index(spark, synth.zones_np(N_ZONES))
    out = jvmpip.pip_points_jvm(docs, zidx.cover_df(spark), zidx.level)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan
    got = out.groupBy().agg(
        F.count("*").alias("n"), F.count("zone_id").alias("m")
    ).collect()[0]
    assert got["n"] == 1000 and got["m"] > 0
