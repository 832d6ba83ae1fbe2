"""Checkpoint/resume + lineage/metrics contract."""

import pytest

from gdal_spark import synth
from gdal_spark.checkpoint import Checkpointer


def test_stage_runs_once_and_resumes(spark, tmp_path):
    cp = Checkpointer(spark, str(tmp_path), run_id="t1")
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return synth.documents_df(spark, 200)

    a = cp.stage("docs", build)
    assert a.count() == 200 and calls["n"] == 1
    b = cp.stage("docs", build)  # resume: build not invoked again
    assert b.count() == 200 and calls["n"] == 1

    m = cp.metrics().collect()
    assert len(m) == 1
    assert m[0]["stage"] == "docs" and m[0]["rows"] == 200
    assert m[0]["rows_per_sec"] > 0

    lin = cp.lineage().collect()
    assert sum(r["rows"] for r in lin) == 200
    assert all(r["run_id"] == "t1" for r in lin)


def test_downstream_stage_reads_checkpoint(spark, tmp_path):
    cp = Checkpointer(spark, str(tmp_path))
    docs = cp.stage("docs", lambda: synth.documents_df(spark, 100))
    filtered = cp.stage("filtered", lambda: docs.limit(10))
    assert filtered.count() == 10
    assert cp.exists("docs") and cp.exists("filtered")
