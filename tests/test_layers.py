"""Editable-layer semantics: MERGE upsert/delete batches, snapshot
commits with atomic pointer swap, time travel, rollback."""

import pandas as pd
from pyspark.sql import functions as F

from gdal_spark.layers import SnapshotTable, merge_upsert


def _base(spark):
    return spark.createDataFrame(
        pd.DataFrame({"id": [1, 2, 3, 4], "v": ["a", "b", "c", "d"]})
    )


def test_merge_upsert_semantics(spark):
    base = _base(spark)
    changes = spark.createDataFrame(
        pd.DataFrame(
            {
                "id": [2, 5, 3],
                "v": ["B", "E", None],
                "_op": ["upsert", "upsert", "delete"],
            }
        )
    )
    got = (
        merge_upsert(base, changes, "id")
        .orderBy("id")
        .toPandas()
        .set_index("id")["v"]
        .to_dict()
    )
    assert got == {1: "a", 2: "B", 4: "d", 5: "E"}  # 3 deleted, 2 replaced


def test_snapshot_commit_time_travel_rollback(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    assert t.current_snapshot() is None
    s0 = t.commit(_base(spark))
    assert s0 == 0 and t.current_snapshot() == 0

    changes = spark.createDataFrame(
        pd.DataFrame({"id": [1], "v": ["A"], "_op": ["upsert"]})
    )
    s1 = t.apply_changes(changes, "id")
    assert s1 == 1
    assert t.read().filter(F.col("id") == 1).first()["v"] == "A"
    # time travel: snapshot 0 still has the original row
    assert t.read(snapshot=0).filter(F.col("id") == 1).first()["v"] == "a"

    t.rollback(0)
    assert t.current_snapshot() == 0
    assert t.read().filter(F.col("id") == 1).first()["v"] == "a"
    # metrics recorded per commit
    m = spark.read.parquet(str(tmp_path / "tbl" / "_metrics"))
    assert m.count() == 2
