"""Editable layers: CRUD batches + snapshot tables with time travel.

The reference's editable-layer surface — CreateFeature / SetFeature /
DeleteFeature wrapped in transactions (generic/ogrlayer.cpp:626,587,
1547; transactions :912-966; OGREditableLayer decorator,
generic/ogreditablelayer.cpp) — restated for an immutable-files world:

  merge_upsert   one MERGE-shaped DataFrame op: a change batch with an
                 _op column ('upsert' | 'delete') applied against the
                 base by key — the exact semantics Iceberg's
                 MERGE INTO would run; expressed with an anti-join +
                 union so it works on plain parquet too
  SnapshotTable  append-only snapshot directories + an atomically
                 swapped _current pointer: commit() = transaction,
                 read(snapshot=N) = time travel, rollback(N) = instant
                 revert. This is Iceberg's snapshot model in miniature
                 (same atomicity primitive: one pointer swap); swap
                 for df.writeTo(tbl) / snapshot_id() on a real catalog.

Every snapshot commit records row count + wall seconds into the same
_metrics table the stage checkpointer uses.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_upsert(base: DataFrame, changes: DataFrame, key: str) -> DataFrame:
    """Apply a change batch to `base`:
      - rows with _op='delete' remove the matching key
      - rows with _op='upsert' replace (or insert) the key's row
    Deterministic one-row-per-key output; `changes` must not repeat a
    key (enforce upstream with a window if needed)."""
    touched = changes.select(key).distinct()
    survivors = base.join(touched, key, "left_anti")
    upserts = changes.filter(F.col("_op") == "upsert").drop("_op")
    return survivors.unionByName(upserts)


class SnapshotTable:
    """Minimal snapshot-pointer table over parquet directories."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # ------------------------------------------------------------- pointers
    def _ptr(self) -> str:
        return os.path.join(self.root, "_current")

    def current_snapshot(self) -> int | None:
        try:
            with open(self._ptr()) as f:
                return int(json.load(f)["snapshot"])
        except FileNotFoundError:
            return None

    def _snap_dir(self, n: int) -> str:
        return os.path.join(self.root, f"snapshot-{n:06d}")

    # --------------------------------------------------------------- commit
    def commit(self, df: DataFrame) -> int:
        """Write df as the next snapshot and atomically swap the
        pointer (the transaction boundary — readers see the old
        snapshot until the single rename)."""
        t0 = time.time()
        cur = self.current_snapshot()
        nxt = 0 if cur is None else cur + 1
        path = self._snap_dir(nxt)
        df.write.mode("overwrite").parquet(path)
        rows = self.spark.read.parquet(path).count()
        tmp = self._ptr() + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"snapshot": nxt, "rows": rows,
                       "committed_unix": time.time()}, f)
        os.replace(tmp, self._ptr())  # atomic pointer swap
        metrics = self.spark.createDataFrame(
            [
                {
                    "run_id": "snapshots", "stage": f"snapshot-{nxt}",
                    "rows": rows, "seconds": float(time.time() - t0),
                    "rows_per_sec": float(rows / max(time.time() - t0, 1e-9)),
                    "finished_unix": time.time(),
                }
            ]
        )
        metrics.write.mode("append").parquet(os.path.join(self.root, "_metrics"))
        return nxt

    # ----------------------------------------------------------------- read
    def read(self, snapshot: int | None = None) -> DataFrame:
        n = snapshot if snapshot is not None else self.current_snapshot()
        if n is None:
            raise FileNotFoundError(f"no snapshot committed in {self.root}")
        return self.spark.read.parquet(self._snap_dir(n))

    def rollback(self, snapshot: int) -> None:
        """Point _current back at an earlier snapshot (no data moves)."""
        if not os.path.exists(self._snap_dir(snapshot)):
            raise FileNotFoundError(f"snapshot {snapshot} does not exist")
        tmp = self._ptr() + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"snapshot": snapshot, "rolled_back": True,
                       "committed_unix": time.time()}, f)
        os.replace(tmp, self._ptr())

    # ------------------------------------------------------------ mutations
    def apply_changes(self, changes: DataFrame, key: str) -> int:
        """Transactionally apply a CRUD batch: read current, MERGE,
        commit as a new snapshot."""
        return self.commit(merge_upsert(self.read(), changes, key))


def build_junction_table(df: DataFrame, id_col: str, href_col: str,
                         out_first: str, out_second: str) -> DataFrame:
    """ogr_build_junction_table (osgeo_utils/samples/
    ogr_build_junction_table.py): flatten a (gml_id, xlink:href[s])
    layer into a (first_gml_id, second_gml_id) junction table, leading
    '#' stripped from each href. href_col may be a string or an
    array<string> (OFTStringList). Map-only: explode + project; the
    reference's CREATE INDEX statements are Catalyst's job here."""
    from pyspark.sql import types as T

    c = F.col(href_col)
    if not isinstance(df.schema[href_col].dataType, T.ArrayType):
        c = F.array(c)
    return df.select(
        F.col(id_col).cast("string").alias(out_first),
        F.explode(c).alias("_href"),
    ).select(
        out_first,
        F.regexp_replace(F.col("_href"), "^#", "").alias(out_second),
    )
