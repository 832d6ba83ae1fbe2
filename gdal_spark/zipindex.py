"""Shuffle-light global row numbering (zip-with-index semantics).

The naive way to number rows in Spark is
`row_number().over(Window.orderBy(...))` with no partitionBy — which
collapses the whole input into ONE partition (WindowExec: "No Partition
Defined ... Moving all data to a single partition"). On a source
operator that is a total-sort scale-killer: a 100 TB GeoJSONSeq scan
would funnel through a single reducer.

This module implements the classic two-pass zip-with-index instead:

1. count rows per physical partition (`spark_partition_id`) — a tiny
   job whose shuffle carries exactly one row per partition;
2. prefix-sum those counts on the driver (bytes of state, not rows)
   and broadcast them back as a literal map;
3. add the partition-local record number (the low 33 bits of
   `monotonically_increasing_id`, which Spark defines as
   `(partition_id << 33) | record_in_partition`) to the partition's
   offset.

No global sort, no single-partition Exchange; cost is one extra pass
over the (deterministic) upstream plan. For an ORDERED index —
OGR SQL's FID special field is "0-based position in layer order"
(`gdal/ogr/ogrfeaturequery.cpp:55`, ogr_sql_dialect.rst FID) — the
input is first parallel-total-sorted with
`repartitionByRange(...).sortWithinPartitions(...)`, the distributed
sort Spark itself uses for ORDER BY, and then numbered the same way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_LOCAL_MASK = (1 << 33) - 1


def with_global_index(df: DataFrame, name: str = "_ln",
                      order_by: list | None = None) -> DataFrame:
    """Add a 0-based int64 global row index column `name`.

    Without `order_by` the index follows physical partition order —
    for file-backed sources (spark.read.text) that is file/byte order,
    i.e. exactly what a sequential reader would assign. With
    `order_by` the frame is range-partitioned and sorted first, so the
    index is the row's rank in that total order (ties broken by
    partition placement, like any distributed row_number).
    """
    if order_by:
        df = df.repartitionByRange(*order_by).sortWithinPartitions(*order_by)
    # monotonically_increasing_id is nondeterministic-flagged, so
    # Catalyst will not push this Project below the sort above.
    part = df.withColumn("_zmid", F.monotonically_increasing_id())
    counts = {
        int(r["_zpid"]): int(r["cnt"])
        for r in part.select(
            F.shiftright("_zmid", 33).cast("int").alias("_zpid")
        ).groupBy("_zpid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for p in sorted(counts):
        offsets[p] = acc
        acc += counts[p]
    if not offsets:
        return df.withColumn(name, F.lit(None).cast("long")).where(F.lit(False))
    off_map = F.create_map(
        *[F.lit(v) for kv in offsets.items() for v in kv]
    )
    out = part.withColumn(
        name,
        (off_map[F.shiftright("_zmid", 33).cast("int")]
         + F.col("_zmid").bitwiseAND(F.lit(_LOCAL_MASK))).cast("long"),
    )
    return out.drop("_zmid")
