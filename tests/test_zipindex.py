"""zipindex.with_global_index: partition-offset zip-with-index — the
no-single-partition replacement for global row_number windows."""

from pyspark.sql import functions as F

from gdal_spark.zipindex import with_global_index


def test_unordered_index_is_dense_and_unique(spark):
    df = spark.range(0, 1000).repartition(7)
    out = with_global_index(df, "_ln")
    vals = sorted(r["_ln"] for r in out.select("_ln").collect())
    assert vals == list(range(1000))


def test_ordered_index_ranks_by_key(spark):
    df = spark.range(0, 500).select(
        (F.lit(499) - F.col("id")).alias("k"),  # reverse order
        F.col("id").alias("orig"),
    ).repartition(5)
    out = with_global_index(df, "rk", order_by=["k"])
    got = {r["k"]: r["rk"] for r in out.collect()}
    assert all(got[k] == k for k in range(500))


def test_empty_frame(spark):
    df = spark.range(0).select(F.col("id"))
    out = with_global_index(df, "_ln")
    assert out.count() == 0
    assert "_ln" in out.columns


def test_no_single_partition_exchange_or_window(spark):
    df = spark.range(0, 100).repartition(4)
    out = with_global_index(df, "_ln")
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in p
    assert "SinglePartition" not in p
