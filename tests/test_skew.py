"""Skew utilities: salted join must preserve join semantics while
spreading a hot key across reducers; cell-prefix repartition must
produce spatially contiguous partitions."""

import pandas as pd
from pyspark.sql import functions as F

from gdal_spark.skew import repartition_by_cell_prefix, salted_join


def test_salted_join_same_result(spark):
    # big side: one hot key (90% of rows) + tail
    big = spark.createDataFrame(
        pd.DataFrame(
            {"k": ["hot"] * 900 + [f"t{i}" for i in range(100)],
             "v": list(range(1000))}
        )
    )
    small = spark.createDataFrame(
        pd.DataFrame({"k": ["hot"] + [f"t{i}" for i in range(0, 100, 2)],
                      "w": list(range(51))})
    )
    plain = big.join(small, "k").groupBy("k").agg(
        F.count("*").alias("n"), F.sum("v").alias("sv"), F.sum("w").alias("sw")
    ).toPandas().sort_values("k").reset_index(drop=True)
    salted = salted_join(big, small, "k", salt=8).groupBy("k").agg(
        F.count("*").alias("n"), F.sum("v").alias("sv"), F.sum("w").alias("sw")
    ).toPandas().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(plain, salted)


def test_salted_join_spreads_hot_key(spark):
    big = spark.createDataFrame(
        pd.DataFrame({"k": ["hot"] * 1000, "v": list(range(1000))})
    ).repartition(8)
    small = spark.createDataFrame(pd.DataFrame({"k": ["hot"], "w": [1]}))
    j = salted_join(big, small, "k", salt=8)
    per_salt = (
        big.withColumn("_salt", F.pmod(F.monotonically_increasing_id(), F.lit(8)))
        .groupBy("_salt").count().count()
    )
    assert per_salt > 1  # the hot key's rows carry multiple salts
    assert j.count() == 1000


def test_repartition_by_cell_prefix(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"quadkey": [f"{a}{b}{c}" for a in "0123" for b in "0123" for c in "0123"],
                      "x": range(64)})
    )
    out = repartition_by_cell_prefix(df, "quadkey", 1, 4)
    parts = out.select(
        F.spark_partition_id().alias("p"), F.substring("quadkey", 1, 1).alias("pre")
    ).distinct().toPandas()
    # each top-level prefix lands in exactly one partition
    assert parts.groupby("pre")["p"].nunique().max() == 1
