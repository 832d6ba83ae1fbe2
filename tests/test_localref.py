"""Parity pins for localref's from-spec primitives: the pure-Python
xxhash64 must match Spark's JVM expression bit-for-bit (strings, ints,
longs, and the int+array<long> chained form the LSH banding uses) —
otherwise the minhash/simhash VALUES oracles silently diverge."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

import localref as LR


def test_xxh64_string_parity(spark):
    samples = ["", "a", "abc", "w0123 w4567", "x" * 31, "y" * 32, "z" * 100,
               "héllo wörld", "the quick brown fox jumps over the lazy dog"]
    df = spark.createDataFrame(pd.DataFrame({"s": samples}))
    got = [r["h"] for r in df.select(F.xxhash64("s").alias("h")).collect()]
    exp = [LR.xxh64_bytes(s.encode("utf-8")) for s in samples]
    assert got == exp


def test_xxh64_long_int_parity(spark):
    vals = [0, 1, -1, 42, 2**40, -(2**40), 2**62]
    df = spark.createDataFrame(pd.DataFrame({"v": vals}))
    got = [r["h"] for r in df.select(F.xxhash64(F.col("v").cast("long")).alias("h")).collect()]
    exp = [LR.xxh64_long(v) for v in vals]
    assert got == exp

    ints = [0, 1, -1, 7, 2**31 - 1, -(2**31)]
    df2 = spark.createDataFrame(pd.DataFrame({"v": ints}))
    got2 = [r["h"] for r in df2.select(F.xxhash64(F.col("v").cast("int")).alias("h")).collect()]
    exp2 = [LR.xxh64_int(v) for v in ints]
    assert got2 == exp2


def test_xxh64_chain_parity(spark):
    # the minhash banding shape: xxhash64(int_band, slice(array<long>))
    sig = [123456789, -987654321, 5, -6]
    df = spark.createDataFrame(
        pd.DataFrame({"b": [0, 1, 7], "sig": [sig, sig, sig]})
    )
    got = [
        r["h"]
        for r in df.select(
            F.xxhash64(
                F.col("b").cast("int"),
                F.col("sig").cast("array<long>"),
            ).alias("h")
        ).collect()
    ]
    exp = [LR.xxh64_chain_int_longs(b, sig) for b in (0, 1, 7)]
    assert got == exp


def test_values_sql_roundtrip():
    import duckdb

    sql = LR.values_sql(
        [("a", 1, 2.5), ("b", -3, None)],
        ["s", "n", "x"],
        ["varchar", "bigint", "double"],
    )
    got = duckdb.connect().execute(sql).fetchall()
    assert got == [("a", 1, 2.5), ("b", -3, None)]
