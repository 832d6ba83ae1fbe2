"""COG layout planning + Z-order clustering."""

from pyspark.sql import functions as F

from gdal_spark import synth, tiling
from gdal_spark.layout import cluster_zorder, cog_plan, morton_key


def test_morton_key(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (2, 3), (65535, 65535)],
        ["x", "y"],
    )
    got = [
        r[0]
        for r in df.select(morton_key(F.col("x"), F.col("y"))).collect()
    ]
    def ref(x, y):
        m = 0
        for b in range(16):
            m |= ((x >> b) & 1) << (2 * b) | ((y >> b) & 1) << (2 * b + 1)
        return m
    assert got == [ref(x, y) for x, y in
                   [(0, 0), (1, 0), (0, 1), (1, 1), (2, 3), (65535, 65535)]]


def test_cog_plan_offsets(spark):
    base = synth.tiles_src_df(spark, 2, 2)
    ov = tiling.build_overview(base, "average")
    plan = cog_plan(base.unionByName(ov)).collect()
    rows = sorted(plan, key=lambda r: r["offset"])
    # coarsest level leads; offsets are exclusive and contiguous
    assert rows[0]["zoom"] == 11 and rows[0]["offset"] == 0
    off = 0
    for r in rows:
        assert r["offset"] == off
        off += r["nbytes"]
    # within the base level, order follows the Morton curve
    lvl = [r for r in rows if r["zoom"] == 12]
    assert [(r["tile_x"], r["tile_y"]) for r in lvl] == [
        (0, 0), (1, 0), (0, 1), (1, 1)
    ]


def test_cluster_zorder(spark):
    df = spark.range(0, 256).select(
        (F.col("id") % 16).cast("int").alias("cx"),
        (F.col("id") / 16).cast("int").alias("cy"),
    )
    out = cluster_zorder(df, "cx", "cy", num_partitions=4)
    assert out.count() == 256
    # partitions hold contiguous morton ranges: max of partition i
    # stays below min of partition i+1
    parts = out.select(
        F.spark_partition_id().alias("p"),
        morton_key(F.col("cx"), F.col("cy")).alias("z"),
    ).groupBy("p").agg(F.min("z").alias("lo"), F.max("z").alias("hi")) \
        .orderBy("p").collect()
    for a, b in zip(parts, parts[1:]):
        assert a["hi"] <= b["lo"]
