"""Cloud-optimized (COG-style) storage layout planning.

GDAL's COG driver lays a raster out as: overview levels first
(coarsest to finest), then the full-resolution tiles, each level's
tiles in a spatially coherent order, with every tile's byte offset
known up front (frmts/cog/cogdriver.cpp; the layout perf matrix is
gdal/perftests/cog.py). For a tile TABLE the same idea is a write
plan: a deterministic (level, key) ordering plus an exclusive byte
offset per tile — which is also exactly Iceberg-style Z-order
clustering of the tile table (repartitionByRange on the interleaved
key gives the spatial locality a 100 TB scan wants).

Scale shape: the Morton key is pure JVM bit arithmetic (whole-stage
codegen). Offsets are computed WITHOUT a global single-partition
window: a per-level running sum (window partitioned by level) plus
per-level base offsets from a tiny per-level aggregate joined back
broadcast — the classic two-level scan that keeps every stage
parallel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_DTYPE_BYTES = {
    "uint8": 1, "int16": 2, "uint16": 2, "int32": 4, "uint32": 4,
    "float32": 4, "float64": 8,
}


def _spread16(x: Column) -> Column:
    """Interleave-ready bit spread of a 16-bit value (classic Morton
    magic masks), all JVM bitwise ops."""
    x = x.cast("long").bitwiseAND(F.lit(0xFFFF))
    x = (x.bitwiseOR(F.shiftleft(x, 8))).bitwiseAND(F.lit(0x00FF00FF))
    x = (x.bitwiseOR(F.shiftleft(x, 4))).bitwiseAND(F.lit(0x0F0F0F0F))
    x = (x.bitwiseOR(F.shiftleft(x, 2))).bitwiseAND(F.lit(0x33333333))
    x = (x.bitwiseOR(F.shiftleft(x, 1))).bitwiseAND(F.lit(0x55555555))
    return x


def morton_key(x: Column, y: Column) -> Column:
    """Z-order (Morton) interleave of two 16-bit tile coordinates."""
    return _spread16(x).bitwiseOR(F.shiftleft(_spread16(y), 1))


def cog_plan(tiles: DataFrame) -> DataFrame:
    """Write plan for a (possibly multi-level) tile table: one row per
    tile with its level (zoom; coarser = written first, like COG's
    overviews-before-full-res), Morton key, within-level sequence,
    byte size, and exclusive global byte offset."""
    dt = F.lit(None).cast("long")
    for name, nb in _DTYPE_BYTES.items():
        dt = F.when(F.col("dtype") == name, F.lit(nb)).otherwise(dt)
    t = tiles.select(
        "raster_id", "band", "zoom", "tile_x", "tile_y",
        morton_key(F.col("tile_x"), F.col("tile_y")).alias("morton"),
        (F.col("width").cast("long") * F.col("height") * dt).alias("nbytes"),
    )
    # per-level running sum (parallel across levels) ...
    w = (
        Window.partitionBy("raster_id", "band", "zoom")
        .orderBy("morton", "tile_x", "tile_y")
    )
    t = t.withColumn("seq", F.row_number().over(w) - 1).withColumn(
        "local_off", F.sum("nbytes").over(w) - F.col("nbytes")
    )
    # ... plus tiny per-level totals -> base offsets, joined broadcast.
    # zoom ASC = coarsest first (overviews lead the file, COG order).
    totals = (
        t.groupBy("raster_id", "band", "zoom")
        .agg(F.sum("nbytes").alias("lv_bytes"))
    )
    wl = (
        Window.partitionBy("raster_id", "band")
        .orderBy("zoom")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bases = totals.withColumn(
        "base", F.coalesce(F.sum("lv_bytes").over(wl), F.lit(0))
    ).select("raster_id", "band", "zoom", "base")
    return (
        t.join(F.broadcast(bases), on=["raster_id", "band", "zoom"])
        .select(
            "raster_id", "band", "zoom", "tile_x", "tile_y",
            "morton", "seq", "nbytes",
            (F.col("base") + F.col("local_off")).alias("offset"),
        )
    )


def cluster_zorder(df: DataFrame, x_col: str, y_col: str,
                   num_partitions: int | None = None) -> DataFrame:
    """Iceberg-style Z-order clustering: repartitionByRange on the
    Morton key, rows sorted by it within partitions — neighboring
    tiles/cells land in the same files, so a spatial range scan prunes
    to a handful of partitions instead of all of them."""
    key = morton_key(F.col(x_col), F.col(y_col)).alias("_z")
    d = df.withColumn("_z", key)
    n = num_partitions or d.rdd.getNumPartitions()
    return d.repartitionByRange(n, "_z").sortWithinPartitions("_z").drop("_z")
