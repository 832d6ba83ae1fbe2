"""Cloud-Optimized GeoTIFF validator — osgeo_utils/samples/
validate_cloud_optimized_geotiff.py restated over the engine's own
TIFF structure parser (geotiff._parse_ifds).

Structural rules (validate() :118-336, message text preserved):
  - overviews must be internal (no sibling `.ovr`);
  - an image larger than 512px on a side must be tiled (strips wider
    than 1024 fail) and should carry internal overviews (warning);
  - IFD offsets must increase along the chain (main, ovr_0, ovr_1…)
    and overview dimensions must descend;
  - data must start with the smallest overview and end with the main
    resolution image (the data_offsets ladder :270-299).

The structural pass is driver-side by design — IFDs are KBs (the
reference reads the same bytes through GDAL). The FULL check
(full_check_band :51-115 — per-block offset ordering) is where a 100
TB file has real row counts, so it runs DISTRIBUTED here: the block
table (one row per tile, straight out of the IFD offset arrays) is
range-partitioned by byte offset and each task verifies in-file
bounds + no inter-block overlap on its slice (partition boundaries
reconciled with #partitions collected head/tail rows); per-IFD
row-major order is a keyed lag over (ifd) — never a global window.
"""

from __future__ import annotations

import os
import struct

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .geotiff import _parse_ifds


def _ifd_offsets(path: str) -> list[int]:
    """Byte offset of every IFD in chain order."""
    with open(path, "rb") as f:
        hdr = f.read(8)
        bo = "<" if hdr[:2] == b"II" else ">"
        (magic,) = struct.unpack(bo + "H", hdr[2:4])
        big = magic == 43
        if big:
            f.seek(8)
            (off,) = struct.unpack(bo + "Q", f.read(8))
        else:
            (off,) = struct.unpack(bo + "I", hdr[4:8])
        offs = []
        while off:
            offs.append(off)
            f.seek(off)
            if big:
                (n,) = struct.unpack(bo + "Q", f.read(8))
                f.seek(off + 8 + 20 * n)
                (off,) = struct.unpack(bo + "Q", f.read(8))
            else:
                (n,) = struct.unpack(bo + "H", f.read(2))
                f.seek(off + 2 + 12 * n)
                (off,) = struct.unpack(bo + "I", f.read(4))
    return offs


def _first_data_offset(tags: dict) -> int:
    offs = tags.get("tile_offsets") or tags.get("strip_offsets") or []
    for o in offs:
        if o:
            return int(o)
    return 0


def cog_structure(path: str) -> tuple[list[str], list[str]]:
    """Driver-side structural pass -> (errors, warnings)."""
    _, ifds = _parse_ifds(path)
    ifd_offs = _ifd_offsets(path)
    errors: list[str] = []
    warnings: list[str] = []
    main = ifds[0]
    ovr_count = len(ifds) - 1

    if os.path.exists(path + ".ovr"):
        errors.append(
            "Overviews found in external .ovr file. They should be internal")

    w0, h0 = main["width"][0], main["height"][0]
    if w0 > 512 or h0 > 512:
        if "tile_offsets" not in main:
            strip_w = w0
            if strip_w > 1024:
                errors.append(
                    "The file is greater than 512xH or Wx512, "
                    "but is not tiled")
        if ovr_count == 0:
            warnings.append(
                "The file is greater than 512xH or Wx512, it is "
                "recommended to include internal overviews")

    for i in range(1, len(ifds)):
        prev, cur = ifds[i - 1], ifds[i]
        if (cur["width"][0] > prev["width"][0]
                or cur["height"][0] > prev["height"][0]):
            if i == 1:
                errors.append(
                    "First overview has larger dimension than main band")
            else:
                errors.append(
                    f"Overview of index {i - 1} has larger dimension "
                    f"than overview of index {i - 2}")
        if "tile_offsets" not in cur and cur["width"][0] > 1024:
            errors.append(f"Overview of index {i - 1} is not tiled")
        if ifd_offs[i] < ifd_offs[i - 1]:
            if i == 1:
                errors.append(
                    f"The offset of the IFD for overview of index 0 is "
                    f"{ifd_offs[i]}, whereas it should be greater than "
                    f"the one of the main image, which is at byte "
                    f"{ifd_offs[i - 1]}")
            else:
                errors.append(
                    f"The offset of the IFD for overview of index "
                    f"{i - 1} is {ifd_offs[i]}, whereas it should be "
                    f"greater than the one of index {i - 2}, which is "
                    f"at byte {ifd_offs[i - 1]}")

    data_offs = [_first_data_offset(t) for t in ifds]
    if data_offs[-1] != 0 and data_offs[-1] < ifd_offs[-1]:
        if ovr_count > 0:
            errors.append(
                "The offset of the first block of the smallest overview "
                "should be after its IFD")
        else:
            errors.append(
                "The offset of the first block of the image should "
                "be after its IFD")
    for i in range(len(data_offs) - 2, 0, -1):
        if data_offs[i] != 0 and data_offs[i] < data_offs[i + 1]:
            errors.append(
                f"The offset of the first block of overview of index "
                f"{i - 1} should be after the one of the overview of "
                f"index {i}")
    if len(data_offs) >= 2 and data_offs[0] != 0 \
            and data_offs[0] < data_offs[1]:
        errors.append(
            "The offset of the first block of the main resolution image "
            f"should be after the one of the overview of index "
            f"{ovr_count - 1}")
    return errors, warnings


def _blocks_df(spark: SparkSession, path: str) -> DataFrame:
    """One row per block straight out of the IFD offset arrays."""
    _, ifds = _parse_ifds(path)
    rows = []
    for k, t in enumerate(ifds):
        offs = t.get("tile_offsets") or t.get("strip_offsets") or []
        cnts = t.get("tile_counts") or t.get("strip_counts") or []
        for b, (o, c) in enumerate(zip(offs, cnts)):
            rows.append((k, b, int(o), int(c)))
    return spark.createDataFrame(
        rows, "ifd int, block int, offset long, nbytes long")


def cog_full_check(spark: SparkSession, path: str) -> DataFrame:
    """Distributed per-block pass -> DataFrame of error strings:
    row-major order within each IFD (BLOCK_ORDER=ROW_MAJOR, the rule
    full_check_band enforces), in-file bounds, and global
    non-overlap."""
    fsize = os.path.getsize(path)
    blocks = _blocks_df(spark, path).filter(F.col("offset") > 0)

    # per-IFD row-major order: keyed lag, never a global window
    w = Window.partitionBy("ifd").orderBy("block")
    order_err = blocks.withColumn("_prev", F.lag("offset").over(w)).filter(
        F.col("_prev").isNotNull() & (F.col("offset") < F.col("_prev"))
    ).select(F.concat(
        F.lit("IFD "), F.col("ifd").cast("string"),
        F.lit(": offset of block "), F.col("block").cast("string"),
        F.lit(" is smaller than previous block")).alias("message"))

    bounds_err = blocks.filter(
        F.col("offset") + F.col("nbytes") > F.lit(fsize)
    ).select(F.concat(
        F.lit("IFD "), F.col("ifd").cast("string"),
        F.lit(": block "), F.col("block").cast("string"),
        F.lit(" extends past end of file")).alias("message"))

    # global overlap: range-partition by offset, check consecutive
    # pairs inside each partition; partition head/tail rows (tiny)
    # reconcile the boundaries driver-side
    ranged = blocks.repartitionByRange(32, "offset") \
        .sortWithinPartitions("offset") \
        .withColumn("pid", F.spark_partition_id())

    def check(batches):
        prev_end, prev_id = None, None
        head_tail = []
        for pdf in batches:
            bad = []
            for r in pdf.itertuples(index=False):
                if prev_end is not None and r.offset < prev_end:
                    bad.append(
                        f"IFD {r.ifd}: block {r.block} overlaps previous "
                        f"block {prev_id}")
                prev_end, prev_id = r.offset + r.nbytes, r.block
                head_tail.append(r)
            out = pd.DataFrame({"message": bad, "kind": "overlap",
                                "pid": -1, "offset": -1, "nbytes": -1}) \
                if bad else pd.DataFrame(
                    columns=["message", "kind", "pid", "offset", "nbytes"])
            yield out
        if head_tail:
            first, last = head_tail[0], head_tail[-1]
            yield pd.DataFrame([
                {"message": "", "kind": "head", "pid": int(first.pid),
                 "offset": int(first.offset), "nbytes": int(first.nbytes)},
                {"message": "", "kind": "tail", "pid": int(last.pid),
                 "offset": int(last.offset), "nbytes": int(last.nbytes)},
            ])

    res = ranged.mapInPandas(
        check, schema=("message string, kind string, pid int, "
                       "offset long, nbytes long")).cache()
    overlap_err = res.filter(F.col("kind") == "overlap").select("message")

    # boundary reconciliation: #partitions rows
    marks = sorted(
        res.filter(F.col("kind") != "overlap").collect(),
        key=lambda r: (r.pid, 0 if r.kind == "head" else 1))
    boundary = []
    for a, b in zip(marks[1::2], marks[2::2]):  # tail_i vs head_{i+1}
        if b.offset < a.offset + a.nbytes:
            boundary.append((f"block at offset {b.offset} overlaps "
                             f"partition-boundary block at {a.offset}",))
    bdf = spark.createDataFrame(boundary, "message string") if boundary \
        else spark.createDataFrame([], "message string")
    return order_err.unionByName(bounds_err).unionByName(overlap_err) \
        .unionByName(bdf)


def validate_cog(spark: SparkSession, path: str, *,
                 full_check: bool = False) -> DataFrame:
    """(severity, message) rows; empty error set = valid COG."""
    errors, warnings = cog_structure(path)
    rows = [("ERROR", m) for m in errors] + \
        [("WARNING", m) for m in warnings]
    df = spark.createDataFrame(rows, "severity string, message string") \
        if rows else spark.createDataFrame([], "severity string, "
                                               "message string")
    if full_check:
        df = df.unionByName(
            cog_full_check(spark, path)
            .select(F.lit("ERROR").alias("severity"), "message"))
    return df
