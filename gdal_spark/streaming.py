"""Structured Streaming composition — incremental ingestion through
the SAME engine operators.

GDAL itself is batch-only (progress callbacks, no checkpoint model —
SURVEY.md §1.3), and the north rule's resumability is satisfied by the
batch snapshot checkpointer (checkpoint.py). This module is the
Spark-native bonus: because the PIP join + tile assignment are
STATELESS map-stage transformations (broadcast index, no shuffle),
they compose unchanged with readStream/writeStream — a document stream
is tiled and zone-joined incrementally with exactly-once file-sink
semantics and the stream's own checkpoint for resume.

  stream_pip_tiles(spark, input_dir, zindex, zoom, out_dir, ckpt_dir)
      file-source stream over document parquet drops -> fused PIP
      zone join -> tile assignment -> parquet append sink.

Stateful streaming (watermarked windows, applyInPandasWithState) is
out of scope: the reference has no streaming semantics to match, and
the engine's aggregations are batch by design.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from . import tiling
from .index import ZoneIndex
from .joins import pip_join


def stream_pip_tiles(
    spark: SparkSession,
    input_dir: str,
    schema,
    zindex: ZoneIndex,
    zoom: int,
    out_dir: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """Start (and return) the streaming query. With
    trigger_available_now=True it drains everything currently in
    input_dir and stops — the incremental-batch testing mode; without
    it the query runs continuously."""
    src = spark.readStream.schema(schema).parquet(input_dir)
    tiled = tiling.assign_tiles(pip_join(src, zindex, mode="first"), zoom)
    out = tiled.select(
        "doc_id", "zone_id", "eas_id", "lon", "lat",
        "tile_x", "tile_y", "quadkey", "spans",
    )
    w = (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()
