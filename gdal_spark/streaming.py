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

Stateful streaming: stream_sessionize runs the engine's gap-based
sessionization incrementally with applyInPandasWithState — per-user
GroupState holds the open session, the event-time watermark closes
sessions whose gap has definitively elapsed, and the emitted session
rows match the batch sessionize on the same data (asserted in
tests/test_streaming.py). The reference has no streaming semantics to
match (GDAL is batch-only); this is the Spark-native incremental
story for the LLM-pipeline operators.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import types as T

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


SESSION_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

SESSION_STATE = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def stream_sessionize(
    spark: SparkSession,
    input_dir: str,
    schema,
    gap_seconds: float,
    out_dir: str,
    checkpoint_dir: str,
):
    """Incremental gap-based sessionization over an event stream —
    the stateful-streaming form of the batch sessionize operator.

    Per-user GroupState holds the OPEN session (start, last ts, count);
    events extend it when within `gap_seconds` of the last event, else
    the old session is emitted and a new one opens. The event-time
    watermark (set to the gap) fires EventTimeTimeout for users with no
    new events, closing their last session exactly when no on-time
    event could still extend it. State is O(1) per active user — no
    event retention, so the operator runs indefinitely.
    """
    import datetime as _dt

    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = int(gap_seconds * 1_000_000)

    def fn(key, pdfs, state):
        user = int(key[0])
        if state.hasTimedOut:
            st, en, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user],
                    "session_start": [pd.Timestamp(st, unit="us")],
                    "session_end": [pd.Timestamp(en, unit="us")],
                    "n_events": [n],
                }
            )
            return
        ts = []
        for pdf in pdfs:
            ts.extend(
                pdf["ts"].to_numpy().astype("datetime64[us]").astype("int64")
            )
        ts.sort()
        if state.exists:
            st, en, n = state.get
        else:
            st, en, n = ts[0], ts[0], 0
        out = []
        for t in ts:
            if t - en > gap_us and n > 0:
                out.append((st, en, n))
                st, n = t, 0
            en = max(en, t)
            n += 1
        state.update((int(st), int(en), int(n)))
        # timeout when the watermark passes session_end + gap (clamped
        # above the current watermark — Spark rejects earlier stamps)
        state.setTimeoutTimestamp(
            max(int(en // 1000) + int(gap_us // 1000),
                state.getCurrentWatermarkMs() + 1)
        )
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [user] * len(out),
                    "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in out],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in out],
                    "n_events": [n_ for _, _, n_ in out],
                }
            )

    src = spark.readStream.schema(schema).parquet(input_dir)
    sessions = (
        src.withWatermark("ts", f"{int(gap_seconds)} seconds")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn, SESSION_OUT, SESSION_STATE, "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
    return (
        sessions.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def stream_windowed_counts(
    spark: SparkSession,
    input_dir: str,
    schema,
    out_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "10 minutes",
):
    """Event-time tumbling-window aggregation with a watermark — the
    Structured Streaming idiom for late data (readStream ->
    withWatermark -> window groupBy -> append sink). In append mode a
    window only emits once the watermark (max event time - delay)
    passes its end, so the tail windows of a drained stream are
    withheld — exactly the semantics the batch oracle reproduces with
    an explicit cutoff. Returns after the availableNow drain."""
    from pyspark.sql import functions as F

    src = spark.readStream.schema(schema).parquet(input_dir)
    # parquet timestamps may arrive as TIMESTAMP_NTZ; event-time
    # watermarks require TIMESTAMP (with local-tz semantics)
    src = src.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        src.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 6).alias("vsum"),
        )
        .select(
            F.col("w.start").alias("wstart"), "event_type", "n", "vsum"
        )
    )
    q = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_dedup(
    spark: SparkSession,
    input_dir: str,
    schema,
    out_dir: str,
    checkpoint_dir: str,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
):
    """Streaming deduplication with bounded state:
    dropDuplicatesWithinWatermark over the key columns — the
    Structured Streaming counterpart of the batch exact-dedup operator
    (the training-pipeline 'dedupe the firehose' op). The watermark
    evicts per-key state once event time passes key-first-seen +
    delay, so state is O(keys inside the watermark horizon), not
    O(stream length). Only the key columns are emitted, so the result
    is deterministic regardless of which physical duplicate wins the
    race inside a micro-batch. Returns after the availableNow drain."""
    from pyspark.sql import functions as F

    src = spark.readStream.schema(schema).parquet(input_dir)
    src = src.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    dd = (
        src.withWatermark(ts_col, watermark)
        .select(ts_col, *key_cols)
        .dropDuplicatesWithinWatermark(key_cols)
        .select(*key_cols)
    )
    q = (
        dd.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
