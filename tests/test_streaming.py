"""Streaming composition golden test: two incremental document drops
through the streaming PIP+tile pipeline must equal the batch run over
the union, and resume from the stream checkpoint must not duplicate."""

import os

from gdal_spark import synth, tiling
from gdal_spark.index import zone_index
from gdal_spark.joins import pip_join
from gdal_spark.streaming import stream_pip_tiles


def test_stream_matches_batch(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")
    os.makedirs(in_dir, exist_ok=True)

    zones = synth.zones_np(64)
    zidx = zone_index(spark, zones)
    schema = synth.documents_df(spark, 1).schema

    # drop 1: docs [0, 3000)
    synth.documents_df(spark, 3000).write.mode("append").parquet(in_dir)
    q = stream_pip_tiles(spark, in_dir, schema, zidx, 12, out_dir, ck_dir)
    q.awaitTermination(120)

    # drop 2: docs [3000, 5000) — resume from the same checkpoint
    full = synth.documents_df(spark, 5000)
    full.filter(full.doc_id >= "doc000003000").write.mode("append").parquet(in_dir)
    q2 = stream_pip_tiles(spark, in_dir, schema, zidx, 12, out_dir, ck_dir)
    q2.awaitTermination(120)

    got = spark.read.parquet(out_dir)
    assert got.count() == 5000
    assert got.select("doc_id").distinct().count() == 5000  # no duplicates

    batch = tiling.assign_tiles(
        pip_join(synth.documents_df(spark, 5000), zidx, "first"), 12
    ).select("doc_id", "zone_id", "eas_id", "tile_x", "tile_y", "quadkey")
    g = got.select("doc_id", "zone_id", "eas_id", "tile_x", "tile_y", "quadkey")
    assert g.exceptAll(batch).count() == 0
    assert batch.exceptAll(g).count() == 0


def test_stream_sessionize_matches_batch(spark, tmp_path):
    """applyInPandasWithState sessionization: two incremental drops,
    then a watermark-advancing sentinel; the emitted CLOSED sessions
    must equal the batch gap-sessionization of the same events."""
    import numpy as np
    import pandas as pd

    from gdal_spark.streaming import stream_sessionize

    gap = 60.0
    base = pd.Timestamp("2024-01-01")
    rng = np.random.RandomState(11)
    rows = []
    eid = 0
    for user in range(6):
        t = base + pd.Timedelta(seconds=int(rng.randint(0, 50)))
        for _ in range(20):
            t = t + pd.Timedelta(
                seconds=int(rng.choice([5, 10, 20, 200, 400]))
            )
            rows.append({"event_id": eid, "ts": t, "user_id": user,
                         "event_type": "x", "value": 1.0, "props": "{}"})
            eid += 1
    pdf = pd.DataFrame(rows).sort_values("ts").reset_index(drop=True)
    # Spark reads parquet TIMESTAMP(us), not pandas' default ns
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    half = len(pdf) // 2
    src = tmp_path / "events_in"
    out = tmp_path / "sessions_out"
    ck = tmp_path / "ck"
    src.mkdir()
    pdf.iloc[:half].to_parquet(src / "drop1.parquet")

    schema = spark.createDataFrame(pdf.head(1)).schema

    q = stream_sessionize(spark, str(src), schema, gap, str(out), str(ck))
    q.awaitTermination()
    pdf.iloc[half:].to_parquet(src / "drop2.parquet")
    q = stream_sessionize(spark, str(src), schema, gap, str(out), str(ck))
    q.awaitTermination()
    # sentinel far in the future closes every remaining session
    sentinel = pd.DataFrame([{
        "event_id": eid, "ts": pdf["ts"].max() + pd.Timedelta(days=2),
        "user_id": 999, "event_type": "x", "value": 1.0, "props": "{}",
    }])
    sentinel["ts"] = sentinel["ts"].astype("datetime64[us]")
    sentinel.to_parquet(src / "drop3.parquet")
    q = stream_sessionize(spark, str(src), schema, gap, str(out), str(ck))
    q.awaitTermination()

    got = (
        spark.read.parquet(str(out)).toPandas()
        .query("user_id != 999")
        .sort_values(["user_id", "session_start"]).reset_index(drop=True)
    )

    # batch oracle: gap sessionization in pandas
    exp_rows = []
    for user, grp in pdf.groupby("user_id"):
        tsv = grp["ts"].sort_values().tolist()
        st = en = tsv[0]
        n = 0
        for t in tsv:
            if (t - en).total_seconds() > gap and n > 0:
                exp_rows.append((user, st, en, n))
                st, n = t, 0
            en = max(en, t)
            n += 1
        exp_rows.append((user, st, en, n))
    exp = pd.DataFrame(
        exp_rows, columns=["user_id", "session_start", "session_end", "n_events"]
    ).sort_values(["user_id", "session_start"]).reset_index(drop=True)

    assert len(got) == len(exp)
    assert (got["user_id"].to_numpy() == exp["user_id"].to_numpy()).all()
    assert (got["n_events"].to_numpy() == exp["n_events"].to_numpy()).all()
    assert (got["session_start"].to_numpy() == exp["session_start"].to_numpy()).all()
    assert (got["session_end"].to_numpy() == exp["session_end"].to_numpy()).all()


def test_stream_windowed_counts_watermark_semantics(spark, tmp_path):
    """Watermarked tumbling windows (append mode): emitted windows =
    exactly those the final watermark passed; values match the batch
    aggregation with the same cutoff."""
    import pandas as pd
    from pyspark.sql import functions as F

    from gdal_spark.streaming import stream_windowed_counts

    ts = pd.date_range("2024-01-01", periods=500, freq="97s")
    pdf = pd.DataFrame({
        "event_id": range(500),
        "ts": ts,
        "event_type": ["click" if i % 3 else "view" for i in range(500)],
        "value": [round(0.5 * (i % 7), 2) for i in range(500)],
    })
    ev = spark.createDataFrame(pdf)
    src, out, ck = (str(tmp_path / d) for d in ("src", "out", "ck"))
    ev.write.parquet(src)
    stream_windowed_counts(spark, src, ev.schema, out, ck,
                           window="1 hour", watermark="10 minutes")
    got = spark.read.parquet(out)
    batch = (
        ev.withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("vsum"))
        .select(F.col("w.start").alias("wstart"),
                F.col("w.end").alias("wend"), "event_type", "n", "vsum")
    )
    mx = ev.agg(F.max(F.col("ts").cast("timestamp"))).collect()[0][0]
    import datetime

    cutoff = mx - datetime.timedelta(minutes=10)
    expect = {
        (r["wstart"], r["event_type"]): (r["n"], r["vsum"])
        for r in batch.collect() if r["wend"] <= cutoff
    }
    gotmap = {
        (r["wstart"], r["event_type"]): (r["n"], r["vsum"])
        for r in got.collect()
    }
    assert gotmap == expect and len(gotmap) > 0
