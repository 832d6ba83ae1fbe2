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
