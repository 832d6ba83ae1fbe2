"""spark-submit entry point for the PIP-join + tiling benchmark job.

Cluster usage (the north-rule deployment shape):

    spark-submit --py-files gdal_spark.zip \
        gdal_spark/jobs/pip_tile_job.py \
        --docs 10000000 --zones 10000 --zoom 12 \
        --checkpoint-dir s3://bucket/checkpoints/run1 \
        --output s3://bucket/out/pip_tiles

(gdal_spark.zip from gdal_spark.session.package_zip(); locally the
session builder ships it automatically.)

Stages are checkpointed — rerunning after a failure skips completed
stages (Iceberg-snapshot semantics over parquet markers, checkpoint.py)
— and per-partition lineage + throughput metrics land in the
checkpoint dir's _metrics/_lineage tables.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--zones", type=int, default=10_000)
    ap.add_argument("--zoom", type=int, default=12)
    ap.add_argument("--checkpoint-dir", default="/tmp/gdal_spark_job")
    ap.add_argument("--output", default=None)
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from gdal_spark import synth, tiling
    from gdal_spark.checkpoint import Checkpointer
    from gdal_spark.index import zone_index
    from gdal_spark.joins import pip_join
    from gdal_spark.session import get_spark

    spark = get_spark("pip_tile_job", cpus=args.cpus)
    cp = Checkpointer(spark, args.checkpoint_dir, run_id=f"docs{args.docs}")

    docs = cp.stage("docs", lambda: synth.documents_df(spark, args.docs))
    zones = synth.zones_np(args.zones)
    zidx = zone_index(spark, zones)

    t0 = time.time()
    result = cp.stage(
        "pip_tiles",
        lambda: tiling.assign_tiles(
            pip_join(docs, zidx, mode="first"), args.zoom
        ).select("doc_id", "zone_id", "eas_id", "tile_x", "tile_y", "quadkey", "spans"),
    )
    n = result.count()
    dt = time.time() - t0
    print(f"pip_tile_job: {n} docs in {dt:.1f}s = {n / dt:.0f} docs/sec")
    if args.output:
        # explicit cell-prefix layout (north rule): spatially adjacent
        # docs co-locate, so parquet min/max stats prune tile-range
        # scans and later spatial joins can co-partition
        from gdal_spark.skew import repartition_by_cell_prefix

        repartition_by_cell_prefix(result, "quadkey", 4, 64).write.mode(
            "overwrite"
        ).parquet(args.output)
    cp.metrics().show(truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
