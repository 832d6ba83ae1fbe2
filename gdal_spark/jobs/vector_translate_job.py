"""spark-submit entry point mirroring the ogr2ogr pipeline
(GDALVectorTranslate, apps/ogr2ogr_lib.cpp; SURVEY.md §3.2):

  open src -> SetAttributeFilter (WHERE) -> SetSpatialFilter (PIP
  against a zone set / bbox) -> per-feature geometry ops (reproject to
  EPSG:3857) -> write, laid out by cell prefix

restated as the linear DataFrame pipeline it is: read -> filter ->
fused spatial join -> column-math reprojection -> prefix-partitioned
parquet. Usage:

    spark-submit --py-files gdal_spark.zip \
        gdal_spark/jobs/vector_translate_job.py \
        --input /data/documents --where "doc_id % 2 = 0" \
        --zones 100 --bbox -120,20,-60,60 \
        --output /data/out
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default=None, help="documents parquet dir; synthesized when omitted")
    ap.add_argument("--docs", type=int, default=100_000)
    ap.add_argument("--where", default=None, help="attribute filter (Spark SQL expr)")
    ap.add_argument("--zones", type=int, default=100, help="spatial-filter zone count")
    ap.add_argument("--bbox", default=None, help="lon0,lat0,lon1,lat1 spatial filter")
    ap.add_argument("--zoom", type=int, default=12)
    ap.add_argument("--output", default="/tmp/gdal_spark_translate_out")
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from gdal_spark import cells, synth, tiling
    from gdal_spark.index import zone_index
    from gdal_spark.joins import pip_join
    from gdal_spark.session import get_spark
    from gdal_spark.skew import repartition_by_cell_prefix

    spark = get_spark("vector_translate", cpus=args.cpus)
    docs = (
        spark.read.parquet(args.input)
        if args.input
        else synth.documents_df(spark, args.docs)
    )

    if args.where:  # SetAttributeFilter (ogr2ogr_lib.cpp:1869-1891)
        docs = docs.filter(args.where)

    zidx = zone_index(spark, synth.zones_np(args.zones))
    out = pip_join(docs, zidx, mode="first")

    if args.bbox:  # SetSpatialFilterRect (generic/ogrlayer.cpp:1184)
        x0, y0, x1, y1 = (float(v) for v in args.bbox.split(","))
        out = out.filter(
            (F.col("lon") >= x0) & (F.col("lon") <= x1)
            & (F.col("lat") >= y0) & (F.col("lat") <= y1)
        )
    else:
        # spatial filter = keep features matching a zone (PIP join hit)
        out = out.filter(F.col("zone_id").isNotNull())

    # geometry op chain: reproject (CompositeCT batch transform,
    # ogr/ogrct.cpp:1822) — pure column math here
    mx, my = cells.lonlat_to_meters(F.col("lon"), F.col("lat"))
    out = out.withColumn("mx", mx).withColumn("my", my)
    out = tiling.assign_tiles(out, args.zoom)

    t0 = time.time()
    repartition_by_cell_prefix(out, "quadkey", 4, 64).write.mode(
        "overwrite"
    ).parquet(args.output)
    n = spark.read.parquet(args.output).count()
    dt = time.time() - t0
    print(f"vector_translate: {n} features in {dt:.1f}s = {n / dt:.0f}/sec -> {args.output}")
    spark.stop()


if __name__ == "__main__":
    main()
