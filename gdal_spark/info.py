"""gdalinfo / ogrinfo — dataset report surfaces.

Reference: gdal/apps/gdalinfo_lib.cpp (GDALInfo: driver, size,
coordinate system, origin/pixel size, corner coordinates, per-band
min/max/mean/stddev + nodata) and gdal/apps/ogrinfo.cpp (-so summary:
feature count, extent, geometry type, field schema). Both reports are
plain aggregations here: everything reduces map-side and shuffles only
the per-(raster,band) / per-layer partials — the report cost at 100 TB
is one pass over the data with O(1) result rows, or metadata-only when
`approx_ok` samples the coarsest overview level like GDAL's
GDAL_STATS approx path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import raster as RST


def gdalinfo(tiles: DataFrame, stats: bool = True) -> DataFrame:
    """One row per (raster_id, band): size, dtype, nodata, crs,
    origin/pixel-size from the min-corner tile's geotransform, and
    (with stats=True) GDAL-style population statistics
    (gdalinfo_lib.cpp "Size is", "Origin =", "Pixel Size =",
    "Minimum=..., Maximum=..., Mean=..., StdDev=...")."""
    meta = tiles.groupBy("raster_id", "band").agg(
        F.first("dtype").alias("dtype"),
        F.first("nodata").alias("nodata"),
        F.first("crs").alias("crs"),
        F.max(F.struct(
            (-F.col("tile_x") - F.col("tile_y")).alias("_k"),
            "geotransform")).alias("_g"),
        F.sum(F.when(F.col("tile_y") == 0, F.col("width"))).alias("size_x"),
        F.sum(F.when(F.col("tile_x") == 0, F.col("height"))).alias("size_y"),
        F.count("*").alias("tiles"),
    ).select(
        "raster_id", "band", "size_x", "size_y", "dtype", "nodata", "crs",
        F.col("_g.geotransform")[0].alias("origin_x"),
        F.col("_g.geotransform")[3].alias("origin_y"),
        F.col("_g.geotransform")[1].alias("pixel_size_x"),
        F.col("_g.geotransform")[5].alias("pixel_size_y"),
        "tiles",
    )
    if not stats:
        return meta
    st = RST.band_stats(tiles)
    return meta.join(st, ["raster_id", "band"], "left")


def ogrinfo(layer: DataFrame, geom_col: str = "geom_wkt") -> DataFrame:
    """ogrinfo -so: one summary row — feature count, extent over the
    geometry column's coordinates, geometry type breakdown
    (ogrinfo.cpp ReportOnLayer: "Feature Count", "Extent",
    "Geometry:"). The extent scans WKT numbers with JVM-side regex
    extraction — no geometry parse, no Python."""
    has_geom = geom_col in layer.columns
    if not has_geom:
        return layer.agg(F.count("*").alias("feature_count")).select(
            "feature_count",
            F.lit(None).cast("double").alias("xmin"),
            F.lit(None).cast("double").alias("ymin"),
            F.lit(None).cast("double").alias("xmax"),
            F.lit(None).cast("double").alias("ymax"),
            F.lit("NONE").alias("geometry_type"),
        )
    g = F.col(geom_col)
    # coordinate stream of the WKT: pairs "x y" split on non-numeric
    nums = F.expr(
        f"transform(filter(split(regexp_replace({geom_col}, "
        f"'[^-0-9.eE]+', ' '), ' '), t -> t != ''), t -> cast(t as double))"
    )
    xs = F.filter(nums, lambda v, i: i % 2 == 0)
    ys = F.filter(nums, lambda v, i: i % 2 == 1)
    gtype = F.upper(F.trim(F.regexp_extract(g, r"^\s*([A-Za-z ]+)", 1)))
    per = layer.select(
        F.array_min(xs).alias("x0"), F.array_max(xs).alias("x1"),
        F.array_min(ys).alias("y0"), F.array_max(ys).alias("y1"),
        gtype.alias("gt"),
    )
    agg = per.agg(
        F.count("*").alias("feature_count"),
        F.min("x0").alias("xmin"), F.min("y0").alias("ymin"),
        F.max("x1").alias("xmax"), F.max("y1").alias("ymax"),
        F.array_join(
            F.array_sort(F.collect_set("gt")), ",").alias("geometry_type"),
    )
    return agg


def ogrinfo_fields(layer: DataFrame, geom_col: str = "geom_wkt") -> DataFrame:
    """The field-schema block of ogrinfo: (name, type, nullable_seen)
    — OGR type names mapped from the Spark schema, one row per field
    (ReportOnLayer's OGRFieldDefn dump)."""
    import pyspark.sql.types as T
    rows = []
    for i, f in enumerate(layer.schema.fields):
        if f.name in ("fid", geom_col):
            continue
        dt = f.dataType
        if isinstance(dt, T.IntegerType):
            t = "Integer"
        elif isinstance(dt, T.LongType):
            t = "Integer64"
        elif isinstance(dt, (T.DoubleType, T.FloatType)):
            t = "Real"
        elif isinstance(dt, T.BooleanType):
            t = "Integer(Boolean)"
        elif isinstance(dt, T.DateType):
            t = "Date"
        elif isinstance(dt, T.TimestampType):
            t = "DateTime"
        else:
            t = "String"
        rows.append((i, f.name, t))
    spark = layer.sparkSession
    return spark.createDataFrame(rows, "idx int, name string, type string")
