"""Spatial joins: point-in-polygon (the benchmark op) and kNN.

PIP join = the reference's spatial-filter / overlay candidate pattern
(OGRLayer::FilterGeometry 3-stage test, generic/ogrlayer.cpp:1357;
overlay Intersection's per-feature pushdown, :2128-2198) restated as:

  docs --(broadcast hash join on geo_cell, 1:1, NO shuffle)--> cover
       --(vectorized Arrow UDF: bbox reject + exact PIP)--> matches

The whole join is a single map stage: no shuffle, no row duplication,
no per-row Python. Left/first-match semantics reproduce OGR SQL's
one-to-first-match LEFT JOIN (ogr_sql_dialect.rst:483-490); 'all' mode
reproduces the overlay join's every-intersecting-pair semantics.

Span-order invariant: `spans` stays a nested array column on the row
through the join — shuffles (there are none here anyway) cannot reorder
it (SURVEY.md §1.1).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import geomlite as G
from . import index as IX
from .cells import geo_cell


# ------------------------------------------------------------ geometry prep
def extract_geom(docs: DataFrame) -> DataFrame:
    """Pull the single 'geom' span's WKT out of the nested spans array
    (JVM higher-order function — no Python), then parse it to vertex
    arrays + representative point in one Arrow UDF batch."""
    wkt = F.element_at(
        F.filter(F.col("spans"), lambda s: s["kind"] == F.lit("geom")), 1
    )["text"]
    docs = docs.withColumn("geom_wkt", wkt)

    parse_schema = T.StructType(
        [
            T.StructField("gx", T.ArrayType(T.DoubleType())),
            T.StructField("gy", T.ArrayType(T.DoubleType())),
        ]
    )

    @F.pandas_udf(parse_schema)
    def parse_wkt(wkt_s: pd.Series) -> pd.DataFrame:
        xs, ys = G.parse_wkt_batch(wkt_s.to_numpy())
        return pd.DataFrame({"gx": [a.tolist() for a in xs], "gy": [a.tolist() for a in ys]})

    docs = docs.withColumn("_g", parse_wkt(F.col("geom_wkt")))
    docs = docs.withColumn("gx", F.col("_g.gx")).withColumn("gy", F.col("_g.gy")).drop("_g")
    # representative point = mean of vertices (the point itself for
    # point docs); JVM-side fold, same order as np.mean over <128 elems
    n = F.size("gx").cast("double")
    docs = docs.withColumn(
        "lon", F.aggregate("gx", F.lit(0.0), lambda a, x: a + x) / n
    ).withColumn("lat", F.aggregate("gy", F.lit(0.0), lambda a, x: a + x) / n)
    return docs


MATCH_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("zone_id", T.LongType()),
            T.StructField("eas_id", T.LongType()),
        ]
    )
)


@F.pandas_udf(MATCH_SCHEMA)
def _match_udf(
    lon: pd.Series,
    lat: pd.Series,
    gx: pd.Series,
    gy: pd.Series,
    cand_zone_id: pd.Series,
    cand_eas_id: pd.Series,
    cand_xmin: pd.Series,
    cand_ymin: pd.Series,
    cand_xmax: pd.Series,
    cand_ymax: pd.Series,
    cand_ring_x: pd.Series,
    cand_ring_y: pd.Series,
    cand_ring_len: pd.Series,
) -> pd.Series:
    gxs = [np.asarray(a, dtype=np.float64) for a in gx]
    gys = [np.asarray(a, dtype=np.float64) for a in gy]
    matches = IX.match_candidates_np(
        lon.to_numpy(dtype=np.float64),
        lat.to_numpy(dtype=np.float64),
        gxs,
        gys,
        cand_zone_id.tolist(),
        cand_eas_id.tolist(),
        (cand_xmin.tolist(), cand_ymin.tolist(), cand_xmax.tolist(), cand_ymax.tolist()),
        cand_ring_x.tolist(),
        cand_ring_y.tolist(),
        cand_ring_len.tolist(),
    )
    return pd.Series(
        [[{"zone_id": z, "eas_id": e} for z, e in m] for m in matches]
    )


FIRST_SCHEMA = T.StructType(
    [
        T.StructField("zone_id", T.LongType()),
        T.StructField("eas_id", T.LongType()),
    ]
)


@F.pandas_udf(FIRST_SCHEMA)
def _first_match_udf(
    lon: pd.Series,
    lat: pd.Series,
    gx: pd.Series,
    gy: pd.Series,
    cand_zone_id: pd.Series,
    cand_eas_id: pd.Series,
    cand_xmin: pd.Series,
    cand_ymin: pd.Series,
    cand_xmax: pd.Series,
    cand_ymax: pd.Series,
    cand_ring_x: pd.Series,
    cand_ring_y: pd.Series,
    cand_ring_len: pd.Series,
) -> pd.DataFrame:
    """Benchmark hot path: flat int64 in/out, no per-row Python objects."""
    gxs = [np.asarray(a, dtype=np.float64) for a in gx]
    gys = [np.asarray(a, dtype=np.float64) for a in gy]
    zone, eas = IX.first_match_np(
        lon.to_numpy(dtype=np.float64),
        lat.to_numpy(dtype=np.float64),
        gxs,
        gys,
        cand_zone_id.tolist(),
        cand_eas_id.tolist(),
        (cand_xmin.tolist(), cand_ymin.tolist(), cand_xmax.tolist(), cand_ymax.tolist()),
        cand_ring_x.tolist(),
        cand_ring_y.tolist(),
        cand_ring_len.tolist(),
    )
    miss = zone < 0
    return pd.DataFrame(
        {
            "zone_id": pd.array(np.where(miss, 0, zone), dtype="Int64"),
            "eas_id": pd.array(np.where(miss, 0, eas), dtype="Int64"),
        }
    ).mask(pd.DataFrame({"zone_id": miss, "eas_id": miss}))


def pip_join(
    docs: DataFrame,
    cover: DataFrame,
    level: int,
    mode: str = "first",
) -> DataFrame:
    """Join documents to zones by geometric intersection.

    docs: output of extract_geom (needs lon/lat/gx/gy columns).
    cover: index.cover_df output (broadcast side).
    mode 'first': one row per doc, first (lowest zone_id) match, NULLs
      when none — OGR SQL LEFT JOIN semantics (ogr_sql_dialect.rst:490).
    mode 'all': one row per intersecting pair, NULL row when none —
      overlay-join semantics (generic/ogrlayer.cpp:2062).
    """
    d = docs.withColumn("cell_id", geo_cell(F.col("lon"), F.col("lat"), level))
    j = d.join(F.broadcast(cover), "cell_id", "left")
    cand_cols = [f.name for f in IX.COVER_SCHEMA.fields if f.name != "cell_id"]
    udf_args = (
        "lon", "lat", "gx", "gy",
        "cand_zone_id", "cand_eas_id",
        "cand_xmin", "cand_ymin", "cand_xmax", "cand_ymax",
        "cand_ring_x", "cand_ring_y", "cand_ring_len",
    )

    if mode == "first":
        j = j.withColumn("_m", _first_match_udf(*udf_args)).drop(*cand_cols)
        return (
            j.withColumn("zone_id", F.col("_m.zone_id"))
            .withColumn("eas_id", F.col("_m.eas_id"))
            .drop("_m")
        )
    j = j.withColumn("_matches", _match_udf(*udf_args)).drop(*cand_cols)
    if mode == "all":
        ex = j.select(
            "*", F.explode_outer("_matches").alias("_m")
        )
        return (
            ex.withColumn("zone_id", F.col("_m.zone_id"))
            .withColumn("eas_id", F.col("_m.eas_id"))
            .drop("_matches", "_m")
        )
    raise ValueError(f"mode must be 'first' or 'all', got {mode}")


def pip_join_full(
    spark: SparkSession,
    docs: DataFrame,
    zones_pdf: pd.DataFrame,
    level: int | None = None,
    mode: str = "first",
) -> DataFrame:
    """Convenience: extract geometry, build + broadcast the cover, join."""
    lvl = level if level is not None else IX.auto_level(len(zones_pdf))
    cov = IX.cover_df(spark, zones_pdf, lvl)
    return pip_join(extract_geom(docs), cov, lvl, mode=mode)
