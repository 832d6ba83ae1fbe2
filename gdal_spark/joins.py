"""Spatial joins: point-in-polygon (the benchmark op) and kNN support.

PIP join = the reference's spatial-filter / overlay candidate pattern
(OGRLayer::FilterGeometry 3-stage test, generic/ogrlayer.cpp:1357;
overlay Intersection's per-feature pushdown, :2128-2198) restated as:

  zones --(driver build, CSR numpy)--> broadcast PackedCover (index.py)
  docs  --(ONE vectorized pandas UDF: parse WKT -> rep point -> cell
           lookup in the broadcast -> bbox reject -> exact PIP)--> matches

The whole join is a single map stage: no shuffle, no join, no row
duplication, no per-row Python, and the only cross-task data movement
is the broadcast index itself (megabytes, once per executor). Left /
first-match semantics reproduce OGR SQL's one-to-first-match LEFT JOIN
(ogr_sql_dialect.rst:483-490); 'all' mode reproduces the overlay join's
every-intersecting-pair semantics (generic/ogrlayer.cpp:2062).

Span-order invariant: `spans` stays a nested array column on the row
through the join — shuffles (there are none here anyway) cannot reorder
it (SURVEY.md §1.1).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import geomlite as G
from . import index as IX
from .cells import np_geo_cell


def geom_wkt_col():
    """The single 'geom' span's WKT, pulled out of the nested spans
    array with JVM higher-order functions — no Python."""
    return F.element_at(
        F.filter(F.col("spans"), lambda s: s["kind"] == F.lit("geom")), 1
    )["text"]


_POINT_RE = r"^POINT\(([-0-9.eE+]+) ([-0-9.eE+]+)\)$"


def _fill_poly_rows(lon: np.ndarray, lat: np.ndarray, raw: np.ndarray) -> dict:
    """Rows whose lon is NaN carry a non-point (or missing) WKT in
    `raw`: parse them Python-side (bounded minority), fill their rep
    point (vertex mean via sequential np.add.reduce — matches the
    oracle's fold order, SURVEY.md §7.4) in place, and return the
    sparse {row: (xs, ys)} dict. Point rows never touch Python: the JVM
    already extracted their coordinates with codegen'd regexp + cast
    (both sides parse decimal -> nearest double, so parity holds)."""
    polys: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    miss = np.where(np.isnan(lon))[0]
    if len(miss):
        gxs, gys = G.parse_wkt_objs(raw[miss])
        for k, i in enumerate(miss):
            xs, ys = gxs[k], gys[k]
            n = len(xs)
            if n == 1:  # POINT the fast path didn't match (odd spacing)
                lon[i] = xs[0]
                lat[i] = ys[0]
            elif n > 1:
                lon[i] = np.add.reduce(xs) / n
                lat[i] = np.add.reduce(ys) / n
                polys[int(i)] = (xs, ys)
            else:
                polys[int(i)] = (xs, ys)  # empty geom -> never matches
    return polys


def extract_geom(docs: DataFrame) -> DataFrame:
    """Pull geometry out of spans, parse to vertex arrays + rep point in
    one Arrow UDF batch. Used by operators that need the vertex columns
    JVM-side (kNN, tiling); pip_join fuses this work into its own UDF."""
    docs = docs.withColumn("geom_wkt", geom_wkt_col())

    schema = T.StructType(
        [
            T.StructField("gx", T.ArrayType(T.DoubleType())),
            T.StructField("gy", T.ArrayType(T.DoubleType())),
            T.StructField("lon", T.DoubleType()),
            T.StructField("lat", T.DoubleType()),
        ]
    )

    @F.pandas_udf(schema)
    def parse_wkt(wkt_s: pd.Series) -> pd.DataFrame:
        gxs, gys = G.parse_wkt_batch(wkt_s.to_numpy())
        n = len(gxs)
        lon = np.full(n, np.nan)
        lat = np.full(n, np.nan)
        for i in range(n):
            m = len(gxs[i])
            if m == 1:
                lon[i] = gxs[i][0]
                lat[i] = gys[i][0]
            elif m > 1:
                lon[i] = np.add.reduce(gxs[i]) / m
                lat[i] = np.add.reduce(gys[i]) / m
        return pd.DataFrame(
            {
                "gx": [a.tolist() for a in gxs],
                "gy": [a.tolist() for a in gys],
                "lon": lon,
                "lat": lat,
            }
        )

    docs = docs.withColumn("_g", parse_wkt(F.col("geom_wkt")))
    return (
        docs.withColumn("gx", F.col("_g.gx"))
        .withColumn("gy", F.col("_g.gy"))
        .withColumn("lon", F.col("_g.lon"))
        .withColumn("lat", F.col("_g.lat"))
        .drop("_g")
    )


def extract_geom_wkb(docs: DataFrame, wkb_col: str = "geom_wkb") -> DataFrame:
    """WKB (binary) counterpart of extract_geom — SURVEY §1.1 declares
    WKB the canonical geometry encoding, so the join path must consume
    it without a WKT round trip. 2-D little-endian POINTs (the 21-byte
    common case) unpack directly; other types go through the full WKB
    reader. Output columns match extract_geom (gx, gy, lon, lat), so
    pip_join's prepared path runs unchanged."""
    import struct

    from . import geometry as GM

    schema = T.StructType(
        [
            T.StructField("gx", T.ArrayType(T.DoubleType())),
            T.StructField("gy", T.ArrayType(T.DoubleType())),
            T.StructField("lon", T.DoubleType()),
            T.StructField("lat", T.DoubleType()),
        ]
    )

    @F.pandas_udf(schema)
    def parse(bs: pd.Series) -> pd.DataFrame:
        vals = bs.to_numpy()
        n = len(vals)
        gxs: list = [None] * n
        gys: list = [None] * n
        lon = np.full(n, np.nan)
        lat = np.full(n, np.nan)
        for i, v in enumerate(vals):
            if v is None:
                gxs[i], gys[i] = [], []
                continue
            v = bytes(v)
            if len(v) == 21 and v[0] == 1 and v[1:5] == b"\x01\x00\x00\x00":
                x, y = struct.unpack_from("<2d", v, 5)
                gxs[i], gys[i] = [x], [y]
                lon[i], lat[i] = x, y
                continue
            g = GM.parse_wkb(v)
            xs, ys = g.all_points()
            gxs[i] = xs.tolist()
            gys[i] = ys.tolist()
            if len(xs) == 1:
                lon[i], lat[i] = float(xs[0]), float(ys[0])
            elif len(xs) > 1:
                lon[i] = float(np.add.reduce(xs) / len(xs))
                lat[i] = float(np.add.reduce(ys) / len(ys))
        return pd.DataFrame({"gx": gxs, "gy": gys, "lon": lon, "lat": lat})

    docs = docs.withColumn("_g", parse(F.col(wkb_col)))
    return (
        docs.withColumn("gx", F.col("_g.gx"))
        .withColumn("gy", F.col("_g.gy"))
        .withColumn("lon", F.col("_g.lon"))
        .withColumn("lat", F.col("_g.lat"))
        .drop("_g")
    )


_FUSED_FIRST = T.StructType(
    [
        T.StructField("lon", T.DoubleType()),
        T.StructField("lat", T.DoubleType()),
        T.StructField("zone_id", T.LongType()),
        T.StructField("eas_id", T.LongType()),
    ]
)

_MATCHES = T.ArrayType(
    T.StructType(
        [
            T.StructField("zone_id", T.LongType()),
            T.StructField("eas_id", T.LongType()),
        ]
    )
)

_FUSED_ALL = T.StructType(
    [
        T.StructField("lon", T.DoubleType()),
        T.StructField("lat", T.DoubleType()),
        T.StructField("matches", _MATCHES),
    ]
)


def _mask_sentinel(zone: np.ndarray, eas: np.ndarray) -> pd.DataFrame:
    miss = zone < 0
    return pd.DataFrame(
        {
            "zone_id": pd.array(np.where(miss, 0, zone), dtype="Int64"),
            "eas_id": pd.array(np.where(miss, 0, eas), dtype="Int64"),
        }
    ).mask(pd.DataFrame({"zone_id": miss, "eas_id": miss}))


def _make_fused_udf(bc, level: int, mode: str):
    """One UDF does rep point -> cell -> staged match against the
    broadcast PackedCover. Point coordinates arrive pre-extracted by
    JVM codegen (pip_join); only the minority polygon rows ship their
    WKT into Python. Arrow traffic: two doubles + a rarely-non-null
    string in, one small struct out — candidate data never rides on
    document rows."""
    if mode == "first":

        @F.pandas_udf(_FUSED_FIRST)
        def fused_first(
            plon: pd.Series, plat: pd.Series, poly_wkt: pd.Series
        ) -> pd.DataFrame:
            cov = bc.value
            lon = plon.to_numpy(dtype=np.float64, na_value=np.nan)
            lat = plat.to_numpy(dtype=np.float64, na_value=np.nan)
            polys = _fill_poly_rows(lon, lat, poly_wkt.to_numpy())
            cell = np_geo_cell(np.nan_to_num(lon, nan=-999.0),
                               np.nan_to_num(lat, nan=-999.0), level)
            cell[np.isnan(lon)] = -1
            zone, eas = IX.first_match_packed(cov, cell, lon, lat, polys)
            out = _mask_sentinel(zone, eas)
            out.insert(0, "lat", lat)
            out.insert(0, "lon", lon)
            return out

        return fused_first

    @F.pandas_udf(_FUSED_ALL)
    def fused_all(
        plon: pd.Series, plat: pd.Series, poly_wkt: pd.Series
    ) -> pd.DataFrame:
        cov = bc.value
        lon = plon.to_numpy(dtype=np.float64, na_value=np.nan)
        lat = plat.to_numpy(dtype=np.float64, na_value=np.nan)
        polys = _fill_poly_rows(lon, lat, poly_wkt.to_numpy())
        cell = np_geo_cell(np.nan_to_num(lon, nan=-999.0),
                           np.nan_to_num(lat, nan=-999.0), level)
        cell[np.isnan(lon)] = -1
        matches = IX.all_matches_packed(cov, cell, lon, lat, polys)
        return pd.DataFrame(
            {
                "lon": lon,
                "lat": lat,
                "matches": [
                    [{"zone_id": z, "eas_id": e} for z, e in m] for m in matches
                ],
            }
        )

    return fused_all


_PRE_FIRST = T.StructType(
    [
        T.StructField("zone_id", T.LongType()),
        T.StructField("eas_id", T.LongType()),
    ]
)


def _polys_from_lists(gx: pd.Series, gy: pd.Series) -> dict:
    """Sparse {row: (xs, ys)} for rows whose vertex list is not a single
    point (extract_geom output carries gx/gy as list columns)."""
    polys: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    for i, a in enumerate(gx):
        if a is None or len(a) != 1:
            xs = np.asarray(a, dtype=np.float64) if a is not None else np.empty(0)
            ys_raw = gy.iloc[i]
            ys = np.asarray(ys_raw, dtype=np.float64) if ys_raw is not None else np.empty(0)
            polys[i] = (xs, ys)
    return polys


def _make_prepared_udf(bc, level: int, mode: str):
    """Variant over already-extracted geometry columns (extract_geom
    output) — avoids re-parsing when the caller needs gx/gy anyway."""
    if mode == "first":

        @F.pandas_udf(_PRE_FIRST)
        def prep_first(
            lon: pd.Series, lat: pd.Series, gx: pd.Series, gy: pd.Series
        ) -> pd.DataFrame:
            cov = bc.value
            lo = lon.to_numpy(dtype=np.float64)
            la = lat.to_numpy(dtype=np.float64)
            polys = _polys_from_lists(gx, gy)
            cell = np_geo_cell(np.nan_to_num(lo, nan=-999.0),
                               np.nan_to_num(la, nan=-999.0), level)
            cell[np.isnan(lo)] = -1
            zone, eas = IX.first_match_packed(cov, cell, lo, la, polys)
            return _mask_sentinel(zone, eas)

        return prep_first

    @F.pandas_udf(_MATCHES)
    def prep_all(
        lon: pd.Series, lat: pd.Series, gx: pd.Series, gy: pd.Series
    ) -> pd.Series:
        cov = bc.value
        lo = lon.to_numpy(dtype=np.float64)
        la = lat.to_numpy(dtype=np.float64)
        polys = _polys_from_lists(gx, gy)
        cell = np_geo_cell(np.nan_to_num(lo, nan=-999.0),
                           np.nan_to_num(la, nan=-999.0), level)
        cell[np.isnan(lo)] = -1
        matches = IX.all_matches_packed(cov, cell, lo, la, polys)
        return pd.Series(
            [[{"zone_id": z, "eas_id": e} for z, e in m] for m in matches]
        )

    return prep_all


def pip_join(
    docs: DataFrame,
    zindex: IX.ZoneIndex,
    mode: str = "first",
    engine: str = "arrow",
) -> DataFrame:
    """Join documents to zones by geometric intersection.

    docs: the raw document table (spans nested) OR extract_geom output.
    zindex: index.zone_index(...) — the broadcast PackedCover.
    mode 'first': one row per doc, first (lowest zone_id) match, NULLs
      when none — OGR SQL LEFT JOIN semantics (ogr_sql_dialect.rst:490).
    mode 'all': one row per intersecting pair, NULL row when none —
      overlay-join semantics (generic/ogrlayer.cpp:2062).
    engine 'arrow' (default): everything through the fused pandas UDF.
      'auto': point documents run the pure-JVM Catalyst leg (jvmpip.py
      — zero Arrow/Python on the hot path), the polygon minority keeps
      the Arrow kernel; legs are unioned. Both produce identical rows
      (tests assert it). MEASURED (8M docs, local[32], interleaved
      reps): arrow best 5.4 s / auto best 10.9 s — Catalyst's
      higher-order-function lambdas evaluate interpreted per vertex,
      which costs more than the Arrow IPC they avoid, so the Arrow
      kernel remains the default; 'auto' exists for clusters where
      Python workers are unavailable or their memory is the constraint.
    """
    if mode not in ("first", "all"):
        raise ValueError(f"mode must be 'first' or 'all', got {mode}")
    if engine not in ("auto", "arrow"):
        raise ValueError(f"engine must be 'auto' or 'arrow', got {engine}")

    if engine == "auto" and "gx" not in docs.columns:
        return _pip_join_hybrid(docs, zindex, mode)

    if "gx" in docs.columns:  # pre-extracted geometry path
        udf = _make_prepared_udf(zindex.bc, zindex.level, mode)
        m = udf(F.col("lon"), F.col("lat"), F.col("gx"), F.col("gy"))
        if mode == "first":
            j = docs.withColumn("_m", m)
            return (
                j.withColumn("zone_id", F.col("_m.zone_id"))
                .withColumn("eas_id", F.col("_m.eas_id"))
                .drop("_m")
            )
        j = docs.withColumn("_matches", m)
    else:  # fused path: parse + locate + match in one UDF
        if "geom_wkt" in docs.columns:
            src = docs
        else:
            src = docs.withColumn("geom_wkt", geom_wkt_col())
        # point coords extracted JVM-side (whole-stage codegen regexp +
        # cast); only non-point rows ship their WKT through Arrow
        src = (
            src.withColumn(
                "_plon", F.regexp_extract("geom_wkt", _POINT_RE, 1).cast("double")
            )
            .withColumn(
                "_plat", F.regexp_extract("geom_wkt", _POINT_RE, 2).cast("double")
            )
            .withColumn(
                "_pwkt", F.when(F.col("_plon").isNull(), F.col("geom_wkt"))
            )
        )
        udf = _make_fused_udf(zindex.bc, zindex.level, mode)
        j = src.withColumn(
            "_m", udf(F.col("_plon"), F.col("_plat"), F.col("_pwkt"))
        ).drop("_plon", "_plat", "_pwkt")
        if mode == "first":
            return (
                j.withColumn("lon", F.col("_m.lon"))
                .withColumn("lat", F.col("_m.lat"))
                .withColumn("zone_id", F.col("_m.zone_id"))
                .withColumn("eas_id", F.col("_m.eas_id"))
                .drop("_m")
            )
        j = (
            j.withColumn("lon", F.col("_m.lon"))
            .withColumn("lat", F.col("_m.lat"))
            .withColumn("_matches", F.col("_m.matches"))
            .drop("_m")
        )

    ex = j.select("*", F.explode_outer("_matches").alias("_e"))
    return (
        ex.withColumn("zone_id", F.col("_e.zone_id"))
        .withColumn("eas_id", F.col("_e.eas_id"))
        .drop("_matches", "_e")
    )


def _pip_join_hybrid(docs: DataFrame, zindex: IX.ZoneIndex, mode: str) -> DataFrame:
    """engine='auto': point rows (WKT matches the POINT regexp, parsed
    by JVM codegen) take the pure-JVM Catalyst leg — broadcast cover
    join + expression ray cast, zero Arrow/Python (jvmpip.py); the
    polygon/malformed minority takes the fused Arrow kernel. Legs are
    unioned by name; both are map-only over a broadcast, so the
    document side still never shuffles. The source is scanned twice
    (once per leg) — at 95% points that trades one cheap extra codegen
    scan for a 20x cut in Arrow IPC traffic, the measured 8->32-core
    bottleneck (BENCH/BASELINE.md)."""
    from . import jvmpip

    if "geom_wkt" in docs.columns:
        src = docs
    else:
        src = docs.withColumn("geom_wkt", geom_wkt_col())
    src = src.withColumn(
        "_plon", F.regexp_extract("geom_wkt", _POINT_RE, 1).cast("double")
    ).withColumn(
        "_plat", F.regexp_extract("geom_wkt", _POINT_RE, 2).cast("double")
    )

    pts = (
        src.filter(F.col("_plon").isNotNull())
        .withColumn("lon", F.col("_plon"))
        .withColumn("lat", F.col("_plat"))
        .drop("_plon", "_plat")
    )
    cover = zindex.cover_df(docs.sparkSession)
    jvm_leg = jvmpip.pip_points_jvm(pts, cover, zindex.level, mode=mode)

    rest = src.filter(F.col("_plon").isNull()).drop("_plon", "_plat")
    arrow_leg = pip_join(rest, zindex, mode=mode, engine="arrow")
    return jvm_leg.unionByName(arrow_leg)


def pip_join_full(
    spark: SparkSession,
    docs: DataFrame,
    zones_pdf: pd.DataFrame,
    level: int | None = None,
    mode: str = "first",
) -> DataFrame:
    """Convenience: build + broadcast the packed cover, fused join."""
    zidx = IX.zone_index(spark, zones_pdf, level)
    return pip_join(docs, zidx, mode=mode)
