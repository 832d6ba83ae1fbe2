"""OGR SQL semantic shims over Spark SQL.

Spark SQL is a superset of OGR SQL (gdal/ogr/swq_parser.y grammar;
doc/source/user/ogr_sql_dialect.rst) — filters, projections,
aggregates, ORDER BY, LIMIT/OFFSET, UNION ALL all map 1:1 to DataFrame
ops and Catalyst handles what OGR hand-rolls (pushdown
ogr_gensql.cpp:168,612; BETWEEN canonicalization ogr_swq.h:139;
ORDER BY+LIMIT short-circuit ogr_gensql.cpp:1944). What does NOT match
by default is a handful of deliberate OGR semantics — each shim below
reproduces one, with the reference citation:

  ci_eq            string '=' is case-INsensitive while '<' '<=' etc.
                   are case-sensitive (ogr_sql_dialect.rst:261-275;
                   swq_op_general.cpp:739-810 EQ uses stricmp)
  ogr_like/ilike   LIKE case-sensitive since GDAL 3.1, ILIKE insensitive
                   (swq_op_general.cpp:56 swq_test_like;
                   ogr_sql_dialect.rst:277-299)
  distinct_ci      SELECT DISTINCT on strings is case-insensitive and
                   keeps the first-seen spelling (swq.cpp:342-386)
  first_match_left_join
                   OGR LEFT JOIN emits exactly ONE row per primary row —
                   the FIRST matching secondary row; extra matches are
                   dropped (ogr_gensql.cpp:1292-1323;
                   ogr_sql_dialect.rst:483-490)
  substr_ogr       SUBSTR is 1-based with negative start counting from
                   the end (ogr_sql_dialect.rst:153-168)
  hstore_get_value 'k=>v' map lookup (ogr_swq.h:62,418;
                   ogr_sql_dialect.rst:170-175)
  avg_timestamp    AVG over datetime = avg of unix seconds re-encoded
                   (ogr_gensql.cpp:1010-1027)
  union_all_layers UNION ALL builds the SUPERSET schema of all SELECTs
                   (non-standard; ogr_sql_dialect.rst:492-513;
                   ogrunionlayer.cpp:327 FIELD_UNION_ALL_LAYERS)
  extent           layer bbox aggregate (ogrlayer.cpp:217 GetExtent)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def ci_eq(col: Column | str, other) -> Column:
    """OGR string '=' — case-insensitive (inequalities stay sensitive)."""
    c = F.col(col) if isinstance(col, str) else col
    o = F.lit(other) if not isinstance(other, Column) else other
    return F.lower(c) == F.lower(o)


def ogr_like(col: Column | str, pattern: str, escape: str | None = None) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    if escape:
        return F.like(c, F.lit(pattern), F.lit(escape))
    return c.like(pattern)


def ogr_ilike(col: Column | str, pattern: str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.ilike(pattern)


def distinct_ci(df: DataFrame, col: str, fid_col: str | None = None) -> DataFrame:
    """Case-insensitive DISTINCT keeping the first-seen spelling.

    OGR iterates in FID order and keys a case-insensitive map on the
    value, storing the first spelling encountered. Deterministic Spark
    restatement: group on lower(col), representative = value of the
    minimum FID (min_by). Without a FID column the lexicographically
    smallest spelling is used (deterministic, order-free)."""
    low = F.lower(F.col(col))
    if fid_col is not None:
        rep = F.min_by(F.col(col), F.col(fid_col))
    else:
        rep = F.min(F.col(col))
    return df.groupBy(low.alias("_k")).agg(rep.alias(col)).drop("_k")


def first_match_left_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    right_order: str,
    prefix: str = "",
    broadcast: bool | None = None,
) -> DataFrame:
    """OGR SQL LEFT JOIN: one output row per left row, joined to the
    FIRST matching right row (in right_order, OGR's FID read order);
    NULLs when no match. Implemented as dedup-first (row_number over
    the key) + equi left join — the role of OGR's attribute index
    lookup (ogr_miattrind.cpp:778).

    `broadcast`: True forces a broadcast-hash join (small deduped right
    side, e.g. a dimension table); False forbids it; None (default)
    leaves the strategy to Catalyst/AQE — the deduped right side is
    ~|distinct keys| rows, which at 100x scale can exceed broadcast
    limits, so the default must NOT force a driver-side collect."""
    keys = [on] if isinstance(on, str) else list(on)
    w = Window.partitionBy(*keys).orderBy(F.asc(right_order))
    r1 = right.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    if prefix:
        for c in r1.columns:
            if c not in keys:
                r1 = r1.withColumnRenamed(c, prefix + c)
    if broadcast is True:
        r1 = F.broadcast(r1)
    elif broadcast is False:
        r1 = r1.hint("shuffle_merge")
    return left.join(r1, keys, "left")


def substr_ogr(col: Column | str, start: int, length: int | None = None) -> Column:
    """SUBSTR(s, start[, len]) — 1-based; negative start counts from the
    string end (ogr_sql_dialect.rst:153-168)."""
    c = F.col(col) if isinstance(col, str) else col
    if length is None:
        return F.when(
            F.lit(start) < 0, F.substring(c, start, 2147483647)
        ).otherwise(F.substring(c, max(start, 1), 2147483647))
    return F.substring(c, start if start != 0 else 1, length)


def hstore_get_value(col: Column | str, key: str) -> Column:
    """hstore_get_value(hstore_str, key): '"a"=>"x", "b"=>"y"' lookup.
    The key is regex-escaped — metacharacters in keys match literally."""
    import re

    c = F.col(col) if isinstance(col, str) else col
    pat = r'(?:^|,)\s*"?' + re.escape(key) + r'"?\s*=>\s*"?([^,"]*)"?'
    return F.nullif(F.regexp_extract(c, pat, 1), F.lit(""))


def avg_timestamp(col: Column | str) -> Column:
    """AVG(datetime) = datetime of the average unix time
    (ogr_gensql.cpp:1010-1027)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_seconds(F.avg(F.unix_timestamp(c)))


def union_all_layers(dfs: list[DataFrame], layer_names: list[str] | None = None) -> DataFrame:
    """OGR UNION ALL / OGRUnionLayer: superset schema (missing fields
    NULL), optional source-layer name column (ogrunionlayer.cpp:260)."""
    parts = []
    for idx, df in enumerate(dfs):
        if layer_names is not None:
            df = df.withColumn("layer_name", F.lit(layer_names[idx]))
        parts.append(df)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out


def extent(df: DataFrame, x_col: str = "lon", y_col: str = "lat") -> DataFrame:
    """GetExtent aggregate (ogrlayer.cpp:217): single-row layer bbox."""
    return df.agg(
        F.min(x_col).alias("xmin"),
        F.min(y_col).alias("ymin"),
        F.max(x_col).alias("xmax"),
        F.max(y_col).alias("ymax"),
    )


def intersect_layers(a: DataFrame, b: DataFrame) -> DataFrame:
    """SQL INTERSECT (set semantics, deduplicated) — Spark-native;
    surfaced for the relational completeness the reference gets from
    its SQLite dialect passthrough (sql_sqlite_dialect.rst:52)."""
    return a.intersect(b)


def except_layers(a: DataFrame, b: DataFrame) -> DataFrame:
    """SQL EXCEPT (set difference, deduplicated — NOT exceptAll's
    multiset subtraction, which would leave duplicate survivors)."""
    return a.subtract(b)


def semi_join(a: DataFrame, b: DataFrame, on: str | list) -> DataFrame:
    """LEFT SEMI join — rows of `a` with at least one match in `b`,
    never duplicated, no columns from `b` (the EXISTS-subquery shape
    the reference gets from its SQLite dialect). Spark-native
    leftsemi: the build side broadcasts when small, otherwise only the
    join keys shuffle."""
    return a.join(b, on, "left_semi")


def anti_join(a: DataFrame, b: DataFrame, on: str | list) -> DataFrame:
    """LEFT ANTI join — rows of `a` with NO match in `b` (NOT EXISTS)."""
    return a.join(b, on, "left_anti")
