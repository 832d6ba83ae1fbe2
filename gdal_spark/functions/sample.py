"""Deterministic corpus sampling / split assignment.

Training-data pipelines need REPRODUCIBLE subset selection — a rerun
(or a resumed checkpoint) must pick exactly the same rows, so Spark's
df.sample (partition-RNG based, changes under repartitioning) is the
wrong tool. Everything here is a pure function of the row id:

  hash_u01          u = pmod((id + seed) * 2654435761, 2^32) / 2^32 —
                    the Knuth multiplicative hash already used by the
                    fixture generators; odd multiplier -> injective on
                    [0, 2^32), so u is collision-free for ids < 2^31
                    (beyond that the 64-bit product wraps, u stays in
                    [0,1) via pmod but injectivity is no longer
                    guaranteed). For 10^12-row ids swap in
                    synth.sm64_col (splitmix64) — same pattern, 64-bit
                    safe.
  split_assign      named train/val/test split by u thresholds; pure
                    column math, no shuffle, stable under any
                    partitioning.
  stratified_sample top-n-per-stratum quota sampling (e.g. n docs per
                    language): rank by u within each stratum. One
                    shuffle on the stratum key; skewed strata are
                    bounded because only rank <= n survives the
                    window (partial top-k would need a two-stage
                    rank for giant strata — noted, not needed while
                    strata counts are << partition size).

No GDAL counterpart; LLM-corpus extension surface. Both ops dual-emit
ANSI SQL with identical integer arithmetic for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

KNUTH = 2654435761
MOD32 = 1 << 32


def hash_u01(col: Column | str, seed: int = 0) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    # pmod, not %: the 64-bit product wraps negative for ids above
    # ~3.47e9 and Spark's % keeps the dividend's sign — a plain % would
    # put u in (-1, 0) and route every such row to 'train'
    u = F.pmod((c.cast("long") + F.lit(seed)) * F.lit(KNUTH), F.lit(MOD32))
    return u.cast("double") / float(MOD32)


def hash_u01_sql(expr: str, seed: int = 0) -> str:
    return f"(CAST((({expr} + {seed}) * {KNUTH}) % {MOD32} AS DOUBLE) / {MOD32})"


def split_assign(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: int = 0,
    train: float = 0.9,
    val: float = 0.05,
) -> DataFrame:
    """Add a 'split' column: train / val / test by hash thresholds."""
    u = hash_u01(id_col, seed)
    split = (
        F.when(u < train, F.lit("train"))
        .when(u < train + val, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn("split", split)


def split_assign_sql(
    id_expr: str = "doc_id", seed: int = 0, train: float = 0.9, val: float = 0.05
) -> str:
    u = hash_u01_sql(id_expr, seed)
    return (
        f"CASE WHEN {u} < {train} THEN 'train' "
        f"WHEN {u} < {train + val} THEN 'val' ELSE 'test' END"
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    n_per_stratum: int,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Keep the n rows with the smallest hash per stratum —
    deterministic quota sampling (u is injective, so the order has no
    ties; id_col is a formal tiebreaker only)."""
    u = hash_u01(id_col, seed)
    w = Window.partitionBy(strata_col).orderBy(u.asc(), F.col(id_col).asc())
    return (
        df.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= n_per_stratum)
        .drop("_rank")
    )


def domain_resample(
    df: DataFrame,
    domain_col: str,
    targets: dict,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Downsample-only domain-mix resampling: keep a deterministic
    subset whose domain proportions match `targets` (weights, need not
    sum to 1), as large as the corpus allows.

    With n_d rows per domain and normalized target t_d, the largest
    achievable output is M = min_d n_d / t_d; each domain keeps rows
    with hash u < p_d = t_d * M / n_d (so E[m_d] = t_d * M and the
    binding domain keeps everything). Deterministic per id: a rerun or
    a resumed checkpoint selects exactly the same rows.

    Scale shape: one groupBy producing #domains rows, a broadcast of
    the per-domain thresholds, then a map-only filter — the corpus
    itself never shuffles. Domains absent from `targets` are dropped
    (ogrmerge of web-corpus practice: unlisted = excluded)."""
    tsum = float(sum(targets.values()))
    spark = df.sparkSession
    tgt = spark.createDataFrame(
        [(str(k), float(v) / tsum) for k, v in targets.items()],
        f"{domain_col} string, _t double",
    )
    counts = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("_n"))
    j = counts.join(F.broadcast(tgt), domain_col, "inner")
    mrow = j.select(F.min(F.col("_n") / F.col("_t")).alias("_m"))
    probs = j.crossJoin(F.broadcast(mrow)).select(
        domain_col,
        F.least(F.lit(1.0), F.col("_t") * F.col("_m") / F.col("_n")).alias("_p"),
    )
    out = df.join(F.broadcast(probs), domain_col, "inner")
    return out.filter(hash_u01(id_col, seed) < F.col("_p")).drop("_p")


def domain_resample_sql(
    table: str, domain_col: str, targets: dict, id_col: str = "doc_id",
    seed: int = 0, cols: str = "*",
) -> str:
    """ANSI-SQL twin of domain_resample for the DuckDB oracle — the
    identical integer hash and threshold arithmetic."""
    tsum = float(sum(targets.values()))
    vals = ", ".join(
        f"('{k}', CAST({float(v) / tsum!r} AS DOUBLE))" for k, v in targets.items()
    )
    u = hash_u01_sql(id_col, seed)
    return f"""
      WITH tgt({domain_col}, _t) AS (VALUES {vals}),
      c AS (SELECT {domain_col}, COUNT(*) AS _n FROM {table} GROUP BY 1),
      jn AS (SELECT c.{domain_col}, _n, _t FROM c JOIN tgt USING ({domain_col})),
      m AS (SELECT MIN(_n / _t) AS _m FROM jn),
      p AS (SELECT {domain_col},
                   LEAST(1.0, _t * (SELECT _m FROM m) / _n) AS _p FROM jn)
      SELECT {cols} FROM {table} t
      JOIN p USING ({domain_col})
      WHERE {u} < _p
    """
