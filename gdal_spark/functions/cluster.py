"""Distributed embedding clustering + semantic dedup (SemDeDup).

Training-data-pipeline operators over the embeddings table
(vec_id bigint, embedding array<float>):

  kmeans_assign    Lloyd's k-means with deterministic init (the k
                   vectors with the smallest ids, in id order) and a
                   fixed iteration count. Each round is ONE scan:
                   assignment is pure column math against k broadcast
                   literal centroids (argmin over an array of squared
                   distances — ties break to the lowest centroid id via
                   array_position-of-min), and the centroid update is
                   posexplode -> groupBy(cluster, dim) avg, which hash-
                   aggregates map-side so the shuffle is O(k*d) rows
                   regardless of input size. Only the k*d centroid
                   matrix ever reaches the driver — the classic
                   broadcast-Lloyd pattern (MLlib does the same), safe
                   at 10^12 rows.

  semdedup_pairs   SemDeDup (Abbas et al. 2023, arXiv:2303.09540):
                   cluster first, then find near-duplicate pairs ONLY
                   within each cluster — the quadratic cosine check is
                   confined to cluster-sized blocks instead of the full
                   corpus. Per-cluster pairing runs as a vectorized
                   numpy gram matrix in applyInPandas; a `max_cluster`
                   guard documents the re-shard path for degenerate
                   giant clusters (re-cluster the oversized block, the
                   paper's own remedy).

  kmeans_oracle_sql / semdedup_oracle_sql emit the equivalent unrolled
  ANSI SQL (DuckDB list functions) from the same parameters, the dual-
  emission convention used by crs.py.

No GDAL counterpart — this module is part of the LLM-corpus extension
surface; distances floor-grid to 1e-6 for cross-engine hashing like
functions/text.py quality_score.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dist2_col(vec, centroid: list[float]):
    lit = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(vec, lit, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def kmeans_assign(
    emb: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Return (id, cluster, d2) after `iters` Lloyd rounds.

    cluster is the 0-based index into the id-ordered deterministic
    seeds; d2 is the squared distance to the winning centroid at the
    final assignment, floored to the 1e-6 grid.
    """
    spark = emb.sparkSession
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = emb.select(F.col(id_col).alias("id"), vec.alias("v"))
    base = base.persist()
    seeds = base.orderBy("id").limit(k).collect()
    cents = [list(r["v"]) for r in seeds]

    def assign(df: DataFrame) -> DataFrame:
        darr = F.array(*[_dist2_col(F.col("v"), c) for c in cents])
        return df.select(
            "id",
            "v",
            (F.array_position(darr, F.array_min(darr)) - 1)
            .cast("int")
            .alias("cluster"),
            F.array_min(darr).alias("d2"),
        )

    for it in range(iters):
        a = assign(base)
        if it == iters - 1:
            out = a.select(
                F.col("id").alias(id_col),
                "cluster",
                (F.floor(F.col("d2") * 1e6) / 1e6).alias("d2"),
            )
            base.unpersist()
            return out
        means = (
            a.select("cluster", F.posexplode("v").alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(F.avg("val").alias("m"))
            .groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .collect()
        )
        got = {r["cluster"]: [p["m"] for p in r["pm"]] for r in means}
        cents = [got.get(j, cents[j]) for j in range(k)]
    raise AssertionError("unreachable")


_PAIR_SCHEMA = T.StructType(
    [
        T.StructField("id_a", T.LongType()),
        T.StructField("id_b", T.LongType()),
        T.StructField("cosine", T.DoubleType()),
    ]
)


def semdedup_pairs(
    emb: DataFrame,
    k: int = 8,
    iters: int = 3,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster: int = 200_000,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, cosine >= threshold) found
    within k-means clusters only. The dedup policy on top is "keep the
    lowest id": drop every id that appears as id_b.

    max_cluster bounds the quadratic block; a cluster above it raises
    with the documented remedy (raise k / re-cluster the block) rather
    than silently running an O(n^2) stage.
    """
    assigned = kmeans_assign(emb, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    joined = emb.select(F.col(id_col).alias("id"), vec.alias("v")).join(
        assigned.select(F.col(id_col).alias("id"), "cluster"), "id"
    )

    def pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n > max_cluster:
            raise ValueError(
                f"cluster of {n} > max_cluster={max_cluster}: raise k or "
                "re-cluster this block before the quadratic pass"
            )
        if n < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cosine": "float64"}
            )
        pdf = pdf.sort_values("id").reset_index(drop=True)
        m = np.vstack(pdf["v"].to_numpy())
        norm = np.linalg.norm(m, axis=1)
        norm[norm == 0] = 1.0
        g = (m @ m.T) / np.outer(norm, norm)
        ia, ib = np.triu_indices(n, k=1)
        keep = g[ia, ib] >= threshold
        ids = pdf["id"].to_numpy()
        return pd.DataFrame(
            {
                "id_a": ids[ia[keep]],
                "id_b": ids[ib[keep]],
                "cosine": np.floor(g[ia, ib][keep] * 1e6) / 1e6,
            }
        )

    return joined.groupBy("cluster").applyInPandas(pairs, _PAIR_SCHEMA)


# ------------------------------------------------------------ oracle SQL
def _sql_dist2(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(list_zip({a}, {b}), "
        "s -> (struct_extract(s, 1) - struct_extract(s, 2))"
        " * (struct_extract(s, 1) - struct_extract(s, 2))))"
    )


def kmeans_assign_sql(
    k: int = 8, iters: int = 3, table: str = "embeddings"
) -> str:
    """Unrolled DuckDB SQL replicating kmeans_assign exactly: same
    seeds, same tie-break (lowest centroid id), same empty-cluster
    carry-forward, same 1e-6 floor grid."""
    parts = [
        f"e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM {table})",
        f"c0 AS (SELECT ROW_NUMBER() OVER (ORDER BY id) - 1 AS cid, v "
        f"FROM (SELECT id, v FROM e ORDER BY id LIMIT {k}))",
    ]
    for it in range(1, iters + 1):
        prev = f"c{it - 1}"
        parts.append(
            f"a{it} AS (SELECT id, v, cid, d2 FROM ("
            f"  SELECT *, ROW_NUMBER() OVER (PARTITION BY id ORDER BY d2, cid) AS rn"
            f"  FROM (SELECT e.id, e.v, c.cid, {_sql_dist2('e.v', 'c.v')} AS d2"
            f"        FROM e CROSS JOIN {prev} c)"
            f") WHERE rn = 1)"
        )
        if it < iters:
            parts.append(
                f"m{it} AS (SELECT cid, LIST(mv ORDER BY pos) AS v FROM ("
                f"  SELECT cid, pos, AVG(val) AS mv FROM ("
                f"    SELECT cid, GENERATE_SUBSCRIPTS(v, 1) AS pos, UNNEST(v) AS val"
                f"    FROM a{it}) GROUP BY cid, pos"
                f") GROUP BY cid)"
            )
            parts.append(
                f"c{it} AS (SELECT p.cid, COALESCE(m.v, p.v) AS v "
                f"FROM {prev} p LEFT JOIN m{it} m USING (cid))"
            )
    return "WITH " + ",\n".join(parts) + (
        f"\nSELECT id AS vec_id, CAST(cid AS INT) AS cluster,"
        f" FLOOR(d2 * 1e6) / 1e6 AS d2 FROM a{iters}"
    )


def semdedup_pairs_sql(
    k: int = 8, iters: int = 3, threshold: float = 0.9, table: str = "embeddings"
) -> str:
    base = kmeans_assign_sql(k=k, iters=iters, table=table)
    head, _tail = base.rsplit("\nSELECT", 1)
    dot = (
        "list_sum(list_transform(list_zip(a.v, b.v), "
        "s -> struct_extract(s, 1) * struct_extract(s, 2)))"
    )
    nrm = (
        "GREATEST(SQRT(list_sum(list_transform({0}, x -> x * x))), 1e-300)"
    )
    return (
        head
        + f",\nfin AS (SELECT id, cid, v FROM a{iters})\n"
        + "SELECT id_a, id_b, FLOOR(cosine * 1e6) / 1e6 AS cosine FROM (\n"
        + f"  SELECT a.id AS id_a, b.id AS id_b,\n"
        + f"         {dot} / ({nrm.format('a.v')} * {nrm.format('b.v')}) AS cosine\n"
        + "  FROM fin a JOIN fin b ON a.cid = b.cid AND a.id < b.id\n"
        + f") WHERE cosine >= {threshold}"
    )
