"""Similarity search over embedding columns (array<float>).

Two paths, same result contract (q_id, vec_id/top id col, cosine, rank):

  cosine_topk     exact brute force — queries broadcast as a dense numpy
                  matrix; each partition computes a LOCAL top-k via one
                  matmul in mapInPandas (partial top-k = map-side
                  combine), then a window takes the global top-k over
                  the tiny per-partition survivors. The embedding table
                  never shuffles; shuffle volume is O(#partitions * q * k).

  lsh_topk        scale path — deterministic random-hyperplane signature
                  buckets (seeded splitmix64 gaussians via Box-Muller),
                  candidates = bucket collisions in >=1 of `tables`
                  repetitions, exact cosine re-rank on candidates only.
                  Approximate: recall measured against cosine_topk in
                  tests, not row-identical.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from .. import geomlite as G

TOPK_SCHEMA = T.StructType(
    [
        T.StructField("q_id", T.LongType()),
        T.StructField("vec_id", T.LongType()),
        T.StructField("cosine", T.DoubleType()),
    ]
)


def _qmatrix(queries: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
    qm = np.stack([np.asarray(v, dtype=np.float64) for v in queries["embedding"]])
    qn = qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-12)
    return queries["q_id"].to_numpy(dtype=np.int64), qn


def cosine_topk(
    emb: DataFrame,
    queries: pd.DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k. queries: pandas (q_id, embedding)."""
    q_ids, qn = _qmatrix(queries)

    def partial(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            m = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            sims = qn @ mn.T  # (Q, B)
            kk = min(k, sims.shape[1])
            top = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            rows = {
                "q_id": np.repeat(q_ids, kk),
                "vec_id": ids[top].ravel(),
                "cosine": np.take_along_axis(sims, top, axis=1).ravel(),
            }
            yield pd.DataFrame(rows)

    partials = emb.mapInPandas(partial, schema=TOPK_SCHEMA)
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        partials.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, n_bits: int, table: int) -> np.ndarray:
    """Deterministic gaussian hyperplanes via splitmix64 + Box-Muller."""
    n = dim * n_bits
    idx = np.arange(2 * n, dtype=np.int64) + table * 1_000_003
    u = (G.splitmix64(idx) >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    u1 = np.clip(u[:n], 1e-12, 1.0)
    u2 = u[n:]
    g = np.sqrt(-2.0 * np.log(u1)) * np.cos(2 * np.pi * u2)
    return g.reshape(n_bits, dim)


def lsh_topk(
    emb: DataFrame,
    queries: pd.DataFrame,
    k: int = 10,
    n_bits: int = 12,
    tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane LSH buckets."""
    q_ids, qn = _qmatrix(queries)
    dim = qn.shape[1]
    planes = [_hyperplanes(dim, n_bits, t) for t in range(tables)]
    pow2 = (1 << np.arange(n_bits)).astype(np.int64)
    # query buckets per table -> dict (table, bucket) -> query rows
    qbuckets = [((planes[t] @ qn.T) > 0).T.astype(np.int64) @ pow2 for t in range(tables)]

    def partial(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            m = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            cand_mask = np.zeros((len(q_ids), len(ids)), dtype=bool)
            for t in range(tables):
                vb = ((planes[t] @ mn.T) > 0).T.astype(np.int64) @ pow2
                cand_mask |= qbuckets[t][:, None] == vb[None, :]
            if not cand_mask.any():
                continue
            sims = np.where(cand_mask, qn @ mn.T, -np.inf)
            kk = min(k, sims.shape[1])
            top = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            vals = np.take_along_axis(sims, top, axis=1)
            keep = np.isfinite(vals)
            yield pd.DataFrame(
                {
                    "q_id": np.repeat(q_ids, kk)[keep.ravel()],
                    "vec_id": ids[top].ravel()[keep.ravel()],
                    "cosine": vals.ravel()[keep.ravel()],
                }
            )

    partials = emb.mapInPandas(partial, schema=TOPK_SCHEMA)
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        partials.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def cosine_topk_sql(emb: DataFrame, queries: pd.DataFrame, k: int = 10) -> DataFrame:
    """Pure-JVM variant (no Python at all): broadcast the queries as a
    literal array and use aggregate/zip_with for the dot product. Used
    for oracle-checked correctness; the numpy path is the fast one."""
    spark = emb.sparkSession
    qdf = spark.createDataFrame(
        pd.DataFrame(
            {
                "q_id": queries["q_id"].astype("int64"),
                "q_emb": [list(map(float, v)) for v in queries["embedding"]],
            }
        )
    )
    j = emb.crossJoin(F.broadcast(qdf))
    vec_d = F.transform("embedding", lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(vec_d, "q_emb", lambda a, b: a * b),
                      F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.transform(vec_d, lambda x: x * x), F.lit(0.0), lambda a, x: a + x))
    nb = F.sqrt(F.aggregate(F.transform("q_emb", lambda x: x * x), F.lit(0.0), lambda a, x: a + x))
    cos = dot / F.greatest(na * nb, F.lit(1e-12))
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        j.select("q_id", "vec_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


NEARDUP_SCHEMA = T.StructType(
    [
        T.StructField("id_a", T.LongType()),
        T.StructField("id_b", T.LongType()),
    ]
)


def neardup_pairs(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: every (a, b), a < b, with
    cosine(a, b) >= threshold.

    Brute-force baseline: the reference side of the comparison is
    broadcast as a dense normalized matrix; each partition emits its
    rows' hits via one matmul in mapInPandas — the embedding table
    never shuffles and the output is only the (rare) duplicate pairs.
    Scale path at 10^9+ vectors: LSH-banded candidate generation
    (lsh_topk's signature machinery) before the exact re-rank.
    """
    spark = emb.sparkSession
    ref = emb.select(id_col, vec_col).toPandas()
    ref_ids = ref[id_col].to_numpy(dtype=np.int64)
    M = np.stack([np.asarray(v, dtype=np.float64) for v in ref[vec_col]])
    M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    bc = spark.sparkContext.broadcast((ref_ids, M))

    def gen(batches):
        ids_all, M_all = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids_b = pdf[id_col].to_numpy(dtype=np.int64)
            Mb = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            Mb /= np.maximum(np.linalg.norm(Mb, axis=1, keepdims=True), 1e-12)
            S = Mb @ M_all.T
            ia, ib = np.where(S >= threshold)
            a = ids_b[ia]
            b = ids_all[ib]
            keep = a < b
            yield pd.DataFrame({"id_a": a[keep], "id_b": b[keep]})

    return emb.select(id_col, vec_col).mapInPandas(gen, schema=NEARDUP_SCHEMA)
