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


def ivf_centroids(dim: int, n_lists: int) -> np.ndarray:
    """Deterministic unit-norm coarse-quantizer centroids (splitmix64
    gaussians). A data-adaptive quantizer (Lloyd iterations over a
    sample) can be passed to ivf_topk via `centroids=` — the plumbing
    is identical; the hash-based one keeps the oracle closed-form."""
    c = _hyperplanes(dim, n_lists, table=7_777_777)
    return c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)


def ivf_topk(
    emb: DataFrame,
    queries: pd.DataFrame,
    k: int = 10,
    n_lists: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF approximate top-k — the classic inverted-file ANN: every
    vector belongs to its nearest centroid's list; a query probes only
    its `nprobe` closest lists and reranks those candidates exactly.

    Scale shape: the assignment is a pure map (argmax against the tiny
    broadcast centroid matrix). At cluster scale the vector table is
    STORED bucketed by list id, so probing prunes partitions before
    any distance math; on local[N] the same pruning runs as a fused
    per-batch membership mask (the lsh_topk pattern). Driver holds
    only the (n_lists x dim) centroids and the query set."""
    q_ids, qn = _qmatrix(queries)
    dim = qn.shape[1]
    C = centroids if centroids is not None else ivf_centroids(dim, n_lists)
    # per-query probed lists: top-nprobe centroid cosines (ties by id)
    qsim = qn @ C.T
    order = np.lexsort((np.arange(C.shape[0])[None, :].repeat(len(qn), 0),
                        -qsim))
    probed = np.zeros((len(q_ids), C.shape[0]), dtype=bool)
    for qi in range(len(q_ids)):
        probed[qi, order[qi, :nprobe]] = True

    def partial(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            m = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            vs = mn @ C.T
            # nearest centroid, ties to the lowest id (stable argmax)
            assign = np.argmax(vs, axis=1)
            cand_mask = probed[:, assign]  # (Q, B)
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
    method: str = "block",
    blocks: int = 8,
    n_bits: int = 8,
    tables: int = 8,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: every (a, b), a < b, with
    cosine(a, b) >= threshold. Nothing is ever collected to the driver.

    method='block' (default, EXACT): block-matrix all-pairs. Each
    vector hashes to one of `blocks` blocks; every unordered block pair
    (i <= j) becomes one applyInPandas group that computes its cross
    (or within, for i == j) similarity matmul and emits only the hits.
    Shuffle volume is O(N * blocks * d); per-task memory is
    O((N/blocks) * d); the O(N^2) flop cost inherent to exact all-pairs
    is spread evenly over blocks*(blocks+1)/2 tasks. Size `blocks` ~
    N*d*8 / executor_budget at the target scale.

    method='lsh' (APPROXIMATE, the 10^9+-vector path): random-
    hyperplane signature buckets (same deterministic planes as
    lsh_topk) generate candidate pairs via a narrow (id, table, bucket)
    self-join; exact cosine re-ranks candidates only. Recall < 1 for
    pairs near the threshold — use for high thresholds where
    p_collision is favorable; measured against the exact path in tests.
    """
    if method == "lsh":
        return _neardup_pairs_lsh(emb, threshold, id_col, vec_col, n_bits, tables)
    if method != "block":
        raise ValueError(f"unknown method {method!r}")
    spark = emb.sparkSession

    e = emb.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(blocks)).cast("int").alias("_blk"),
    )
    rows = []
    pid = 0
    for i in range(blocks):
        for j in range(i, blocks):
            rows.append({"_blk": i, "_pair": pid, "_side": 0})
            if j != i:
                rows.append({"_blk": j, "_pair": pid, "_side": 1})
            pid += 1
    pmap = spark.createDataFrame(pd.DataFrame(rows))
    rep = e.join(F.broadcast(pmap), "_blk")

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame({"id_a": [], "id_b": []}).astype("int64")
        ids = pdf["_id"].to_numpy(dtype=np.int64)
        side = pdf["_side"].to_numpy(dtype=np.int64)
        M = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["_v"]])
        M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        if (side == 1).any():  # cross-block pair
            l, r = side == 0, side == 1
            S = M[l] @ M[r].T
            ia, ib = np.where(S >= threshold)
            a, b = ids[l][ia], ids[r][ib]
        else:  # diagonal: within-block, upper triangle
            S = M @ M.T
            ia, ib = np.where(np.triu(S >= threshold, k=1))
            a, b = ids[ia], ids[ib]
        return pd.DataFrame(
            {"id_a": np.minimum(a, b), "id_b": np.maximum(a, b)}
        )

    return rep.groupBy("_pair").applyInPandas(compute, schema=NEARDUP_SCHEMA)


def _neardup_pairs_lsh(
    emb: DataFrame,
    threshold: float,
    id_col: str,
    vec_col: str,
    n_bits: int,
    tables: int,
) -> DataFrame:
    """LSH-banded candidates + exact cosine re-rank (no driver data)."""
    first = emb.select(vec_col).first()
    dim = len(first[0])
    planes = np.stack([_hyperplanes(dim, n_bits, t) for t in range(tables)])
    pow2 = (1 << np.arange(n_bits)).astype(np.int64)

    BUCKET_SCHEMA = T.StructType(
        [
            T.StructField("_id", T.LongType()),
            T.StructField("_tbl", T.IntegerType()),
            T.StructField("_bkt", T.LongType()),
        ]
    )

    def bucketize(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            M = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
            for t in range(tables):
                b = ((planes[t] @ M.T) > 0).T.astype(np.int64) @ pow2
                yield pd.DataFrame(
                    {"_id": np.repeat(ids, 1), "_tbl": t, "_bkt": b}
                )

    buckets = emb.select(id_col, vec_col).mapInPandas(bucketize, schema=BUCKET_SCHEMA)
    a = buckets.select("_tbl", "_bkt", F.col("_id").alias("id_a"))
    b = buckets.select("_tbl", "_bkt", F.col("_id").alias("id_b"))
    cand = (
        a.join(b, ["_tbl", "_bkt"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    ea = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    eb = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    withv = cand.join(ea, "id_a").join(eb, "id_b")
    va = F.transform("_va", lambda x: x.cast("double"))
    vb = F.transform("_vb", lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(va, vb, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)
    na = F.sqrt(F.aggregate(F.transform(va, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))
    nb = F.sqrt(F.aggregate(F.transform(vb, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))
    cos = dot / F.greatest(na * nb, F.lit(1e-12))
    return withv.filter(cos >= threshold).select("id_a", "id_b")
