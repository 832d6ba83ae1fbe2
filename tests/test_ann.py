"""ANN similarity search tests: exact brute-force vs numpy oracle, JVM
variant parity, LSH recall."""

import numpy as np
import pandas as pd

from gdal_spark.functions import ann

K = 10
NQ = 8


def _queries(emb_pdf):
    q = emb_pdf.head(NQ).copy()
    return pd.DataFrame({"q_id": q["vec_id"].astype("int64"), "embedding": q["embedding"]})


def _oracle(emb_pdf, queries, k):
    m = np.stack([np.asarray(v, dtype=np.float64) for v in emb_pdf["embedding"]])
    mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    ids = emb_pdf["vec_id"].to_numpy(dtype=np.int64)
    out = {}
    for q in queries.itertuples(index=False):
        v = np.asarray(q.embedding, dtype=np.float64)
        v = v / max(np.linalg.norm(v), 1e-12)
        sims = mn @ v
        order = np.lexsort((ids, -sims))[:k]
        out[q.q_id] = [int(ids[i]) for i in order]
    return out


def test_cosine_topk_exact(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    emb_pdf = emb.toPandas()
    queries = _queries(emb_pdf)
    got = ann.cosine_topk(emb, queries, k=K).toPandas().sort_values(["q_id", "rank"])
    exp = _oracle(emb_pdf, queries, K)
    for q_id, grp in got.groupby("q_id"):
        assert grp["vec_id"].tolist() == exp[q_id]
    # self-match is rank 1 with cosine ~1
    r1 = got[got["rank"] == 1]
    assert (r1["q_id"].to_numpy() == r1["vec_id"].to_numpy()).all()
    assert (r1["cosine"] > 0.999999).all()


def test_cosine_topk_sql_parity(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = _queries(emb.toPandas())
    a = ann.cosine_topk(emb, queries, k=K).toPandas().sort_values(["q_id", "rank"])
    b = ann.cosine_topk_sql(emb, queries, k=K).toPandas().sort_values(["q_id", "rank"])
    assert a["vec_id"].tolist() == b["vec_id"].tolist()
    np.testing.assert_allclose(a["cosine"].to_numpy(), b["cosine"].to_numpy(), rtol=1e-9)


def test_lsh_topk_recall(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    emb_pdf = emb.toPandas()
    queries = _queries(emb_pdf)
    exact = _oracle(emb_pdf, queries, K)
    # hyperplane LSH collision prob per table ~ (1 - theta/pi)^n_bits;
    # these embeddings' true neighbors sit near cosine ~0.5 (theta 60deg),
    # so 4 bits x 16 tables gives ~97% expected recall per neighbor
    got = ann.lsh_topk(emb, queries, k=K, n_bits=4, tables=16).toPandas()
    recalls = []
    for q_id in queries["q_id"]:
        approx = set(got[got["q_id"] == q_id]["vec_id"].tolist())
        recalls.append(len(approx & set(exact[q_id])) / K)
    assert np.mean(recalls) >= 0.8, recalls
    # self-match must always survive (same bucket in every table)
    r1 = got[got["rank"] == 1]
    assert (r1["q_id"].to_numpy() == r1["vec_id"].to_numpy()).all()


def test_neardup_block_exact_and_lsh_recall(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    emb_pdf = emb.toPandas()
    ids = emb_pdf["vec_id"].to_numpy(dtype=np.int64)
    M = np.stack([np.asarray(v, dtype=np.float64) for v in emb_pdf["embedding"]])
    M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    S = M @ M.T
    ia, ib = np.where(np.triu(S >= 0.4, k=1))
    exp = {(int(min(ids[i], ids[j])), int(max(ids[i], ids[j]))) for i, j in zip(ia, ib)}

    got = ann.neardup_pairs(emb, threshold=0.4, blocks=4).toPandas()
    got_pairs = {(int(a), int(b)) for a, b in zip(got["id_a"], got["id_b"])}
    assert got_pairs == exp  # block path is EXACT

    lsh = ann.neardup_pairs(emb, threshold=0.4, method="lsh", n_bits=4, tables=16).toPandas()
    lsh_pairs = {(int(a), int(b)) for a, b in zip(lsh["id_a"], lsh["id_b"])}
    assert lsh_pairs <= exp  # re-rank never admits false positives
    if exp:
        assert len(lsh_pairs & exp) / len(exp) >= 0.8  # recall bound


def test_ivf_topk_recall(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = _queries(emb.toPandas())
    exact = ann.cosine_topk(emb, queries, k=5).toPandas()
    ivf = ann.ivf_topk(emb, queries, k=5, n_lists=8, nprobe=4).toPandas()
    # with half the lists probed, recall@5 should be high
    e = {(r.q_id, r.vec_id) for r in exact.itertuples()}
    g = {(r.q_id, r.vec_id) for r in ivf.itertuples()}
    assert len(e & g) / len(e) >= 0.6
    # and every IVF hit carries the TRUE cosine (exact rerank)
    m = exact.merge(ivf, on=["q_id", "vec_id"], suffixes=("_e", "_i"))
    assert np.allclose(m["cosine_e"], m["cosine_i"], atol=1e-12)
