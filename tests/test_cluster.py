"""k-means / SemDeDup clustering + exact-substring dedup tests."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark.functions import cluster as CL
from gdal_spark.functions.text import duplicate_spans


def _emb_df(spark, rows):
    return spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


def test_kmeans_separates_two_blobs(spark):
    rng = np.random.RandomState(7)
    a = rng.normal(0.0, 0.1, (20, 4))
    b = rng.normal(10.0, 0.1, (20, 4))
    rows = [(i, a[i]) for i in range(20)] + [(20 + i, b[i]) for i in range(20)]
    out = CL.kmeans_assign(_emb_df(spark, rows), k=2, iters=3).toPandas()
    lo = set(out[out.vec_id < 20].cluster)
    hi = set(out[out.vec_id >= 20].cluster)
    assert len(lo) == 1 and len(hi) == 1 and lo != hi
    # d2 after convergence is within-blob variance scale, not blob gap
    assert out.d2.max() < 1.0


def test_kmeans_deterministic_tiebreak(spark):
    # two coincident seed points: every vector is equidistant from both
    # centroids after the first update; the lowest cid must win
    rows = [(0, [1.0, 1.0]), (1, [1.0, 1.0]), (2, [1.0, 1.0])]
    out = CL.kmeans_assign(_emb_df(spark, rows), k=2, iters=2).toPandas()
    assert set(out.cluster) == {0}


def test_semdedup_finds_in_cluster_pair(spark):
    rng = np.random.RandomState(3)
    base = rng.normal(0, 1, 8)
    rows = [(0, base), (1, base * 1.001)]  # cosine ~ 1
    rows += [(2 + i, rng.normal(5, 1, 8)) for i in range(6)]
    pairs = CL.semdedup_pairs(
        _emb_df(spark, rows), k=2, iters=2, threshold=0.99
    ).toPandas()
    assert {(0, 1)} == set(zip(pairs.id_a, pairs.id_b))
    assert pairs.cosine.iloc[0] > 0.999


def test_semdedup_max_cluster_guard(spark):
    rows = [(i, [0.0, float(i) * 1e-3]) for i in range(10)]
    with pytest.raises(Exception, match="max_cluster"):
        CL.semdedup_pairs(
            _emb_df(spark, rows), k=1, iters=1, max_cluster=4
        ).collect()


def test_kmeans_sql_matches_spark(spark, tmp_path):
    import duckdb

    rng = np.random.RandomState(11)
    rows = [(i, rng.normal(i % 3, 0.2, 6)) for i in range(30)]
    df = _emb_df(spark, rows)
    pq = str(tmp_path / "emb.parquet")
    df.toPandas().to_parquet(pq)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{pq}'")
    want = (
        con.execute(CL.kmeans_assign_sql(k=3, iters=3))
        .fetchdf()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    got = (
        CL.kmeans_assign(df, k=3, iters=3)
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert (got.cluster.values == want.cluster.values).all()
    assert np.allclose(got.d2.values, want.d2.values, atol=1e-9)


def test_duplicate_spans_boilerplate(spark):
    boiler = " ".join(f"tok{i}" for i in range(16))
    docs = spark.createDataFrame(
        [
            (1, "alpha beta " + boiler + " gamma"),
            (2, "unrelated words only here with no duplication at all"),
            (3, boiler + " trailing stuff here"),
        ],
        "doc_id long, text string",
    )
    out = duplicate_spans(docs, n=16).toPandas().sort_values("doc_id")
    assert list(out.doc_id) == [1, 3]
    # doc 1: boiler starts at token 2; doc 3: at token 0
    assert list(out.span_start) == [2, 0]
    assert list(out.span_end) == [17, 15]


def test_duplicate_spans_merges_adjacent_runs(spark):
    boiler = " ".join(f"w{i}" for i in range(20))  # 20 tokens > n
    docs = spark.createDataFrame(
        [(1, boiler), (2, boiler)], "doc_id long, text string"
    )
    out = duplicate_spans(docs, n=16).toPandas()
    # positions 0..4 all duplicate -> ONE merged span 0..19 per doc
    assert len(out) == 2
    assert set(out.span_start) == {0} and set(out.span_end) == {19}
