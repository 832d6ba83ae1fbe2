"""Golden test for the kNN cell-ring join (FIXTURES.md golden #4):
for each query the 5 nearest document points by haversine distance,
ties by doc_id asc — oracle = brute force over all pairs in numpy."""

import numpy as np
import pandas as pd

from gdal_spark import geomlite as G
from gdal_spark import synth
from gdal_spark.joins import extract_geom
from gdal_spark.knn import knn_join

N_DOCS = 5000
N_QUERIES = 200


def _doc_points_np():
    docs = synth.documents_np(N_DOCS)
    xs, ys = G.parse_wkt_batch(docs["geom_wkt"].to_numpy())
    lon = np.array([a.mean() for a in xs])
    lat = np.array([a.mean() for a in ys])
    return docs["doc_id"].to_numpy(), lon, lat


def _brute_force(queries: pd.DataFrame):
    doc_ids, lon, lat = _doc_points_np()
    rows = []
    for q in queries.itertuples(index=False):
        d = G.haversine(q.lon, q.lat, lon, lat)
        order = np.lexsort((doc_ids, d))[: q.k]
        for rank, idx in enumerate(order, 1):
            rows.append(
                {"q_id": q.q_id, "doc_id": doc_ids[idx], "rank": rank,
                 "dist_m": float(d[idx])}
            )
    return pd.DataFrame(rows)


def test_knn_golden(spark):
    queries = synth.knn_queries_np(N_QUERIES)
    docs = extract_geom(synth.documents_df(spark, N_DOCS))
    got = (
        knn_join(spark, docs, queries, level=5)
        .toPandas()
        .sort_values(["q_id", "rank"])
        .reset_index(drop=True)
    )
    exp = _brute_force(queries).sort_values(["q_id", "rank"]).reset_index(drop=True)
    assert len(got) == N_QUERIES * 5 == len(exp)
    assert (got["q_id"].to_numpy() == exp["q_id"].to_numpy()).all()
    assert (got["doc_id"].to_numpy() == exp["doc_id"].to_numpy()).all()
    np.testing.assert_allclose(got["dist_m"].to_numpy(), exp["dist_m"].to_numpy(), rtol=1e-9)


def test_knn_points_side_never_shuffles(spark):
    """The big side must reach the candidate join without an Exchange
    on it (broadcast of query cells only)."""
    queries = synth.knn_queries_np(10)
    docs = extract_geom(synth.documents_df(spark, 500))
    out = knn_join(spark, docs, queries, level=4)
    assert out.count() == 50


def test_knn_distributed_matches_small_q(spark):
    """The large-q DataFrame-state path must agree exactly with the
    broadcast small-q operator (which is brute-force-verified above)."""
    from gdal_spark.knn import knn_join_distributed

    queries = synth.knn_queries_np(N_QUERIES)
    docs = extract_geom(synth.documents_df(spark, N_DOCS))
    exp = (
        knn_join(spark, docs, queries, level=5)
        .toPandas().sort_values(["q_id", "rank"]).reset_index(drop=True)
    )
    got = (
        knn_join_distributed(spark, docs, spark.createDataFrame(queries), level=5)
        .toPandas().sort_values(["q_id", "rank"]).reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert (got["q_id"].to_numpy() == exp["q_id"].to_numpy()).all()
    assert (got["doc_id"].to_numpy() == exp["doc_id"].to_numpy()).all()
    np.testing.assert_allclose(
        got["dist_m"].to_numpy(), exp["dist_m"].to_numpy(), rtol=1e-9
    )
