"""Physical-plan shape assertions for this session's operators —
the 100-TB design contract continued: sampling / blocklist / split
stay in one codegen'd map stage, k-means assignment never shuffles
the embedding table, packing shuffles once on the shard key."""


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_split_and_blocklist_are_map_only(spark, sf_dir):
    """Split assignment and blocklist filtering are pure column math:
    no exchange, no Python runner, whole-stage codegen."""
    import __spark_entry__ as E

    for name in ("sample_split", "url_blocklist"):
        p = _plan(E.queries()[name](spark, sf_dir))
        assert "Exchange hashpartitioning" not in p, name
        assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p, name
        assert "*(1)" in p, name


def test_kmeans_assignment_no_embedding_shuffle(spark, sf_dir):
    """The final k-means assignment is a map stage over the embedding
    scan: centroids are literals, so no join and no exchange."""
    from gdal_spark.functions import cluster as CL

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    p = _plan(CL.kmeans_assign(emb, k=4, iters=1))
    assert "Exchange" not in p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p


def test_pack_sequences_single_shard_shuffle(spark, sf_dir):
    """Packing exchanges once, on the shard key, for the running-total
    window; token counting itself is codegen'd."""
    import __spark_entry__ as E

    p = _plan(E.queries()["pack_sequences"](spark, sf_dir))
    assert p.count("Exchange hashpartitioning") == 1
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p


def test_dup_spans_partial_count(spark, sf_dir):
    """Exact-substring dedup combines window-hash counts map-side
    before its shuffle (partial_count), and the adjacency merge adds
    exactly one more hash exchange (id) beyond the hash/count pair."""
    import __spark_entry__ as E

    p = _plan(E.queries()["dup_spans"](spark, sf_dir))
    assert "partial_count" in p
    assert p.count("Exchange hashpartitioning") <= 3


def test_chunk_documents_map_only(spark, sf_dir):
    import __spark_entry__ as E

    p = _plan(E.queries()["chunk_documents"](spark, sf_dir))
    assert "Exchange hashpartitioning" not in p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
