"""Tests for dedup + text analysis operators (training-data pipeline)."""

import numpy as np
from pyspark.sql import Row
from pyspark.sql import functions as F

from gdal_spark.functions import text as TX


def _docs(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    near = base.replace("today", "tonight")
    rows = [
        Row(doc_id=1, text=base),
        Row(doc_id=2, text=base),                     # exact dup of 1
        Row(doc_id=3, text="  THE   quick brown fox jumps over the lazy dog and runs far away today "),  # ws/case dup
        Row(doc_id=4, text=near),                     # near-dup of 1
        Row(doc_id=5, text="completely different content about spark shuffles and partitions"),
        Row(doc_id=6, text="el la de que y en un por con los amigos"),
        Row(doc_id=7, text="le la de et les des en un du une maison"),
    ]
    return spark.createDataFrame(rows)


def test_exact_dedup(spark):
    got = TX.exact_dedup(_docs(spark), "text", "doc_id").orderBy("doc_id").collect()
    groups = {}
    for r in got:
        groups.setdefault(r["dup_group"], []).append((r["doc_id"], r["is_canonical"]))
    g1 = [g for g in groups.values() if len(g) > 1]
    assert len(g1) == 1 and sorted(x[0] for x in g1[0]) == [1, 2, 3]
    assert [x[1] for x in sorted(g1[0])] == [True, False, False]  # min id canonical


def test_minhash_near_dup(spark):
    pairs = TX.minhash_dedup(_docs(spark), "text", "doc_id", threshold=0.5).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    # exact dups + the near-dup pair must all be found
    assert {(1, 2), (1, 3), (2, 3)} <= got
    assert any(p in got for p in [(1, 4), (2, 4), (3, 4)])
    # unrelated docs must not pair
    assert not any(5 in p or 6 in p or 7 in p for p in got)


def test_minhash_deterministic_across_runs(spark):
    s1 = TX.minhash_signatures(_docs(spark), "text", "doc_id").orderBy("doc_id").collect()
    s2 = TX.minhash_signatures(_docs(spark), "text", "doc_id").orderBy("doc_id").collect()
    assert [r["sig"] for r in s1] == [r["sig"] for r in s2]


def test_simhash_pairs(spark):
    sh = TX.simhash(_docs(spark), "text", "doc_id")
    vals = {r["doc_id"]: r["simhash"] for r in sh.collect()}
    assert vals[1] == vals[2]  # identical text -> identical simhash
    # 4x16 banding GUARANTEES recall only for hamming <= 3 (pigeonhole);
    # beyond that candidates are best-effort.
    pairs = TX.simhash_pairs(sh, "doc_id", max_hamming=10).collect()
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    assert got.get((1, 2)) == 0 and got.get((1, 3)) == 0 and got.get((2, 3)) == 0
    assert all(h <= 10 for h in got.values())
    # near-dup of 1 sits at hamming 6 — may or may not share a band;
    # what's guaranteed is it is NOT reported with a wrong distance
    if (1, 4) in got:
        assert got[(1, 4)] == 6


def test_simhash_pairs_degenerate_band_cap(spark):
    """Web corpora produce degenerate bands (simhash 0 from empty /
    whitespace docs puts EVERY such doc in one bucket per band); the
    hot-bucket cap must drop those buckets instead of going |B|^2,
    while selective buckets keep pairing."""
    rows = [Row(doc_id=i, text="   ") for i in range(40)]  # simhash 0
    rows += [
        Row(doc_id=100, text="unique informative text about spark plans"),
        Row(doc_id=101, text="unique informative text about spark plans"),
    ]
    sh = TX.simhash(spark.createDataFrame(rows), "text", "doc_id")
    vals = {r["doc_id"]: r["simhash"] for r in sh.collect()}
    assert all(vals[i] == 0 for i in range(40))
    capped = TX.simhash_pairs(sh, "doc_id", max_hamming=3, max_bucket=10)
    got = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    # degenerate-bucket pairs dropped; the real dup pair survives
    assert got == {(100, 101)}
    # uncapped still returns the full quadratic set (40*39/2 + 1)
    full = TX.simhash_pairs(sh, "doc_id", max_hamming=3, max_bucket=None)
    assert full.count() == 40 * 39 // 2 + 1


def test_ngram_jaccard_verification(spark):
    docs = _docs(spark)
    cand = TX.minhash_dedup(docs, "text", "doc_id", threshold=0.4)
    verified = TX.ngram_jaccard_pairs(docs, cand, "text", "doc_id").collect()
    j = {(r["id_a"], r["id_b"]): r["jaccard"] for r in verified}
    assert j[(1, 2)] == 1.0
    if (1, 4) in j:
        assert 0.5 < j[(1, 4)] < 1.0


def test_lang_id_and_quality_and_tokens(spark):
    df = _docs(spark)
    got = {r["doc_id"]: r for r in df.select(
        "doc_id",
        TX.lang_id("text").alias("lang"),
        TX.token_count("text").alias("ntok"),
        TX.token_count("text", "bpe").alias("nbpe"),
        TX.quality_score("text").alias("q"),
    ).collect()}
    assert got[1]["lang"] == "en"
    assert got[6]["lang"] == "es"
    assert got[7]["lang"] == "fr"
    assert got[1]["ntok"] == 14
    assert got[1]["nbpe"] >= got[1]["ntok"]
    assert 0.0 <= got[1]["q"] <= 1.0
    assert got[5]["q"] > 0.3


def test_fingerprint_deterministic_and_ws_robust(spark):
    df = _docs(spark)
    fp = {r["doc_id"]: r["fp"] for r in df.select(
        "doc_id", TX.fingerprint(F.regexp_replace(F.lower("text"), r"\s+", " ")).alias("fp")
    ).collect()}
    assert fp[1] == fp[2]
    assert fp[1] != fp[5]


def test_on_driver_documents_table(spark, sf_dir):
    """Operators run on the driver's real documents parquet."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    out = docs.select(
        "doc_id",
        TX.token_count("text").alias("ntok"),
        TX.lang_id("text").alias("lang"),
        TX.quality_score("text").alias("q"),
    )
    assert out.count() == n
    assert out.filter(F.col("ntok") > 0).count() == n


def test_scrub_pii(spark):
    from gdal_spark.functions.text import scrub_pii

    df = spark.createDataFrame(
        [(1, "write bob.smith+x@mail.example.org or 192.168.1.10 "
             "or +31 20 624-1111 today")],
        "id int, t string",
    )
    got = df.select(scrub_pii("t").alias("s")).first()["s"]
    assert "<EMAIL>" in got and "<IP>" in got and "<PHONE>" in got
    assert "bob" not in got and "192.168" not in got and "624" not in got


def test_repetition_metrics(spark):
    from gdal_spark.functions.text import repetition_metrics
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "spam spam spam ham\nline\nline\nother")],
        "id int, t string",
    )
    dw, dl = repetition_metrics(F.col("t"))
    r = df.select(dw.alias("w"), dl.alias("l")).first()
    # 7 tokens, 4 distinct -> 3/7; 4 lines ('spam spam spam ham' is
    # one line), 3 distinct -> 1/4
    assert abs(r["w"] - (1 - 4 / 7)) < 2e-6
    assert abs(r["l"] - 0.25) < 2e-6


def test_extract_domains_and_blocklist(spark):
    from gdal_spark.functions.text import blocklist_filter, extract_domains

    df = spark.createDataFrame(
        [
            (1, "go to https://Bad.Example.com/x and http://ok.org/y"),
            (2, "only http://fine.net here"),
            (3, "no urls at all"),
        ],
        "id int, t string",
    )
    doms = {r["id"]: list(r["d"]) for r in
            df.select("id", extract_domains("t").alias("d")).collect()}
    assert doms[1] == ["bad.example.com", "ok.org"]
    assert doms[3] == []
    kept = blocklist_filter(df, "t", ["bad.example.com"])
    assert sorted(r["id"] for r in kept.collect()) == [2, 3]


def test_split_assign_deterministic(spark):
    from gdal_spark.functions.sample import split_assign

    df = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    a = split_assign(df, "doc_id", seed=1).groupBy("split").count().collect()
    counts = {r["split"]: r["count"] for r in a}
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > 800  # ~90%
    # same seed -> identical assignment under different partitioning
    b = split_assign(df.repartition(13), "doc_id", seed=1)
    a2 = split_assign(df, "doc_id", seed=1)
    assert a2.exceptAll(b).count() == 0 and b.exceptAll(a2).count() == 0


def test_stratified_sample_quota(spark):
    from gdal_spark.functions.sample import stratified_sample

    df = spark.range(0, 300).select(
        F.col("id").alias("doc_id"), (F.col("id") % 3).alias("s")
    )
    out = stratified_sample(df, "s", 10, id_col="doc_id").toPandas()
    assert len(out) == 30
    assert out.groupby("s").size().tolist() == [10, 10, 10]


def test_pack_sequences(spark):
    from gdal_spark.functions.text import pack_sequences

    df = spark.createDataFrame(
        [(i, 100) for i in range(8)], "doc_id long, ntok long"
    )
    out = pack_sequences(df, "ntok", capacity=256, shards=1).toPandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    # single shard: offsets 0,100,...,700; bins 0,0,0,1,1,1,2,2
    assert list(out.start_offset) == [100 * i for i in range(8)]
    assert list(out.bin) == [0, 0, 0, 1, 1, 1, 2, 2]
    # deterministic under repartitioning
    out2 = pack_sequences(df.repartition(5), "ntok", capacity=256, shards=1)
    assert out2.exceptAll(
        pack_sequences(df, "ntok", capacity=256, shards=1)
    ).count() == 0


def test_chunk_documents(spark):
    from gdal_spark.functions.text import chunk_documents

    text = " ".join(f"t{i}" for i in range(50))
    df = spark.createDataFrame([(1, text), (2, "short doc")],
                               "doc_id long, text string")
    out = chunk_documents(df, chunk_tokens=32, overlap=8).toPandas()
    d1 = out[out.doc_id == 1].sort_values("chunk_idx")
    # starts 0, 24 (48 would overlap-cover: 48+8 >= 50 -> dropped)
    assert list(d1.start_tok) == [0, 24]
    assert d1.iloc[0].chunk.split()[0] == "t0"
    assert d1.iloc[1].chunk.split()[-1] == "t49"  # final partial chunk
    d2 = out[out.doc_id == 2]
    assert len(d2) == 1 and d2.iloc[0].chunk == "short doc"


def test_minhash_dedup_groups(spark):
    import pandas as pd
    from gdal_spark.functions.text import minhash_dedup_groups

    base = "the quick brown fox jumps over the lazy dog " * 8
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4, 5],
                "text": [
                    base,
                    base + "tail",        # near-dup of 1
                    base + "tail tip",    # near-dup of 2 (chain -> comp 1)
                    "completely different content about rasters and tiles "
                    * 10,
                    "another unrelated document with its own words " * 10,
                ],
            }
        )
    )
    got = {
        r["doc_id"]: r["canonical_id"]
        for r in minhash_dedup_groups(docs, "text", "doc_id").collect()
    }
    assert got[1] == 1 and got[2] == 1 and got[3] == 1
    assert got[4] == 4 and got[5] == 5


def test_ngram_overlap(spark):
    import pandas as pd
    from gdal_spark.functions.text import ngram_overlap

    corpus = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "a b c d e f",          # shares the eval 4-grams
                    "x y z w q r",          # no overlap
                    "c d e f g h",          # shares 'c d e f'
                ],
            }
        )
    )
    ev = spark.createDataFrame(
        pd.DataFrame({"doc_id": [9], "text": ["a b c d e f g"]})
    )
    got = {
        r["doc_id"]: r["matched_grams"]
        for r in ngram_overlap(corpus, ev, "text", "doc_id", n=4).collect()
    }
    # doc1: grams 'a b c d','b c d e','c d e f' all in eval -> 3
    # doc3: 'c d e f' and 'd e f g' -> 2; doc2 absent
    assert got == {1: 3, 3: 2}


def test_compression_ratio(spark):
    import zlib

    rows = [
        Row(doc_id=1, text="abc " * 500),         # highly repetitive
        Row(doc_id=2, text=""),                     # empty -> 1.0
        Row(doc_id=3, text="The quick brown fox jumps over the lazy dog."),
    ]
    got = {r["doc_id"]: r["c"] for r in spark.createDataFrame(rows).select(
        "doc_id", TX.compression_ratio(F.col("text")).alias("c")).collect()}
    assert got[1] < 0.05          # repetition compresses away
    assert got[2] == 1.0
    raw = rows[2].text.encode()
    assert abs(got[3] - len(zlib.compress(raw, 6)) / len(raw)) < 1e-12


def test_dedup_keep_best(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    rows = [
        Row(doc_id=1, text=base),
        Row(doc_id=2, text=base + " with an extra longer tail of words"),
        Row(doc_id=3, text=base),
        Row(doc_id=4, text="completely different content about spark shuffles"),
    ]
    got = {r["doc_id"]: r for r in TX.dedup_keep_best(
        spark.createDataFrame(rows), "text", "doc_id",
        F.length("text").cast("long"), threshold=0.5).collect()}
    # 1,2,3 cluster under canonical 1; the LONGEST (2) is kept
    assert got[1]["canonical_id"] == got[2]["canonical_id"] == got[3]["canonical_id"] == 1
    assert got[2]["keep"] and not got[1]["keep"] and not got[3]["keep"]
    # singleton keeps itself
    assert got[4]["keep"] and got[4]["canonical_id"] == 4


def test_paragraph_dedup_first_occurrence_wins(spark):
    import pandas as pd

    from gdal_spark.functions.text import paragraph_dedup

    df = spark.createDataFrame(pd.DataFrame({
        "id": [1, 2, 3],
        "t": ["alpha beta\n\ngamma", "alpha  BETA\n\ndelta", "gamma\n\ndelta"],
    }))
    out = {r["id"]: (r["dedup_text"], r["n_paras_kept"])
           for r in paragraph_dedup(df, "t", "id").collect()}
    # doc 1 keeps both; doc 2 loses 'alpha BETA' (normalized dup of doc 1)
    # but keeps 'delta'; doc 3 loses both
    assert out[1] == ("alpha beta\n\ngamma", 2)
    assert out[2] == ("delta", 1)
    assert 3 not in out


def test_canonicalize_url_rules(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    from gdal_spark.functions.text import canonicalize_url

    urls = [
        "HTTP://WWW.Example.COM:80/A/b/?utm_source=x#top",
        "https://ex.com/p?gclid=1&q=2&utm_medium=m",
        "https://ex.com/p/",
        "https://ex.com:8080/p",          # non-default port kept
        "https://ex.com/p?fbclid=z",
    ]
    df = spark.createDataFrame(pd.DataFrame({"u": urls}))
    got = [r["c"] for r in
           df.select(canonicalize_url("u").alias("c")).collect()]
    assert got == [
        # host lowercased (path case untouched), :80 dropped, utm query
        # emptied and removed, then the now-bare trailing slash dropped
        "http://www.example.com/A/b",
        "https://ex.com/p?q=2",
        "https://ex.com/p",
        "https://ex.com:8080/p",
        "https://ex.com/p",
    ]
