"""BPE tokenizer tests (Sennrich et al. 2016 semantics): merge order
on a hand-computed corpus, reconstruction invariant, determinism under
repartitioning."""

import pandas as pd

from gdal_spark.functions.bpe import END, bpe_apply, bpe_train


def test_merge_order_hand_example(spark):
    # "low low low lower newest newest" — classic BPE walkthrough
    df = spark.createDataFrame(
        pd.DataFrame({"text": ["low low low lower", "newest newest"]}))
    merges = bpe_train(df, "text", 4)
    # most frequent first pairs: ('w', END) freq 3 from 'low'... verify
    # against the sequential recomputation
    assert len(merges) == 4
    out = bpe_apply(df, "text", merges).collect()
    toks = out[0]["bpe_tokens"]
    # 'low' must have become a single token after 4 merges (freq 3+1 prefix)
    assert f"low{END}" in toks


def test_reconstruction_invariant(spark):
    df = spark.createDataFrame(pd.DataFrame(
        {"text": ["abc abd abe abc", "xy xz xy"]}))
    merges = bpe_train(df, "text", 6)
    rows = bpe_apply(df, "text", merges).collect()
    for r in rows:
        joined = "".join(r["bpe_tokens"]).replace(END, " ").strip()
        assert joined == r["text"].lower()


def test_determinism_under_partitioning(spark):
    texts = [f"w{i % 7} common common w{i % 5}" for i in range(100)]
    a = spark.createDataFrame(pd.DataFrame({"text": texts})).repartition(1)
    b = spark.createDataFrame(pd.DataFrame({"text": texts})).repartition(16)
    assert bpe_train(a, "text", 10) == bpe_train(b, "text", 10)
