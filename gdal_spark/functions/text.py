"""Text analysis + deduplication operators for training-data pipelines.

These extend the engine beyond the reference's own surface (GDAL has no
text ops) with the operations a 100 TB document pipeline needs. Design
rules are the same as everywhere else: JVM column expressions first
(tokenize/count/score run in whole-stage codegen), Arrow-batched numpy
UDFs only where bit-twiddling is genuinely needed (minhash/simhash),
and every shuffle is on a narrow projected key — never on full rows
with document bodies.

Operators:
  tokens / token_count      whitespace + BPE-ish regex counting (JVM)
  lang_id                   stopword-overlap n-gram heuristic (JVM)
  quality_score             length/alpha/stopword ratios (JVM)
  fingerprint               winnowing min-rolling-hash (Arrow UDF)
  exact_dedup               hash groupBy, canonical = min id
  minhash_signatures + lsh_candidates + minhash_dedup
                            shingle -> 64 minhashes -> banded LSH ->
                            bucket join -> signature-estimated jaccard
  simhash + simhash_pairs   64-bit simhash, banded hamming candidates
  ngram_jaccard_pairs       exact character-n-gram jaccard verification
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

# BPE-ish token regex: words, numbers, or single non-space symbols
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

_STOPWORDS = {
    "en": ["the", "of", "and", "to", "in", "is", "it", "that", "for", "was"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "los"],
    "fr": ["le", "la", "de", "et", "les", "des", "en", "un", "du", "une"],
    "de": ["der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "im"],
}


def tokens(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), r"\s+"), lambda t: t != "")


def token_count(col: Column | str, mode: str = "whitespace") -> Column:
    """'whitespace': split count; 'bpe': regex token count (both JVM)."""
    c = F.col(col) if isinstance(col, str) else col
    if mode == "whitespace":
        return F.size(tokens(c))
    if mode == "bpe":
        return F.regexp_count(c, F.lit(TOKEN_RE))
    raise ValueError(mode)


def lang_id(col: Column | str) -> Column:
    """Stopword-overlap language heuristic: argmax over per-language
    stopword hit counts; 'und' when nothing matches. Pure JVM
    (array_intersect over the token array)."""
    toks = F.array_distinct(tokens(col))
    scores = [
        F.struct(
            F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in ws]))).alias("hits"),
            F.lit(lang).alias("lang"),
        )
        for lang, ws in sorted(_STOPWORDS.items())
    ]
    best = F.array_max(F.array(*scores))
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def quality_score(col: Column | str) -> Column:
    """Deterministic [0,1] quality heuristic from length, alphabetic
    ratio, and mean word length — all JVM regexp/length arithmetic."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c).cast("double")
    alpha = F.regexp_count(c, F.lit(r"[A-Za-z]")).cast("double")
    nw = F.greatest(F.size(tokens(c)), F.lit(1)).cast("double")
    len_score = F.least(n / 200.0, F.lit(1.0))
    alpha_ratio = F.when(n > 0, alpha / n).otherwise(F.lit(0.0))
    wordlen = n / nw
    wordlen_score = F.when((wordlen >= 3) & (wordlen <= 12), 1.0).otherwise(0.3)
    # floor-grid instead of round: floor is identical in every engine
    # (Spark rounds HALF_UP, others half-even — floor avoids the divergence)
    return F.floor((len_score * 0.3 + alpha_ratio * 0.5 + wordlen_score * 0.2) * 1e6) / 1e6


FINGERPRINT_K = 8  # rolling window (chars)
_FP_BASE = np.uint64(1099511628211)
_FP_SEED = np.uint64(14695981039346656037)


def _rolling_hashes(s: str, k: int = FINGERPRINT_K) -> np.ndarray:
    """All k-char rolling FNV-style hashes of s — ONE vectorized pass of
    k xor-multiply steps over the whole byte array. This is the shingle
    hasher for minhash too: JVM higher-order substring shingling
    re-evaluates the outer normalization expression per element
    (CollapseProject inlines it), which is O(len^2) regexp work — the
    numpy rolling hash is the fast path."""
    b = np.frombuffer(s.encode("utf-8", "ignore"), dtype=np.uint8)
    if len(b) < k:
        b = np.pad(b, (0, k - len(b)), constant_values=32)
    with np.errstate(over="ignore"):
        h = np.full(len(b) - k + 1, _FP_SEED, dtype=np.uint64)
        for i in range(k):
            h = (h ^ b[i : i + len(h)].astype(np.uint64)) * _FP_BASE
    return h


def _norm_py(s: str) -> str:
    return " ".join((s or "").lower().split())


@F.pandas_udf(T.LongType())
def fingerprint(text: pd.Series) -> pd.Series:
    """Winnowing-style document fingerprint: min rolling k-gram hash
    (deterministic; robust to token order at window granularity)."""
    out = np.empty(len(text), dtype=np.int64)
    for i, s in enumerate(text):
        out[i] = np.int64(_rolling_hashes(s or "").min().astype(np.int64))
    return pd.Series(out)


# ----------------------------------------------------------------- dedup
def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact duplicate grouping: dup_group = xxhash64 of the normalized
    text; is_canonical = min id within group. Shuffle carries only
    (hash, id) via a window over the narrow projection."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    out = df.withColumn("dup_group", F.xxhash64(norm))
    w = Window.partitionBy("dup_group")
    return out.withColumn("is_canonical", F.col(id_col) == F.min(id_col).over(w))


MINHASH_SCHEMA = T.ArrayType(T.LongType())


def minhash_signatures(df: DataFrame, text_col: str, id_col: str,
                       n_hashes: int = 64, shingle_k: int = 5) -> DataFrame:
    """(id, sig: array<long>[n_hashes]).

    One Arrow UDF does normalize -> rolling k-gram hashes (vectorized,
    deterministic — never Python's process-randomized hash()) ->
    unique -> n_hashes odd-multiplier min-reductions in a single
    (shingles x hashes) numpy pass per row."""
    from .. import geomlite as G

    seeds = (G.splitmix64(np.arange(n_hashes)) | np.uint64(1)).astype(np.uint64)

    @F.pandas_udf(MINHASH_SCHEMA)
    def mh(texts: pd.Series) -> pd.Series:
        out = []
        with np.errstate(over="ignore"):
            for s in texts:
                sh = np.unique(_rolling_hashes(_norm_py(s), shingle_k))
                m = sh[:, None] * seeds[None, :]  # (n_shingles, n_hashes)
                out.append(m.min(axis=0).astype(np.int64).tolist())
        return pd.Series(out)

    return df.select(F.col(id_col), mh(F.col(text_col)).alias("sig"))


def lsh_candidates(sigs: DataFrame, id_col: str, bands: int = 16,
                   max_bucket: int | None = 1000) -> DataFrame:
    """Banded LSH: equal band-slice -> same bucket. Returns candidate
    pairs (id_a < id_b) with the signature-estimated jaccard.

    Scale design:
      - signatures persist once (the minhash UDF lineage must not be
        re-evaluated by each self-join branch)
      - the bucket self-join runs on the NARROW (id, band, bkey)
        projection only; full signatures rejoin after pair dedup
      - `max_bucket` drops degenerate buckets (boilerplate-heavy
        corpora produce near-global buckets whose |B|^2 pair blow-up is
        the classic LSH skew; the dropped bucket's true dups still
        surface via their other, more selective bands) — the explicit
        hot-key mitigation the north rule requires.
    """
    sigs = sigs.persist()
    slice_len = (F.size("sig") / bands).cast("int")
    banded = sigs.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        b, F.slice(F.col("sig"), b * slice_len + 1, slice_len)
                    ).alias("bkey"),
                ),
            )
        ).alias("bk"),
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.bkey").alias("bkey"))

    if max_bucket is not None:
        w = Window.partitionBy("band", "bkey")
        banded = banded.withColumn("_bc", F.count(F.lit(1)).over(w)).filter(
            F.col("_bc") <= max_bucket
        ).drop("_bc")

    a = banded.select("band", "bkey", F.col(id_col).alias("id_a"))
    b = banded.select("band", "bkey", F.col(id_col).alias("id_b"))
    pairs = (
        a.join(b, ["band", "bkey"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    sa = sigs.select(F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"))
    withsigs = pairs.join(sa, "id_a").join(sb, "id_b")
    est = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v
        )
    ).cast("double") / F.size("sig_a")
    return withsigs.select("id_a", "id_b", est.alias("est_jaccard"))


def minhash_dedup(df: DataFrame, text_col: str, id_col: str,
                  threshold: float = 0.8, n_hashes: int = 64,
                  bands: int = 16, shingle_k: int = 5) -> DataFrame:
    """Near-duplicate pairs above the jaccard threshold."""
    sigs = minhash_signatures(df, text_col, id_col, n_hashes, shingle_k)
    return lsh_candidates(sigs, id_col, bands).filter(F.col("est_jaccard") >= threshold)


def gopher_flags(col: Column | str) -> dict[str, Column]:
    """Gopher-style composite quality filter (the published rule
    family: token-count window, mean-word-length window, alphabetic
    ratio, duplicate word/line fractions). Returns the individual
    flag columns plus `keep` = AND of all — every term is JVM
    regexp/length/array arithmetic, zero Python."""
    c = F.col(col) if isinstance(col, str) else col
    nt = F.size(tokens(c))
    n = F.length(c).cast("double")
    nw = F.greatest(nt, F.lit(1)).cast("double")
    mwl = n / nw
    alpha = F.regexp_count(c, F.lit(r"[A-Za-z]")).cast("double")
    alpha_ratio = F.when(n > 0, alpha / n).otherwise(F.lit(0.0))
    dw, dl = repetition_metrics(c)
    flags = {
        "f_tokens": (nt >= 50) & (nt <= 100000),
        "f_wordlen": (mwl >= 3.0) & (mwl <= 10.0),
        "f_alpha": alpha_ratio >= 0.6,
        "f_dup_words": dw <= 0.5,
        "f_dup_lines": dl <= 0.3,
    }
    keep = F.lit(True)
    for f in flags.values():
        keep = keep & f
    flags["keep"] = keep
    return flags


def word_ngrams(df: DataFrame, text_col: str, id_col: str,
                n: int = 8) -> DataFrame:
    """(id, gram) rows: whitespace-token n-grams, entirely JVM
    (split/transform/slice/concat_ws — no Python in the gram path)."""
    t = tokens(F.col(text_col))
    g = (
        F.when(
            F.size(t) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(t) - n),
                lambda i: F.concat_ws(" ", F.slice(t, i + F.lit(1), n)),
            ),
        ).otherwise(F.array().cast("array<string>"))
    )
    # per-doc dedup happens map-side (array_distinct) so downstream
    # counts are plain COUNT(*) — no expensive distinct aggregation
    return df.select(F.col(id_col),
                     F.explode(F.array_distinct(g)).alias("gram"))


def ngram_overlap(corpus: DataFrame, eval_set: DataFrame, text_col: str,
                  id_col: str, n: int = 8) -> DataFrame:
    """Benchmark decontamination: which corpus documents share a word
    n-gram with the eval set, and how many distinct grams collide.
    The eval side deduplicates then BROADCASTS (eval sets are tiny
    next to a 10^12-doc corpus), so the corpus-side gram stream feeds
    a map-side hash join — the corpus never shuffles; the only
    aggregation is the per-doc distinct-gram count."""
    ev = word_ngrams(eval_set, text_col, id_col, n).select("gram").distinct()
    return (
        word_ngrams(corpus, text_col, id_col, n)
        .join(F.broadcast(ev), "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("matched_grams"))
    )


def minhash_dedup_groups(df: DataFrame, text_col: str, id_col: str,
                         threshold: float = 0.8, n_hashes: int = 64,
                         bands: int = 16, shingle_k: int = 5) -> DataFrame:
    """Canonical-document assignment: near-dup pairs -> undirected
    connected components (pointer-jumping, O(log diameter) rounds) ->
    every document mapped to the min doc id of its component
    (singletons map to themselves). This is the keep-one-per-cluster
    step a dedup pipeline runs after pair generation; at 10^12 docs
    the component graph is tiny relative to the corpus (only docs in
    pairs enter the iteration), so the cost is the pair join plus
    O(log d) small shuffles."""
    from ..graph import connected_components

    pairs = minhash_dedup(df, text_col, id_col, threshold, n_hashes,
                          bands, shingle_k)
    comp = connected_components(
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    return (
        df.select(F.col(id_col).alias("node"))
        .join(comp, "node", "left")
        .select(
            F.col("node").alias(id_col),
            F.coalesce("component", "node").alias("canonical_id"),
        )
    )


# ----------------------------------------------------------------- simhash
@F.pandas_udf(T.LongType())
def _simhash_bits_udf(word_hashes: pd.Series) -> pd.Series:
    """Bit-majority over pre-hashed words (hashing happened JVM-side —
    deterministic xxhash64; only the 64-bit majority fold is numpy)."""
    out = np.empty(len(word_hashes), dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    for i, arr in enumerate(word_hashes):
        if arr is None or len(arr) == 0:
            out[i] = 0
            continue
        hs = np.asarray(arr, dtype=np.int64).astype(np.uint64)
        bits = ((hs[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
        maj = (bits.sum(axis=0) * 2 > len(hs)).astype(np.uint64)
        with np.errstate(over="ignore"):
            out[i] = np.int64((maj << shifts).sum().astype(np.uint64).astype(np.int64))
    return pd.Series(out)


def simhash(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    wh = F.transform(tokens(text_col), lambda w: F.xxhash64(w))
    return df.select(F.col(id_col), _simhash_bits_udf(wh).alias("simhash"))


def simhash_pairs(sh: DataFrame, id_col: str, max_hamming: int = 3,
                  max_bucket: int | None = 10000) -> DataFrame:
    """Candidate pairs within hamming distance via 4x16-bit banding
    (a pair within distance 3 shares at least one exact band).

    Scale design: one self-join on the long (band, bk) key — not four
    separate joins — and, like lsh_candidates, a `max_bucket` cap:
    degenerate band values are common in web corpora (simhash 0 from
    empty/near-empty docs puts band 0 of every such doc in one bucket)
    and an uncapped bucket is |B|^2 in the join. Capped buckets are
    dropped; a true near-dup pair in a dropped bucket still surfaces
    through its other, more selective bands unless ALL its shared
    bands are degenerate (overwhelmingly the all-zero-hash case, which
    is boilerplate, not content)."""
    banded = sh.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftrightunsigned(F.col("simhash"), 16 * i)
                    .bitwiseAND(F.lit(0xFFFF)).alias("bk"),
                )
                for i in range(4)
            ])
        ).alias("_b"),
    ).select(id_col, "simhash", F.col("_b.band").alias("band"),
             F.col("_b.bk").alias("bk"))
    if max_bucket is not None:
        w = Window.partitionBy("band", "bk")
        banded = banded.withColumn(
            "_bc", F.count(F.lit(1)).over(w)
        ).filter(F.col("_bc") <= max_bucket).drop("_bc")
    a = banded.select("band", "bk", F.col(id_col).alias("id_a"),
                      F.col("simhash").alias("h_a"))
    b = banded.select("band", "bk", F.col(id_col).alias("id_b"),
                      F.col("simhash").alias("h_b"))
    cand = (a.join(b, ["band", "bk"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "h_a", "h_b")
            .dropDuplicates(["id_a", "id_b"]))
    ham = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return cand.select("id_a", "id_b", ham.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


# ------------------------------------------------------------- exact jaccard
def ngram_jaccard_pairs(df: DataFrame, pairs: DataFrame, text_col: str,
                        id_col: str, k: int = 5) -> DataFrame:
    """Exact character-k-gram jaccard for given (id_a, id_b) pairs —
    the verification stage after LSH candidates. Texts join to the
    (small) pair set; the set-jaccard runs batch-wise in one Arrow UDF
    over the same deterministic rolling k-gram hashes as minhash."""
    t = df.select(F.col(id_col), F.col(text_col).alias("_t"))
    j = (
        pairs.join(t.withColumnRenamed(id_col, "id_a").withColumnRenamed("_t", "t_a"), "id_a")
        .join(t.withColumnRenamed(id_col, "id_b").withColumnRenamed("_t", "t_b"), "id_b")
    )

    @F.pandas_udf(T.DoubleType())
    def jac(ta: pd.Series, tb: pd.Series) -> pd.Series:
        out = np.empty(len(ta))
        for i, (a, b) in enumerate(zip(ta, tb)):
            sa = set(np.unique(_rolling_hashes(_norm_py(a), k)).tolist())
            sb = set(np.unique(_rolling_hashes(_norm_py(b), k)).tolist())
            u = len(sa | sb)
            out[i] = (len(sa & sb) / u) if u else 1.0
        return pd.Series(out)

    return j.select("id_a", "id_b", jac("t_a", "t_b").alias("jaccard"))


def word_ngram_jaccard_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 2,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact word-n-gram Jaccard near-duplicate pairs over the WHOLE
    table — no LSH approximation: an inverted index on n-grams
    generates candidate pairs (only docs sharing >= 1 gram ever meet),
    then |intersection| falls out of the join group count and
    J = inter / (|A| + |B| - inter) filters at `threshold`.

    Everything is JVM column math + one shuffle join keyed on the gram
    string — no Python. Scale note: stop-phrase grams are hot keys; at
    10^9+ docs cap gram document-frequency (drop grams above a DF
    bound, standard practice) or fall back to minhash_dedup's banded
    LSH — this operator is the exact verifier of that pipeline.

    Jaccard here is a ratio of small integers, so the value (and the
    threshold comparison) is bit-identical across engines — the oracle
    can recompute it closed-form.
    """
    toks = F.array_remove(F.split(F.lower(F.col(text_col)), r"\s+"), "")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(F.col("_toks")) - (n - 1)),
        lambda i: F.concat_ws(" ", *[F.element_at(F.col("_toks"), i + j) for j in range(n)]),
    )
    d = (
        df.select(F.col(id_col), toks.alias("_toks"))
        .filter(F.size("_toks") >= n)
        .select(F.col(id_col), F.array_distinct(grams).alias("_grams"))
        .select(F.col(id_col), "_grams", F.size("_grams").alias("_sz"))
    )
    e = d.select(F.col(id_col), F.col("_sz"), F.explode("_grams").alias("_gram"))
    a = e.select(
        F.col(id_col).alias("id_a"), F.col("_sz").alias("_sa"), "_gram"
    )
    b = e.select(
        F.col(id_col).alias("id_b"), F.col("_sz").alias("_sb"), "_gram"
    )
    pairs = (
        a.join(b, "_gram")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "_sa", "_sb")
        .agg(F.count("*").alias("_inter"))
    )
    jac = F.col("_inter").cast("double") / (
        F.col("_sa") + F.col("_sb") - F.col("_inter")
    )
    return (
        pairs.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# --------------------------------------------------------- pii scrubbing
# Conservative leftmost-greedy patterns with no alternation ambiguity,
# so Java regex (Spark, backtracking) and RE2 (leftmost-longest) agree
# on every match; aggressive by design (long digit runs mask as phones)
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE_RE = r"\+?\d[\d\- ]{7,}\d"


def scrub_pii(col: Column | str) -> Column:
    """Mask emails, IPv4 addresses, and phone-like digit runs (order:
    email -> ip -> phone, so an IP is not half-eaten as a phone). The
    standard pre-training redaction pass, entirely JVM regexp_replace."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, PII_EMAIL_RE, "<EMAIL>")
    c = F.regexp_replace(c, PII_IPV4_RE, "<IP>")
    return F.regexp_replace(c, PII_PHONE_RE, "<PHONE>")


def repetition_metrics(col: Column | str) -> tuple[Column, Column]:
    """Gopher-style repetition signals: (dup_word_frac, dup_line_frac)
    = 1 - distinct/total over whitespace tokens and non-empty lines.
    Floor-grid to 1e-6 (same cross-engine convention as quality_score)."""
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(c)
    lines = F.filter(F.split(c, r"\n"), lambda t: t != "")

    def frac(arr):
        n = F.size(arr).cast("double")
        d = F.size(F.array_distinct(arr)).cast("double")
        return F.when(n > 0, F.floor((1.0 - d / n) * 1e6) / 1e6).otherwise(0.0)

    return frac(toks), frac(lines)


# ------------------------------------------------- exact-substring dedup
def duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 16,
) -> DataFrame:
    """Exact-substring duplicate spans (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better", arXiv:2107.06499 —
    the sliding-window alternative to their suffix array): every
    n-token window is keyed by xxhash64; windows whose hash occurs
    more than once corpus-wide are duplicate positions, and adjacent
    positions merge into (doc, span_start, span_end) token spans via
    the pos - row_number run trick.

    Scale shape: the exploded relation is (id, pos, hash) — 24 bytes a
    token — grouped by an 8-byte hash with map-side partial counts,
    then a semi join back; the merge window partitions by doc only.
    No driver state, no Python in the hot path (all JVM codegen).
    """
    toks = tokens(F.col(text_col))
    base = df.select(F.col(id_col).alias("id"), toks.alias("toks")).filter(
        F.size("toks") >= n
    )
    grams = base.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.size("toks") - n),
                lambda p: F.concat_ws(" ", F.slice("toks", p + 1, n)),
            )
        ).alias("pos", "gram"),
    ).select("id", "pos", F.xxhash64("gram").alias("h"))
    duph = grams.groupBy("h").agg(F.count("*").alias("c")).filter(F.col("c") > 1)
    dup = grams.join(duph.select("h"), "h", "left_semi")
    w = Window.partitionBy("id").orderBy("pos")
    runs = dup.withColumn("grp", F.col("pos") - F.row_number().over(w))
    return (
        runs.groupBy("id", "grp")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + n - 1).alias("span_end"),
        )
        .select(F.col("id").alias(id_col), "span_start", "span_end")
    )


# ------------------------------------------------------ url blocklists
URL_DOMAIN_RE = r"https?://([A-Za-z0-9.-]+)"


def extract_domains(col: Column | str) -> Column:
    """Distinct lowercased domains of every http(s) URL in the text
    (JVM regexp_extract_all; sorted for a canonical array)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_sort(
        F.array_distinct(
            F.transform(
                F.regexp_extract_all(c, F.lit(URL_DOMAIN_RE), 1),
                lambda x: F.lower(x),
            )
        )
    )


def blocklist_filter(
    df: DataFrame, text_col: str, blocked: list[str]
) -> DataFrame:
    """Drop documents that cite any blocked domain (the standard
    URL-blocklist curation pass). Pure column math: the blocklist is a
    literal array (broadcast by Catalyst), so no join, no shuffle —
    at 10^12 docs this is a single codegen'd scan stage. For
    blocklists too large for a literal (millions of domains), explode
    domains and LEFT ANTI join against a blocklist table instead."""
    dom = extract_domains(F.col(text_col))
    bad = F.array(*[F.lit(b.lower()) for b in blocked])
    return df.filter(~F.arrays_overlap(dom, bad))


# ----------------------------------------------- packing / chunking
def pack_sequences(
    df: DataFrame,
    token_count_col: str,
    capacity: int,
    id_col: str = "doc_id",
    shards: int = 32,
) -> DataFrame:
    """Streaming sequence packing for LLM training: documents are
    concatenated in deterministic (shard, id) order and the resulting
    token stream is cut into context windows of `capacity` tokens.
    Each doc gets (shard, bin, start_offset): bin = which window its
    first token lands in; docs may straddle a boundary (the standard
    concat-then-split packing, not first-fit bin packing — document
    boundaries are preserved by the offset, not by padding).

    Scale shape: shard = id-hash % shards, so the running-total window
    never sees more than 1/shards of the corpus and shards scale out
    with the cluster; within a shard the cumsum window is one
    partition-local sort. Deterministic under any input partitioning.
    The shard hash is the Knuth multiplicative hash (cross-engine
    reproducible; see functions/sample.py) — swap in xxhash64 when ids
    exceed 2^31.
    """
    from .sample import KNUTH, MOD32

    shard = (F.col(id_col).cast("long") * F.lit(KNUTH)) % F.lit(MOD32) % shards
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    base = df.select(
        F.col(id_col), shard.alias("shard"),
        F.col(token_count_col).alias("_ntok"),
    )
    start = F.coalesce(F.sum("_ntok").over(w), F.lit(0))
    return base.select(
        id_col,
        "shard",
        start.alias("start_offset"),
        F.floor(start / capacity).cast("long").alias("bin"),
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Sliding-window chunking (RAG / training-sample windowing):
    each doc explodes into chunks of `chunk_tokens` whitespace tokens
    with `overlap` tokens of overlap; the final partial chunk is kept.
    All JVM higher-order functions — no Python in the hot path."""
    step = chunk_tokens - overlap
    if step <= 0:
        raise ValueError("overlap must be < chunk_tokens")
    toks = tokens(F.col(text_col))
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size(toks) - 1, F.lit(0)),
        F.lit(step),
    )
    # drop trailing windows fully covered by the previous chunk
    starts = F.filter(
        starts, lambda s: (s == 0) | (s + overlap < F.size(toks))
    )
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            s.alias("start_tok"),
            F.concat_ws(" ", F.slice(toks, s + 1, chunk_tokens)).alias("chunk"),
        ),
    )
    ex = df.select(F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "c"))
    return ex.select(
        id_col, "chunk_idx", F.col("c.start_tok").alias("start_tok"),
        F.col("c.chunk").alias("chunk"),
    )


def bm25_scores(
    df: DataFrame, terms: list[str], text_col: str = "text",
    id_col: str = "doc_id", k1: float = 1.2, b: float = 0.75,
) -> DataFrame:
    """BM25 relevance of every document against a fixed query-term
    set (Robertson/Sparck Jones; the retrieval-side scorer a
    training-data pipeline uses for quality/topic filtering).

    Two passes, both JVM-side: (1) one tiny aggregate for corpus
    stats (N, avgdl, per-term document frequency) collected to
    scalars — constant-size regardless of corpus size; (2) a map-only
    scoring pass with the stats folded in as literals. No shuffle of
    document data, no Python, whole-stage codegen throughout.

    Tokenization: lowercase, split on non-alphanumeric runs —
    identical closed form in SQL (the oracle restates it with
    string_split_regex/list_filter)."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda t: t != ""
    )
    d = df.select(F.col(id_col), toks.alias("toks"),
                  F.size(toks).alias("dl"))
    stats = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum(F.array_contains("toks", t).cast("long")).alias(f"df{i}")
            for i, t in enumerate(terms)
        ],
    ).collect()[0]
    n, avgdl = float(stats["n"]), float(stats["avgdl"])
    score = F.lit(0.0)
    for i, t in enumerate(terms):
        dft = float(stats[f"df{i}"])
        idf = math.log(1.0 + (n - dft + 0.5) / (dft + 0.5))
        tf = F.size(F.filter("toks", lambda x: x == F.lit(t))).cast("double")
        score = score + F.lit(idf) * (
            tf * (k1 + 1.0)
            / (tf + k1 * (1.0 - b + b * F.col("dl").cast("double") / avgdl))
        )
    return d.select(id_col, F.col("dl").alias("doc_len"),
                    score.alias("bm25"))


# --------------------------------------------- quality: compression ratio
@F.pandas_udf(T.DoubleType())
def compression_ratio(text: pd.Series) -> pd.Series:
    """zlib-compressed size / raw UTF-8 size (level 6) — the classic
    repetition/boilerplate quality signal (low ratio = highly
    compressible = repetitive; used by Gopher-style corpus filters
    alongside the token heuristics in gopher_flags). Deterministic:
    zlib with a fixed level is bit-stable across platforms. Empty
    text -> 1.0 (incompressible by convention)."""
    import zlib

    out = np.empty(len(text))
    for i, s in enumerate(text):
        if s is None or len(s) == 0:
            out[i] = 1.0
            continue
        raw = s.encode("utf-8")
        out[i] = len(zlib.compress(raw, 6)) / len(raw)
    return pd.Series(out)


def dedup_keep_best(df: DataFrame, text_col: str, id_col: str,
                    score_col, threshold: float = 0.8,
                    n_hashes: int = 64, bands: int = 16,
                    shingle_k: int = 5) -> DataFrame:
    """Near-dup retention policy: cluster with minhash connected
    components, keep ONE doc per cluster — the highest `score_col`
    (ties to the smallest id) — instead of blindly keeping the min id.
    This is the keep-best-quality dedup a training-data pipeline
    actually runs (dedup THEN quality-select loses good docs; this
    fuses them). Returns (id, canonical_id, keep) for every doc.

    Scale: the groups frame carries only (id, canonical, score); the
    per-cluster argmax is one partial-aggregating groupBy on the
    cluster key — corpus text never shuffles."""
    score_col = F.col(score_col) if isinstance(score_col, str) else score_col
    groups = minhash_dedup_groups(df, text_col, id_col, threshold,
                                  n_hashes, bands, shingle_k)
    scored = groups.join(
        df.select(F.col(id_col), score_col.alias("_score")), id_col
    )
    best = (
        scored.groupBy("canonical_id")
        .agg(F.max(F.struct(F.col("_score"),
                            (-F.col(id_col)).alias("_negid"))).alias("_b"))
        .select(
            "canonical_id",
            (-F.col("_b._negid")).alias("_best_id"),
        )
    )
    return (
        scored.join(best, "canonical_id")
        .select(
            id_col, "canonical_id",
            (F.col(id_col) == F.col("_best_id")).alias("keep"),
        )
    )


def paragraph_dedup(df: DataFrame, text_col: str, id_col: str,
                    min_chars: int = 1) -> DataFrame:
    """Corpus-wide paragraph-level exact dedup (the paragraph variant
    of exact_dedup, standard web-corpus cleaning): split each document
    on blank lines, keep only the FIRST occurrence of every normalized
    paragraph across the corpus (first = smallest (id, position)),
    and reassemble each document from its surviving paragraphs in
    original order.

    Scale shape: explode -> one groupBy on the paragraph hash carrying
    (hash, id, idx) only -> join back on the narrow key -> per-doc
    reassembly via sort_array(collect_list) keyed by the DOCUMENT id
    (never a global window). Paragraph text rides the shuffle once as
    the reassembly payload; at 100 TB the wide column can be re-read
    from the source instead (id+idx join), trade documented here."""
    paras = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), r"\n\s*\n+")).alias("idx", "para"),
    ).filter(F.length(F.trim("para")) >= min_chars)
    norm = F.trim(F.regexp_replace(F.lower(F.col("para")), r"\s+", " "))
    paras = paras.withColumn("phash", F.xxhash64(norm))
    w = Window.partitionBy("phash")
    first = F.struct(F.col(id_col), F.col("idx"))
    kept = paras.withColumn("_first", F.min(first).over(w)).filter(
        (F.col(f"_first.{id_col}") == F.col(id_col))
        & (F.col("_first.idx") == F.col("idx")))
    return kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "para"))),
                lambda s: s["para"],
            ),
            "\n\n",
        ).alias("dedup_text"),
        F.count(F.lit(1)).alias("n_paras_kept"),
    )


def paragraph_dedup_sql(table: str, text_col: str, id_col: str,
                        min_chars: int = 1) -> str:
    """DuckDB twin of paragraph_dedup (hash replaced by the normalized
    paragraph itself as the group key — same grouping, same survivors)."""
    return f"""
      WITH p AS (
        SELECT {id_col},
               UNNEST(regexp_split_to_array({text_col}, '\\n\\s*\\n+')) AS para,
               GENERATE_SUBSCRIPTS(
                 regexp_split_to_array({text_col}, '\\n\\s*\\n+'), 1) - 1 AS idx
        FROM {table}
      ), f AS (
        SELECT *, TRIM(REGEXP_REPLACE(LOWER(para), '\\s+', ' ', 'g')) AS norm
        FROM p WHERE LENGTH(TRIM(para)) >= {min_chars}
      ), k AS (
        SELECT {id_col}, idx, para,
               ROW_NUMBER() OVER (PARTITION BY norm
                                  ORDER BY {id_col}, idx) AS rn
        FROM f
      )
      SELECT {id_col},
             STRING_AGG(para, CHR(10) || CHR(10) ORDER BY idx) AS dedup_text,
             COUNT(*) AS n_paras_kept
      FROM k WHERE rn = 1 GROUP BY {id_col}
    """


def canonicalize_url(col: Column | str) -> Column:
    """URL canonicalization for URL-level dedup (the usual web-corpus
    normalization: CCNet/RefinedWeb-style): lowercase scheme+host,
    strip the fragment, strip tracking query params (utm_*, fbclid,
    gclid, msclkid, ref), drop an emptied '?', drop default ports,
    collapse a bare trailing slash. Pure JVM regexp chain — map-only,
    codegen'd, no UDF."""
    c = F.col(col) if isinstance(col, str) else col
    u = F.regexp_replace(c, r"#.*$", "")                       # fragment
    # lowercase scheme://host (group 1) but not path/query
    u = F.concat(
        F.lower(F.regexp_extract(u, r"^([^/]*//[^/?#]*)", 1)),
        F.regexp_replace(u, r"^[^/]*//[^/?#]*", ""),
    )
    u = F.regexp_replace(u, r"(://[^/?#]*):(80|443)([/?#]|$)", "$1$3")
    u = F.regexp_replace(
        u, r"([?&])(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|ref)=[^&#]*", "$1")
    u = F.regexp_replace(u, r"[?&]+$", "")                     # emptied query
    u = F.regexp_replace(u, r"\?&+", "?")
    u = F.regexp_replace(u, r"&&+", "&")
    u = F.regexp_replace(u, r"^([^?]*[^/?])/$", "$1")          # trailing slash
    return u


def canonicalize_url_sql(expr: str) -> str:
    """DuckDB twin of canonicalize_url — the same regexp chain with
    the 'g' flag where Spark replaces globally."""
    u = f"REGEXP_REPLACE({expr}, '#.*$', '')"
    u = (f"LOWER(REGEXP_EXTRACT({u}, '^([^/]*//[^/?#]*)', 1)) || "
         f"REGEXP_REPLACE({u}, '^[^/]*//[^/?#]*', '')")
    u = f"REGEXP_REPLACE({u}, '(://[^/?#]*):(80|443)([/?#]|$)', '\\1\\3')"
    u = (f"REGEXP_REPLACE({u}, "
         f"'([?&])(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|ref)=[^&#]*', "
         f"'\\1', 'g')")
    u = f"REGEXP_REPLACE({u}, '[?&]+$', '')"
    u = f"REGEXP_REPLACE({u}, '\\?&+', '?')"
    u = f"REGEXP_REPLACE({u}, '&&+', '&', 'g')"
    u = f"REGEXP_REPLACE({u}, '^([^?]*[^/?])/$', '\\1')"
    return u
