"""Skew mitigation utilities — the north rule's explicit partitioning
story, applied wherever a shuffle key can be hot.

  salted_join      the textbook salt/replicate equi-join: the skewed
                   big side gets salt = hash(row) % S appended to its
                   key; the other side is replicated S times (one copy
                   per salt). Join semantics are UNCHANGED; a hot key's
                   rows now spread over S reducers instead of one.
  repartition_by_cell_prefix
                   range-repartition a table on its quadkey/cell-id
                   prefix so spatially adjacent rows co-locate —
                   storage layout for downstream tile-range pruning
                   (the role of the reference's .qix spatial index
                   ordering, ogr/ogrsf_frmts/shape/ogrshapelayer.cpp:
                   621) and co-partitioned spatial joins.

Where the engine already avoids the problem by construction (the PIP
join is shuffle-free; AQE skew-join covers sort-merge paths), these
are not needed — they exist for the wide ops that DO shuffle on a
content-derived key (n-gram inverted index, LSH buckets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `big` ⋈ `small` on `key` with the hot keys of `big`
    spread over `salt` reducers. `small` is replicated `salt` times —
    use when `small` is the modest side of a skewed shuffle join (for
    genuinely small sides just broadcast instead).

    Only inner/left(-semi) joins are valid: with right/full outer the
    salt-replicated small side would emit each unmatched row once per
    salt value (salt-fold duplication), silently breaking semantics."""
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi, not {how!r}: "
            "replicating the small side duplicates its unmatched rows "
            "under right/full outer semantics"
        )
    if salt <= 1:
        return big.join(small, key, how)
    # per-row round-robin salt (deterministic within a stage attempt;
    # any per-row value works — the point is spreading a hot key)
    b = big.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(salt)).cast("int")
    )
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    return b.join(s, [key, "_salt"], how).drop("_salt")


def repartition_by_cell_prefix(
    df: DataFrame, prefix_col: str, prefix_len: int, num_partitions: int
) -> DataFrame:
    """Range-repartition on the leading `prefix_len` characters of a
    quadkey (or the high bits of a cell id): parent-prefix ordering
    means each output partition holds a spatially contiguous block —
    min/max parquet stats then prune tile-range scans for free."""
    return df.repartitionByRange(
        num_partitions, F.substring(F.col(prefix_col), 1, prefix_len)
    )
