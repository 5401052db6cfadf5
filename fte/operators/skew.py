"""Skew handling: salted joins + AQE (BASELINE.json:6,14 —
"salting + AQE skew-join hints").

Long conversations make conv_id a hot join key: one shuffle partition
receives the whale's entire payload while siblings idle. Two layers of
defense:

1. AQE skew-join (on by default in fte.conf): splits oversized
   sort-merge partitions at runtime. Covers most skew transparently.
2. Explicit salting (this module) for the pathological case AQE can't
   fix — a single key so hot that even a split partition is dominated
   by it, or broadcast-ineligible aggregations over the hot key.

``salted_join`` replicates the (small) right side S ways and scatters
the left side across the S replicas with a deterministic per-row salt,
so the hot key's rows spread over S partitions. ``salted_group_count``
shows the two-phase aggregate form (partial per salt → final).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    salt: int = 8,
    how: str = "inner",
    salt_src: str | None = None,
) -> DataFrame:
    """Equi-join with the left side's hot keys scattered over ``salt``
    sub-keys. ``right`` is replicated ×salt (use only when right is the
    smaller side; if right fits in memory use F.broadcast instead —
    salting is for the mid-size case).

    The left salt is derived deterministically from ``salt_src`` (a
    high-cardinality column, default: all non-key columns hashed) so
    results are reproducible across runs/partitionings.
    """
    keys = list(keys)
    src = [salt_src] if salt_src else [c for c in left.columns if c not in keys]
    lsalt = F.pmod(F.xxhash64(*[F.col(c) for c in src]), F.lit(salt)).cast("int")
    l_salted = left.withColumn("_salt", lsalt)
    r_salted = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = l_salted.join(r_salted, keys + ["_salt"], how)
    return out.drop("_salt")


def salted_group_count(
    df: DataFrame, keys: Sequence[str], salt: int = 8, salt_src: str | None = None
) -> DataFrame:
    """Two-phase count for a skewed groupBy key: partial count per
    (key, salt), then final sum per key. Spark's hash aggregate already
    does map-side partials, so this only pays off when the FINAL
    aggregation partition for a hot key overflows — rare; provided for
    parity with the classic recipe and as the template for
    non-decomposable aggs."""
    keys = list(keys)
    src = [salt_src] if salt_src else [c for c in df.columns if c not in keys]
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in src]), F.lit(salt))
    )
    partial = salted.groupBy(*keys, "_salt").agg(F.count("*").alias("_c"))
    return partial.groupBy(*keys).agg(F.sum("_c").alias("n"))


def key_skew_report(
    df, key_col: str, top_n: int = 10
):
    """Skew diagnostics: the top-N heaviest keys with their share of
    all rows — the measurement that decides whether a join needs
    salting (fte.operators.skew.salted_join) or AQE skew-split alone.
    One hash aggregate on the key + a TakeOrderedAndProject for the
    top-N + a broadcast single-row total; nothing corpus-sized moves
    twice. Output: (key, n_rows, share) ordered by n_rows desc."""
    from pyspark.sql import functions as F

    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows")
    )
    total = counts.agg(F.sum("n_rows").cast("double").alias("_total"))
    top = counts.orderBy(F.desc("n_rows"), F.asc("key")).limit(top_n)
    return top.crossJoin(F.broadcast(total)).select(
        "key", "n_rows", (F.col("n_rows") / F.col("_total")).alias("share")
    )
