"""Data-quality column profiling: one long-format row per column with
null counts, distinct counts, and type-appropriate extremes/moments —
the "what did we just ingest" first look every large-scale pipeline
runs before featurization.

Scale shape: ONE aggregate pass over the table computes every
column's stats (Catalyst shares the scan; count_distinct expands to a
per-column partial-aggregate, all map-side combined), then a
literal-backed union pivots the single stats row into per-column rows.
No shuffle beyond the final 1-row reduce, no collect, no Python. For
corpora where exact distinct counts are too hot (10^9+ distinct keys
concentrate the final reduce), pass ``approx=True`` to swap in
HyperLogLog++ (mergeable sketch, bounded memory) — the engine's
approx_distinct family documents its error envelope.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def column_profile(
    df: DataFrame,
    numeric_cols: Sequence[str] = (),
    string_cols: Sequence[str] = (),
    approx: bool = False,
) -> DataFrame:
    """Profile the named columns into long-format rows:
    (col_name, n_rows, null_count, n_distinct, min_num, max_num, mean,
    min_str, max_str) — numeric stats NULL for string columns and
    vice versa ("col_name", not "column": reserved word in ANSI SQL).

    mean accumulates in DECIMAL(38,6) and divides exact operands
    (repo oracle pattern); distinct counts exclude NULLs (both
    engines' COUNT(DISTINCT) semantics). One aggregate, one row,
    pivoted by a union of literal selects.
    """
    distinct = (
        (lambda c: F.approx_count_distinct(c))
        if approx
        else (lambda c: F.count_distinct(F.col(c)))
    )
    aggs = [F.count(F.lit(1)).alias("_n_rows")]
    for c in list(numeric_cols) + list(string_cols):
        aggs += [
            F.count(F.when(F.col(c).isNull(), F.lit(1))).alias(f"_null_{c}"),
            distinct(c).alias(f"_dist_{c}"),
        ]
    for c in numeric_cols:
        aggs += [
            F.min(F.col(c).cast("double")).alias(f"_min_{c}"),
            F.max(F.col(c).cast("double")).alias(f"_max_{c}"),
            F.sum(F.col(c).cast("decimal(38,6)")).cast("double").alias(f"_sum_{c}"),
            F.count(F.col(c)).alias(f"_cnt_{c}"),
        ]
    for c in string_cols:
        aggs += [F.min(c).alias(f"_smin_{c}"), F.max(c).alias(f"_smax_{c}")]
    one = df.agg(*aggs)

    # inline(array<struct>) pivots the single stats row into per-column
    # rows in ONE plan — a union of per-column selects would re-execute
    # the aggregate (and its full table scan) once per column
    structs = []
    for c in numeric_cols:
        structs.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("_n_rows").cast("long").alias("n_rows"),
                F.col(f"_null_{c}").cast("long").alias("null_count"),
                F.col(f"_dist_{c}").cast("long").alias("n_distinct"),
                F.col(f"_min_{c}").alias("min_num"),
                F.col(f"_max_{c}").alias("max_num"),
                F.when(
                    F.col(f"_cnt_{c}") > 0,
                    F.col(f"_sum_{c}") / F.col(f"_cnt_{c}").cast("double"),
                ).alias("mean"),
                F.lit(None).cast("string").alias("min_str"),
                F.lit(None).cast("string").alias("max_str"),
            )
        )
    for c in string_cols:
        structs.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("_n_rows").cast("long").alias("n_rows"),
                F.col(f"_null_{c}").cast("long").alias("null_count"),
                F.col(f"_dist_{c}").cast("long").alias("n_distinct"),
                F.lit(None).cast("double").alias("min_num"),
                F.lit(None).cast("double").alias("max_num"),
                F.lit(None).cast("double").alias("mean"),
                F.col(f"_smin_{c}").alias("min_str"),
                F.col(f"_smax_{c}").alias("max_str"),
            )
        )
    return one.select(F.inline(F.array(*structs)))
