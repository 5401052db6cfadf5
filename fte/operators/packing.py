"""Sequence packing: assign documents to fixed-token-capacity bins —
the LLM-training step that turns a curated corpus into dense context
windows.

Packing is inherently sequential (each doc's bin depends on the
running fill), so the scale design is SHARD-PARALLEL: documents are
hash-sharded (key-stable md5 shard so the layout is reproducible and
SQL-checkable), each shard packs independently with a deterministic
greedy rule, and bin ids are (shard, bin_idx) pairs. At 10^12 docs the
Python loop per shard is the cost — one pass of simple arithmetic per
doc inside an Arrow batch, the same work any packer must do — and
shards bound both memory and skew (a shard is ~n/n_shards docs).

Greedy rule (deterministic, order = ascending id within shard):
  fill + t <= capacity  → same bin, fill += t
  else                  → bin += 1, fill = t
Docs longer than capacity get a bin of their own (truncation /
chunking is upstream policy, not the packer's).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T


def pack_documents(
    df: DataFrame,
    token_col: str,
    id_col: str = "doc_id",
    capacity: int = 2048,
    n_shards: int = 64,
    seed: int = 42,
) -> DataFrame:
    """(id, n_tokens) → (id, shard, bin_idx, bin_fill_after): greedy
    sequential packing within md5-hash shards. Output grain = input
    grain; join back on id for payloads. One shuffle (the shard
    groupBy)."""
    shard = (
        F.conv(F.substring(F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f"#p{seed}"))), 1, 8), 16, 10)
        .cast("long") % n_shards
    ).cast("int")
    slim = df.select(
        F.col(id_col), F.col(token_col).cast("long").alias("_t"), shard.alias("shard")
    )
    out_schema = T.StructType(
        [
            slim.schema[id_col],
            T.StructField("shard", T.IntegerType(), True),
            T.StructField("bin_idx", T.LongType(), True),
            T.StructField("bin_fill_after", T.LongType(), True),
        ]
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort")
        bins, fills = [], []
        fill, b = 0, 0
        first = True
        for t in pdf["_t"].to_numpy():
            t = int(t)
            if first:
                fill, first = t, False
            elif fill + t <= capacity:
                fill += t
            else:
                b += 1
                fill = t
            bins.append(b)
            fills.append(fill)
        return pd.DataFrame(
            {
                id_col: pdf[id_col].to_numpy(),
                "shard": pdf["shard"].to_numpy(),
                "bin_idx": pd.array(bins, dtype="int64"),
                "bin_fill_after": pd.array(fills, dtype="int64"),
            }
        )

    return slim.groupBy("shard").applyInPandas(pack, schema=out_schema)
