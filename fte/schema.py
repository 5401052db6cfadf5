"""Declared schemas for the engine's canonical tables.

The reference (FeatureHub) infers pandas dtypes at CSV load time
[U: src/featurehub/user/session.py::Session._load_dataset]; this engine
declares fixed StructTypes so that scans never pay inference, parquet
predicate pushdown sees correct types, and pandas-UDF boundaries are
schema-checked (BASELINE.json:15 input_hint).
"""

from __future__ import annotations

from pyspark.sql import types as T

# The primary fact table: one row per conversation turn.
# BASELINE.json:15 — (conv_id:string, turn_idx:int32, role:string,
# text:string, tool:string, ts:timestamp)
TRANSCRIPTS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), nullable=False),
        T.StructField("turn_idx", T.IntegerType(), nullable=False),
        T.StructField("role", T.StringType(), nullable=False),
        T.StructField("text", T.StringType(), nullable=False),
        T.StructField("tool", T.StringType(), nullable=True),
        T.StructField("ts", T.TimestampType(), nullable=False),
    ]
)

ROLES = ("user", "assistant", "system", "tool")
TOOLS = ("search", "bash", "read", "write", "browse", "none")

# Left side of the point-in-time as-of join (FIXTURES.md §2).
ANCHORS_SCHEMA = T.StructType(
    [
        T.StructField("anchor_id", T.LongType(), nullable=False),
        T.StructField("conv_id", T.StringType(), nullable=False),
        T.StructField("ts", T.TimestampType(), nullable=False),
    ]
)

# Optional target table (FeatureHub Problem.target_table_name analog
# [U: src/featurehub/admin/sqlalchemy_declarative.py]).
LABELS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), nullable=False),
        T.StructField("ts", T.TimestampType(), nullable=False),
        T.StructField("y", T.DoubleType(), nullable=False),
    ]
)

# Session-split threshold (seconds) used by sessionize defaults; the
# fixture generator plants ~5% gaps above this (FIXTURES.md §1).
SESSION_GAP_SECONDS = 1800
