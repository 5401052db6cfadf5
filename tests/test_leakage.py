"""Zero-temporal-leakage property (BASELINE.json:6; SURVEY.md §5.2-3a):
mutating any turn with ts > anchor ts must leave features at that
anchor unchanged. Also: order invariance and parallelism invariance."""

from __future__ import annotations

import pandas as pd

from fte.features import build_default_registry
from fte.pipeline import build_matrix
from fte.schema import TRANSCRIPTS_SCHEMA

KEY = ["conv_id", "turn_idx"]


def _matrix_pdf(spark, pdf):
    reg = build_default_registry()
    names = [n for n, s in reg.features.items() if not s.leaky]
    df = spark.createDataFrame(pdf, schema=TRANSCRIPTS_SCHEMA)
    out = build_matrix(df, reg, features=names, serve=True).toPandas()
    return out.sort_values(KEY, kind="mergesort").reset_index(drop=True)


def test_future_mutation_does_not_change_past(spark, transcripts_pdf):
    base = _matrix_pdf(spark, transcripts_pdf)

    # pick a cutoff inside the busiest conversation and mutate
    # EVERYTHING after it (text, role, tool, value-bearing cols)
    conv = transcripts_pdf["conv_id"].value_counts().idxmax()
    sub = transcripts_pdf[transcripts_pdf.conv_id == conv].sort_values("turn_idx")
    cutoff_ts = sub["ts"].iloc[len(sub) // 2]

    mutated = transcripts_pdf.copy()
    future = (mutated.conv_id == conv) & (mutated.ts > cutoff_ts)
    assert future.sum() > 0
    mutated.loc[future, "text"] = "MUTATED " * 50
    mutated.loc[future, "role"] = "tool"
    mutated.loc[future, "tool"] = "bash"
    got = _matrix_pdf(spark, mutated)

    # all rows at or before cutoff_ts (any conv) must be unchanged
    past_keys = base[(base.conv_id != conv) | (base.ts <= cutoff_ts)]
    merged = past_keys.merge(got, on=KEY, suffixes=("_a", "_b"))
    feat_cols = [c for c in base.columns if c not in KEY + ["ts"]]
    for c in feat_cols:
        a, b = merged[f"{c}_a"], merged[f"{c}_b"]
        same = (a == b) | (a.isna() & b.isna())
        assert same.all(), f"leak via {c}: {int((~same).sum())} rows changed"


def test_input_order_invariance(spark, transcripts_pdf):
    base = _matrix_pdf(spark, transcripts_pdf)
    shuffled = transcripts_pdf.sample(frac=1.0, random_state=7).reset_index(drop=True)
    got = _matrix_pdf(spark, shuffled)
    pd.testing.assert_frame_equal(base, got)


def test_parallelism_invariance(spark, transcripts_pdf):
    reg = build_default_registry()
    names = [n for n, s in reg.features.items() if not s.leaky]
    df = spark.createDataFrame(transcripts_pdf, schema=TRANSCRIPTS_SCHEMA)
    a = (
        build_matrix(df.repartition(1), reg, features=names, serve=True)
        .toPandas().sort_values(KEY, kind="mergesort").reset_index(drop=True)
    )
    b = (
        build_matrix(df.repartition(16), reg, features=names, serve=True)
        .toPandas().sort_values(KEY, kind="mergesort").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
