"""Late-batch ingest + anchor-grained feature matrix with PIT labels."""

from __future__ import annotations

import numpy as np
import pandas as pd

from fte.features import build_default_registry
from fte.operators.ingest import merge_late_batch
from fte.pipeline import attach_labels, build_anchor_matrix
from fte.schema import ANCHORS_SCHEMA, LABELS_SCHEMA, TRANSCRIPTS_SCHEMA
from fte.synth import gen_late_batch_pdf


def test_merge_late_batch_idempotent(spark, transcripts_pdf):
    late_pdf = gen_late_batch_pdf(transcripts_pdf, seed=42)
    existing = spark.createDataFrame(transcripts_pdf, schema=TRANSCRIPTS_SCHEMA)
    late = spark.createDataFrame(late_pdf, schema=TRANSCRIPTS_SCHEMA)

    merged = merge_late_batch(existing, late)
    n1 = merged.count()
    # replays must not duplicate
    assert merged.groupBy("conv_id", "turn_idx").count().filter("count > 1").count() == 0
    # genuinely-new rows were added
    n_new = (
        late.dropDuplicates(["conv_id", "turn_idx"])
        .join(existing.select("conv_id", "turn_idx"), ["conv_id", "turn_idx"], "left_anti")
        .count()
    )
    assert n1 == existing.count() + n_new
    # merging the same batch again is a no-op
    again = merge_late_batch(merged, late)
    assert again.count() == n1


def test_anchor_matrix_pit(spark, transcripts_df, anchors_df, transcripts_pdf, anchors_pdf):
    reg = build_default_registry()
    m = build_anchor_matrix(anchors_df, transcripts_df, reg).toPandas()
    assert len(m) == len(anchors_pdf)  # left semantics: no anchor dropped

    # anchors before the conv's first turn or for unknown convs → null features
    firsts = transcripts_pdf.groupby("conv_id")["ts"].min()
    exp_null = anchors_pdf.apply(
        lambda r: r["conv_id"] not in firsts.index or r["ts"] < firsts[r["conv_id"]],
        axis=1,
    )
    got = m.sort_values("anchor_id").reset_index(drop=True)
    exp = anchors_pdf.sort_values("anchor_id").reset_index(drop=True)
    assert (got["f_turns_so_far"].isna() == exp_null[exp.index]).all()

    # PIT invariant: matched turn features never use turns after anchor ts
    matched = got[got["f_ts"].notna()]
    assert (matched["f_ts"] <= matched["ts"]).all()
    # turns_so_far at the anchor == count of turns with ts <= anchor ts
    tp = transcripts_pdf
    for _, r in matched.sample(n=min(10, len(matched)), random_state=1).iterrows():
        n = ((tp.conv_id == r.conv_id) & (tp.ts <= r.ts)).sum()
        assert r["f_turns_so_far"] == n


def test_anchor_matrix_strategies_agree(spark, transcripts_df, anchors_df):
    reg = build_default_registry()
    a = build_anchor_matrix(anchors_df, transcripts_df, reg, strategy="window").toPandas()
    b = build_anchor_matrix(anchors_df, transcripts_df, reg, strategy="merge").toPandas()
    a = a.sort_values("anchor_id").reset_index(drop=True)
    b = b.sort_values("anchor_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_attach_labels_pit(spark, transcripts_df, anchors_df, labels_df, labels_pdf, anchors_pdf):
    reg = build_default_registry()
    m = build_anchor_matrix(anchors_df, transcripts_df, reg, features=["f_session"])
    out = attach_labels(m, labels_df).toPandas()
    assert len(out) == anchors_df.count()
    got = out[out["label_y"].notna()]
    # label observation time never after the anchor
    assert (got["label_ts"] <= got["ts"]).all()
    # cross-check one anchor against pandas
    lp = labels_pdf
    for _, r in got.sample(n=min(5, len(got)), random_state=2).iterrows():
        cand = lp[(lp.conv_id == r.conv_id) & (lp.ts <= r.ts)]
        assert not cand.empty
        assert np.isclose(r["label_y"], cand.sort_values("ts")["y"].iloc[-1])
