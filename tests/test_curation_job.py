"""End-to-end test of jobs/run_curation.py: every funnel stage drops
exactly the planted offender, outputs are split-partitioned, bins
respect capacity and never mix splits, PII is redacted on disk."""

from __future__ import annotations

import pandas as pd
import pytest


CLEAN = (
    "the quick brown fox jumps over the lazy dog and it runs to the "
    "river for a drink of cool water in the morning sun with friends "
)


def _mk_docs():
    long_a = (CLEAN * 3) + "unique alpha tail words here"
    long_b = (CLEAN * 3) + "unique alpha tail words there"  # near-dup of a
    rows = [
        (0, CLEAN + "call me at +1-555-0100 or mail bob@x.io for the offer"),
        (1, CLEAN + "it is that you for the and of to in another fine day"),
        (2, "der die und das ist nicht ich ein zu mit der die und das ist"),  # de
        # en by stopwords, but <5 tokens AND mean word len >12 -> 0.5
        (3, "the aaaaaaaaaaaaaaaaaaaaaaa"),
        # en by stopwords, quality 1.0, but distinct-word ratio 3/90
        (4, "the buy now " * 30),
        (5, CLEAN + "it is that you for the and of to in another fine day"),  # exact dup of 1
        (6, long_a),
        (7, long_b),  # near-dup -> dropped (id_b of verified pair)
    ]
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def test_curation_funnel_end_to_end(spark, tmp_path):
    from jobs.run_curation import curate

    src = str(tmp_path / "docs_in")
    out = str(tmp_path / "cur_out")
    spark.createDataFrame(_mk_docs()).write.parquet(src)

    funnel = curate(
        spark, src, out, chunk_words=16, stride=12, capacity=64,
    )
    assert funnel["n_input"] == 8
    assert funnel["n_lang"] == 7          # doc 2 (German) dropped
    assert funnel["n_quality"] == 6       # doc 3 (too short) dropped
    assert funnel["n_repetition"] == 5    # doc 4 (spam) dropped
    assert funnel["n_exact_dedup"] == 4   # doc 5 (exact dup of 1) dropped
    assert funnel["n_neardup"] == 3       # doc 7 (near-dup of 6) dropped

    docs = spark.read.parquet(f"{out}/documents").toPandas()
    assert sorted(docs["doc_id"]) == [0, 1, 6]
    # PII redacted on disk, audit counts preserved
    d0 = docs.set_index("doc_id").loc[0]
    assert "<PHONE>" in d0["text"] and "<EMAIL>" in d0["text"]
    assert "555-0100" not in d0["text"] and "bob@x.io" not in d0["text"]
    assert d0["n_emails"] == 1 and d0["n_phones"] == 1
    assert set(docs.columns) >= {"split", "quality_score", "lang_pred"}

    chunks = spark.read.parquet(f"{out}/chunks").toPandas()
    assert funnel["n_chunks"] == len(chunks) > 3  # long docs chunked
    # every chunk's doc survived; chunk split matches its doc's split
    doc_split = docs.set_index("doc_id")["split"].to_dict()
    assert all(chunks["split"] == chunks["doc_id"].map(doc_split))
    # bins: capacity respected, no bin mixes splits or exceeds capacity
    for (s, sh, b), g in chunks.groupby(["split", "shard", "bin_idx"]):
        assert g["n_tokens"].sum() <= 64 or len(g) == 1  # oversize singleton ok
        assert g["split"].nunique() == 1


def test_curation_with_segment_dedup_stage(spark, tmp_path):
    """--seg-words enables cross-doc repeated-block removal: docs 0,
    1, 6 all open with the same CLEAN prefix, so doc 0 (first owner)
    keeps its blocks and the later docs lose them, keeping only their
    genuinely new content."""
    from jobs.run_curation import curate

    src = str(tmp_path / "docs_in_seg")
    out = str(tmp_path / "cur_out_seg")
    spark.createDataFrame(_mk_docs()).write.parquet(src)

    funnel = curate(
        spark, src, out, chunk_words=16, stride=12, capacity=64,
        seg_words=8,
    )
    assert funnel["n_neardup"] == 3
    assert funnel["n_segment"] <= 3
    docs = spark.read.parquet(f"{out}/documents").toPandas()
    by_id = docs.set_index("doc_id")["text"].to_dict()
    # doc 0 (first owner) keeps its opening block
    assert 0 in by_id and by_id[0].startswith("the quick brown fox")
    # later docs lose the repeated opening block but keep unique tails
    for did, text in by_id.items():
        if did == 0:
            continue
        assert not text.startswith("the quick brown fox"), (did, text[:60])
    if 1 in by_id:
        assert "another fine day" in by_id[1]


def test_curation_canonical_keeps_best_quality_duplicate(spark, tmp_path):
    """--canonical reverses the min-id keep rule when the later
    duplicate is the better copy: doc 10 is a near-dup of doc 11 but
    ~40% SHOUTED (upper_ratio > 0.3 -> quality 0.75 vs 1.0; case
    doesn't change shingles, so the pair is still found). Default
    drops id_b=11 (keeping the shouty copy); --canonical keeps the
    clean one."""
    from jobs.run_curation import curate

    shared = CLEAN * 3
    half = len(shared) // 2
    ugly = shared[:half].upper() + shared[half:] + "unique alpha tail words here"
    clean = shared + "unique alpha tail words there"
    rows = [
        (0, CLEAN + "it is that you for the and of to in another fine day"),
        (10, ugly),
        (11, clean),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    src = str(tmp_path / "docs_in_canon")
    spark.createDataFrame(pdf).write.parquet(src)

    out_default = str(tmp_path / "cur_out_default")
    funnel = curate(spark, src, out_default, chunk_words=16, stride=12, capacity=64)
    ids = set(spark.read.parquet(f"{out_default}/documents").toPandas()["doc_id"])
    assert funnel["n_neardup"] == 2
    assert 10 in ids and 11 not in ids, "default min-id rule keeps the shouty copy"

    out_canon = str(tmp_path / "cur_out_canon")
    funnel = curate(
        spark, src, out_canon, chunk_words=16, stride=12, capacity=64,
        canonical=True,
    )
    ids = set(spark.read.parquet(f"{out_canon}/documents").toPandas()["doc_id"])
    assert funnel["n_neardup"] == 2
    assert 11 in ids and 10 not in ids, "--canonical keeps the best-quality copy"
    assert 0 in ids, "singleton (non-dup) docs survive canonical selection"
