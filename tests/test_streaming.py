"""Streaming sessionization agrees with the batch sessionizer on
session boundaries (availableNow drain → deterministic)."""

from __future__ import annotations

import pandas as pd

from fte.operators import sessionize
from fte.schema import TRANSCRIPTS_SCHEMA
from fte.streaming import run_available_now, stream_transcripts, streaming_session_stats


def test_streaming_sessions_match_batch(spark, transcripts_pdf, tmp_path):
    src = str(tmp_path / "src")
    spark.createDataFrame(transcripts_pdf, schema=TRANSCRIPTS_SCHEMA).write.parquet(src)

    stream = stream_transcripts(spark, src)
    result = streaming_session_stats(stream, gap_seconds=1800)
    run_available_now(result, str(tmp_path / "ckpt"), "sess_stream")
    got = spark.table("sess_stream").toPandas()

    batch = (
        sessionize(spark.createDataFrame(transcripts_pdf, schema=TRANSCRIPTS_SCHEMA))
        .groupBy("conv_id", "session_id")
        .count()
        .toPandas()
    )
    # same number of sessions overall and per conversation
    assert len(got) == len(batch)
    a = got.groupby("conv_id").size().sort_index()
    b = batch.groupby("conv_id").size().sort_index()
    pd.testing.assert_series_equal(a, b, check_names=False)
    # per-session turn counts agree (session_window uses the same
    # gap>1800s split; compare count multisets per conv)
    ga = got.groupby("conv_id")["n_turns"].apply(lambda s: sorted(s))
    gb = batch.groupby("conv_id")["count"].apply(lambda s: sorted(s))
    assert ga.to_dict() == gb.to_dict()
