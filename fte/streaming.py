"""Structured Streaming extension (SURVEY.md §2.B marks streaming a
documented non-goal for the north rule — batch + resumable checkpoints
— but the engine's operators map cleanly onto streams, shown here).

- ``stream_transcripts``: file-source stream over the same parquet
  layout (works incrementally as new ts_day partitions land).
- ``streaming_session_stats``: event-time sessionization via
  ``F.session_window`` with a watermark for late turns — the streaming
  analog of operators/sessionize.py's per-row labeling (streaming
  aggregation yields per-session rows instead; per-row labels would
  use ``applyInPandasWithState``).
- ``run_available_now``: deterministic one-shot drain (used by tests
  and by incremental batch jobs that want streaming's exactly-once
  file tracking without a long-running query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from fte.schema import SESSION_GAP_SECONDS, TRANSCRIPTS_SCHEMA


def stream_transcripts(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(path)
    )


def streaming_session_stats(
    stream: DataFrame,
    gap_seconds: int = SESSION_GAP_SECONDS,
    watermark: str = "2 hours",
) -> DataFrame:
    """Per (conv, session) aggregates with event-time session windows.

    The watermark bounds state: turns later than `watermark` behind the
    max seen ts are dropped from session state (the batch engine
    handles the same late data via ingest.merge_late_batch + partition
    re-run instead — no state bound needed there).
    """
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(
            F.session_window("ts", f"{gap_seconds} seconds").alias("sw"),
            F.col("conv_id"),
        )
        .agg(
            F.count("*").alias("n_turns"),
            F.sum(F.length("text")).alias("total_chars"),
        )
        .select(
            "conv_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_turns",
            "total_chars",
        )
    )


def run_available_now(
    result: DataFrame, checkpoint_dir: str, table_name: str
) -> None:
    """Drain everything currently available into an in-memory table and
    stop — deterministic, no wall-clock dependence."""
    q = (
        result.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
