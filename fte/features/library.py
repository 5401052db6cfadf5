"""Built-in feature extractor library.

Each extractor is a registered builder ``(transcripts) -> transcripts +
feature cols`` — the engine-provided replacement for the ad-hoc pandas
code FeatureHub users wrote inside feature functions [U: user feature
code executed by featurehub/evaluation/client.py]. All are leakage-safe
(frames end at currentRow) unless flagged ``leaky=True``.

Every extractor here shares the SAME window partitioning+ordering
(conv_id / ts,turn_idx), so applying the whole library costs ONE
shuffle + ONE sort total — Catalyst merges identical WindowSpecs into
a single WindowExec chain. `.explain()` on the assembled matrix shows
exactly one Exchange for all window features. That property is the
core scale win vs per-feature passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from fte.operators.sessionize import sessionize
from fte.operators.windows import (
    with_backfill,
    with_lag_lead,
    with_rolling_counts,
    with_rolling_role_freq,
    with_rolling_text_stats,
)
from fte.registry import FeatureRegistry


def build_default_registry() -> FeatureRegistry:
    reg = FeatureRegistry()

    @reg.feature(outputs=("session_id",), tags=("window", "session"))
    def f_session(df: DataFrame) -> DataFrame:
        """Session id from 1800s ts-gap splits."""
        return sessionize(df)

    @reg.feature(outputs=("turns_so_far", "turns_last_300s"), tags=("window",))
    def f_rolling_counts(df: DataFrame) -> DataFrame:
        """Expanding turn count + trailing 5-minute turn count."""
        return with_rolling_counts(df)

    @reg.feature(
        outputs=tuple(f"cnt_{r}" for r in ("user", "assistant", "system", "tool"))
        + tuple(f"frac_{r}" for r in ("user", "assistant", "system", "tool")),
        tags=("window", "role"),
    )
    def f_role_freq(df: DataFrame) -> DataFrame:
        """Running per-role counts and fractions."""
        return with_rolling_role_freq(df)

    @reg.feature(
        outputs=("textlen_mean", "textlen_std", "textlen_min", "textlen_max", "textlen_sum"),
        tags=("window", "text"),
    )
    def f_text_stats(df: DataFrame) -> DataFrame:
        """Running text-length stats."""
        return with_rolling_text_stats(df)

    @reg.feature(outputs=("ffill_tool",), tags=("window", "backfill"))
    def f_tool_ffill(df: DataFrame) -> DataFrame:
        """Last tool used so far (forward-fill)."""
        return with_backfill(df, ["tool"])

    @reg.feature(
        outputs=("lag_role_1", "gap_prev_s", "lag_textlen_1"),
        tags=("window", "lag"),
    )
    def f_prev_turn(df: DataFrame) -> DataFrame:
        """Previous turn's role, ts gap (seconds), text length — one
        WindowExec pass for all three lags."""
        from pyspark.sql import Window

        from fte.functions import epoch_seconds

        w = Window.partitionBy("conv_id").orderBy("ts", "turn_idx")
        # pre-project the narrow inputs so text/ts stay out of the
        # shuffle (lag over a projected int, not length(text))
        tl = F.col("textlen") if "textlen" in df.columns else F.length("text")
        projected = df.select(
            "*", tl.alias("_tl"), epoch_seconds("ts").alias("_es")
        )
        out = projected.select(
            "*",
            F.lag("role", 1).over(w).alias("lag_role_1"),
            (F.col("_es") - F.lag("_es", 1).over(w)).cast("double").alias("gap_prev_s"),
            F.lag("_tl", 1).over(w).alias("lag_textlen_1"),
        )
        return out.drop("_tl", "_es")

    @reg.feature(outputs=("hour_of_day", "is_weekend"), tags=("scalar", "time"))
    def f_time_of_day(df: DataFrame) -> DataFrame:
        """Anchor-time scalar features (no window)."""
        return df.withColumn("hour_of_day", F.hour("ts")).withColumn(
            "is_weekend", F.dayofweek("ts").isin(1, 7).cast("int")
        )

    @reg.feature(
        outputs=("textlen", "word_count", "has_question", "upper_ratio"),
        tags=("scalar", "text"),
    )
    def f_text_scalars(df: DataFrame) -> DataFrame:
        """Per-turn text scalars — pure JVM expressions, projected at
        the scan (scalar stage) so `text` never reaches the shuffle."""
        return (
            df.withColumn("textlen", F.length("text"))
            .withColumn("word_count", F.size(F.split(F.trim(F.col("text")), r"\s+")))
            .withColumn("has_question", F.col("text").contains("?").cast("int"))
            .withColumn(
                "upper_ratio",
                (
                    F.length(F.regexp_replace(F.col("text"), "[^A-Z]", ""))
                    / F.greatest(F.length("text"), F.lit(1))
                ).cast("double"),
            )
        )

    @reg.feature(outputs=("lead_role_1",), leaky=True, tags=("window", "lead"))
    def f_next_role(df: DataFrame) -> DataFrame:
        """NEXT turn's role — train-time target helper, LEAKY."""
        return with_lag_lead(df, ["role"], offsets=(1,), include_lead=True).drop("lag_role_1")

    return reg
