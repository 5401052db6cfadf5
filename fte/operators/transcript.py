"""Transcript-structure analytics: role-transition matrices, response
latency, and turn-taking run statistics.

The input shape is the engine's canonical transcript table (SURVEY.md
§1.2: conv_id, turn_idx/ts ordering, role) — on the driver testdata the
`events` table stands in (user_id≈conv_id, event_type≈role,
(ts, event_id)≈turn order). These are the conversation-level features a
FeatureHub-style user writes against multi-turn agent transcripts:
"how often does the assistant follow the user", "how fast does a role
respond", "how long are monologue runs".

Scale shape (all three operators):
- ONE shuffle on the conversation key for the lag/row_number windows —
  the same (conv_id) Exchange every other windowed feature in
  fte/operators/windows.py uses, so at 100 TB these co-schedule with
  the rest of the feature pass instead of adding a new partitioning.
- The downstream aggregates are tiny (|roles|² rows, |roles| rows,
  |convs| rows) with map-side partial aggregation; no broadcast, no
  collect, no Python.
- Everything is built-in-function codegen; no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from fte.functions import epoch_micros


def role_transitions(
    df: DataFrame,
    conv_col: str = "conv_id",
    role_col: str = "role",
    order_cols: tuple[str, ...] = ("ts", "turn_idx"),
    start_token: str = "<start>",
) -> DataFrame:
    """First-order Markov transition counts/probabilities over roles.

    Each turn contributes one (prev_role, role) observation within its
    conversation; the first turn of a conversation transitions from
    ``start_token``. Returns one row per observed (prev_role, role)
    pair: ``n`` (BIGINT), ``n_prev`` (BIGINT, total transitions out of
    prev_role) and ``p`` = n / n_prev as a double — both operands are
    exact integers, so the ratio is bit-identical across engines.
    """
    w = Window.partitionBy(conv_col).orderBy(*order_cols)
    prev = F.coalesce(F.lag(role_col).over(w), F.lit(start_token))
    pairs = df.select(
        prev.alias("prev_role"), F.col(role_col).alias("role")
    )
    counts = pairs.groupBy("prev_role", "role").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    w_prev = Window.partitionBy("prev_role")
    return counts.select(
        "prev_role",
        "role",
        "n",
        F.sum("n").over(w_prev).cast("long").alias("n_prev"),
        (F.col("n").cast("double") / F.sum("n").over(w_prev).cast("double")).alias("p"),
    )


def response_latency(
    df: DataFrame,
    conv_col: str = "conv_id",
    role_col: str = "role",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = ("ts", "turn_idx"),
) -> DataFrame:
    """Per-role response-time stats: for every turn whose predecessor
    in the conversation was spoken by a DIFFERENT role, the latency is
    ts − prev_ts; aggregate per responding role.

    Latencies are computed in integer microseconds (timestamp_ntz has
    exact µs precision, so sums/means are reproducible: ``mean_us`` is
    an exact BIGINT sum divided by an exact BIGINT count — identical
    double on every engine). Returns (role, n_responses, mean_us,
    max_us, min_us).
    """
    w = Window.partitionBy(conv_col).orderBy(*order_cols)
    ep = epoch_micros(ts_col)
    lat = df.select(
        F.col(role_col).alias("role"),
        F.lag(role_col).over(w).alias("_prev_role"),
        (ep - F.lag(ep).over(w)).alias("_delta_us"),
    ).where(
        F.col("_prev_role").isNotNull() & (F.col("_prev_role") != F.col("role"))
    )
    return lat.groupBy("role").agg(
        F.count(F.lit(1)).cast("long").alias("n_responses"),
        (F.sum("_delta_us").cast("double") / F.count(F.lit(1)).cast("double")).alias("mean_us"),
        F.max("_delta_us").cast("long").alias("max_us"),
        F.min("_delta_us").cast("long").alias("min_us"),
    )


def turn_runs(
    df: DataFrame,
    conv_col: str = "conv_id",
    role_col: str = "role",
    order_cols: tuple[str, ...] = ("ts", "turn_idx"),
) -> DataFrame:
    """Gaps-and-islands: maximal runs of consecutive same-role turns
    per conversation, summarized per conversation.

    The run id is the classic difference of two row_numbers — global
    position minus position within the role — so the corpus crosses
    the wire once (the (conv) window Exchange both row_numbers share);
    the two aggregates that follow re-hash only RUN rows (map-side
    combined, ≤ one row per monologue), not turns. Returns one row per
    conversation: ``n_turns``, ``n_runs``, ``max_run`` (length of the
    longest monologue), ``max_run_role`` (role of that run; ties broken
    by earliest run start so the answer is deterministic).
    """
    w = Window.partitionBy(conv_col).orderBy(*order_cols)
    w_role = Window.partitionBy(conv_col, role_col).orderBy(*order_cols)
    marked = df.select(
        F.col(conv_col).alias("conv"),
        F.col(role_col).alias("role"),
        F.row_number().over(w).alias("_pos"),
        (F.row_number().over(w) - F.row_number().over(w_role)).alias("_run_key"),
    )
    runs = marked.groupBy("conv", "role", "_run_key").agg(
        F.count(F.lit(1)).cast("long").alias("run_len"),
        F.min("_pos").alias("_start"),
    )
    # longest run per conversation; ties -> earliest start (deterministic)
    w_conv = Window.partitionBy("conv").orderBy(
        F.col("run_len").desc(), F.col("_start").asc()
    )
    return (
        runs.withColumn("_rk", F.row_number().over(w_conv))
        .groupBy("conv")
        .agg(
            F.sum("run_len").cast("long").alias("n_turns"),
            F.count(F.lit(1)).cast("long").alias("n_runs"),
            F.max("run_len").cast("long").alias("max_run"),
            F.max(F.when(F.col("_rk") == 1, F.col("role"))).alias("max_run_role"),
        )
    )
