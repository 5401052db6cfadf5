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


SESSION_LABEL_SCHEMA = "conv_id string, turn_idx int, ts timestamp, session_id long"
_STATE_SCHEMA = "last_ts_us long, session_id long"


def _whole_group(pdfs):
    """Materialize a stateful group's Arrow chunk iterator into ONE
    frame (yielded as a 1-element iterable). applyInPandasWithState
    delivers a group whose rows exceed arrow.maxRecordsPerBatch as
    SEVERAL chunks in arbitrary order; sorting each chunk
    independently would process a spanning conversation out of
    (ts, turn_idx) order and corrupt the running state. Memory is
    bounded by one conversation per trigger — the same envelope as
    any per-conv aggregate (whale convs are capped upstream)."""
    import pandas as pd

    chunks = [pdf for pdf in pdfs if len(pdf)]
    if not chunks:
        return
    yield chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)


def streaming_session_labels(
    stream: DataFrame, gap_seconds: int = SESSION_GAP_SECONDS
) -> DataFrame:
    """PER-ROW session labels on a stream — the custom stateful
    operator (``applyInPandasWithState``): state per conv_id carries
    (last turn ts, current session id) across micro-batches, so a
    conversation that spans triggers keeps one numbering. This is the
    streaming twin of operators/sessionize.py (same floored-seconds
    gap rule); ``streaming_session_stats`` is the aggregate variant.

    Rows within a batch are sorted per conv before labeling; across
    batches correctness relies on source time-ordering per conv (true
    for append-only transcript logs; out-of-order late turns are the
    batch engine's ingest path instead).
    """
    import pandas as pd

    def label(key, pdfs, state):
        conv_id = key[0]
        if state.exists:
            last_ts_us, sid = state.get
        else:
            last_ts_us, sid = None, 0
        for pdf in _whole_group(pdfs):
            pdf = pdf.sort_values(["ts", "turn_idx"], kind="mergesort")
            # worker-side pandas delivers datetime64[ns]; normalize to
            # microseconds before integer arithmetic
            ts_us = pdf["ts"].astype("datetime64[us]").astype("int64")
            ts_s = ts_us // 1_000_000
            out_sid = []
            for t in ts_s:
                if last_ts_us is None or (t - last_ts_us // 1_000_000) > gap_seconds:
                    sid += 1
                out_sid.append(sid)
                last_ts_us = int(ts_us.iloc[len(out_sid) - 1])
            yield pd.DataFrame(
                {
                    "conv_id": conv_id,
                    "turn_idx": pdf["turn_idx"].to_numpy(),
                    "ts": pdf["ts"].to_numpy(),
                    "session_id": pd.array(out_sid, dtype="int64"),
                }
            )
        state.update((last_ts_us, sid))

    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        stream.select("conv_id", "turn_idx", "ts")
        .groupBy("conv_id")
        .applyInPandasWithState(
            label,
            outputStructType=SESSION_LABEL_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


EWMA_SCHEMA = "conv_id string, turn_idx int, ts timestamp, ewma double"
_EWMA_STATE_SCHEMA = "wa double, ow double"


def streaming_ewma(
    stream: DataFrame, value_expr=None, alpha: float = 0.3
) -> DataFrame:
    """Streaming EWMA of a per-turn value (default: text length) —
    a second custom stateful operator: state per conv_id carries the
    pandas-ewm(adjust=True) recursion state (weighted_avg, old_wt)
    across micro-batches, so a conversation that spans triggers
    continues the SAME recursion the batch operator (with_ewma) runs,
    float-op for float-op:  ow' = (1-α)·ow;  wa' = (ow'·wa + x)/(ow'+1)
    unless wa == x;  then ow' += 1. Bit-identical to the batch/oracle
    semantics (fte/queries_extra.py SQL_EWMA) given in-order arrival
    per conv (true for append-only transcript logs).
    """
    import pandas as pd

    factor = 1.0 - alpha

    def step(key, pdfs, state):
        conv_id = key[0]
        if state.exists:
            wa, ow = state.get
            started = True
        else:
            wa, ow, started = 0.0, 0.0, False
        for pdf in _whole_group(pdfs):
            pdf = pdf.sort_values(["ts", "turn_idx"], kind="mergesort")
            xs = pdf["_x"].astype("float64").to_numpy()
            out = []
            for x in xs:
                if not started:
                    wa, ow, started = float(x), 1.0, True
                else:
                    ow = ow * factor
                    if wa != x:
                        wa = (ow * wa + x) / (ow + 1.0)
                    ow = ow + 1.0
                out.append(wa)
            yield pd.DataFrame(
                {
                    "conv_id": conv_id,
                    "turn_idx": pdf["turn_idx"].to_numpy(),
                    "ts": pdf["ts"].to_numpy(),
                    "ewma": pd.array(out, dtype="float64"),
                }
            )
        state.update((wa, ow))

    from pyspark.sql.streaming.state import GroupStateTimeout

    x = value_expr if value_expr is not None else F.length("text").cast("double")
    return (
        stream.select("conv_id", "turn_idx", "ts", x.alias("_x"))
        .groupBy("conv_id")
        .applyInPandasWithState(
            step,
            outputStructType=EWMA_SCHEMA,
            stateStructType=_EWMA_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


ROLLING_SCHEMA = (
    "conv_id string, turn_idx int, ts timestamp, n_so_far long, "
    "n_user long, n_assistant long, user_frac double, len_mean double"
)
_ROLLING_STATE_SCHEMA = "n long, n_user long, n_assistant long, len_sum double"


def streaming_rolling_features(stream: DataFrame) -> DataFrame:
    """Streaming twin of the serve-time rolling-feature core
    (fte/operators/windows.py: rolling counts, running role
    frequencies, running text-length mean): state per conv_id carries
    (n, n_user, n_assistant, len_sum) across micro-batches, so every
    emitted turn sees EXACTLY the turns with ts <= its own — the same
    leakage-safe currentRow-bounded frames the batch windows use, and
    a conversation spanning triggers continues the same running sums.
    Deterministic given in-order arrival per conv (append-only
    transcript logs); parity vs the batch frames is pytest-gated.

    Per turn: n_so_far, n_user, n_assistant, user_frac, len_mean.
    """
    import pandas as pd

    def step(key, pdfs, state):
        conv_id = key[0]
        if state.exists:
            n, n_user, n_asst, len_sum = state.get
        else:
            n, n_user, n_asst, len_sum = 0, 0, 0, 0.0
        for pdf in _whole_group(pdfs):
            pdf = pdf.sort_values(["ts", "turn_idx"], kind="mergesort")
            roles = pdf["role"].to_numpy()
            lens = pdf["_len"].astype("float64").to_numpy()
            o_n, o_u, o_a, o_uf, o_lm = [], [], [], [], []
            for r, ln in zip(roles, lens):
                n += 1
                if r == "user":
                    n_user += 1
                elif r == "assistant":
                    n_asst += 1
                len_sum += float(ln)
                o_n.append(n)
                o_u.append(n_user)
                o_a.append(n_asst)
                o_uf.append(n_user / n)
                o_lm.append(len_sum / n)
            yield pd.DataFrame(
                {
                    "conv_id": conv_id,
                    "turn_idx": pdf["turn_idx"].to_numpy(),
                    "ts": pdf["ts"].to_numpy(),
                    "n_so_far": pd.array(o_n, dtype="int64"),
                    "n_user": pd.array(o_u, dtype="int64"),
                    "n_assistant": pd.array(o_a, dtype="int64"),
                    "user_frac": pd.array(o_uf, dtype="float64"),
                    "len_mean": pd.array(o_lm, dtype="float64"),
                }
            )
        state.update((n, n_user, n_asst, len_sum))

    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        stream.select(
            "conv_id", "turn_idx", "ts", "role",
            F.length("text").cast("double").alias("_len"),
        )
        .groupBy("conv_id")
        .applyInPandasWithState(
            step,
            outputStructType=ROLLING_SCHEMA,
            stateStructType=_ROLLING_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


TE_SCHEMA = (
    "conv_id string, turn_idx int, role string, te_count long, te_mean double"
)
_TE_STATE_SCHEMA = "n long, s double"


def streaming_target_encode(stream: DataFrame) -> DataFrame:
    """Streaming twin of fte.operators.encoding.target_encode over the
    transcript stream: per ROLE (the category key), every turn is
    emitted with the count and mean of text length over turns of the
    same role processed strictly BEFORE it — the serve-time prior the
    batch operator's UNBOUNDED PRECEDING..1 PRECEDING frame computes.
    State per role carries (n, sum) across micro-batches; within a
    trigger the group is sorted by (ts, conv_id, turn_idx) — the batch
    operator's total order — so parity holds whenever arrival order
    respects event time per category (append-only logs; tested via
    sequential availableNow drains sharing one checkpoint, which is
    exactly how an incremental serve-time encoder would run).

    Accumulation is float (state is a running double sum), vs the
    batch/oracle decimal path — parity is allclose(1e-9), not
    bit-exact; the decimal accumulator doesn't fit a 2-field state row.
    """
    import pandas as pd

    def step(key, pdfs, state):
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in _whole_group(pdfs):
            pdf = pdf.sort_values(
                ["ts", "conv_id", "turn_idx"], kind="mergesort"
            )
            xs = pdf["_len"].astype("float64").to_numpy()
            counts, means = [], []
            for x in xs:
                counts.append(n)
                means.append((s / n) if n > 0 else float("nan"))
                n += 1
                s += float(x)
            yield pd.DataFrame(
                {
                    "conv_id": pdf["conv_id"].to_numpy(),
                    "turn_idx": pdf["turn_idx"].to_numpy(),
                    "role": key[0],
                    "te_count": pd.array(counts, dtype="int64"),
                    "te_mean": pd.array(means, dtype="float64"),
                }
            )
        state.update((n, s))

    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        stream.select(
            "conv_id", "turn_idx", "ts", "role",
            F.length("text").cast("double").alias("_len"),
        )
        .groupBy("role")
        .applyInPandasWithState(
            step,
            outputStructType=TE_SCHEMA,
            stateStructType=_TE_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_dedup(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup — the streaming twin of
    operators/dedup.exact_dedup: fingerprint the normalized text
    (xxhash64, fte.operators.text.with_fingerprint) and keep the FIRST
    arrival of each fingerprint via ``dropDuplicatesWithinWatermark``.

    Scale contract: state holds only fingerprints seen within the
    event-time watermark horizon, so state size is bounded by the
    dup-arrival window, not by corpus size — plain ``dropDuplicates``
    on a stream grows key state forever and is not viable at 10^12
    turns. Duplicates farther apart than the watermark are the batch
    engine's job (exact_dedup over the accumulated table); this
    operator guarantees the horizon only.
    """
    from fte.operators.text import with_fingerprint

    fp = with_fingerprint(stream, text_col)
    return fp.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["fingerprint"]
    )


def run_available_now(
    result: DataFrame, checkpoint_dir: str, table_name: str, mode: str = "complete"
) -> None:
    """Drain everything currently available into an in-memory table and
    stop — deterministic, no wall-clock dependence. mode='complete'
    for aggregations, 'update' for stateful map output."""
    q = (
        result.writeStream.format("memory")
        .queryName(table_name)
        .outputMode(mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_available_now_to_parquet(
    result: DataFrame, checkpoint_dir: str, out_dir: str, mode: str = "update"
) -> None:
    """Resumable one-shot drain to parquet via foreachBatch — unlike
    the memory sink, foreachBatch supports checkpoint RECOVERY, so
    sequential invocations sharing ``checkpoint_dir`` continue from
    the saved source offsets AND stateful-operator state. This is the
    incremental-batch shape: run availableNow per ingest cycle, state
    carries across cycles, output accumulates.

    The sink is IDEMPOTENT under batch replay: each micro-batch
    overwrites its own ``batch_id=<id>/`` partition directory, so a
    crash between a successful write and the checkpoint commit —
    which makes the engine re-run that batch on recovery — rewrites
    the same directory instead of appending duplicates (a bare
    mode('append') sink would double every replayed row, the exact
    failure recovery exists to survive). Read the root dir; the
    discovered ``batch_id`` partition column doubles as provenance."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")

    q = (
        result.writeStream.foreachBatch(write_batch)
        .outputMode(mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def streaming_funnel(
    stream: DataFrame,
    steps: tuple[str, ...] = ("user", "assistant", "tool"),
    entity_col: str = "conv_id",
    type_col: str = "role",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming twin of fte.operators.behavior.funnel_conversion:
    per-entity ordered-funnel automaton. State per entity carries the
    k "first ts step k was reached strictly after step k−1" scalars
    (epoch µs); each micro-batch advances them by scanning the
    entity's new events in (ts, …) order. Because s_{k−1}, once set,
    IS the minimum the batch operator computes, a single in-order
    pass sets every s_k to the batch value — parity holds whenever
    arrival order respects event time per entity (append-only logs;
    tested via sequential availableNow drains sharing one checkpoint,
    including state recovery across the restart).

    Emits one row per entity per trigger (update mode): the current
    step timestamps plus ``steps_reached``. The batch-side funnel
    counts are then a k-row aggregate over the latest row per entity —
    exactly how a serve-time funnel dashboard consumes it.
    """
    import pandas as pd

    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupStateTimeout

    k = len(steps)
    out_schema = T.StructType(
        [T.StructField("entity", T.StringType())]
        + [T.StructField(f"s{i}_us", T.LongType(), True) for i in range(k)]
        + [T.StructField("steps_reached", T.LongType())]
    )
    state_schema = ", ".join(f"s{i} long" for i in range(k))

    def step_fn(key, pdfs, state):
        ss = list(state.get) if state.exists else [None] * k
        for pdf in _whole_group(pdfs):
            pdf = pdf.sort_values(["_ts_us", "_t"], kind="mergesort")
            for ts_us, typ in zip(pdf["_ts_us"].to_numpy(), pdf["_t"].to_numpy()):
                for i in range(k):
                    if ss[i] is not None:
                        continue
                    prev_ok = i == 0 or (
                        ss[i - 1] is not None and int(ts_us) > int(ss[i - 1])
                    )
                    if typ == steps[i] and prev_ok:
                        ss[i] = int(ts_us)
                    break  # only the first unreached stage can advance
            reached = sum(1 for v in ss if v is not None)
            yield pd.DataFrame(
                {
                    "entity": [key[0]],
                    **{f"s{i}_us": pd.array([ss[i]], dtype="Int64") for i in range(k)},
                    "steps_reached": [reached],
                }
            )
        state.update(tuple(ss))

    return (
        stream.select(
            F.col(entity_col).cast("string").alias("_e"),
            F.col(type_col).alias("_t"),
            F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_ts_us"),
        )
        .groupBy("_e")
        .applyInPandasWithState(
            step_fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
