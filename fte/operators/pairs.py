"""Training-example extraction from conversation transcripts.

The transcript-to-training-data step of an LLM pipeline: turn a turns
table (BASELINE.json input_hint shape: conv_id, turn_idx, role, text,
ts) into supervised pairs (context = the rendered previous K turns,
response = the assistant turn) and into flat SFT documents (the whole
conversation rendered with a chat template).

Scale design (100 TB / 10^12 turns):
- ONE shuffle on the conversation key per operator; everything after
  is window/aggregate machinery inside each partition.
- The rendered text IS the payload here, so it must cross the
  Exchange — unlike the feature matrix (where `text` is pruned before
  the shuffle, tests/test_plans_text.py) there is no smaller column
  set to ship.
- Context assembly is `collect_list` over a BOUNDED window frame
  (K preceding .. 1 preceding): per-row state is at most K turns, so
  executor memory is O(K · turn_len) regardless of conversation
  length. No interpreted higher-order functions (concat_ws /
  array_join are codegen; the CLAUDE.md ~100 µs/element HOF trap does
  not apply to them).
- Full-conversation rendering aggregates per conv_id; the whole
  conversation must exist in one place by definition. Whale
  conversations are the same risk class as any per-conv agg — cap with
  `max_turns` (take the LAST max_turns turns) to bound the worst key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def render_turn(role_col: str = "role", text_col: str = "text", sep: str = ": ") -> Column:
    """One turn rendered for a chat template: ``role: text``."""
    return F.concat_ws(sep, F.col(role_col), F.col(text_col))


def make_training_pairs(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_cols: tuple[str, ...] = ("turn_idx",),
    role_col: str = "role",
    text_col: str = "text",
    response_role: str = "assistant",
    context_turns: int = 8,
    turn_sep: str = "\n",
) -> DataFrame:
    """(context, response) supervised pairs: one output row per turn
    whose role == ``response_role``, with the previous ``context_turns``
    turns (ANY role) rendered into ``context``. Point-in-time safe by
    frame construction — the frame ends at 1 PRECEDING, so the response
    turn and everything after it can never leak into its own context
    (the window twin of the as-of ts ≤ anchor bound, SURVEY §2.B).

    Output: conv + order cols, n_context (turns actually present, < K
    at conversation starts), context (may be '' for a conversation-
    opening response), response.
    """
    w = (
        Window.partitionBy(conv_col)
        .orderBy(*order_cols)
        .rowsBetween(-context_turns, -1)
    )
    rendered = render_turn(role_col, text_col)
    out = (
        df.withColumn("_r", rendered)
        .withColumn("n_context", F.count(F.lit(1)).over(w).cast("long"))
        .withColumn("context", F.concat_ws(turn_sep, F.collect_list("_r").over(w)))
        .filter(F.col(role_col) == response_role)
        .withColumn("response", rendered)
    )
    return out.select(conv_col, *order_cols, "n_context", "context", "response")


def render_conversations(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_cols: tuple[str, ...] = ("turn_idx",),
    role_col: str = "role",
    text_col: str = "text",
    turn_sep: str = "\n",
    max_turns: int | None = None,
) -> DataFrame:
    """Flatten each conversation into ONE SFT document: all turns in
    order, rendered with the chat template, joined by ``turn_sep``.

    One hash aggregate on conv_col. Ordering is done INSIDE the
    aggregate — `array_sort` over structs whose leading fields are the
    order columns — so no window pass or secondary sort is needed, and
    extracting the rendered strings uses struct-field extraction over
    the array (`arr.r` → array<string>, codegen), not an interpreted
    `transform` lambda. With ``max_turns`` set, keeps the LAST
    max_turns turns (`slice` from the tail) to bound whale
    conversations' memory.

    Output: (conv, n_turns, sft_text).
    """
    rendered = render_turn(role_col, text_col)
    arr = F.array_sort(
        F.collect_list(F.struct(*[F.col(c) for c in order_cols], rendered.alias("r")))
    )
    agg = df.groupBy(conv_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        arr.alias("_a"),
    )
    texts = F.col("_a").getField("r")
    if max_turns is not None:
        texts = F.slice(
            texts,
            F.greatest(F.size(texts) - F.lit(max_turns) + 1, F.lit(1)),
            max_turns,
        )
    return agg.select(
        conv_col, "n_turns", F.array_join(texts, turn_sep).alias("sft_text")
    )


def sft_loss_spans(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_cols: tuple[str, ...] = ("turn_idx",),
    role_col: str = "role",
    text_col: str = "text",
    loss_role: str = "assistant",
    turn_sep: str = "\n",
) -> DataFrame:
    """Loss-mask spans for the ``render_conversations`` documents: the
    0-based character ranges [span_start, span_end) inside ``sft_text``
    that cover each ``loss_role`` turn — SFT training computes loss
    only on assistant tokens, so the renderer must ship these offsets
    with the text (re-deriving them tokenizer-side re-parses the
    template and breaks on role strings appearing in content).

    Pure codegen companion to the renderer: rendered-turn length per
    row, one window cumsum over (len + len(turn_sep)) with the frame
    ending at 1 PRECEDING — same single conv shuffle. The window's
    order is (order_cols..., rendered text) — the SAME total order
    array_sort(struct(order_cols..., r)) gives the renderer — so even
    dirty data with duplicate order keys yields offsets that match
    the rendered document. Offsets correspond to the UNTRUNCATED
    render (``max_turns=None``); for whale-capped documents compute
    spans over the same pre-sliced turn subset instead. Span parity
    with substring() is pytest-gated.

    Output: conv + order cols, span_start, span_end (end-exclusive).
    """
    rendered = render_turn(role_col, text_col)
    rlen = F.length(rendered)
    w = (
        Window.partitionBy(conv_col)
        .orderBy(*order_cols, rendered)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    sep_len = len(turn_sep)
    start = F.coalesce(F.sum(rlen + F.lit(sep_len)).over(w), F.lit(0))
    return (
        df.withColumn("span_start", start.cast("long"))
        .withColumn("span_end", (start + rlen).cast("long"))
        .filter(F.col(role_col) == loss_role)
        .select(conv_col, *order_cols, "span_start", "span_end")
    )
