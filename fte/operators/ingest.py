"""Late-data ingest: dedup replayed turns, merge genuinely-new ones.

FIXTURES.md §4: a late batch contains (a) exact replays of already
ingested (conv_id, turn_idx) rows and (b) genuinely new turns whose ts
is EARLIER than already-ingested turns of the same conversation.
The merge is two anti-join-shaped steps (one shuffle each, both on the
narrow key pair), and downstream features stay correct because every
window orders by (ts, turn_idx), not ingestion order.

At 100 TB the existing side is the huge one: the anti-join keys
against it should be the bucketed/partitioned key columns only —
``merge_late_batch`` projects the key columns before joining so the
shuffle carries 12 bytes/row, not the text payload, and with the
ts_day/conv_bucket layout the join prunes to the late batch's
partitions.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from fte.operators.windows import dedup_turns


def merge_late_batch(
    existing: DataFrame,
    late: DataFrame,
    keys: Sequence[str] = ("conv_id", "turn_idx"),
) -> DataFrame:
    """existing ∪ (late \\ existing), with intra-batch replays deduped.

    Idempotent: merging the same late batch twice is a no-op.
    """
    keys = list(keys)
    late_unique = dedup_turns(late, keys=keys, order_cols=("ts",))
    existing_keys = existing.select(*keys)
    genuinely_new = late_unique.join(existing_keys, keys, "left_anti")
    return existing.unionByName(genuinely_new)
