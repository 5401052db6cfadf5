"""Engine operators (SURVEY.md §2.B).

All operators are declarative pyspark.sql compositions (Catalyst
optimizes and AQE re-plans them) except where semantics genuinely need
Arrow-vectorized pandas (the cogrouped merge_asof path). No per-row
Python UDFs exist in this package — tests/test_no_slow_udfs.py lints
for it.
"""

from fte.operators.sessionize import sessionize
from fte.operators.windows import (
    with_lag_lead,
    with_backfill,
    with_rolling_counts,
    with_rolling_role_freq,
    with_rolling_text_stats,
)
from fte.operators.asof import asof_join, asof_join_window, asof_join_merge
from fte.operators.windows import dedup_turns
from fte.operators.skew import salted_join, salted_group_count

__all__ = [
    "dedup_turns",
    "salted_join",
    "salted_group_count",
    "sessionize",
    "with_lag_lead",
    "with_backfill",
    "with_rolling_counts",
    "with_rolling_role_freq",
    "with_rolling_text_stats",
    "asof_join",
    "asof_join_window",
    "asof_join_merge",
]
