"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship feature-matrix query on sf0.001;
``queries()``/``oracle_sql()`` expose the operator catalog from
``fte.queries`` (Spark + DuckDB oracle pairs) for the sf0.01
correctness gate.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: sessionize + PIT as-of join + rolling features on the
    sf0.001 events table (the transcript analog)."""
    from fte.queries import q_asof_join, q_sessionize, q_rolling_counts
    import pyspark.sql.functions as F

    sf_dir = "/root/testdata/sf0.001"
    asof = q_asof_join(spark, sf_dir)
    sess = q_sessionize(spark, sf_dir).withColumnRenamed("event_id", "anchor_id")
    roll = q_rolling_counts(spark, sf_dir).withColumnRenamed("event_id", "anchor_id")
    return (
        asof.join(sess.select("anchor_id", "session_id"), "anchor_id", "left")
        .join(roll.select("anchor_id", "n_so_far", "n_last_300s"), "anchor_id", "left")
        .orderBy("anchor_id")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from fte.queries import catalog

    return {name: fn for name, (fn, _sql) in catalog().items()}


def oracle_sql() -> dict[str, str]:
    from fte.queries import catalog

    return {name: sql for name, (_fn, sql) in catalog().items() if sql is not None}
