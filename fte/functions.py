"""Scalar helper expressions shared across operators.

All pure JVM Column expressions (SURVEY.md §2.B scalar functions).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def epoch_seconds(col: Column | str) -> Column:
    """Timestamp → epoch seconds (long), handling both TIMESTAMP and
    TIMESTAMP_NTZ (parquet `timestamp[us]` without tz loads as NTZ in
    Spark 4; NTZ can't cast straight to long). The session timezone is
    pinned to UTC (fte.conf), so NTZ→TZ is value-preserving and matches
    DuckDB's epoch()."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp").cast("long")


def epoch_micros(col: Column | str) -> Column:
    """Timestamp → epoch microseconds (long) — the exact-precision twin
    of epoch_seconds (parquet timestamp[us] is µs-precise; second
    truncation would alias distinct turn times). Same NTZ handling and
    UTC-session caveat; matches DuckDB's epoch_us()."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def decimal_sum(col: Column | str, scale: int = 6) -> Column:
    """Order-independent exact sum of a double column: cast each value
    to DECIMAL before summing so accumulation order can't change the
    result (doubles summed in shuffle order are nondeterministic at the
    last ulp). Cast back to double by the caller if needed."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(27,{scale})"))
