"""Batch sessionization: split a per-key event stream into sessions at
inactivity gaps > ``gap``.

Classic two-window rewrite (lag → gap flag → running sum), equivalent to
Structured Streaming's ``session_window`` on the same data (the
stream-batch equivalence test in tests/test_streaming.py holds both
implementations to each other). One shuffle on the key; both windows share
the same (key, ts) sort order so Catalyst plans a single Sort+Window pair.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType, TimestampType


def _epoch_expr(df: DataFrame, ts: str) -> tuple[Column, int]:
    """(epoch column, units-per-second) for gap arithmetic, dtype-proof.

    TIMESTAMP / TIMESTAMP_NTZ → exact integer microseconds via
    ``unix_micros`` (NTZ first cast to TIMESTAMP, value-preserving under
    the pinned UTC session zone). Casting a timestamp to double is an
    illegal cast in Spark 4 for NTZ and loses sub-second precision past
    2^53 µs anyway — integer arithmetic is both legal and exact.
    Numeric ``ts`` columns (epoch seconds) pass through as doubles.
    """
    dt = df.schema[ts].dataType
    if isinstance(dt, (TimestampType, TimestampNTZType)):
        col = F.col(ts)
        if isinstance(dt, TimestampNTZType):
            col = col.cast("timestamp")
        return F.unix_micros(col), 1_000_000
    return F.col(ts).cast("double"), 1


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap_seconds: int,
    session_col: str = "session_id",
    tie_break: tuple[str, ...] = (),
) -> DataFrame:
    """Add a per-key session ordinal (1-based) to each event row.

    ``tie_break`` columns extend the window order past ``ts`` so rows
    sharing (key, ts) get a deterministic lag/running-sum order — without
    it, cross-engine comparison of session boundaries is undefined on ties.
    """
    epoch, per_sec = _epoch_expr(df, ts)
    w = Window.partitionBy(key).orderBy(ts, *tie_break)
    prev = F.lag(epoch).over(w)
    is_new = F.when(
        prev.isNull() | ((epoch - prev) > gap_seconds * per_sec),
        1).otherwise(0)
    return df.withColumn(
        session_col,
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)))


def session_stats(
    df: DataFrame,
    key: str,
    ts: str,
    gap_seconds: int,
    agg_value: str | None = None,
    tie_break: tuple[str, ...] = (),
) -> DataFrame:
    """Collapse sessions to one row each: start/end/duration/event count."""
    s = sessionize(df, key, ts, gap_seconds, tie_break=tie_break)
    aggs = [
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if agg_value is not None:
        aggs.append(F.sum(agg_value).alias(f"sum_{agg_value}"))
    return s.groupBy(key, "session_id").agg(*aggs)
