"""Batch sessionization: split a per-key event stream into sessions at
inactivity gaps > ``gap``.

Classic two-window rewrite (lag → gap flag → running sum), equivalent to
Structured Streaming's ``session_window`` on the same data (the
stream-batch equivalence test in tests/test_streaming.py holds both
implementations to each other). One shuffle on the key; both windows share
the same (key, ts) sort order so Catalyst plans a single Sort+Window pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


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
    w = Window.partitionBy(key).orderBy(ts, *tie_break)
    prev_ts = F.lag(ts).over(w)
    gap = F.col(ts).cast("double") - prev_ts.cast("double")
    is_new = F.when(prev_ts.isNull() | (gap > gap_seconds), 1).otherwise(0)
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
