"""SCD2 interval building: change events -> validity-interval dimension.

The warehouse-dimension operation downstream of every change-data feed
(the reference lands raw change records; the dimension build it leaves
to the warehouse is this): collapse a per-key event stream into rows
valid over [valid_from, valid_to), one row per distinct run of an
attribute value, the latest row open-ended (valid_to NULL).

Plan shape: one shuffle on the key; both the change detection (lag) and
the interval close (lead over the change rows) ride the same (key, ts)
sort order, so Catalyst plans a single Exchange + Sort reused by both
windows.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def scd2_intervals(df: DataFrame, key: str, ts_col: str, attr: str,
                   tie_break: tuple[str, ...] = ()) -> DataFrame:
    """One row per (key, attribute-value run): valid_from/valid_to.

    ``tie_break`` columns extend the event order past ``ts_col`` so rows
    sharing (key, ts) order deterministically — same contract as
    sessionize. A "change" is the first event of the key or any event
    whose ``attr`` differs from the previous event's.
    """
    order: list[Column] = [F.col(ts_col), *(F.col(c) for c in tie_break)]
    w = Window.partitionBy(key).orderBy(*order)
    prev = F.lag(attr).over(w)
    # NULL attribute values are legal run members: detect the key's first
    # event with a constant-lag sentinel (prev.isNull() would also fire on
    # a genuine NULL run and split it), and compare null-safely so a
    # value -> NULL transition counts as a change instead of yielding
    # NULL and silently extending the prior interval.
    is_first = F.lag(F.lit(1)).over(w).isNull()
    changed = is_first | ~prev.eqNullSafe(F.col(attr))
    changes = (df.withColumn("__chg", changed)
               .filter(F.col("__chg"))
               .select(key, F.col(ts_col).alias("valid_from"),
                       F.col(attr).alias(attr),
                       *(F.col(c) for c in tie_break)))
    w2 = Window.partitionBy(key).orderBy(
        F.col("valid_from"), *(F.col(c) for c in tie_break))
    return (changes
            .withColumn("valid_to", F.lead("valid_from").over(w2))
            .select(key, attr, "valid_from", "valid_to"))


def point_in_time_join(facts: DataFrame, dim: DataFrame, key: str,
                       fact_ts: str, attr: str,
                       how: str = "left") -> DataFrame:
    """Join each fact row to the SCD2 dimension row valid at its event
    time: the row with ``valid_from <= ts`` and (``ts < valid_to`` or
    open-ended) — the standard point-in-time (temporal) dimension
    lookup over :func:`scd2_intervals` output.

    Because SCD2 intervals are CONTIGUOUS per key by construction (each
    row's valid_to is the next row's valid_from), "valid at ts" is
    exactly "latest valid_from <= ts", so this composes the as-of join
    (operators/asof.py) instead of an interval join — one shuffle on
    (key, bounded union sort), no bin replication, no post-join filter.
    Facts before the key's first interval get NULLs under ``how='left'``
    (dropped under 'inner'), matching the oracle's LEFT JOIN ON
    range-containment semantics.
    """
    from .asof import asof_join

    # Two changes of a key at the same timestamp produce a ZERO-WIDTH
    # interval [t, t) for the superseded value. Range containment
    # (valid_from <= ts < valid_to) excludes it by construction, but an
    # as-of join on latest-valid_from would pick between the two t-rows
    # nondeterministically — drop zero-width rows first so exactly the
    # surviving (later-by-tie-break) change is joinable at t.
    live = dim.filter(F.col("valid_to").isNull()
                      | (F.col("valid_to") != F.col("valid_from")))
    out = asof_join(
        facts, live.select(key, "valid_from", attr),
        on=key, left_ts=fact_ts, right_ts="valid_from",
        right_values=[attr], how=how, direction="backward")
    # present dimension columns under their own names (facts carry no
    # clashing columns by contract: the attr is the lookup result)
    return (out.withColumnRenamed(f"{attr}_right", attr)
            .withColumnRenamed("valid_from_right", "valid_from"))
