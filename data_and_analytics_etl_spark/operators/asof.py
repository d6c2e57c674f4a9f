"""As-of join: for each left row, the most recent right row at-or-before it.

Spark has no native ASOF JOIN (DuckDB does; Pandas has merge_asof). The
scalable rewrite is the **union-and-carry** formulation, not a
conditional join:

    conditional join:  left ⋈ (right.ts <= left.ts) → per-key row explosion
                       (O(n·m) pairs on hot keys), then a max_by — dead at
                       100 TB on skewed keys.
    union-and-carry:   tag both inputs, union, single shuffle on
                       (key, ts), then last(right_value, ignorenulls) over
                       an ordered running window — O(n+m) rows, one
                       shuffle, no explosion, AQE-friendly.

Inclusive semantics match DuckDB ASOF JOIN (right.ts <= left.ts wins ties):
right rows sort *before* left rows at equal timestamps.
"""

from __future__ import annotations

import functools

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    right_values: list[str] | None = None,
    suffix: str = "_right",
    how: str = "left",
    direction: str = "backward",
    tolerance_s: float | None = None,
) -> DataFrame:
    """Join each left row to its as-of right row, per equality key ``on``.

    Parameters
    ----------
    on : equality key column(s) present in both inputs.
    left_ts / right_ts : ordering (timestamp) columns.
    right_values : right columns to carry (default: all non-key,
        non-timestamp right columns).
    how : 'left' keeps unmatched left rows with NULL right values;
        'inner' drops them.
    direction : 'backward' = latest right with right_ts <= left_ts
        (DuckDB's default ASOF >=-match); 'forward' = earliest right
        with right_ts >= left_ts. Ties match in both directions.
    tolerance_s : maximum staleness in seconds (pandas merge_asof's
        ``tolerance``): a match farther than this from the left
        timestamp is treated as NO match (NULLs under 'left', dropped
        under 'inner'). Compared in exact integer microseconds, so the
        boundary row never flaps cross-engine. A stale quote/sensor
        reading being silently carried forever is the classic as-of
        footgun this bounds.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest, "
                         f"got {direction!r}")
    if direction == "nearest":
        return _asof_nearest(left, right, on, left_ts, right_ts,
                             right_values, suffix, how, tolerance_s)
    backward = direction == "backward"
    keys = [on] if isinstance(on, str) else list(on)
    if right_values is None:
        right_values = [c for c in right.columns
                        if c not in keys and c != right_ts]
    carried = [f"{c}{suffix}" for c in right_values]

    # Tag and align the two sides on a common shape. `_side` places right
    # rows on the frame side of equal timestamps → inclusive semantics:
    # backward scans look back (right first at ties), forward scans look
    # ahead (right last at ties).
    left_tag, right_tag = (1, 0) if backward else (0, 1)
    lhs = left.select(
        *keys,
        F.col(left_ts).alias("_ts"),
        F.lit(left_tag).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(a)
          for c, a in zip(right_values, carried)],
        F.lit(None).cast(right.schema[right_ts].dataType).alias(f"{right_ts}{suffix}"),
    )
    rhs = right.select(
        *keys,
        F.col(right_ts).alias("_ts"),
        F.lit(right_tag).alias("_side"),
        F.lit(None).cast(lhs.schema["_lrow"].dataType).alias("_lrow"),
        *[F.col(c).alias(a) for c, a in zip(right_values, carried)],
        F.col(right_ts).alias(f"{right_ts}{suffix}"),
    )

    base = Window.partitionBy(*keys).orderBy(F.col("_ts").asc(),
                                             F.col("_side").asc())
    if backward:
        w = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        carry = functools.partial(F.last, ignorenulls=True)
    else:
        w = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        carry = functools.partial(F.first, ignorenulls=True)
    carried_all = carried + [f"{right_ts}{suffix}"]
    # One select, not N withColumns: each withColumn is a full analysis
    # pass over an ever-wider plan (quadratic on wide right sides); the
    # shared window spec still collapses to a single Window node.
    unioned = lhs.unionByName(rhs).select(
        "_side", "_lrow",
        *[carry(c).over(w).alias(c) for c in carried_all])

    out = (unioned.filter(F.col("_side") == F.lit(left_tag))
           .select(F.col("_lrow.*"), *carried_all))
    if tolerance_s is not None:
        rts = F.col(f"{right_ts}{suffix}")
        gap_us = (F.unix_micros(F.col(left_ts)) - F.unix_micros(rts)
                  if backward
                  else F.unix_micros(rts) - F.unix_micros(F.col(left_ts)))
        ok = rts.isNotNull() & (gap_us <= int(tolerance_s * 1_000_000))
        left_cols = [c for c in out.columns if c not in carried_all]
        out = out.select(
            *left_cols,
            *[F.when(ok, F.col(c)).alias(c) for c in carried_all])
    if how == "inner":
        out = out.filter(F.col(f"{right_ts}{suffix}").isNotNull())
    elif how != "left":
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    return out


def _asof_nearest(left: DataFrame, right: DataFrame, on, left_ts: str,
                  right_ts: str, right_values, suffix: str, how: str,
                  tolerance_s: float | None) -> DataFrame:
    """direction='nearest' (pandas merge_asof parity): the closer of
    the latest-at-or-before and earliest-after right rows, ties to the
    backward side — the sensor-alignment mode where staleness and
    lookahead cost the same.

    Still ONE union-and-carry pass: both the backward running-last and
    the forward running-first evaluate over the SAME (key, ts) sort
    (two frames, one underlying shuffle+sort — no second plan, no row
    ids to re-join on, which would be partitioning-dependent). Right
    rows sort before left at equal timestamps, so a tied right lands
    on the backward side at gap 0 and wins by the tie rule; gaps
    compare in exact integer microseconds, never floats. Tolerance
    disqualifies each side independently BEFORE the choice.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if right_values is None:
        right_values = [c for c in right.columns
                        if c not in keys and c != right_ts]
    carried = [f"{c}{suffix}" for c in right_values]
    carried_all = carried + [f"{right_ts}{suffix}"]

    lhs = left.select(
        *keys,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(a)
          for c, a in zip(right_values, carried)],
        F.lit(None).cast(right.schema[right_ts].dataType)
        .alias(f"{right_ts}{suffix}"),
    )
    rhs = right.select(
        *keys,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(lhs.schema["_lrow"].dataType).alias("_lrow"),
        *[F.col(c).alias(a) for c, a in zip(right_values, carried)],
        F.col(right_ts).alias(f"{right_ts}{suffix}"),
    )
    base = Window.partitionBy(*keys).orderBy(F.col("_ts").asc(),
                                             F.col("_side").asc())
    wb = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wf = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    unioned = lhs.unionByName(rhs).select(
        "_side", "_lrow",
        *[F.last(c, ignorenulls=True).over(wb).alias(f"{c}__b")
          for c in carried_all],
        *[F.first(c, ignorenulls=True).over(wf).alias(f"{c}__f")
          for c in carried_all])
    rows = unioned.filter(F.col("_side") == 1)
    lts = F.col("_lrow").getField(left_ts)
    bts = F.col(f"{right_ts}{suffix}__b")
    fts = F.col(f"{right_ts}{suffix}__f")
    gap_b = F.unix_micros(lts) - F.unix_micros(bts)
    gap_f = F.unix_micros(fts) - F.unix_micros(lts)
    ok_b = bts.isNotNull()
    ok_f = fts.isNotNull()
    if tolerance_s is not None:
        tol = int(tolerance_s * 1_000_000)
        ok_b = ok_b & (gap_b <= tol)
        ok_f = ok_f & (gap_f <= tol)
    use_b = ok_b & (~ok_f | (gap_b <= gap_f))
    use_f = ok_f & ~use_b
    out = rows.select(
        F.col("_lrow.*"),
        *[F.when(use_b, F.col(f"{c}__b"))
          .when(use_f, F.col(f"{c}__f")).alias(c)
          for c in carried_all])
    if how == "inner":
        out = out.filter(F.col(f"{right_ts}{suffix}").isNotNull())
    elif how != "left":
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    return out
