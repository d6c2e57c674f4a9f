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
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, "
                         f"got {direction!r}")
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
