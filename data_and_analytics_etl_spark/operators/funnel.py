"""Ordered-stage funnel analysis (view -> click -> purchase, etc.).

For each user, stage k's timestamp is the earliest event of stage k's
type that is STRICTLY AFTER the user's stage k-1 timestamp — the
classic product-analytics conversion funnel. A user is "at stage k" if
all stages 1..k have timestamps.

Scale shape: ONE hash shuffle on the user key. Each stage is a
conditional window-min over the same ``partitionBy(user)`` spec, so
Catalyst plans a single Exchange followed by chained Window operators
over the same sort — no per-stage join, no re-shuffle (per-user stage
values are partition constants). The final per-user collapse reuses
the same partitioning, and stage counts aggregate from the collapsed
(one row per user) frame, which is tiny relative to raw events.

Heavy users (skewed keys) bound the per-partition work, not the plan:
the window functions are O(events-per-user) with no buffering beyond
the running minimum.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def funnel_stages(df: DataFrame, user_col: str, ts_col: str, type_col: str,
                  stages: list[str]) -> DataFrame:
    """Per-user funnel: one row per user who reached stage 1.

    Output: (user_col, t1..tn timestamps, stage int) where ``stage`` is
    the deepest stage reached and t{k} is NULL past it.
    """
    if len(stages) < 2:
        raise ValueError("funnel needs at least 2 stages")
    w = Window.partitionBy(user_col)
    out = df
    prev = None
    for i, stage in enumerate(stages, start=1):
        cond = F.col(type_col) == stage
        if prev is not None:
            cond = cond & (F.col(ts_col) > F.col(prev))
        out = out.withColumn(f"t{i}", F.min(F.when(cond, F.col(ts_col)))
                             .over(w))
        prev = f"t{i}"
    t_cols = [f"t{i}" for i in range(1, len(stages) + 1)]
    depth = sum((F.col(c).isNotNull().cast("int") for c in t_cols),
                F.lit(0))
    return (out.filter(F.col("t1").isNotNull())
            .groupBy(user_col)
            .agg(*[F.first(c).alias(c) for c in t_cols])
            .withColumn("stage", depth))


def funnel_counts(per_user: DataFrame, n_stages: int) -> DataFrame:
    """Collapse ``funnel_stages`` output to per-stage reach counts."""
    aggs = [F.sum((F.col("stage") >= k).cast("long")).alias(f"reached_{k}")
            for k in range(1, n_stages + 1)]
    return per_user.agg(*aggs)


def time_to_convert(df: DataFrame, user_col: str, ts_col: str,
                    type_col: str, from_step: str, to_step: str,
                    percentiles: tuple[float, ...] = (0.5, 0.9),
                    ) -> DataFrame:
    """Conversion-latency distribution between two funnel steps: for
    every user whose FIRST ``from_step`` precedes their FIRST
    ``to_step`` (the standard strict-funnel rule — conversions that
    predate exposure don't count), the elapsed time; summarized as
    exact order statistics — the "median time from signup to first
    purchase" metric.

    Exactness: durations are integer microseconds (µs min-timestamps
    per side, one subtraction); percentiles use the engine-portable
    rank rule (value at rank ceil(p·n), never interpolated — the
    group_percentiles contract). One hash agg to a row per user, one
    ranking window over the converted-user table.
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    per_user = (df.filter(F.col(type_col).isin(from_step, to_step))
                .groupBy(user_col)
                .agg(F.min(F.when(F.col(type_col) == from_step, us))
                     .alias("__a"),
                     F.min(F.when(F.col(type_col) == to_step, us))
                     .alias("__b")))
    conv = (per_user
            .filter(F.col("__a").isNotNull() & F.col("__b").isNotNull()
                    & (F.col("__b") > F.col("__a")))
            .select((F.col("__b") - F.col("__a")).alias("dur_us")))
    w = Window.orderBy("dur_us")
    wall = Window.partitionBy(F.lit(0)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    r = (conv.withColumn("__r", F.row_number().over(w))
         .withColumn("__n", F.count(F.lit(1)).over(wall)))
    aggs = [F.count(F.lit(1)).alias("n_converted")]
    for p in percentiles:
        rank = F.greatest(F.ceil(F.lit(p) * F.col("__n")).cast("long"),
                          F.lit(1))
        aggs.append(F.max(F.when(F.col("__r") == rank,
                                 F.col("dur_us")))
                    .alias(f"p{int(p * 100)}_us"))
    return r.agg(*aggs)
