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
