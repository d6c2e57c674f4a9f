"""Cohort retention: users grouped by first-activity period, tracked
across subsequent periods.

The other half of product analytics next to the funnel: cohort =
truncate(first event time), retention cell = distinct users of cohort
c active at offset k periods later. Everything is integer counts on
top of two co-keyed aggregations, so the operator is exactly
oracle-checkable.

Scale shape: cohort assignment is a window-min over the user key (one
hash shuffle); the distinct + count collapse shuffles (cohort, offset,
user) pairs, already ≪ events. No driver-side date logic; offsets are
datediff arithmetic in codegen.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def cohort_retention(df: DataFrame, user_col: str, ts_col: str,
                     period: str = "day") -> DataFrame:
    """(cohort_period, period_offset, n_users) retention triangle.

    ``period`` is any date_trunc/datediff unit ('day', 'week',
    'month'). n_users counts DISTINCT users of the cohort active at
    that offset; offset 0 row is the cohort size.
    """
    w = Window.partitionBy(user_col)
    cohorted = df.withColumn(
        "__cohort", F.to_date(F.date_trunc(period, F.min(ts_col).over(w))))
    p = F.to_date(F.date_trunc(period, F.col(ts_col)))
    if period == "day":
        offset = F.datediff(p, F.col("__cohort"))
    elif period == "week":
        # both sides are week starts, so the day diff is an exact
        # multiple of 7
        offset = (F.datediff(p, F.col("__cohort")) / 7).cast("int")
    elif period == "month":
        offset = F.months_between(p, F.col("__cohort")).cast("int")
    else:
        raise ValueError(f"unsupported period: {period!r}")
    cells = (cohorted
             .select(F.col("__cohort").alias("cohort_period"),
                     offset.alias("period_offset"),
                     F.col(user_col).alias("__u"))
             .distinct())
    return (cells.groupBy("cohort_period", "period_offset")
            .agg(F.countDistinct("__u").alias("n_users")))
