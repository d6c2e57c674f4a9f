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


def rfm_scores(orders: DataFrame, customer_col: str, ts_col: str,
               amount_col: str) -> DataFrame:
    """Per-customer RFM (recency / frequency / monetary) quintile
    scores — the classic customer-value segmentation.

    Metrics are exact: recency_days = whole days from the customer's
    last order to the corpus max date (integer datediff), frequency =
    order count, monetary_cents = round(amount·100) summed as longs.
    Each metric scores 1–5 by VALUE thresholds at the quintile ORDER
    STATISTICS (values at ranks ceil(0.2n)..ceil(0.8n) of the
    per-customer metric table — data members, so both engines agree
    bit-for-bit and ties share a score by construction):
    score = 1 + |{t : v > t}|, inverted for recency (most recent = 5).

    Scale shape: metrics are ONE hash agg over orders; each threshold
    set is a ranked window over the per-customer AGGREGATE (one row
    per customer — orders of magnitude under the fact table; for true
    100 TB customer counts swap in quantile_bucket_approx's sketch
    cutpoints, same score contract) broadcast back as a 1-row
    crossJoin. The corpus max date is likewise a broadcast 1-row
    aggregate, keeping construction action-free.
    """
    from .binning import group_percentiles
    per_cust = (orders.groupBy(customer_col)
                .agg(F.max(ts_col).alias("__last"),
                     F.count(F.lit(1)).alias("frequency"),
                     F.sum(F.round(F.col(amount_col) * 100).cast("long"))
                     .alias("monetary_cents")))
    maxd = orders.agg(F.max(ts_col).alias("__maxd"))
    scored = (per_cust.crossJoin(F.broadcast(maxd))
              .withColumn("recency_days",
                          F.datediff(F.to_date("__maxd"),
                                     F.to_date("__last")))
              .drop("__maxd", "__last"))
    for metric, out, invert in (("recency_days", "r_score", True),
                                ("frequency", "f_score", False),
                                ("monetary_cents", "m_score", False)):
        cuts = (group_percentiles(
            scored.select(F.lit(0).alias("__g"), metric),
            "__g", metric, percentiles=(0.2, 0.4, 0.6, 0.8))
            .select(*(F.col(f"p{q}").alias(f"__{metric}_p{q}")
                      for q in (20, 40, 60, 80))))
        asc = F.lit(1)
        for q in (20, 40, 60, 80):
            asc = asc + (F.col(metric)
                         > F.col(f"__{metric}_p{q}")).cast("int")
        score = (F.lit(6) - asc) if invert else asc
        scored = (scored.crossJoin(F.broadcast(cuts))
                  .withColumn(out, score)
                  .drop(*(f"__{metric}_p{q}" for q in (20, 40, 60, 80))))
    return scored


def cohort_ltv(df: DataFrame, user_col: str, ts_col: str,
               amount_cents: Column) -> DataFrame:
    """Cohort lifetime-value curves: users cohort by their FIRST
    activity month; each (cohort, age-in-months) cell carries that
    month's revenue and the running cumulative — the monetary
    completion of :func:`cohort_retention` (retention counts who came
    back; LTV integrates what they spent).

    Exactness: revenue accumulates as BIGINT cents; the cumulative is
    an integer window sum over the bounded (cohorts × ages) table;
    the per-user average is the single closing double chain. Plan:
    one first-activity aggregate joined back (broadcast — cohort table
    is user-bounded but the JOIN result regroups immediately), one
    hash agg on (cohort, age), one bounded cumulative window.
    """
    m = (F.year(ts_col) * 12 + F.month(ts_col) - 1).cast("long")
    rows = df.select(F.col(user_col).alias("__u"), m.alias("__m"),
                     amount_cents.cast("long").alias("__c"))
    first = (rows.groupBy("__u")
             .agg(F.min("__m").alias("__m0"),
                  F.count(F.lit(1)).alias("__dummy"))
             .select("__u", "__m0"))
    cell = (rows.join(first, "__u")
            .groupBy(F.col("__m0").alias("cohort_month"),
                     (F.col("__m") - F.col("__m0")).alias("age_months"))
            .agg(F.countDistinct("__u").alias("n_users"),
                 F.sum("__c").alias("revenue_cents")))
    size = (first.groupBy(F.col("__m0").alias("cohort_month"))
            .agg(F.count(F.lit(1)).alias("cohort_size")))
    w = (Window.partitionBy("cohort_month").orderBy("age_months")
         .rowsBetween(Window.unboundedPreceding, 0))
    return (cell.join(F.broadcast(size), "cohort_month")
            .withColumn("cum_revenue_cents",
                        F.sum("revenue_cents").over(w).cast("long"))
            .select("cohort_month", "age_months",
                    F.col("n_users").cast("long").alias("n_users"),
                    F.col("cohort_size").cast("long").alias("cohort_size"),
                    F.col("revenue_cents").cast("long")
                    .alias("revenue_cents"),
                    "cum_revenue_cents",
                    F.round(F.col("cum_revenue_cents").cast("double")
                            / F.col("cohort_size").cast("double")
                            / 100.0, 6).alias("ltv_per_user"))
            .orderBy("cohort_month", "age_months"))
