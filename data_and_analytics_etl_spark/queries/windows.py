"""Window function probes (SURVEY §2.2 "Window functions").

Each window spec shuffles once on its partition key; probes that stack
multiple functions share one (partition, order) spec so Catalyst collapses
them into a single Window physical node — check ``.explain`` shows one
Sort+Window pair, not N.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import load_table
from ..operators.sessionize import session_stats
from .registry import query


@query(
    "window_ranking",
    oracle="""
SELECT o_orderkey, o_orderpriority,
       row_number()   OVER w AS rn,
       rank()         OVER w AS rnk,
       dense_rank()   OVER w AS drnk,
       ntile(4)       OVER w AS quartile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist()    OVER w, 6) AS cdist
FROM orders
WHERE o_orderstatus = 'F' AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
ORDER BY o_orderpriority, rn
""",
    tags=("window",),
    priority=100,
    doc="Ranking family over one shared window spec.",
)
def window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderstatus") == "F")
        & (F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")))
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select(
            "o_orderkey", "o_orderpriority",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cdist"))
        .orderBy("o_orderpriority", "rn")
    )


@query(
    "window_analytic",
    oracle="""
SELECT event_id, user_id,
       round(value, 4)                              AS value,
       round(lag(value)  OVER w, 4)                 AS prev_value,
       round(lead(value) OVER w, 4)                 AS next_value,
       first_value(event_id) OVER w                 AS first_event,
       last_value(event_id)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                                                    AS last_event,
       nth_value(event_id, 2)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                                                    AS second_event
FROM events
WHERE user_id < 8
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, event_id
""",
    tags=("window",),
    priority=100,
    doc="lag/lead/first/last/nth_value analytic functions.",
)
def window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 8)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        ev.select(
            "event_id", "user_id",
            F.round("value", 4).alias("value"),
            F.round(F.lag("value").over(w), 4).alias("prev_value"),
            F.round(F.lead("value").over(w), 4).alias("next_value"),
            F.first("event_id").over(w).alias("first_event"),
            F.last("event_id").over(w_full).alias("last_event"),
            F.nth_value("event_id", 2).over(w_full).alias("second_event"))
        .orderBy("user_id", "event_id")
    )


@query(
    "window_running_agg",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
              OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey
                    ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total,
       count(*) OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS UNBOUNDED PRECEDING)          AS running_n,
       round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                    OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
             / count(*) OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey
                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
                                                         AS moving_avg3
FROM orders
WHERE o_custkey < 50
ORDER BY o_custkey, o_orderkey
""",
    tags=("window",),
    doc="Running totals and a 3-row moving average (ROWS frames).",
)
def window_running_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    base = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mov = base.rowsBetween(-2, Window.currentRow)
    return (
        o.select(
            "o_custkey", "o_orderkey",
            # decimal window sums: frame accumulation order differs across
            # engines (DuckDB segment trees vs Spark running state)
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(run)
             .cast("double").alias("running_total"),
            F.count(F.lit(1)).over(run).alias("running_n"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                    .over(mov).cast("double")
                    / F.count(F.lit(1)).over(mov), 4).alias("moving_avg3"))
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "window_range_frame",
    oracle="""
SELECT p_partkey, p_brand, p_size,
       count(*) OVER (PARTITION BY p_brand ORDER BY p_size
                      RANGE BETWEEN 2 PRECEDING AND CURRENT ROW)
         AS n_similar_smaller,
       CAST(sum(CAST(p_retailprice AS DECIMAL(18,2)))
              OVER (PARTITION BY p_brand ORDER BY p_size
                    RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING)
            AS DOUBLE)
         AS price_in_band
FROM part
ORDER BY p_partkey
""",
    tags=("window",),
    priority=100,
    doc="RANGE frames: value-based (not row-count) window bounds, under a "
        "partitionBy so the pattern scales (an unpartitioned RANGE window "
        "collapses the input to one task — never do that at 100 TB).",
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    w1 = Window.partitionBy("p_brand").orderBy("p_size") \
        .rangeBetween(-2, Window.currentRow)
    w2 = Window.partitionBy("p_brand").orderBy("p_size").rangeBetween(-2, 2)
    price_dec = F.col("p_retailprice").cast("decimal(18,2)")
    return (
        p.select(
            "p_partkey", "p_brand", "p_size",
            F.count(F.lit(1)).over(w1).alias("n_similar_smaller"),
            F.sum(price_dec).over(w2).cast("double").alias("price_in_band"))
        .orderBy("p_partkey")
    )


@query(
    "sessionization",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CAST(value AS DECIMAL(18,2)) AS value_dec,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1
              ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT user_id, ts, value_dec,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_id
  FROM flagged
)
SELECT user_id,
       session_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end,
       count(*)                           AS n_events,
       CAST(sum(value_dec) AS DOUBLE)     AS sum_value
FROM sessions
GROUP BY user_id, session_id
ORDER BY user_id, session_id
""",
    tags=("window", "ext"),
    doc="Batch sessionization (30-min gap) via operators/sessionize.py; "
        "equals Structured Streaming session_window on the same input.",
)
def sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Decimal sums are accumulation-order-independent (SURVEY §7.4), and
    # (ts, event_id) fixes the lag order on same-timestamp events — raw
    # double sums hash-diverged from the oracle in r2.
    ev = (load_table(spark, sf_dir, "events")
          .withColumn("value", F.col("value").cast("decimal(18,2)")))
    out = session_stats(ev, key="user_id", ts="ts", gap_seconds=1800,
                        agg_value="value", tie_break=("event_id",))
    return (
        out.select(
            "user_id", "session_id",
            F.date_format("session_start", "yyyy-MM-dd HH:mm:ss.SSSSSS")
            .alias("session_start"),
            F.date_format("session_end", "yyyy-MM-dd HH:mm:ss.SSSSSS")
            .alias("session_end"),
            "n_events",
            F.col("sum_value").cast("double").alias("sum_value"))
        .orderBy("user_id", "session_id")
    )


@query(
    "window_distinct_running",
    oracle="""
WITH e AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN row_number() OVER (
                PARTITION BY user_id, event_type
                ORDER BY ts, event_id) = 1
              THEN 1 ELSE 0 END AS first_seen
  FROM events WHERE user_id < 40
)
SELECT user_id, event_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
       event_type,
       CAST(sum(first_seen) OVER (
              PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS distinct_types_so_far
FROM e
ORDER BY user_id, ts, event_id
""",
    tags=("window",),
    doc="Running COUNT(DISTINCT) over an ordered stream — the window "
        "shape SQL engines refuse (DISTINCT aggregates aren't framed), "
        "decomposed into its scalable dual: a first-occurrence flag "
        "running-summed over the event order. BOTH windows partition "
        "by user_id only — the flag comes from change detection under "
        "a (type, ts) sort (a type's rows are one contiguous run, so "
        "first occurrence = type != lag(type)), not from a "
        "row_number over (user, type), which would force a second "
        "hash partitioning. ONE data shuffle, two in-partition sorts, "
        "O(1) state per row vs the naive collect_set-over-frame whose "
        "per-row set copy is O(distinct). The oracle states the same "
        "semantics in the clearer row_number form — values are "
        "identical, plans are not.",
)
def window_distinct_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    w_first = (Window.partitionBy("user_id")
               .orderBy("event_type", "ts", "event_id"))
    w_run = (Window.partitionBy("user_id").orderBy("ts", "event_id")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    prev_type = F.lag("event_type").over(w_first)
    return (ev.withColumn(
                "first_seen",
                F.when(prev_type.isNull()
                       | (prev_type != F.col("event_type")), 1)
                .otherwise(0))
            .withColumn("distinct_types_so_far",
                        F.sum("first_seen").over(w_run).cast("long"))
            .select("user_id", "event_id",
                    F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
                    "event_type", "distinct_types_so_far")
            .orderBy("user_id", "ts", "event_id"))


@query(
    "window_ratio_to_report",
    oracle="""
WITH rev AS (
  SELECT n.n_regionkey AS region, c.c_nationkey AS nation,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
              AS DECIMAL(38,0)) AS rev_c
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n   ON n.n_nationkey = c.c_nationkey
  GROUP BY 1, 2
)
SELECT region, nation,
       CAST(rev_c AS DOUBLE) / 100 AS revenue,
       CAST(rev_c AS DOUBLE)
         / CAST(sum(rev_c) OVER (PARTITION BY region) AS DOUBLE)
         AS share_of_region
FROM rev
ORDER BY region, nation
""",
    tags=("window", "agg"),
    doc="Ratio-to-report: each nation's share of its region's revenue "
        "— the contribution-analysis window (RATIO_TO_REPORT in "
        "warehouse SQL). Revenue aggregates as exact integer cents "
        "(decimal partials), the region total is ONE windowed sum over "
        "the already-aggregated nation table (25 rows per region, "
        "never the fact table), and the share is a single double "
        "division of two exact decimals — bit-stable cross-engine. "
        "Plan: one fact shuffle for the aggregate (dims broadcast), "
        "one tiny window over the rollup.",
)
def window_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    rev = (o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
           .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
           .groupBy(F.col("n_regionkey").alias("region"),
                    F.col("c_nationkey").alias("nation"))
           .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")
                      .cast("decimal(38,0)")).alias("rev_c")))
    w = Window.partitionBy("region")
    return (rev.select(
        "region", "nation",
        (F.col("rev_c").cast("double") / 100).alias("revenue"),
        (F.col("rev_c").cast("double")
         / F.sum("rev_c").over(w).cast("double"))
        .alias("share_of_region"))
        .orderBy("region", "nation"))


@query(
    "timeseries_pct_change",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(sum(CAST(value AS DECIMAL(18,2)))
              AS DECIMAL(38,2)) AS total
  FROM events WHERE ts < TIMESTAMP '2024-02-01 00:00:00'
  GROUP BY 1, 2
), shifted AS (
  SELECT event_type, day, total,
         lag(total) OVER (PARTITION BY event_type ORDER BY day) AS prev
  FROM daily
)
SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
       CAST(total AS DOUBLE) AS total,
       CASE WHEN prev IS NOT NULL AND prev <> 0
            THEN (CAST(total AS DOUBLE) - CAST(prev AS DOUBLE))
                 / CAST(prev AS DOUBLE) END AS pct_change
FROM shifted
ORDER BY event_type, day
""",
    tags=("window", "timeseries"),
    doc="Period-over-period growth: daily value totals per event type "
        "with the relative change vs the previous day — the lag-based "
        "KPI delta every dashboard computes. Totals accumulate as "
        "exact decimals; the change is a fixed (cur − prev)/prev "
        "double chain over two exact values, NULL for the first day "
        "and zero-denominator days. One shuffle for the daily rollup; "
        "the lag window runs over the aggregated (type, day) table.",
)
def timeseries_pct_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts") < F.lit("2024-02-01 00:00:00").cast("timestamp"))
    daily = (ev.groupBy("event_type",
                        F.col("ts").cast("date").alias("day"))
             .agg(F.sum(F.col("value").cast("decimal(18,2)"))
                  .cast("decimal(38,2)").alias("total")))
    w = Window.partitionBy("event_type").orderBy("day")
    prev = F.lag("total").over(w)
    return (daily.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("total").cast("double").alias("total"),
        F.when(prev.isNotNull() & (prev != 0),
               (F.col("total").cast("double") - prev.cast("double"))
               / prev.cast("double")).alias("pct_change"))
        .orderBy("event_type", "day"))
