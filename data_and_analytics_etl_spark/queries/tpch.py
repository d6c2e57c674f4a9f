"""Headline analytic queries (TPC-H shapes over the driver corpus).

These are the bench-critical plans (BASELINE.md B1-B3). Each is written so
Catalyst produces the plan we want at 100 TB:

- filters appear before aggregation so they push to the parquet scan
  (``PushedFilters`` on the FileScan node);
- only referenced columns survive analysis (``ReadSchema`` pruning);
- dimension tables (region/nation/customer at the small end of the star)
  are explicitly ``broadcast()`` so the big fact side never shuffles for
  the join;
- aggregations are plain ``groupBy`` → partial + final hash agg with
  map-side combine, no handwritten two-phase logic.

The reference computes no relational queries (its whole pipeline is a
windowed ordered scan, SURVEY §2.1 A2-A11); this module is the declared
analytic surface that subsumes it.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from .registry import query


def _cents(col: F.Column) -> F.Column:
    """Exact integer cents of a <=2-decimal price stored as double.

    round(x*100) recovers the true integer exactly (double error is
    ~1e-8 cents, never near the .5 rounding boundary for 2-decimal
    money values), so downstream products/sums run in LONG inside
    whole-stage codegen instead of per-row BigDecimal math (which
    benched 74% slower on q1).
    """
    return F.round(col * 100).cast("long")


def _scaled_sum(col: F.Column, divisor: int) -> F.Column:
    """Overflow-safe exact sum of an integer column, rescaled to double.

    The sum accumulates as decimal(38,0) — compact-long representation
    until the unscaled value outgrows a long, so it's safe where a raw
    long sum would wrap at 100 TB row counts, at ~2x the agg cost of a
    long sum (measured). One exact decimal division per group, then a
    single cast to double — the same one rounding the oracle's
    decimal->double cast performs. Prefer :func:`_scaled_sum_long` when
    the per-group total is provably long-bounded, or the two-stage
    pattern in :func:`_exact_money_agg` for low-cardinality groups.
    """
    return (F.sum(col.cast("decimal(38,0)")) / divisor).cast("double")


def _scaled_sum_long(col: F.Column, divisor: int) -> F.Column:
    """Exact rescaled sum in pure LONG — for provably bounded groups.

    Safe ONLY when max |per-row value| * max group row count stays under
    2^63 (e.g. per-order revenue: <= 7 lineitems/order x ~4e11 cents^2
    << 9.2e18, at ANY corpus size — group size is data-model-bounded,
    not corpus-bounded). The final division goes through decimal so the
    double conversion performs the same single rounding as the oracle.
    """
    return (F.sum(col).cast("decimal(38,0)") / divisor).cast("double")


def _exact_money_agg(df: DataFrame, keys: list[str],
                     sums: list[tuple[str, F.Column, int]],
                     count_alias: str | None = None) -> DataFrame:
    """Two-stage exact integer aggregation for LOW-cardinality groups.

    Stage 1 sums per (keys, input partition) in LONG — per-partial
    magnitude is bounded by rows-per-partition (~128 MB of parquet,
    1-6M rows) x per-row value (<= ~4e11), comfortably inside a long at
    any corpus size. Stage 2 decimal-sums the handful of partials per
    group. All per-row work stays in whole-stage codegen longs (~2x
    faster than decimal accumulation, measured on q1); decimal touches
    only #groups x #partitions rows. The extra shuffle moves that same
    tiny row set, so it's noise next to the stage-1 scan.

    ``sums``: (output alias, long column, rescale divisor) triples.
    """
    pid = F.spark_partition_id().alias("__pid")
    stage1 = (df.groupBy(*keys, pid)
              .agg(*[F.sum(c).alias(f"__s_{a}") for a, c, _ in sums],
                   F.count(F.lit(1)).alias("__n")))
    aggs = [(F.sum(F.col(f"__s_{a}").cast("decimal(38,0)")) / d)
            .cast("double").alias(a) for a, _, d in sums]
    aggs.append(F.sum("__n").alias(count_alias or "__count"))
    out = stage1.groupBy(*keys).agg(*aggs)
    return out if count_alias else out.drop("__count")


@query(
    "q1_pricing_summary",
    oracle="""
SELECT l_returnflag,
       l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)           AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)      AS sum_base_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)    AS sum_disc_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(4,2)))
                * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE)         AS sum_charge,
       round(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
             / count(*), 4)                                             AS avg_qty,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
             / count(*), 4)                                             AS avg_price,
       round(CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)
             / count(*), 4)                                             AS avg_disc,
       count(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
    tags=("agg", "bench"),
    doc="Scan→filter→hash-agg→sort over the fact table (TPC-H Q1 shape).",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # Exact cross-engine arithmetic without per-row decimal math: see
    # _cents/_scaled_sum. The oracle's decimal formulation computes the
    # identical rational, so the one double rounding at the end matches.
    qty_c = _cents(F.col("l_quantity"))
    ep_c = _cents(F.col("l_extendedprice"))
    disc_p = _cents(F.col("l_discount"))   # percent points
    tax_p = _cents(F.col("l_tax"))
    # Two-stage exact aggregation (long partials per partition, decimal
    # across partials) — see _exact_money_agg; averages derive from the
    # summed columns post-agg (no duplicated aggregate expressions).
    flt = li.filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
    return (
        _exact_money_agg(
            flt, ["l_returnflag", "l_linestatus"],
            [("sum_qty", qty_c, 100),
             ("sum_base_price", ep_c, 100),
             ("sum_disc_price", ep_c * (100 - disc_p), 10_000),
             ("sum_charge",
              ep_c * (100 - disc_p) * (100 + tax_p), 1_000_000),
             ("__sum_disc", disc_p, 100)],
            count_alias="count_order")
        .select(
            "l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
            "sum_disc_price", "sum_charge",
            F.round(F.col("sum_qty") / F.col("count_order"), 4)
            .alias("avg_qty"),
            F.round(F.col("sum_base_price") / F.col("count_order"), 4)
            .alias("avg_price"),
            F.round(F.col("__sum_disc") / F.col("count_order"), 4)
            .alias("avg_disc"),
            "count_order")
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q3_shipping_priority",
    oracle="""
SELECT l_orderkey,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
       strftime(o_orderdate, '%Y-%m-%d')                 AS orderdate,
       o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1996-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
    tags=("join", "topk", "bench"),
    doc="3-way join + agg + global top-k (TPC-H Q3 shape); customer side broadcast.",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp"))
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15 00:00:00").cast("timestamp"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        # per-order group: row count is order-size-bounded, so pure long
        # sums are exact and overflow-safe at any corpus size
        .agg(_scaled_sum_long(_cents(F.col("l_extendedprice"))
                              * (100 - _cents(F.col("l_discount"))),
                              10_000)
             .alias("revenue"))
        .select(
            "l_orderkey", "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_star_join",
    oracle="""
SELECT n_name,
       r_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
       count(*)                                          AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name, r_name
ORDER BY revenue DESC, n_name
""",
    tags=("join", "bench"),
    doc="5-way star join: fact side stays put, all dimensions broadcast.",
)
def q5_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")))
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey))
    # 25 nation groups accumulate corpus-scale totals: two-stage exact
    # aggregation (long partials, decimal across partials)
    rev_c = (_cents(F.col("l_extendedprice"))
             * (100 - _cents(F.col("l_discount"))))
    return (_exact_money_agg(joined, ["n_name", "r_name"],
                             [("revenue", rev_c, 10_000)],
                             count_alias="n_items")
            .orderBy(F.desc("revenue"), F.asc("n_name")))


@query(
    "q6_forecast_revenue",
    oracle="""
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
       count(*)                                    AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
""",
    tags=("agg", "filter"),
    doc="Pure scan-side predicate pushdown + global agg (TPC-H Q6 shape).",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    flt = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & F.col("l_discount").between(0.03, 0.07)
        & (F.col("l_quantity") < 24))
    # single global group: two-stage exact aggregation
    return _exact_money_agg(
        flt, [],
        [("revenue",
          _cents(F.col("l_extendedprice")) * _cents(F.col("l_discount")),
          10_000)],
        count_alias="n_rows")


@query(
    "q4_late_shipment_priority",
    oracle="""
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    tags=("join", "subquery", "bench"),
    doc="TPC-H Q4 shape: correlated EXISTS decorrelated by Catalyst into "
        "a left-semi join on the fact key, then a small hash agg — the "
        "semi join never duplicates order rows, so no post-join dedup.",
)
def q4_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp")))
    li = load_table(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate > F.date_add(o.o_orderdate.cast("date"), 30)
           .cast("timestamp")),
        "left_semi")
    return (late.groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("order_count"))
            .orderBy("o_orderpriority"))


@query(
    "q10_returned_revenue",
    oracle="""
SELECT c.c_custkey, c.c_name, n.n_name,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))
                * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE)
         AS revenue,
       round(c.c_acctbal, 2) AS c_acctbal
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY c.c_custkey, c.c_name, n.n_name, c.c_acctbal
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    tags=("join", "topk", "bench"),
    doc="TPC-H Q10 shape: fact-fact join on the order key, broadcast "
        "nation dimension, decimal-exact revenue (cross-engine stable "
        "under any accumulation order), global top-20 via "
        "TakeOrderedAndProject.",
)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp")))
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .join(c, o.o_custkey == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
            # per-customer-year group: bounded order counts keep the
            # long partial sums far inside 2^63 at any corpus size
            .agg(_scaled_sum_long(_cents(F.col("l_extendedprice"))
                                  * (100 - _cents(F.col("l_discount"))),
                                  10_000)
                 .alias("revenue"))
            .select("c_custkey", "c_name", "n_name", "revenue",
                    F.round("c_acctbal", 2).alias("c_acctbal"))
            .orderBy(F.desc("revenue"), F.asc("c_custkey"))
            .limit(20))


@query(
    "q12_priority_by_month",
    oracle="""
SELECT month(l.l_shipdate) AS ship_month,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY 1
ORDER BY ship_month
""",
    tags=("join", "agg", "bench"),
    doc="TPC-H Q12 shape: fact join + conditional aggregation (CASE "
        "inside sum) — the filter on shipdate pushes to the lineitem "
        "scan; the orders side prunes to (key, priority) columns only.",
)
def q12_priority_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp")))
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy(F.month("l_shipdate").alias("ship_month"))
            .agg(F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
                 F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"))
            .orderBy("ship_month"))


@query(
    "q14_promo_revenue",
    oracle="""
SELECT round(100.00 *
         CAST(sum(CASE WHEN p_type LIKE 'PROMO%%'
                  THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(round(l_discount * 100) AS BIGINT))
                  ELSE 0 END) AS DOUBLE)
         / CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100) AS BIGINT)))
           AS DOUBLE), 4) AS promo_revenue_pct,
       count(*) AS n_rows
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
""",
    tags=("join", "agg", "bench"),
    doc="TPC-H Q14 shape: broadcast part dimension into the date-pruned "
        "lineitem scan, conditional integer-cents revenue ratio — the "
        "ratio of two exact sums is a single double division, so "
        "rounding to 4 matches cross-engine.",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp")))
    p = load_table(spark, sf_dir, "part")
    rev_c = (_cents(F.col("l_extendedprice"))
             * (100 - _cents(F.col("l_discount"))))
    promo_c = F.when(F.col("p_type").startswith("PROMO"), rev_c).otherwise(
        F.lit(0).cast("long"))
    return (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .agg((F.lit(100.0)
                  * F.sum(promo_c.cast("decimal(38,0)")).cast("double")
                  / F.sum(rev_c.cast("decimal(38,0)")).cast("double"))
                 .alias("__ratio"),
                 F.count(F.lit(1)).alias("n_rows"))
            .select(F.round("__ratio", 4).alias("promo_revenue_pct"),
                    "n_rows"))


@query(
    "q18_large_orders",
    oracle="""
WITH big AS (
  SELECT l_orderkey
  FROM lineitem
  GROUP BY l_orderkey
  HAVING sum(CAST(round(l_quantity * 100) AS BIGINT)) > 21200
)
SELECT o.o_orderkey, o.o_custkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
       round(o.o_totalprice, 2) AS o_totalprice,
       CAST(sum(CAST(round(l.l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100
         AS total_qty
FROM orders o
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
JOIN big b ON b.l_orderkey = o.o_orderkey
GROUP BY o.o_orderkey, o.o_custkey, o.o_orderdate, o.o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""",
    tags=("join", "agg", "subquery", "bench"),
    doc="TPC-H Q18 shape: HAVING-filtered aggregate drives a semi-style "
        "key join back to the facts (aggregate once per order — the "
        "per-order group sum is order-size-bounded, so pure long sums "
        "are exact at any corpus size), global top-100 via "
        "TakeOrderedAndProject.",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    qty_c = _cents(F.col("l_quantity"))
    big = (li.groupBy("l_orderkey")
           .agg(F.sum(qty_c).alias("__qty_c"))
           .filter(F.col("__qty_c") > 21_200))
    return (o.join(big, o.o_orderkey == big.l_orderkey)
            .select("o_orderkey", "o_custkey",
                    F.date_format("o_orderdate", "yyyy-MM-dd")
                    .alias("orderdate"),
                    F.round("o_totalprice", 2).alias("o_totalprice"),
                    (F.col("__qty_c").cast("double") / 100)
                    .alias("total_qty"))
            .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
            .limit(100))


@query(
    "q19_disjunctive_filter",
    oracle="""
SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT)))
            AS DOUBLE) / 10000 AS revenue,
       count(*) AS n_rows
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 35
       AND l_quantity BETWEEN 20 AND 30)
""",
    tags=("join", "filter", "bench"),
    doc="TPC-H Q19 shape: OR-of-ANDs predicate spanning both join sides "
        "— Catalyst extracts the common join key and pushes the "
        "single-side conjuncts (brand/size to the part scan, quantity "
        "to lineitem) below the join; integer-cents exact revenue.",
)
def q19_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 25)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 35)
           & F.col("l_quantity").between(20, 30)))
    rev_c = (_cents(F.col("l_extendedprice"))
             * (100 - _cents(F.col("l_discount"))))
    return (j.filter(cond)
            .agg((F.sum(rev_c.cast("decimal(38,0)")).cast("double") / 10_000)
                 .alias("revenue"),
                 F.count(F.lit(1)).alias("n_rows")))


@query(
    "q7_nation_volume",
    oracle="""
SELECT sn.n_name AS supp_nation,
       cn.n_name AS cust_nation,
       year(l.l_shipdate) AS l_year,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
            AS DOUBLE) / 10000 AS revenue,
       count(*) AS n_rows
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
WHERE sn.n_name IN ('NATION_1', 'NATION_2')
  AND cn.n_name IN ('NATION_1', 'NATION_2')
  AND sn.n_name <> cn.n_name
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
""",
    tags=("join", "agg", "bench"),
    doc="TPC-H Q7 shape: two fact-side joins (supplier, orders) then "
        "broadcast customer/nation dimensions, nation-pair predicate "
        "applied after the dimension join, yearly exact-cents volume. "
        "Six-table join tree exercises Catalyst's join reordering.",
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    sn = n.select(F.col("n_nationkey").alias("sn_key"),
                  F.col("n_name").alias("supp_nation"))
    cn = n.select(F.col("n_nationkey").alias("cn_key"),
                  F.col("n_name").alias("cust_nation"))
    rev_c = (_cents(F.col("l_extendedprice"))
             * (100 - _cents(F.col("l_discount"))))
    pair = (F.col("supp_nation").isin("NATION_1", "NATION_2")
            & F.col("cust_nation").isin("NATION_1", "NATION_2")
            & (F.col("supp_nation") != F.col("cust_nation")))
    joined = (li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
              .join(o, li.l_orderkey == o.o_orderkey)
              .join(F.broadcast(c), o.o_custkey == c.c_custkey)
              .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
              .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
              .filter(pair))
    return (_exact_money_agg(
        joined.withColumn("l_year", F.year("l_shipdate")),
        ["supp_nation", "cust_nation", "l_year"],
        [("revenue", rev_c, 10_000)],
        count_alias="n_rows")
        .orderBy("supp_nation", "cust_nation", "l_year"))


@query(
    "q13_custdist",
    oracle="""
WITH c_orders AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
SELECT c_count, count(*) AS custdist
FROM c_orders GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
    tags=("join", "agg"),
    doc="Customer order-count distribution (TPC-H Q13 shape): LEFT join "
        "keeps zero-order customers (count(o_orderkey) skips the NULL "
        "rows they produce), then a second aggregation over the "
        "per-customer counts. Two shuffles; the distribution result is "
        "bounded by max orders-per-customer.",
)
def q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (c.join(o, c.c_custkey == o.o_custkey, "left")
            .groupBy("c_custkey")
            .agg(F.count("o_orderkey").alias("c_count"))
            .groupBy("c_count")
            .agg(F.count(F.lit(1)).alias("custdist"))
            .orderBy(F.desc("custdist"), F.desc("c_count")))


@query(
    "q15_top_supplier",
    oracle="""
WITH rev AS (
  SELECT l_suppkey AS suppkey,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                  * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
           AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY 1
)
SELECT s_suppkey, s_name, total_rev
FROM supplier JOIN rev ON s_suppkey = suppkey
WHERE total_rev = (SELECT max(total_rev) FROM rev)
ORDER BY s_suppkey
""",
    tags=("join", "agg", "subquery"),
    doc="Top revenue supplier over a quarter (TPC-H Q15 shape): "
        "agg-of-agg with a scalar-max subquery. The per-supplier "
        "revenue frame persists before its two consumers (max + join) "
        "— without it the lineitem scan would run twice. Revenue is "
        "exact two-stage integer-cents (equality against the max is "
        "then bit-safe; raw double sums would make the winner "
        "accumulation-order-dependent).",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate")
         >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate")
           < F.lit("1996-04-01 00:00:00").cast("timestamp")))
    rev = _exact_money_agg(
        li.select(F.col("l_suppkey").alias("suppkey"),
                  "l_extendedprice", "l_discount"),
        ["suppkey"],
        [("total_rev",
          _cents(F.col("l_extendedprice"))
          * (100 - _cents(F.col("l_discount"))), 10_000)]).persist()
    mx = rev.agg(F.max("total_rev").alias("__mx"))
    s = load_table(spark, sf_dir, "supplier")
    return (rev.join(F.broadcast(mx), rev.total_rev == F.col("__mx"))
            .join(s, F.col("suppkey") == s.s_suppkey)
            .select("s_suppkey", "s_name", "total_rev")
            .orderBy("s_suppkey"))


@query(
    "q17_small_qty_revenue",
    oracle="""
WITH pa AS (
  SELECT l_partkey, count(*) AS n,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sumq
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
         AS avg_yearly,
       count(*) AS n_rows
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN pa ON pa.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#13'
  AND 5 * pa.n * CAST(l.l_quantity AS BIGINT) < pa.sumq
""",
    tags=("join", "agg", "subquery"),
    doc="Small-quantity-order revenue (TPC-H Q17 shape): the correlated "
        "per-part average-quantity subquery becomes a per-part "
        "aggregate joined back onto the scan, and the threshold "
        "l_quantity < 0.2*avg(qty) is cross-multiplied into PURE "
        "INTEGER form (5*n*qty < sum_qty) so the boundary row is exact "
        "on every engine — a float avg would make rows at the "
        "threshold accumulation-order-dependent. Quantities are "
        "integer-valued by data contract (cast is exact).",
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pa = (li.groupBy("l_partkey")
          .agg(F.count(F.lit(1)).alias("__n"),
               F.sum(F.col("l_quantity").cast("long")).alias("__sumq"))
          .withColumnRenamed("l_partkey", "__pk"))
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#13")
    flt = (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
           .join(pa, li.l_partkey == F.col("__pk"))
           .filter(5 * F.col("__n") * F.col("l_quantity").cast("long")
                   < F.col("__sumq")))
    out = _exact_money_agg(
        flt.select("l_extendedprice"), [],
        [("__sum_price", _cents(F.col("l_extendedprice")), 100)],
        count_alias="n_rows")
    return out.select((F.col("__sum_price") / 7.0).alias("avg_yearly"),
                      "n_rows")


@query(
    "q8_market_share",
    oracle="""
WITH flat AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
         CAST(l_extendedprice AS DECIMAL(12,2))
           * (1 - CAST(l_discount AS DECIMAL(4,2))) AS vol,
         sn.n_name AS supp_nation
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN region r  ON cn.n_regionkey = r.r_regionkey
  JOIN supplier s ON l_suppkey = s.s_suppkey
  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
  JOIN part p   ON l_partkey = p.p_partkey
  WHERE r.r_name = 'AMERICA' AND p.p_type = 'PROMO'
)
SELECT o_year,
       round(CAST(sum(CASE WHEN supp_nation = 'NATION_3'
                           THEN vol ELSE CAST(0 AS DECIMAL(12,2)) END)
                  AS DOUBLE)
             / CAST(sum(vol) AS DOUBLE), 6) AS mkt_share
FROM flat GROUP BY o_year ORDER BY o_year
""",
    tags=("join", "agg"),
    doc="National market share (TPC-H Q8 shape): an 8-table join tree — "
        "4 broadcast dims (nation x2, region, supplier), broadcast part "
        "filter, one fact-fact shuffle (lineitem-orders), customer "
        "joined on the order side. Share = ratio of two exact decimal "
        "sums, ONE double division per year row.",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "AMERICA")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    cn = n.select(F.col("n_nationkey").alias("__cnk"),
                  F.col("n_regionkey").alias("__crk"))
    sn = n.select(F.col("n_nationkey").alias("__snk"),
                  F.col("n_name").alias("supp_nation"))
    vol_c = _cents(F.col("l_extendedprice")) \
        * (100 - _cents(F.col("l_discount")))
    flat = (li
            .join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .join(o, li.l_orderkey == o.o_orderkey)
            .join(c, o.o_custkey == c.c_custkey)
            .join(F.broadcast(cn), c.c_nationkey == F.col("__cnk"))
            .join(F.broadcast(r), F.col("__crk") == r.r_regionkey)
            .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
            .join(F.broadcast(sn), s.s_nationkey == F.col("__snk"))
            .select(F.year("o_orderdate").cast("int").alias("o_year"),
                    vol_c.alias("__vol_c"), "supp_nation"))
    num = F.sum(F.when(F.col("supp_nation") == "NATION_3",
                       F.col("__vol_c")).otherwise(F.lit(0))
                .cast("decimal(38,0)"))
    den = F.sum(F.col("__vol_c").cast("decimal(38,0)"))
    return (flat.groupBy("o_year")
            .agg(F.round((num / 10_000).cast("double")
                         / (den / 10_000).cast("double"), 6)
                 .alias("mkt_share"))
            .orderBy("o_year"))


# ---------------------------------------------------------------------------
# r6: the remaining TPC-H shapes. The corpus has no partsupp table, so
# Q2/Q9/Q11/Q16/Q20-family queries that price supplier inventory are
# expressed with lineitem as the part-supplier bridge and retailprice as
# the unit-cost surrogate — the JOIN/SUBQUERY SHAPE (correlated mins,
# HAVING vs scalar subquery, NOT IN, multi-anti-join) is what each probe
# preserves; docstrings note the substitution. With these, all 22 TPC-H
# query shapes have a probe.
# ---------------------------------------------------------------------------


@query(
    "q9_product_profit",
    oracle="""
SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(4,2)))
                - CAST(p_retailprice AS DECIMAL(12,2))
                  * CAST(l_quantity AS BIGINT)) AS DOUBLE) AS profit
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
JOIN orders   ON o_orderkey = l_orderkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
ORDER BY nation, o_year DESC
""",
    tags=("join", "agg"),
    doc="Product-type profit by nation and year (TPC-H Q9 shape; "
        "ps_supplycost substituted with p_retailprice*quantity — no "
        "partsupp table in the corpus). Five-table tree: broadcast "
        "part-filter + supplier + nation dims, one lineitem-orders "
        "fact shuffle; profit is an exact integer-cents difference "
        "summed two-stage (longs per partition, decimal across).",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%red%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    # rev in 1e-4 dollars (cents x percent), cost scaled x100 to match
    profit_c4 = (_cents(F.col("l_extendedprice"))
                 * (100 - _cents(F.col("l_discount")))
                 - _cents(F.col("p_retailprice")) * 100
                 * F.col("l_quantity").cast("long"))
    flat = (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
            .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
            .join(o, li.l_orderkey == o.o_orderkey)
            .select(F.col("n_name").alias("nation"),
                    F.year("o_orderdate").cast("int").alias("o_year"),
                    profit_c4.alias("__p4")))
    return (_exact_money_agg(flat, ["nation", "o_year"],
                             [("profit", F.col("__p4"), 10_000)])
            .orderBy("nation", F.desc("o_year")))


@query(
    "q21_waiting_supplier",
    oracle="""
WITH os AS (
  SELECT l_orderkey, l_suppkey, max(l_shipdate) AS smax
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY 1, 2
), w AS (
  SELECT l_orderkey, l_suppkey, smax,
         max(smax) OVER (PARTITION BY l_orderkey) AS omax,
         count(*)  OVER (PARTITION BY l_orderkey) AS nsupp
  FROM os
), q AS (
  SELECT l_orderkey, l_suppkey FROM (
    SELECT l_orderkey, l_suppkey, nsupp, smax = omax AS at_max,
           CAST(sum(CASE WHEN smax = omax THEN 1 ELSE 0 END)
                OVER (PARTITION BY l_orderkey) AS BIGINT) AS n_at_max
    FROM w)
  WHERE at_max AND nsupp > 1 AND n_at_max = 1
)
SELECT s_name, count(*) AS numwait
FROM q JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
""",
    tags=("join", "window", "subquery"),
    doc="Suppliers who kept orders waiting (TPC-H Q21 shape; the corpus "
        "has no commit/receipt dates, so 'late' = sole last-shipper of "
        "a multi-supplier finished order — same EXISTS another supplier "
        "+ NOT EXISTS another equally-late supplier structure, here as "
        "per-order windows over a (order, supplier) pre-aggregate: two "
        "shuffles total instead of Q21's classic double self-join).",
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F").select("o_orderkey")
    s = load_table(spark, sf_dir, "supplier")
    os_ = (li.join(o, li.l_orderkey == o.o_orderkey)
           .groupBy("l_orderkey", "l_suppkey")
           .agg(F.max("l_shipdate").alias("smax")))
    w = Window.partitionBy("l_orderkey")
    q = (os_.withColumn("omax", F.max("smax").over(w))
         .withColumn("nsupp", F.count(F.lit(1)).over(w))
         .withColumn("at_max", F.col("smax") == F.col("omax"))
         .withColumn("n_at_max",
                     F.sum(F.when(F.col("at_max"), 1).otherwise(0))
                     .over(w))
         .filter(F.col("at_max") & (F.col("nsupp") > 1)
                 & (F.col("n_at_max") == 1)))
    return (q.join(F.broadcast(s), q.l_suppkey == s.s_suppkey)
            .groupBy("s_name")
            .agg(F.count(F.lit(1)).alias("numwait"))
            .orderBy(F.desc("numwait"), "s_name")
            .limit(20))


@query(
    "q22_inactive_customers",
    oracle="""
WITH pos AS (
  SELECT c_custkey, c_nationkey,
         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
  FROM customer WHERE c_nationkey IN (0, 1, 2, 3, 4, 5, 6)
), thr AS (
  SELECT CAST(sum(CASE WHEN bal_c > 0 THEN bal_c ELSE 0 END)
              AS DECIMAL(38,0)) AS tot,
         CAST(sum(CASE WHEN bal_c > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n
  FROM pos
), el AS (
  SELECT p.* FROM pos p, thr
  WHERE CAST(p.bal_c AS DECIMAL(38,0)) * thr.n > thr.tot
    AND NOT EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = p.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
)
SELECT c_nationkey AS cntrycode, count(*) AS numcust,
       CAST(CAST(sum(bal_c) AS DECIMAL(38,0)) AS DOUBLE) / 100
         AS totacctbal
FROM el GROUP BY 1 ORDER BY 1
""",
    tags=("join", "subquery", "agg"),
    doc="Prospective-but-inactive customers (TPC-H Q22 shape; nationkey "
        "stands in for phone country codes, and 'inactive' = no order "
        "since 2001-01-01 — every corpus customer has SOME order, so "
        "the recency predicate keeps the anti-join selective instead of "
        "degenerate). Above-average balance against a scalar-subquery "
        "mean, cross-multiplied into exact integer form (bal*n > "
        "total), then LEFT ANTI against recent orders — never a "
        "row-multiplying outer join. The threshold aggregate "
        "broadcasts; one shuffle for the final nation rollup.",
)
def q22_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate")
        >= F.lit("2001-01-01 00:00:00").cast("timestamp"))
    pos = (c.filter(F.col("c_nationkey").isin(0, 1, 2, 3, 4, 5, 6))
           .select("c_custkey", "c_nationkey",
                   _cents(F.col("c_acctbal")).alias("bal_c")))
    thr = pos.agg(
        F.sum(F.when(F.col("bal_c") > 0, F.col("bal_c")).otherwise(0)
              .cast("decimal(38,0)")).alias("__tot"),
        F.sum(F.when(F.col("bal_c") > 0, 1).otherwise(0)).alias("__n"))
    el = (pos.crossJoin(F.broadcast(thr))
          .filter(F.col("bal_c").cast("decimal(38,0)") * F.col("__n")
                  > F.col("__tot"))
          .join(o, pos.c_custkey == o.o_custkey, "left_anti"))
    return (el.groupBy(F.col("c_nationkey").alias("cntrycode"))
            .agg(F.count(F.lit(1)).alias("numcust"),
                 (F.sum(F.col("bal_c").cast("decimal(38,0)"))
                  .cast("double") / 100).alias("totacctbal"))
            .orderBy("cntrycode"))


@query(
    "q2_min_cost_supplier",
    oracle="""
WITH eu AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON n_nationkey = s_nationkey
  JOIN region ON r_regionkey = n_regionkey
  WHERE r_name = 'EUROPE'
), offer AS (
  SELECT l_partkey, l_suppkey,
         min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS price_c
  FROM lineitem JOIN eu ON l_suppkey = s_suppkey
  GROUP BY 1, 2
), best AS (
  SELECT l_partkey, min(price_c) AS min_c FROM offer GROUP BY 1
)
SELECT round(s_acctbal, 2) AS s_acctbal, s_name, n_name, p_partkey
FROM offer
JOIN best ON offer.l_partkey = best.l_partkey
         AND offer.price_c = best.min_c
JOIN eu   ON offer.l_suppkey = eu.s_suppkey
JOIN part ON p_partkey = offer.l_partkey
WHERE p_size > 30
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
""",
    tags=("join", "subquery"),
    doc="Minimum-cost supplier per part (TPC-H Q2 shape; no partsupp "
        "table, so the offer price is the supplier's cheapest observed "
        "lineitem price for the part, in exact integer cents — integer "
        "equality against the correlated min is bit-safe where a double "
        "min would be). Region-filtered suppliers broadcast into the "
        "scan; correlated min = per-part aggregate joined back.",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") > 30)
    eu = (s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
          .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
          .select("s_suppkey", "s_name", "s_acctbal", "n_name"))
    offer = (li.join(F.broadcast(eu.select("s_suppkey")),
                     li.l_suppkey == F.col("s_suppkey"))
             .groupBy("l_partkey", "l_suppkey")
             .agg(F.min(_cents(F.col("l_extendedprice")))
                  .alias("price_c")))
    best = offer.groupBy(F.col("l_partkey").alias("__bpk")).agg(
        F.min("price_c").alias("__min_c"))
    return (offer
            .join(best, (offer.l_partkey == F.col("__bpk"))
                  & (offer.price_c == F.col("__min_c")))
            .join(F.broadcast(eu), offer.l_suppkey == eu.s_suppkey)
            .join(p, offer.l_partkey == p.p_partkey)
            .select(F.round("s_acctbal", 2).alias("s_acctbal"),
                    "s_name", "n_name", "p_partkey")
            .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
            .limit(100))


@query(
    "q11_part_value_share",
    oracle="""
WITH de AS (
  SELECT s_suppkey FROM supplier WHERE s_nationkey = 3
), val AS (
  SELECT l_partkey,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
              AS DECIMAL(38,0)) AS v_c
  FROM lineitem JOIN de ON l_suppkey = s_suppkey
  GROUP BY 1
), tot AS (
  SELECT CAST(sum(v_c) AS DECIMAL(38,0)) AS t_c FROM val
)
SELECT l_partkey AS partkey,
       CAST(v_c AS DOUBLE) / 100 AS value
FROM val, tot
WHERE v_c * 10000 > t_c
ORDER BY value DESC, partkey
""",
    tags=("agg", "subquery"),
    doc="Part value concentration for one nation's suppliers (TPC-H Q11 "
        "shape; lineitem revenue stands in for partsupp inventory "
        "value). HAVING sum > fraction*[scalar subquery total], cross-"
        "multiplied to exact integer form (v*10000 > total); the total "
        "derives from the SAME per-part aggregate (persisted once), so "
        "lineitem scans once.",
)
def q11_part_value_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_nationkey") == 3).select("s_suppkey")
    val = (li.join(F.broadcast(s), li.l_suppkey == F.col("s_suppkey"))
           .groupBy("l_partkey")
           .agg(F.sum(_cents(F.col("l_extendedprice")))
                .cast("decimal(38,0)").alias("v_c")).persist())
    tot = val.agg(F.sum("v_c").cast("decimal(38,0)").alias("__t_c"))
    return (val.crossJoin(F.broadcast(tot))
            .filter(F.col("v_c") * 10_000 > F.col("__t_c"))
            .select(F.col("l_partkey").alias("partkey"),
                    (F.col("v_c").cast("double") / 100).alias("value"))
            .orderBy(F.desc("value"), "partkey"))


@query(
    "q16_supplier_part_count",
    oracle="""
WITH excl AS (
  SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
), bridge AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
  WHERE l_suppkey NOT IN (SELECT s_suppkey FROM excl)
)
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM bridge JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#13' AND p_type NOT LIKE 'PROMO%'
  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""",
    tags=("join", "agg", "subquery"),
    doc="Supplier diversity per part attribute (TPC-H Q16 shape; the "
        "part-supplier bridge is distinct lineitem pairs — no partsupp "
        "— and negative account balance stands in for the complaint "
        "comment filter). NOT IN via broadcast anti-join, distinct "
        "count per attribute triple.",
)
def q16_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    excl = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0).select("s_suppkey")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & ~F.col("p_type").like("PROMO%")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
    bridge = (li.select("l_partkey", "l_suppkey")
              .join(F.broadcast(excl), li.l_suppkey == excl.s_suppkey,
                    "left_anti")
              .distinct())
    return (bridge.join(F.broadcast(p), bridge.l_partkey == p.p_partkey)
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
            .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type",
                     "p_size"))


@query(
    "q20_excess_stock",
    oracle="""
WITH blue AS (
  SELECT p_partkey FROM part WHERE p_name LIKE 'blue%'
), qty AS (
  SELECT l_partkey, l_suppkey,
         CAST(sum(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
                       THEN CAST(l_quantity AS BIGINT) ELSE 0 END)
              AS BIGINT) AS q96,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qall
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM blue)
  GROUP BY 1, 2
)
SELECT s_name, n_name
FROM supplier
JOIN nation ON n_nationkey = s_nationkey
WHERE n_name IN ('NATION_0', 'NATION_1', 'NATION_2', 'NATION_3',
                 'NATION_4')
  AND s_suppkey IN (SELECT l_suppkey FROM qty WHERE 2 * q96 > qall)
ORDER BY s_name
""",
    tags=("join", "subquery", "agg"),
    doc="Potential part promotion (TPC-H Q20 shape; no partsupp, so "
        "ps_availqty > 0.5*shipped-in-year becomes its observable dual: "
        "suppliers whose 1996 shipments of a 'blue' part exceed half "
        "their all-time shipments of it — the same nested "
        "IN-subquery-over-correlated-aggregate shape, comparing a "
        "year-windowed sum against a scaled total per (part, supplier). "
        "All quantity math is exact BIGINT (quantities are integral), "
        "the doubled comparison avoids a fractional threshold. Plan: "
        "the blue part list broadcasts into a semi-join on the lineitem "
        "scan, one (part, supplier) hash-agg, then the qualifying "
        "supplier set broadcasts into a semi-join against the "
        "nation-filtered supplier dim — the fact table shuffles once "
        "and nothing re-scans. Completes the 22/22 TPC-H shape set.",
)
def q20_excess_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    blue = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("blue%")).select("p_partkey")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(*[f"NATION_{i}" for i in range(5)]))
    in96 = ((F.col("l_shipdate")
             >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate")
               < F.lit("1997-01-01 00:00:00").cast("timestamp")))
    qty = (li.join(F.broadcast(blue), li.l_partkey == blue.p_partkey,
                   "left_semi")
           .groupBy("l_partkey", "l_suppkey")
           .agg(F.sum(F.when(in96, F.col("l_quantity").cast("long"))
                      .otherwise(F.lit(0))).alias("q96"),
                F.sum(F.col("l_quantity").cast("long")).alias("qall")))
    qual = (qty.filter(2 * F.col("q96") > F.col("qall"))
            .select("l_suppkey").distinct())
    return (s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
            .join(F.broadcast(qual), s.s_suppkey == F.col("l_suppkey"),
                  "left_semi")
            .select("s_name", "n_name")
            .orderBy("s_name"))
