"""Aggregation surface probes (SURVEY §2.2 "Aggregation").

Every ``groupBy().agg`` here compiles to Spark's two-phase hash aggregate
(partial map-side combine → shuffle on group keys → final), so wire volume
is one row per (partition, group), not per input row. ``count(distinct)``
gets the Expand + two-phase rewrite from Catalyst automatically. The
approximate sketches (HLL++, quantile) are property-tested rather than
oracle-hashed (cross-engine sketches differ by design).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table, register_all
from .registry import query


@query(
    "agg_basic",
    oracle="""
SELECT o_orderpriority,
       count(*)                        AS n_orders,
       count(DISTINCT o_custkey)       AS n_customers,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             / count(*), 4)            AS avg_price,
       round(min(o_totalprice), 2)     AS min_price,
       round(max(o_totalprice), 2)     AS max_price
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    tags=("agg",),
    doc="Hash agg: count/sum/avg/min/max + count distinct per group.",
)
def agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
         .agg(F.count(F.lit(1)).alias("n_orders"),
              F.countDistinct("o_custkey").alias("n_customers"),
              # decimal sums: accumulation-order-independent (SURVEY §7.4)
              F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
               .cast("double").alias("sum_price"),
              F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                      .cast("double") / F.count(F.lit(1)), 4)
               .alias("avg_price"),
              F.round(F.min("o_totalprice"), 2).alias("min_price"),
              F.round(F.max("o_totalprice"), 2).alias("max_price"))
         .orderBy("o_orderpriority")
    )


@query(
    "agg_multi_distinct",
    oracle="""
SELECT l_returnflag,
       count(DISTINCT l_suppkey)     AS n_supp,
       count(DISTINCT l_partkey)     AS n_part,
       count(DISTINCT l_linenumber)  AS n_line,
       count(*)                      AS n_rows
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    tags=("agg",),
    doc="Multiple DISTINCT aggregates in one pass (Expand rewrite).",
)
def agg_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
          .agg(F.countDistinct("l_suppkey").alias("n_supp"),
               F.countDistinct("l_partkey").alias("n_part"),
               F.countDistinct("l_linenumber").alias("n_line"),
               F.count(F.lit(1)).alias("n_rows"))
          .orderBy("l_returnflag")
    )


@query(
    "agg_stats",
    oracle="""
SELECT l_returnflag,
       round(stddev_samp(l_extendedprice), 4) AS sd_price,
       round(stddev_pop(l_extendedprice), 4)  AS sdp_price,
       round(var_samp(l_discount), 8)         AS var_disc,
       round(var_pop(l_discount), 8)          AS varp_disc,
       round(corr(l_extendedprice, l_quantity), 6)       AS corr_pq,
       round(covar_samp(l_extendedprice, l_quantity), 4) AS cov_pq,
       round(covar_pop(l_extendedprice, l_quantity), 4)  AS covp_pq
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    tags=("agg",),
    doc="Statistical aggregates: stddev/var (samp+pop), corr, covar.",
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
          .agg(F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
               F.round(F.stddev_pop("l_extendedprice"), 4).alias("sdp_price"),
               F.round(F.var_samp("l_discount"), 8).alias("var_disc"),
               F.round(F.var_pop("l_discount"), 8).alias("varp_disc"),
               F.round(F.corr("l_extendedprice", "l_quantity"), 6).alias("corr_pq"),
               F.round(F.covar_samp("l_extendedprice", "l_quantity"), 4).alias("cov_pq"),
               F.round(F.covar_pop("l_extendedprice", "l_quantity"), 4).alias("covp_pq"))
          .orderBy("l_returnflag")
    )


@query(
    "agg_minmax_by",
    oracle="""
WITH ranked AS (
  SELECT c_nationkey, c_custkey, c_acctbal,
         row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal DESC, c_custkey DESC) AS rn_max,
         row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal ASC, c_custkey ASC)   AS rn_min
  FROM customer
)
SELECT c_nationkey,
       max(CASE WHEN rn_max = 1 THEN c_custkey END) AS richest_cust,
       max(CASE WHEN rn_min = 1 THEN c_custkey END) AS poorest_cust,
       round(max(c_acctbal), 2)     AS max_bal,
       round(min(c_acctbal), 2)     AS min_bal
FROM ranked
GROUP BY c_nationkey
ORDER BY c_nationkey
""",
    tags=("agg",),
    priority=100,
    doc="min_by/max_by ordered selection aggregates (deterministic: "
        "struct-valued ordering key breaks acctbal ties on custkey; the "
        "oracle's row_number formulation pins the same total order).",
)
def agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_nationkey")
         .agg(F.max_by("c_custkey",
                       F.struct("c_acctbal", "c_custkey")).alias("richest_cust"),
              F.min_by("c_custkey",
                       F.struct("c_acctbal", "c_custkey")).alias("poorest_cust"),
              F.round(F.max("c_acctbal"), 2).alias("max_bal"),
              F.round(F.min("c_acctbal"), 2).alias("min_bal"))
         .orderBy("c_nationkey")
    )


@query(
    "agg_collect",
    oracle="""
SELECT n_regionkey,
       array_to_string(list_sort(list(n_name)), '|')                AS nations,
       array_to_string(list_sort(list_distinct(list(n_name))), '|') AS nations_set
FROM nation
GROUP BY n_regionkey
ORDER BY n_regionkey
""",
    tags=("agg",),
    doc="collect_list/collect_set, sorted for determinism (SURVEY §7.5).",
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    return (
        n.groupBy("n_regionkey")
         .agg(F.array_join(F.array_sort(F.collect_list("n_name")), "|")
              .alias("nations"),
              F.array_join(F.array_sort(F.collect_set("n_name")), "|")
              .alias("nations_set"))
         .orderBy("n_regionkey")
    )


@query(
    "agg_percentiles",
    oracle="""
SELECT o_orderstatus,
       round(median(o_totalprice), 4)              AS med_price,
       round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
       round(quantile_cont(o_totalprice, 0.75), 4) AS p75,
       round(quantile_cont(o_totalprice, 0.95), 4) AS p95
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
    tags=("agg",),
    doc="Exact percentiles (continuous interpolation) + median.",
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
         .agg(F.round(F.median("o_totalprice"), 4).alias("med_price"),
              F.round(F.percentile("o_totalprice", 0.25), 4).alias("p25"),
              F.round(F.percentile("o_totalprice", 0.75), 4).alias("p75"),
              F.round(F.percentile("o_totalprice", 0.95), 4).alias("p95"))
         .orderBy("o_orderstatus")
    )


@query(
    "agg_rollup",
    oracle="""
SELECT l_returnflag, l_linestatus,
       grouping(l_returnflag) * 2 + grouping(l_linestatus) AS grp_id,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       count(*)                  AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY grp_id, l_returnflag NULLS LAST, l_linestatus NULLS LAST
""",
    tags=("agg",),
    doc="ROLLUP hierarchy with grouping() indicator bits.",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    grp_id = (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus"))
    return (
        li.rollup("l_returnflag", "l_linestatus")
          .agg(grp_id.alias("grp_id"),
               F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                .cast("double").alias("sum_qty"),
               F.count(F.lit(1)).alias("n"))
          .orderBy(F.asc("grp_id"),
                   F.asc_nulls_last("l_returnflag"),
                   F.asc_nulls_last("l_linestatus"))
    )


@query(
    "agg_cube",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS grp_id,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       count(*)                    AS n
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY grp_id, o_orderstatus NULLS LAST, o_orderpriority NULLS LAST
""",
    tags=("agg",),
    doc="CUBE over two keys with grouping() indicator bits.",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    grp_id = (F.grouping("o_orderstatus") * 2 + F.grouping("o_orderpriority"))
    return (
        o.cube("o_orderstatus", "o_orderpriority")
         .agg(grp_id.alias("grp_id"),
              F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
               .cast("double").alias("sum_price"),
              F.count(F.lit(1)).alias("n"))
         .orderBy(F.asc("grp_id"),
                  F.asc_nulls_last("o_orderstatus"),
                  F.asc_nulls_last("o_orderpriority"))
    )


@query(
    "agg_grouping_sets",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         AS sum_price,
       count(*)                       AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
ORDER BY l_returnflag NULLS LAST, l_linestatus NULLS LAST
""",
    tags=("agg",),
    doc="Explicit GROUPING SETS (SQL path through the engine).",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_all(spark, sf_dir)
    return spark.sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS sum_price,
               count(*)                       AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY l_returnflag NULLS LAST, l_linestatus NULLS LAST
    """)


@query(
    "agg_global",
    oracle="""
SELECT count(*)                             AS n_rows,
       count(DISTINCT l_orderkey)           AS n_orders,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             / count(*), 4)                 AS avg_price,
       round(min(l_discount), 2)            AS min_disc,
       round(max(l_tax), 2)                 AS max_tax
FROM lineitem
""",
    tags=("agg",),
    doc="Global (no-key) aggregation.",
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
         .cast("double").alias("sum_qty"),
        F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                .cast("double") / F.count(F.lit(1)), 4).alias("avg_price"),
        F.round(F.min("l_discount"), 2).alias("min_disc"),
        F.round(F.max("l_tax"), 2).alias("max_tax"))


@query(
    "agg_approx_count_distinct",
    oracle=None,  # sketch output is engine-specific; property-tested in
                  # tests/test_operators.py (±5% of exact, SURVEY §5.2)
    tags=("agg", "approx"),
    priority=150,
    doc="HLL++ approximate count-distinct (rows-only driver check).",
)
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
          .agg(F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
               F.countDistinct("l_partkey").alias("exact_parts"))
          .orderBy("l_returnflag")
    )


@query(
    "agg_approx_percentile",
    oracle=None,  # sketch output engine-specific; property-tested
    tags=("agg", "approx"),
    priority=150,
    doc="Approximate percentile sketch (rows-only driver check).",
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
         .agg(F.percentile_approx("o_totalprice", 0.5, 1000).alias("approx_med"),
              F.round(F.median("o_totalprice"), 4).alias("exact_med"))
         .orderBy("o_orderstatus")
    )


@query(
    "agg_mode_per_group",
    oracle="""
WITH counts AS (
  SELECT o_orderstatus, o_orderpriority, count(*) AS n
  FROM orders GROUP BY 1, 2
), ranked AS (
  SELECT o_orderstatus, o_orderpriority, n,
         row_number() OVER (PARTITION BY o_orderstatus
                            ORDER BY n DESC, o_orderpriority) AS rk
  FROM counts
)
SELECT o_orderstatus, o_orderpriority AS mode_priority, n AS mode_count
FROM ranked WHERE rk = 1
ORDER BY o_orderstatus
""",
    tags=("agg",),
    doc="Statistical mode per group: the most frequent order priority "
        "per status, with an EXPLICIT (count desc, value asc) "
        "tie-break — mode()/max_by() builtins leave ties "
        "engine-defined, which is exactly the nondeterminism the "
        "probe contract bans, so the engine derives the mode from a "
        "ranked count rollup instead. Two shuffles, both over "
        "aggregated rows (statuses × priorities, then statuses).",
)
def agg_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    o = load_table(spark, sf_dir, "orders")
    counts = (o.groupBy("o_orderstatus", "o_orderpriority")
              .agg(F.count(F.lit(1)).alias("n")))
    w = (Window.partitionBy("o_orderstatus")
         .orderBy(F.desc("n"), F.asc("o_orderpriority")))
    return (counts.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("o_orderstatus",
                    F.col("o_orderpriority").alias("mode_priority"),
                    F.col("n").alias("mode_count"))
            .orderBy("o_orderstatus"))


@query(
    "agg_boolean_family",
    oracle="""
SELECT o_orderstatus,
       count(*) AS n,
       count(*) FILTER (o_totalprice > 100000) AS n_big,
       bool_and(o_totalprice > 1000)  AS all_over_1k,
       bool_or(o_totalprice > 400000) AS any_over_400k,
       CAST(count(*) FILTER (o_orderpriority = '1-URGENT') AS BIGINT)
         AS n_urgent
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
    tags=("agg",),
    doc="Boolean aggregate family: count_if, bool_and (every), bool_or "
        "(any) per group — the predicate-rollup shapes quality gates "
        "and monitoring queries lean on (Spark count_if/bool_and/"
        "bool_or == DuckDB FILTER/bool_and/bool_or). One hash agg, "
        "predicates in codegen.",
)
def agg_boolean_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (o.groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.count_if(F.col("o_totalprice") > 100000)
                 .alias("n_big"),
                 F.bool_and(F.col("o_totalprice") > 1000)
                 .alias("all_over_1k"),
                 F.bool_or(F.col("o_totalprice") > 400000)
                 .alias("any_over_400k"),
                 F.count_if(F.col("o_orderpriority") == "1-URGENT")
                 .alias("n_urgent"))
            .orderBy("o_orderstatus"))
