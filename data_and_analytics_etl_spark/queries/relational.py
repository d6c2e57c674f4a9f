"""Relational core probes: projection/filter/conditional, every join type,
set operations, sort/limit/offset, subqueries (SURVEY §2.2).

Scale notes embedded per probe; the common themes:
- dimension sides are broadcast so fact tables never shuffle for joins;
- non-equi (theta/range) joins keep one small side → BNLJ with broadcast,
  never a shuffled cartesian of two big inputs;
- the as-of join is the union-and-carry rewrite (operators/asof.py), one
  shuffle, no pair explosion.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table, register_all
from ..operators.asof import asof_join
from ..operators.topk import top_k_per_group
from .registry import query


# ---------------------------------------------------------------- filters

@query(
    "filter_predicates",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag,
       CAST(round(CAST(l_extendedprice AS DECIMAL(18,4))
                  * (1 - CAST(l_discount AS DECIMAL(18,4))), 2)
            AS DOUBLE) AS net_price
FROM lineitem
WHERE l_quantity BETWEEN 10 AND 20
  AND l_returnflag IN ('A', 'R')
  AND l_linestatus IS NOT NULL
  AND (l_discount < 0.03 OR l_tax >= 0.05)
  AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
ORDER BY l_orderkey, l_linenumber
""",
    tags=("filter",),
    priority=100,
    doc="Compound predicate pushdown: BETWEEN, IN, IS NOT NULL, OR-tree.",
)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            F.col("l_quantity").between(10, 20)
            & F.col("l_returnflag").isin("A", "R")
            & F.col("l_linestatus").isNotNull()
            & ((F.col("l_discount") < 0.03) | (F.col("l_tax") >= 0.05))
            & (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp")))
        .select(
            "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag",
            # Decimal, not raw-double, rounding: round(x*y, 2) on doubles
            # hits half-tie divergence across engines (SURVEY §7.4).
            F.round(F.col("l_extendedprice").cast("decimal(18,4)")
                    * (F.lit(1).cast("decimal(18,4)")
                       - F.col("l_discount").cast("decimal(18,4)")), 2)
            .cast("double").alias("net_price"))
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "filter_like_rlike",
    oracle="""
SELECT p_partkey, p_name, p_brand,
       (p_name LIKE '%gold%')                  AS has_gold,
       regexp_matches(p_name, '^[a-m]')        AS starts_a_to_m
FROM part
WHERE p_name LIKE '%o%' AND regexp_matches(p_type, '(SMALL|LARGE)')
ORDER BY p_partkey
""",
    tags=("filter",),
    doc="LIKE and regexp predicates, pushed and projected.",
)
def filter_like_rlike(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return (
        p.filter(F.col("p_name").like("%o%")
                 & F.col("p_type").rlike("(SMALL|LARGE)"))
        .select(
            "p_partkey", "p_name", "p_brand",
            F.col("p_name").like("%gold%").alias("has_gold"),
            F.col("p_name").rlike("^[a-m]").alias("starts_a_to_m"))
        .orderBy("p_partkey")
    )


@query(
    "conditional_expr",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice > 300000 THEN 'big'
            WHEN o_totalprice > 150000 THEN 'mid'
            ELSE 'small' END                          AS size_band,
       coalesce(nullif(o_orderstatus, 'O'), 'open')   AS status_or_open,
       CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS is_urgent
FROM orders
WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
ORDER BY o_orderkey
""",
    tags=("filter",),
    doc="CASE WHEN / coalesce / nullif conditional expressions.",
)
def conditional_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp"))
        .select(
            "o_orderkey",
            F.when(F.col("o_totalprice") > 300000, "big")
             .when(F.col("o_totalprice") > 150000, "mid")
             .otherwise("small").alias("size_band"),
            F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open"))
             .alias("status_or_open"),
            F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
             .alias("is_urgent"))
        .orderBy("o_orderkey")
    )


@query(
    "null_safe_equality",
    oracle="""
SELECT (nullif(l_returnflag, 'N') IS NOT DISTINCT FROM nullif(l_linestatus, 'O'))
         AS ns_eq,
       count(*) AS n
FROM lineitem
GROUP BY ns_eq
ORDER BY ns_eq NULLS LAST
""",
    tags=("filter",),
    doc="Null-safe equality (<=> / IS NOT DISTINCT FROM).",
)
def null_safe_equality(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    ns_eq = F.nullif(F.col("l_returnflag"), F.lit("N")).eqNullSafe(
        F.nullif(F.col("l_linestatus"), F.lit("O")))
    return (li.groupBy(ns_eq.alias("ns_eq"))
              .agg(F.count(F.lit(1)).alias("n"))
              .orderBy(F.asc_nulls_last("ns_eq")))


# ------------------------------------------------------------------ joins

@query(
    "join_inner",
    oracle="""
SELECT n_name, r_name, count(*) AS n_customers,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_balance
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY n_name, r_name
ORDER BY n_name
""",
    tags=("join",),
    doc="Inner equi-join chain, both dimensions broadcast.",
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
         .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
         .groupBy("n_name", "r_name")
         .agg(F.count(F.lit(1)).alias("n_customers"),
              F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
               .cast("double").alias("total_balance"))
         .orderBy("n_name")
    )


@query(
    "join_left_outer",
    oracle="""
SELECT c_custkey, o_orderkey, round(o_totalprice, 2) AS total_price
FROM customer
LEFT JOIN (SELECT * FROM orders WHERE o_orderstatus = 'F'
            AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00') o
  ON c_custkey = o.o_custkey
ORDER BY c_custkey, o_orderkey NULLS LAST
""",
    tags=("join",),
    doc="Left outer join preserving unmatched build-side rows.",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderstatus") == "F")
        & (F.col("o_orderdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp")))
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
         .select("c_custkey", "o_orderkey",
                 F.round("o_totalprice", 2).alias("total_price"))
         .orderBy(F.asc("c_custkey"), F.asc_nulls_last("o_orderkey"))
    )


@query(
    "join_full_outer",
    oracle="""
WITH cust_n AS (SELECT c_nationkey AS nationkey, count(*) AS n_cust
                FROM customer WHERE c_acctbal > 9000 GROUP BY c_nationkey),
     supp_n AS (SELECT s_nationkey AS nationkey, count(*) AS n_supp
                FROM supplier GROUP BY s_nationkey)
SELECT coalesce(cust_n.nationkey, supp_n.nationkey) AS nationkey,
       n_cust, n_supp
FROM cust_n FULL OUTER JOIN supp_n ON cust_n.nationkey = supp_n.nationkey
ORDER BY nationkey
""",
    tags=("join",),
    doc="Full outer join over two pre-aggregated sides.",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (load_table(spark, sf_dir, "customer")
         .filter(F.col("c_acctbal") > 9000)
         .groupBy(F.col("c_nationkey").alias("nationkey"))
         .agg(F.count(F.lit(1)).alias("n_cust")))
    s = (load_table(spark, sf_dir, "supplier")
         .groupBy(F.col("s_nationkey").alias("nationkey"))
         .agg(F.count(F.lit(1)).alias("n_supp")))
    return (
        c.join(s, "nationkey", "full")  # USING-style: coalesced key
         .select("nationkey", "n_cust", "n_supp")
         .orderBy("nationkey")
    )


@query(
    "join_semi",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
ORDER BY c_custkey
""",
    tags=("join",),
    doc="Left semi join (EXISTS rewrite).",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT")
    return (c.join(o, c.c_custkey == o.o_custkey, "left_semi")
             .select("c_custkey", "c_name")
             .orderBy("c_custkey"))


@query(
    "join_anti",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
ORDER BY c_custkey
""",
    tags=("join",),
    doc="Left anti join (NOT EXISTS rewrite).",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (c.join(o, c.c_custkey == o.o_custkey, "left_anti")
             .select("c_custkey", "c_name")
             .orderBy("c_custkey"))


@query(
    "join_cross",
    oracle="""
SELECT r_name, s.status
FROM region
CROSS JOIN (SELECT DISTINCT o_orderstatus AS status FROM orders) s
ORDER BY r_name, s.status
""",
    tags=("join",),
    doc="Cross join of two tiny inputs (broadcast NLJ).",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region")
    s = (load_table(spark, sf_dir, "orders")
         .select(F.col("o_orderstatus").alias("status")).distinct())
    return (r.crossJoin(F.broadcast(s))
             .select("r_name", "status")
             .orderBy("r_name", "status"))


@query(
    "join_theta",
    oracle="""
SELECT s_suppkey, c_custkey
FROM supplier JOIN customer
  ON s_nationkey = c_nationkey AND c_acctbal > s_acctbal
ORDER BY s_suppkey, c_custkey
""",
    tags=("join",),
    doc="Mixed equi + theta join: hash on the equi key, residual inequality.",
)
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    return (
        s.join(c, (s.s_nationkey == c.c_nationkey) & (c.c_acctbal > s.s_acctbal))
         .select("s_suppkey", "c_custkey")
         .orderBy("s_suppkey", "c_custkey")
    )


@query(
    "join_range",
    oracle="""
WITH bands(band, lo, hi) AS (
  VALUES ('low', 0.0, 100.0), ('mid', 100.0, 500.0), ('high', 500.0, 1e18))
SELECT band, count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events JOIN bands ON value >= lo AND value < hi
GROUP BY band
ORDER BY band
""",
    tags=("join",),
    doc="Range/interval join: broadcast BNLJ against a tiny band table.",
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bands = spark.createDataFrame(
        [("low", 0.0, 100.0), ("mid", 100.0, 500.0), ("high", 500.0, 1e18)],
        "band string, lo double, hi double")
    return (
        ev.join(F.broadcast(bands),
                (ev.value >= bands.lo) & (ev.value < bands.hi))
          .groupBy("band")
          .agg(F.count(F.lit(1)).alias("n_events"),
               F.sum(F.col("value").cast("decimal(18,2)"))
                .cast("double").alias("sum_value"))
          .orderBy("band")
    )


@query(
    "join_asof",
    oracle="""
SELECT p.event_id, p.user_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
       c.event_id                             AS click_event_id,
       strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
ORDER BY p.event_id
""",
    tags=("join", "ext"),
    doc="As-of join via union-and-carry rewrite (operators/asof.py); "
        "checked against DuckDB's native ASOF JOIN.",
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    clicks = ev.filter(F.col("event_type") == "click")
    joined = asof_join(
        purchases, clicks, on="user_id", left_ts="ts", right_ts="ts",
        right_values=["event_id"], how="left")
    return (
        joined.select(
            "event_id", "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("purchase_ts"),
            F.col("event_id_right").alias("click_event_id"),
            F.date_format("ts_right", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("click_ts"))
        .orderBy("event_id")
    )


@query(
    "subquery_in",
    oracle="""
SELECT o_orderkey, round(o_totalprice, 2) AS total_price
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
  AND o_orderkey NOT IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 49)
ORDER BY o_orderkey
""",
    tags=("join",),
    doc="IN / NOT IN subqueries (Catalyst rewrites to semi/anti joins).",
)
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_all(spark, sf_dir)
    return spark.sql("""
        SELECT o_orderkey, round(o_totalprice, 2) AS total_price
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer
                            WHERE c_mktsegment = 'AUTOMOBILE')
          AND o_orderkey NOT IN (SELECT l_orderkey FROM lineitem
                                 WHERE l_quantity > 49)
        ORDER BY o_orderkey
    """)


@query(
    "subquery_scalar_correlated",
    oracle="""
SELECT c_custkey, c_name,
       (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders
FROM customer
WHERE c_acctbal > 9500
ORDER BY c_custkey
""",
    tags=("join",),
    doc="Correlated scalar subquery (decorrelated to an aggregate join).",
)
def subquery_scalar_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_all(spark, sf_dir)
    return spark.sql("""
        SELECT c_custkey, c_name,
               (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders
        FROM customer
        WHERE c_acctbal > 9500
        ORDER BY c_custkey
    """)


# ----------------------------------------------------------------- setops

@query(
    "set_union_all",
    oracle="""
SELECT name, round(acctbal, 2) AS acctbal, kind FROM (
  SELECT c_name AS name, c_acctbal AS acctbal, 'customer' AS kind
  FROM customer WHERE c_acctbal > 9900
  UNION ALL
  SELECT s_name AS name, s_acctbal AS acctbal, 'supplier' AS kind
  FROM supplier WHERE s_acctbal > 5000
)
ORDER BY kind, name
""",
    tags=("setop",),
    doc="UNION ALL with aligned schemas (unionByName).",
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (load_table(spark, sf_dir, "customer")
         .filter(F.col("c_acctbal") > 9900)
         .select(F.col("c_name").alias("name"),
                 F.round("c_acctbal", 2).alias("acctbal"),
                 F.lit("customer").alias("kind")))
    s = (load_table(spark, sf_dir, "supplier")
         .filter(F.col("s_acctbal") > 5000)
         .select(F.col("s_name").alias("name"),
                 F.round("s_acctbal", 2).alias("acctbal"),
                 F.lit("supplier").alias("kind")))
    return c.unionByName(s).orderBy("kind", "name")


@query(
    "set_union_distinct",
    oracle="""
SELECT nationkey FROM (
  SELECT c_nationkey AS nationkey FROM customer
  UNION
  SELECT s_nationkey AS nationkey FROM supplier
)
ORDER BY nationkey
""",
    tags=("setop",),
    doc="UNION (distinct) — union + dedup in one shuffle.",
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct().orderBy("nationkey")


@query(
    "set_intersect",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey FROM supplier
ORDER BY nationkey
""",
    tags=("setop",),
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s).orderBy("nationkey")


@query(
    "set_except",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey FROM supplier
ORDER BY nationkey
""",
    tags=("setop",),
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s).orderBy("nationkey")  # subtract == EXCEPT DISTINCT


@query(
    "set_intersect_all",
    oracle="""
SELECT l_returnflag AS flag, l_linenumber AS line FROM lineitem WHERE l_quantity > 25
INTERSECT ALL
SELECT l_returnflag, l_linenumber FROM lineitem WHERE l_discount > 0.05
ORDER BY flag, line
""",
    tags=("setop",),
    doc="INTERSECT ALL: multiset semantics preserved.",
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") > 25).select(
        F.col("l_returnflag").alias("flag"), F.col("l_linenumber").alias("line"))
    b = li.filter(F.col("l_discount") > 0.05).select(
        F.col("l_returnflag").alias("flag"), F.col("l_linenumber").alias("line"))
    return a.intersectAll(b).orderBy("flag", "line")


@query(
    "set_except_all",
    oracle="""
SELECT l_returnflag AS flag, l_linenumber AS line FROM lineitem WHERE l_quantity > 25
EXCEPT ALL
SELECT l_returnflag, l_linenumber FROM lineitem WHERE l_discount > 0.05
ORDER BY flag, line
""",
    tags=("setop",),
    doc="EXCEPT ALL: multiset difference.",
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") > 25).select(
        F.col("l_returnflag").alias("flag"), F.col("l_linenumber").alias("line"))
    b = li.filter(F.col("l_discount") > 0.05).select(
        F.col("l_returnflag").alias("flag"), F.col("l_linenumber").alias("line"))
    return a.exceptAll(b).orderBy("flag", "line")


# ------------------------------------------------------- sort/limit/top-k

@query(
    "sort_multi_key",
    oracle="""
SELECT c_custkey, c_nationkey, c_mktsegment, round(c_acctbal, 2) AS acctbal
FROM customer
ORDER BY c_mktsegment ASC, acctbal DESC, c_custkey ASC
""",
    tags=("sort",),
    doc="Total multi-key sort, mixed directions.",
)
def sort_multi_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return (c.select("c_custkey", "c_nationkey", "c_mktsegment",
                     F.round("c_acctbal", 2).alias("acctbal"))
             .orderBy(F.asc("c_mktsegment"), F.desc("acctbal"), F.asc("c_custkey")))


@query(
    "limit_offset",
    oracle="""
SELECT o_orderkey, round(o_totalprice, 2) AS total_price
FROM orders
ORDER BY total_price DESC, o_orderkey
LIMIT 20 OFFSET 10
""",
    tags=("sort",),
    doc="LIMIT/OFFSET over a total order.",
)
def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (o.select("o_orderkey", F.round("o_totalprice", 2).alias("total_price"))
             .orderBy(F.desc("total_price"), F.asc("o_orderkey"))
             .offset(10).limit(20))


@query(
    "topk_global",
    oracle="""
SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price
FROM lineitem
ORDER BY price DESC, l_orderkey, l_linenumber
LIMIT 25
""",
    tags=("sort", "topk"),
    doc="Global top-k → TakeOrderedAndProject (no total sort at scale).",
)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (li.select("l_orderkey", "l_linenumber",
                      F.round("l_extendedprice", 2).alias("price"))
              .orderBy(F.desc("price"), F.asc("l_orderkey"), F.asc("l_linenumber"))
              .limit(25))


@query(
    "topk_per_group",
    oracle="""
SELECT user_id, event_id, event_type, round(value, 2) AS value, rnk
FROM (
  SELECT user_id, event_id, event_type, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY value DESC, event_id) AS rnk
  FROM events
)
WHERE rnk <= 3
ORDER BY user_id, rnk
""",
    tags=("sort", "topk", "window"),
    doc="Per-group top-k via row_number window (operators/topk.py).",
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = top_k_per_group(
        ev, group=["user_id"],
        order=[F.desc("value"), F.asc("event_id")], k=3)
    return (out.select("user_id", "event_id", "event_type",
                       F.round("value", 2).alias("value"), "rnk")
               .orderBy("user_id", "rnk"))


@query(
    "distinct_projection",
    oracle="""
SELECT DISTINCT c_mktsegment, c_nationkey
FROM customer
ORDER BY c_mktsegment, c_nationkey
""",
    tags=("sort",),
)
def distinct_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return (c.select("c_mktsegment", "c_nationkey").distinct()
             .orderBy("c_mktsegment", "c_nationkey"))


@query(
    "join_asof_tolerance",
    oracle="""
SELECT p.event_id, p.user_id,
       CASE WHEN c.ts IS NOT NULL
             AND epoch_us(p.ts) - epoch_us(c.ts) <= 7200000000
            THEN c.event_id END AS click_event_id,
       CASE WHEN c.ts IS NOT NULL
             AND epoch_us(p.ts) - epoch_us(c.ts) <= 7200000000
            THEN strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') END AS click_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
ORDER BY p.event_id
""",
    tags=("join", "ext"),
    doc="As-of join with a staleness tolerance (operators/asof.py "
        "tolerance_s — pandas merge_asof parity): each purchase takes "
        "its latest preceding click ONLY within 2 hours; a staler "
        "match becomes NULL instead of being carried forever (the "
        "stale-quote footgun). The gap compares in exact integer "
        "microseconds so the boundary row never flaps; the oracle is "
        "DuckDB's native ASOF JOIN with the same post-filter.",
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import asof_join
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    clicks = ev.filter(F.col("event_type") == "click")
    joined = asof_join(
        purchases, clicks, on="user_id", left_ts="ts", right_ts="ts",
        right_values=["event_id"], how="left", tolerance_s=7200)
    return (joined.select(
        "event_id", "user_id",
        F.col("event_id_right").alias("click_event_id"),
        F.date_format("ts_right", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .alias("click_ts"))
        .orderBy("event_id"))
