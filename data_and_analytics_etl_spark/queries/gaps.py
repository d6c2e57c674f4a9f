"""Coverage-gap probes: right outer join, sampling, explode variants,
from_json/json_tuple, extended map functions (VERDICT r1 "small gaps").
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from .registry import query


@query(
    "join_right_outer",
    oracle="""
SELECT c.c_custkey, c.c_name, o.o_orderkey,
       round(o.o_totalprice, 2) AS o_totalprice
FROM (SELECT * FROM orders WHERE o_orderkey < 5000) o
RIGHT JOIN (SELECT * FROM customer WHERE c_custkey < 300) c
  ON o.o_custkey = c.c_custkey
ORDER BY c_custkey, o_orderkey
""",
    tags=("join",),
    priority=100,
    doc="Right outer join: unmatched right-side customers survive with "
        "NULL order columns (completes the outer-join family).",
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 5000)
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 300)
    return (o.join(c, o.o_custkey == c.c_custkey, "right")
            .select("c_custkey", "c_name", "o_orderkey",
                    F.round("o_totalprice", 2).alias("o_totalprice"))
            .orderBy("c_custkey", "o_orderkey"))


@query(
    "sample_deterministic",
    oracle="""
SELECT o_orderkey, o_custkey
FROM orders
WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) < '1a'
ORDER BY o_orderkey
""",
    tags=("sample",),
    doc="Deterministic hash-threshold sampling (~10.2% = 26/256): "
        "md5(key) prefix under a threshold picks the same rows on every "
        "engine and every run — unlike seeded Bernoulli df.sample, whose "
        "row choice is engine-defined (that form's run-to-run determinism "
        "is asserted in tests/test_gaps.py). Hash-mod sampling is also "
        "the scale form: stable under repartition, no state, and "
        "consistent across incremental loads.",
)
def sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import hash_sample
    o = load_table(spark, sf_dir, "orders")
    return (hash_sample(o, "o_orderkey", 26 / 256)
            .select("o_orderkey", "o_custkey")
            .orderBy("o_orderkey"))


@query(
    "explode_variants",
    oracle=r"""
WITH src AS (
  SELECT p_partkey,
         regexp_extract_all(p_name, '\b[aeiou]\w+') AS arr
  FROM part WHERE p_partkey < 200
)
SELECT p_partkey,
       CASE WHEN len(arr) = 0 THEN NULL
            ELSE CAST(u.pos - 1 AS INTEGER) END AS pos,
       u.token
FROM src, LATERAL (
  SELECT unnest(CASE WHEN len(arr) = 0 THEN [NULL] ELSE arr END) AS token,
         generate_subscripts(CASE WHEN len(arr) = 0 THEN [NULL] ELSE arr END,
                             1) AS pos
) u
ORDER BY p_partkey, pos
""",
    tags=("functions", "lateral"),
    priority=100,
    doc="posexplode_outer: lateral explode with position, keeping rows "
        "whose array is empty (NULL pos/token) — the outer explode "
        "variants missing from r1.",
)
def explode_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 200)
    arr = F.regexp_extract_all(F.col("p_name"), F.lit(r"\b[aeiou]\w+"), 0)
    return (p.select("p_partkey", arr.alias("arr"))
            .select("p_partkey", F.posexplode_outer("arr"))
            .withColumnsRenamed({"col": "token"})
            .orderBy("p_partkey", "pos"))


@query(
    "json_extended",
    oracle="""
SELECT event_id,
       json_extract_string(props, '$.k')            AS k_str,
       CAST(json_extract(props, '$.k') AS BIGINT)   AS k_from_json,
       CAST(json_extract(props, '$.k') AS BIGINT)   AS k_tuple
FROM events
WHERE event_id < 3000
ORDER BY event_id
""",
    tags=("functions", "json"),
    priority=100,
    doc="from_json (schema'd parse to struct) and json_tuple (multi-path "
        "extract) over events.props — the schemaless-JSON record model "
        "of the reference (CommCareAPIHandler.py:204).",
)
def json_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 3000)
    parsed = F.from_json("props", "k bigint")
    return (ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        parsed.getField("k").alias("k_from_json"),
        F.json_tuple(F.col("props"), "k").alias("k_tuple_s"))
        .withColumn("k_tuple", F.col("k_tuple_s").cast("bigint"))
        .drop("k_tuple_s")
        .orderBy("event_id"))


@query(
    "map_extended",
    oracle="""
SELECT n_nationkey,
       array_to_string(
         list_sort([n_name || '=' || CAST(n_regionkey AS VARCHAR),
                    'code=' || CAST(n_nationkey AS VARCHAR)]), '|')
                                                            AS entries,
       CAST(n_regionkey AS VARCHAR)                         AS looked_up,
       2                                                    AS n_keys
FROM nation
ORDER BY n_nationkey
""",
    tags=("functions", "map"),
    doc="map_from_arrays + map_concat + map_entries + element_at + "
        "map_keys: maps built from columns, merged, then rendered as "
        "sorted 'k=v' strings joined with '|' (map iteration order is "
        "engine-defined, and array cells crash the driver's "
        "canonicalizer — r2 finding — so the probe boundary is scalar).",
)
def map_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    m1 = F.map_from_arrays(F.array(F.col("n_name")),
                           F.array(F.col("n_regionkey").cast("string")))
    m2 = F.map_from_entries(F.array(F.struct(
        F.lit("code").alias("key"),
        F.col("n_nationkey").cast("string").alias("value"))))
    merged = F.map_concat(m1, m2)
    entries = F.array_sort(F.transform(
        F.map_entries(merged),
        lambda e: F.concat(e.getField("key"), F.lit("="),
                           e.getField("value"))))
    return (n.select(
        "n_nationkey",
        F.array_join(entries, "|").alias("entries"),
        F.element_at(merged, F.col("n_name")).alias("looked_up"),
        F.size(F.map_keys(merged)).alias("n_keys"))
        .orderBy("n_nationkey"))


@query(
    "join_salted",
    oracle="""
SELECT o.o_orderpriority,
       count(*)            AS n,
       CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
""",
    tags=("join", "skew"),
    doc="Salted equi-join (operators/skew.py:salted_join, 16 buckets): "
        "hot keys on the big side spread across shuffle partitions, the "
        "small side replicates per bucket — result must be EXACTLY the "
        "plain join (this probe is the proof). The manual fallback for "
        "skew AQE can't split.",
)
def join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_join
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority")
    joined = salted_join(li, o, on=["l_orderkey"],
                         salt_source=F.col("l_linenumber"))
    return (joined.groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                  .cast("double").alias("sum_qty"))
            .orderBy("o_orderpriority"))


@query(
    "agg_pivot",
    oracle="""
SELECT l_returnflag,
       CAST(sum(CASE WHEN l_linestatus = 'F'
                THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE)
         AS f_qty,
       CAST(sum(CASE WHEN l_linestatus = 'O'
                THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE)
         AS o_qty,
       count(CASE WHEN l_linestatus = 'F' THEN 1 END)        AS f_rows,
       count(CASE WHEN l_linestatus = 'O' THEN 1 END)        AS o_rows
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    tags=("agg", "pivot"),
    doc="Pivot: groupBy().pivot(values-pinned).agg() — explicit pivot "
        "values keep it single-pass (no extra distinct-values job) and "
        "the plan a plain two-phase hash agg; == conditional aggregation.",
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    out = (li.groupBy("l_returnflag")
           .pivot("l_linestatus", ["F", "O"])
           .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                .cast("double").alias("qty"),
                F.count(F.lit(1)).alias("rows")))
    return (out.select(
        "l_returnflag",
        F.col("F_qty").alias("f_qty"), F.col("O_qty").alias("o_qty"),
        F.col("F_rows").alias("f_rows"), F.col("O_rows").alias("o_rows"))
        .orderBy("l_returnflag"))


@query(
    "unpivot_stack",
    oracle="""
SELECT c_custkey, metric, val
FROM (
  SELECT c_custkey, 'acctbal' AS metric, round(c_acctbal, 2) AS val
  FROM customer WHERE c_custkey < 200
  UNION ALL
  SELECT c_custkey, 'nationkey', CAST(c_nationkey AS DOUBLE)
  FROM customer WHERE c_custkey < 200
)
ORDER BY c_custkey, metric
""",
    tags=("agg", "pivot"),
    doc="Unpivot (wide->long) via native melt/unpivot — columns become "
        "(metric, value) rows with no shuffle at all (pure projection + "
        "generate).",
)
def unpivot_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") < 200)
    wide = c.select("c_custkey",
                    F.round("c_acctbal", 2).alias("acctbal"),
                    F.col("c_nationkey").cast("double").alias("nationkey"))
    return (wide.unpivot("c_custkey", ["acctbal", "nationkey"],
                         "metric", "val")
            .orderBy("c_custkey", "metric"))


@query(
    "timeseries_resample",
    oracle="""
WITH agg AS (
  SELECT user_id, time_bucket(INTERVAL 1 HOUR, ts) AS b,
         count(*) AS n,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
  FROM events WHERE user_id < 5 GROUP BY 1, 2
), bounds AS (
  SELECT user_id, min(b) AS lo, max(b) AS hi FROM agg GROUP BY 1
), spine AS (
  SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS b
  FROM bounds
)
SELECT s.user_id,
       strftime(s.b, '%Y-%m-%d %H:%M:%S') AS bucket,
       coalesce(a.n, 0)                   AS n,
       a.sum_value                        AS sum_value
FROM spine s LEFT JOIN agg a ON s.user_id = a.user_id AND s.b = a.b
ORDER BY s.user_id, bucket
""",
    tags=("timeseries",),
    doc="Hypertable-style resample with gap filling "
        "(operators/timeseries.py): hourly rollup per user including "
        "empty buckets (n=0) — spine generated with sequence/explode, "
        "never a driver-side date loop.",
)
def timeseries_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import resample
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 5)
    out = resample(ev, key="user_id", ts_col="ts", interval="1 hour",
                   value_col="value")
    return (out.select(
        "user_id",
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
        "n", "sum_value")
        .orderBy("user_id", "bucket"))


@query(
    "join_asof_forward",
    oracle="""
SELECT e.event_id, e.user_id,
       strftime(e.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
       n.event_id AS next_purchase_id,
       strftime(n.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_right
FROM (SELECT * FROM events WHERE event_type = 'view') e
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') n
  ON e.user_id = n.user_id AND e.ts <= n.ts
ORDER BY e.event_id
""",
    tags=("join", "asof"),
    doc="Forward as-of join (operators/asof.py, direction='forward'): "
        "each view matched to the user's next purchase at-or-after it — "
        "same union-and-carry O(n+m) rewrite, frame flipped to "
        "[current, unbounded following].",
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import asof_join
    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view")
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .select("user_id", "ts",
                         F.col("event_id").alias("next_purchase_id")))
    out = asof_join(views, purchases, on="user_id", left_ts="ts",
                    right_ts="ts", right_values=["next_purchase_id"],
                    suffix="_right", direction="forward")
    return (out.select(
        "event_id", "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
        F.col("next_purchase_id_right").alias("next_purchase_id"),
        F.date_format("ts_right", "yyyy-MM-dd HH:mm:ss.SSSSSS")
         .alias("ts_right"))
        .orderBy("event_id"))


@query(
    "agg_hll_sketch_merge",
    oracle=None,  # Apache DataSketches HLL; bounded-error vs exact in pytest
    tags=("agg", "sketch"),
    priority=150,
    doc="Mergeable distinct-count sketches (hll_sketch_agg per nation -> "
        "hll_union_agg to region -> estimate): the re-aggregatable form "
        "of count-distinct — partial sketches persist and roll up "
        "without re-scanning, the pattern for daily->monthly rollups "
        "at 100 TB. Error bound tested in tests/test_operators.py.",
)
def agg_hll_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    per_nation = (c.groupBy("c_nationkey")
                  .agg(F.hll_sketch_agg("c_custkey").alias("sk")))
    return (per_nation.join(F.broadcast(n),
                            per_nation.c_nationkey == n.n_nationkey)
            .groupBy("n_regionkey")
            .agg(F.hll_sketch_estimate(F.hll_union_agg("sk"))
                 .alias("approx_customers"))
            .orderBy("n_regionkey"))


@query(
    "join_range_binned",
    oracle="""
SELECT i.o_orderkey AS interval_id,
       count(p.o_orderkey)          AS n_in_range,
       CAST(sum(CAST(p.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS sum_in_range
FROM (SELECT o_orderkey, o_totalprice * 0.98 AS lo, o_totalprice * 1.02 AS hi
      FROM orders WHERE o_orderkey < 500) i
LEFT JOIN (SELECT o_orderkey, o_totalprice FROM orders
           WHERE o_orderkey >= 500) p
  ON i.lo <= p.o_totalprice AND p.o_totalprice < i.hi
GROUP BY i.o_orderkey
ORDER BY interval_id
""",
    tags=("join", "range"),
    doc="Binned range join (operators/rangejoin.py): interval containment "
        "rewritten as bin equi-join + exact recheck — hash join instead "
        "of the BNLJ a naive range predicate plans; result proven equal "
        "to the naive join by this oracle.",
)
def join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rangejoin import binned_range_join
    o = load_table(spark, sf_dir, "orders")
    intervals = (o.filter(F.col("o_orderkey") < 500)
                 .select(F.col("o_orderkey").alias("interval_id"),
                         (F.col("o_totalprice") * 0.98).alias("lo"),
                         (F.col("o_totalprice") * 1.02).alias("hi")))
    points = (o.filter(F.col("o_orderkey") >= 500)
              .select(F.col("o_orderkey").alias("p_id"), "o_totalprice"))
    joined = binned_range_join(points, intervals, "o_totalprice",
                               "lo", "hi", bin_width=10_000.0)
    return (intervals.join(joined, "interval_id", "left")
            .groupBy("interval_id")
            .agg(F.count("p_id").alias("n_in_range"),
                 F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                  .cast("double").alias("sum_in_range"))
            .orderBy("interval_id"))


@query(
    "table_profile",
    oracle="""
SELECT 'c_custkey' AS col_name, count(*) AS n_rows,
       CAST(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null,
       count(DISTINCT c_custkey) AS n_distinct,
       min(CAST(c_custkey AS VARCHAR)) AS min_str,
       max(CAST(c_custkey AS VARCHAR)) AS max_str
FROM customer
UNION ALL
SELECT 'c_mktsegment', count(*),
       CAST(sum(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       count(DISTINCT c_mktsegment),
       min(c_mktsegment), max(c_mktsegment)
FROM customer
UNION ALL
SELECT 'c_name', count(*),
       CAST(sum(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       count(DISTINCT c_name),
       min(c_name), max(c_name)
FROM customer
ORDER BY col_name
""",
    tags=("profile",),
    doc="Table profiling (operators/profile.py): per-column null/distinct"
        "/min/max in ONE aggregate pass over the table (never one job "
        "per column); exact mode here for the oracle, HLL mode at scale.",
)
def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import profile
    c = load_table(spark, sf_dir, "customer")
    out = profile(c, ["c_custkey", "c_mktsegment", "c_name"], exact=True)
    return (out.withColumnRenamed("n_distinct_approx", "n_distinct")
            .withColumnRenamed("column", "col_name")
            .orderBy("col_name"))


@query(
    "map_higher_order",
    oracle="""
SELECT n_nationkey,
       array_to_string(
         list_sort([n_name || '=' || CAST(n_regionkey * 10 AS VARCHAR),
                    'code=' || CAST(n_nationkey * 10 AS VARCHAR)]), '|')
         AS values_x10,
       array_to_string(list_sort([upper(n_name), 'CODE']), '|')
                                                   AS keys_upper,
       (CASE WHEN n_regionkey > 1 THEN 1 ELSE 0 END
        + CASE WHEN n_nationkey > 1 THEN 1 ELSE 0 END) AS n_kept,
       array_to_string(
         list_sort([n_name || '=' || CAST(n_regionkey * 2 AS VARCHAR),
                    'code=' || CAST(n_nationkey * 2 AS VARCHAR)]), '|')
         AS zip_doubled
FROM nation
ORDER BY n_nationkey
""",
    tags=("functions", "map"),
    doc="Higher-order map lambdas: transform_keys / transform_values / "
        "map_filter / map_zip_with, rendered as sorted '|'-joined entry "
        "strings (map iteration order is engine-defined; array cells "
        "crash the driver canonicalizer — r2 finding); the oracle "
        "recomputes the same results from the source columns.",
)
def map_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    m = F.map_from_arrays(
        F.array(F.col("n_name"), F.lit("code")),
        F.array(F.col("n_regionkey"), F.col("n_nationkey")))

    def render(mp):
        return F.array_sort(F.transform(
            F.map_entries(mp),
            lambda e: F.concat(e.getField("key"), F.lit("="),
                               e.getField("value").cast("string"))))

    vals_x10 = F.transform_values(m, lambda k, v: v * 10)
    keys_up = F.array_sort(F.map_keys(
        F.transform_keys(m, lambda k, v: F.upper(k))))
    kept = F.size(F.map_keys(F.map_filter(m, lambda k, v: v > 1)))
    zipped = F.map_zip_with(m, m, lambda k, v1, v2: v1 + v2)
    return (n.select(
        "n_nationkey",
        F.array_join(render(vals_x10), "|").alias("values_x10"),
        F.array_join(keys_up, "|").alias("keys_upper"),
        kept.alias("n_kept"),
        F.array_join(render(zipped), "|").alias("zip_doubled"))
        .orderBy("n_nationkey"))


@query(
    "sort_nulls_ordering",
    oracle="""
SELECT c_custkey,
       CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_acctbal END AS bal
FROM customer
WHERE c_custkey < 400
ORDER BY bal ASC NULLS FIRST, c_custkey
""",
    tags=("sort",),
    doc="Explicit NULL placement in sorts (asc_nulls_first + tie-break): "
        "cross-engine default null order differs, so the declared "
        "surface always pins it (SURVEY §7.5 rule 5).",
)
def sort_nulls_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 400)
    bal = F.when(F.col("c_custkey") % 7 == 0, None) \
           .otherwise(F.col("c_acctbal"))
    return (c.select("c_custkey", bal.alias("bal"))
            .orderBy(F.asc_nulls_first("bal"), F.asc("c_custkey")))


@query(
    "misc_encodings",
    oracle="""
SELECT p_partkey,
       upper(hex(p_partkey))                         AS key_hex,
       to_base64(CAST(p_brand AS BLOB))              AS brand_b64,
       ascii(p_name)                                 AS first_cp,
       chr(65 + CAST(p_partkey % 26 AS INTEGER))     AS letter
FROM part
WHERE p_partkey < 300
ORDER BY p_partkey
""",
    tags=("functions",),
    doc="Encoding functions: hex, base64, ascii, chr (uppercased hex on "
        "both sides — engines disagree on hex case).",
)
def misc_encodings(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 300)
    return (p.select(
        "p_partkey",
        F.upper(F.hex("p_partkey")).alias("key_hex"),
        F.base64(F.col("p_brand").cast("binary")).alias("brand_b64"),
        F.ascii("p_name").alias("first_cp"),
        F.chr(F.lit(65) + F.col("p_partkey") % 26).alias("letter"))
        .orderBy("p_partkey"))


@query(
    "json_variant",
    oracle="""
SELECT event_id,
       CAST(json_extract(props, '$.k') AS BIGINT) AS k,
       (CASE WHEN json_valid(props) THEN 1 ELSE 0 END) AS is_valid,
       0 AS bad_parsed
FROM events
WHERE event_id < 2000
ORDER BY event_id
""",
    tags=("functions", "json", "variant"),
    doc="Spark 4 VariantType: parse_json -> binary variant encoding -> "
        "typed variant_get extraction, with try_parse_json returning "
        "NULL on malformed input — the modern semi-structured column "
        "(open-ended JSON without string re-parsing per access).",
)
def json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    v = F.parse_json("props")
    return (ev.select(
        "event_id",
        F.variant_get(v, "$.k", "bigint").alias("k"),
        F.when(F.try_parse_json(F.col("props")).isNotNull(), 1)
         .otherwise(0).alias("is_valid"),
        F.when(F.try_parse_json(F.lit("{not json")).isNotNull(), 1)
         .otherwise(0).alias("bad_parsed"))
        .orderBy("event_id"))


@query(
    "sample_stratified",
    oracle="""
SELECT event_id, user_id, event_type
FROM events
WHERE substr(md5(CAST(event_id AS VARCHAR)), 1, 2) <
      CASE event_type
        WHEN 'view' THEN '0d'
        WHEN 'purchase' THEN '33'
        ELSE '1a' END
ORDER BY event_id
""",
    tags=("sample",),
    doc="Deterministic stratified sampling "
        "(operators/sampling.py:hash_stratified_sample): per-stratum "
        "rates (~5% views, ~20% purchases, ~10% rest) as a CASE over "
        "the row's md5 bucket — sampleBy semantics with cross-engine, "
        "cross-run, cross-partitioning stability; one scan, no shuffle, "
        "predicate inside codegen.",
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import hash_stratified_sample
    ev = load_table(spark, sf_dir, "events")
    out = hash_stratified_sample(
        ev, key_col="event_id", stratum_col="event_type",
        fractions={"view": 13 / 256, "purchase": 51 / 256},
        default_frac=26 / 256)
    return out.select("event_id", "user_id", "event_type").orderBy("event_id")


@query(
    "scd2_intervals",
    oracle="""
WITH src AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_id % 7 = 0 THEN NULL ELSE event_type END
           AS event_type
  FROM events WHERE user_id < 20
), ordered AS (
  SELECT user_id, ts, event_id, event_type,
         lag(event_type) OVER w AS prev,
         row_number()    OVER w AS rn
  FROM src
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), changes AS (
  SELECT user_id, event_type, ts AS valid_from, event_id
  FROM ordered WHERE rn = 1 OR prev IS DISTINCT FROM event_type
)
SELECT user_id, event_type,
       strftime(valid_from, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
       strftime(lead(valid_from)
                  OVER (PARTITION BY user_id ORDER BY valid_from, event_id),
                '%Y-%m-%d %H:%M:%S.%f') AS valid_to
FROM changes
ORDER BY user_id, valid_from
""",
    tags=("etl", "window"),
    doc="SCD2 dimension build (operators/scd.py:scd2_intervals): "
        "per-user event_type change runs collapsed to validity "
        "intervals [valid_from, valid_to), latest row open (NULL). "
        "Every 7th event's attr is NULLed so NULL runs and value<->NULL "
        "transitions are exercised (null-safe change detection). "
        "Change detection and interval close share one (key, ts) sort "
        "=> single shuffle.",
)
def scd2_intervals_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.scd import scd2_intervals
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("user_id") < 20)
          .withColumn("event_type",
                      F.when(F.col("event_id") % 7 == 0, None)
                       .otherwise(F.col("event_type"))))
    out = scd2_intervals(ev, key="user_id", ts_col="ts",
                         attr="event_type", tie_break=("event_id",))
    return (out.select(
        "user_id", "event_type",
        F.date_format("valid_from", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .alias("valid_from"),
        F.date_format("valid_to", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .alias("valid_to"))
        .orderBy("user_id", "valid_from"))


@query(
    "sample_holdout_split",
    oracle="""
WITH s AS (
  SELECT CASE WHEN substring(md5(CAST(o_custkey AS VARCHAR)), 1, 2) < '33'
              THEN 'holdout' ELSE 'train' END AS split,
         o_custkey, o_totalprice
  FROM orders
)
SELECT split, count(*) AS n_orders,
       count(DISTINCT o_custkey) AS n_customers,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS sum_total
FROM s GROUP BY split ORDER BY split
""",
    tags=("sample",),
    doc="Leakage-safe train/holdout split (operators/sampling.py:"
        "holdout_split): assignment is md5(o_custkey) under threshold "
        "0x33 (51/256 ~ 20%), so every order of a customer lands on the "
        "same side — the group-aware split an eval set needs. Zero "
        "shuffles for the labeling; the probe aggregates per side to "
        "prove both membership and group integrity (n_customers sums "
        "to the distinct-key total).",
)
def sample_holdout_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import holdout_split
    o = load_table(spark, sf_dir, "orders")
    s = holdout_split(o, "o_custkey", 51 / 256)
    return (s.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
         .cast("double").alias("sum_total"))
        .orderBy("split"))


@query(
    "sample_kfold",
    oracle="""
WITH f AS (
  SELECT o_custkey, o_totalprice,
         CASE WHEN substring(md5(CAST(o_custkey AS VARCHAR)), 1, 2) < '33'
                THEN 0
              WHEN substring(md5(CAST(o_custkey AS VARCHAR)), 1, 2) < '66'
                THEN 1
              WHEN substring(md5(CAST(o_custkey AS VARCHAR)), 1, 2) < '9a'
                THEN 2
              WHEN substring(md5(CAST(o_custkey AS VARCHAR)), 1, 2) < 'cd'
                THEN 3
              ELSE 4 END AS fold
  FROM orders
)
SELECT CAST(fold AS INTEGER) AS fold, count(*) AS n_orders,
       count(DISTINCT o_custkey) AS n_customers,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS sum_total
FROM f GROUP BY fold ORDER BY fold
""",
    tags=("sample",),
    doc="Deterministic 5-fold CV assignment (operators/sampling.py:"
        "kfold_assign): fold = contiguous md5-bucket range of the GROUP "
        "key (thresholds round(i*256/5) -> 33/66/9a/cd), so folds are "
        "group-consistent, ~equal mass, engine-portable (prefix "
        "compares, no hex->int casts), and stable under incremental "
        "loads. Zero shuffles for the labeling.",
)
def sample_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import kfold_assign
    o = load_table(spark, sf_dir, "orders")
    s = kfold_assign(o, "o_custkey", k=5)
    return (s.groupBy("fold").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
         .cast("double").alias("sum_total"))
        .orderBy("fold"))


@query(
    "join_point_in_time_scd2",
    oracle="""
WITH src AS (
  SELECT user_id, ts, event_id, event_type FROM events
  WHERE user_id < 20 AND event_id % 2 = 0
), ordered AS (
  SELECT user_id, ts, event_id, event_type,
         lag(event_type) OVER w AS prev, row_number() OVER w AS rn
  FROM src WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), changes AS (
  SELECT user_id, event_type, ts AS valid_from, event_id
  FROM ordered WHERE rn = 1 OR prev IS DISTINCT FROM event_type
), dim AS (
  SELECT user_id, event_type AS attr, valid_from,
         lead(valid_from) OVER (PARTITION BY user_id
                                ORDER BY valid_from, event_id) AS valid_to
  FROM changes
), facts AS (
  SELECT user_id, ts, event_id FROM events
  WHERE user_id < 20 AND event_id % 2 = 1
)
SELECT f.user_id AS user_id, f.event_id,
       strftime(f.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts, d.attr
FROM facts f LEFT JOIN dim d
  ON f.user_id = d.user_id AND d.valid_from <= f.ts
 AND (d.valid_to IS NULL OR f.ts < d.valid_to)
ORDER BY f.user_id, f.event_id
""",
    tags=("etl", "join"),
    doc="Point-in-time (temporal) dimension lookup (operators/scd.py:"
        "point_in_time_join): facts join the SCD2 row valid at event "
        "time. Because scd2_intervals emits CONTIGUOUS per-key "
        "intervals, range containment reduces to an as-of join — one "
        "shuffle, no bin replication, no post-join dedup; the oracle "
        "recomputes with explicit [valid_from, valid_to) containment, "
        "proving the reduction. Facts before a key's first interval "
        "keep NULL attrs (left join).",
)
def join_point_in_time_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.scd import point_in_time_join, scd2_intervals
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    dim = scd2_intervals(ev.filter(F.col("event_id") % 2 == 0),
                         key="user_id", ts_col="ts", attr="event_type",
                         tie_break=("event_id",))
    facts = (ev.filter(F.col("event_id") % 2 == 1)
             .select("user_id", "event_id", "ts"))
    out = point_in_time_join(facts, dim, key="user_id", fact_ts="ts",
                             attr="event_type")
    return (out.select(
        "user_id", "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
        F.col("event_type").alias("attr"))
        .orderBy("user_id", "event_id"))


@query(
    "sample_temperature_mixture",
    oracle="""
WITH counts AS (
  SELECT source, count(*) AS n,
         CAST(floor(sqrt(count(*)) * 1000000) AS BIGINT) AS w
  FROM documents GROUP BY source
), tot AS (SELECT sum(w) AS tw FROM counts),
lk AS (
  SELECT source,
         CASE WHEN floor(256.0 * 1000 * w / (tw * n)) >= 256 THEN 'g0'
              ELSE lpad(lower(to_hex(CAST(floor(256.0 * 1000 * w
                                                / (tw * n)) AS INTEGER))),
                        2, '0') END AS th
  FROM counts, tot
)
SELECT d.source AS source, count(*) AS n_kept,
       count(DISTINCT d.doc_id) AS n_docs
FROM documents d JOIN lk ON d.source = lk.source
WHERE substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 2) < lk.th
GROUP BY 1 ORDER BY 1
""",
    tags=("sample", "llm"),
    doc="Temperature-flattened source mixing (operators/sampling.py:"
        "temperature_mixture_sample, alpha=0.5, target 1000): kept "
        "counts proportional to sqrt(n_source) — the T5/mT5 mixture "
        "step. Thresholds derive from integer-quantized sqrt weights "
        "(sqrt is the one IEEE-correctly-rounded power, and the "
        "quantization makes the denominator an exact integer sum), so "
        "membership is engine-portable. Zero data shuffles: stratum "
        "counts broadcast back, keep predicate in codegen.",
)
def sample_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import temperature_mixture_sample
    d = load_table(spark, sf_dir, "documents")
    s = temperature_mixture_sample(d, "doc_id", "source",
                                   target_rows=1000, alpha=0.5)
    return (s.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.countDistinct("doc_id").alias("n_docs"))
        .orderBy("source"))


@query(
    "pivot_event_type_counts",
    oracle="""
SELECT user_id,
       CAST(sum(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS click,
       CAST(sum(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS error,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
       CAST(sum(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS signup,
       CAST(sum(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS view
FROM events WHERE user_id < 200
GROUP BY user_id ORDER BY user_id
""",
    tags=("agg", "pivot"),
    doc="Wide pivot (long->wide reshape): groupBy(user).pivot(type) "
        "with an EXPLICIT value list — without it Spark runs an eager "
        "distinct scan to discover columns (construction-purity "
        "violation) and the output schema becomes data-dependent. "
        "Missing (user, type) combos fill 0, matching the conditional-"
        "aggregation oracle. Compiles to one ordinary hash aggregate "
        "(pivot_col, value) pairs wide — one shuffle, no extra pass.",
)
def pivot_event_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 200)
    types = ["click", "error", "purchase", "signup", "view"]
    return (ev.groupBy("user_id")
            .pivot("event_type", types)
            .agg(F.count(F.lit(1)))
            .na.fill(0, types)
            .orderBy("user_id"))


@query(
    "unpivot_order_measures",
    oracle="""
SELECT o_orderkey, 'custkey_d' AS measure,
       CAST(o_custkey AS DOUBLE) AS val
FROM orders WHERE o_orderkey < 2000
UNION ALL
SELECT o_orderkey, 'o_year', CAST(year(o_orderdate) AS DOUBLE)
FROM orders WHERE o_orderkey < 2000
UNION ALL
SELECT o_orderkey, 'price', round(o_totalprice, 2)
FROM orders WHERE o_orderkey < 2000
ORDER BY o_orderkey, measure
""",
    tags=("pivot",),
    doc="Unpivot (wide->long reshape, SQL stack/UNPIVOT): three order "
        "measures melt into (key, measure, val) rows. Spark's unpivot "
        "is a zero-shuffle map-side Expand (each input row emits N "
        "output rows in place) — the oracle's UNION ALL of three scans "
        "computes the same multiset, proving the reshape.",
)
def unpivot_order_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") < 2000)
    wide = o.select(
        "o_orderkey",
        F.col("o_custkey").cast("double").alias("custkey_d"),
        F.year("o_orderdate").cast("double").alias("o_year"),
        F.round("o_totalprice", 2).alias("price"))
    return (wide.unpivot("o_orderkey", ["custkey_d", "o_year", "price"],
                         "measure", "val")
            .orderBy("o_orderkey", "measure"))
