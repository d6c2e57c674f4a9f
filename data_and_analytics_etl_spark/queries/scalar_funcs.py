"""Scalar function surface probes (SURVEY §2.2 "Scalar functions").

One probe per family — string, date/time, math, array, higher-order, map,
JSON, hash, cast — each exercising the declared functions over real corpus
columns. All expressions are JVM built-ins inside whole-stage codegen; no
Python UDFs anywhere in this module.

Cross-engine notes (vs DuckDB 1.0 oracle):
- DuckDB ``CAST(double AS INT)`` rounds, Spark truncates → oracles use
  ``trunc()`` explicitly.
- DuckDB ``dayofweek`` is 0=Sunday, Spark is 1=Sunday → oracle adds 1.
- DuckDB list_distinct/list_intersect return unordered lists → both sides
  sort before comparison (SURVEY §7.5 rule 4).
- Functions DuckDB lacks (initcap, sha1, crc32, xxhash64, months_between,
  soundex) are covered by a rows-only probe so the surface is still
  declared and smoke-run.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from .registry import query


@query(
    "string_funcs",
    oracle="""
SELECT p_partkey,
       concat(p_brand, '-', p_type)            AS brand_type,
       concat_ws('/', p_brand, p_name)         AS ws_joined,
       upper(p_name)                           AS up_name,
       lower(p_brand)                          AS low_brand,
       substring(p_name, 1, 10)                AS name10,
       length(p_name)                          AS name_len,
       replace(p_name, ' ', '_')               AS name_us,
       len(string_split(p_name, ' '))          AS n_words,
       instr(p_name, 'o')                      AS first_o,
       reverse(p_brand)                        AS rev_brand,
       repeat(p_brand, 2)                      AS brand2,
       left(p_name, 5)                         AS left5,
       right(p_name, 5)                        AS right5,
       lpad(CAST(p_size AS VARCHAR), 4, '0')   AS size_pad,
       rpad(p_brand, 12, '.')                  AS brand_pad,
       trim(concat(' ', p_brand, ' '))         AS trimmed,
       translate(p_brand, 'ABE', 'xyz')        AS translated,
       regexp_extract(p_name, '([a-z]+)', 1)   AS first_word,
       regexp_replace(p_name, '[aeiou]', '*', 'g')  AS devoweled,
       levenshtein(p_brand, left(p_type, 8))   AS lev_dist,
       printf('%s-%03d', p_brand, p_size)      AS formatted
FROM part
WHERE p_partkey < 120
ORDER BY p_partkey
""",
    tags=("functions",),
    doc="String function family over part names.",
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 120)
    return (
        p.select(
            "p_partkey",
            F.concat(F.col("p_brand"), F.lit("-"), F.col("p_type")).alias("brand_type"),
            F.concat_ws("/", "p_brand", "p_name").alias("ws_joined"),
            F.upper("p_name").alias("up_name"),
            F.lower("p_brand").alias("low_brand"),
            F.substring("p_name", 1, 10).alias("name10"),
            F.length("p_name").alias("name_len"),
            F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_us"),
            F.size(F.split("p_name", " ")).alias("n_words"),
            F.instr("p_name", "o").alias("first_o"),
            F.reverse("p_brand").alias("rev_brand"),
            F.repeat("p_brand", 2).alias("brand2"),
            F.expr("left(p_name, 5)").alias("left5"),
            F.expr("right(p_name, 5)").alias("right5"),
            F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
            F.rpad("p_brand", 12, ".").alias("brand_pad"),
            F.trim(F.concat(F.lit(" "), F.col("p_brand"), F.lit(" "))).alias("trimmed"),
            F.translate("p_brand", "ABE", "xyz").alias("translated"),
            F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
            F.regexp_replace("p_name", "[aeiou]", "*").alias("devoweled"),
            F.levenshtein("p_brand", F.expr("left(p_type, 8)")).alias("lev_dist"),
            F.format_string("%s-%03d", "p_brand", "p_size").alias("formatted"))
        .orderBy("p_partkey")
    )


@query(
    "string_funcs_spark_only",
    oracle=None,  # initcap/sha1/crc32/xxhash64/soundex absent from DuckDB
    tags=("functions",),
    priority=150,
    doc="Declared string/hash functions DuckDB can't mirror (rows-only).",
)
def string_funcs_spark_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 50)
    return (
        p.select(
            "p_partkey",
            F.initcap("p_name").alias("init_name"),
            F.sha1(F.col("p_name").cast("binary")).alias("sha1_name"),
            F.crc32(F.col("p_name").cast("binary")).alias("crc32_name"),
            F.xxhash64("p_name").alias("xx64_name"),
            F.soundex("p_brand").alias("soundex_brand"),
            F.months_between(
                F.lit("2024-03-31").cast("date"),
                F.lit("2024-01-31").cast("date")).alias("mb"))
        .orderBy("p_partkey")
    )


@query(
    "date_funcs",
    oracle="""
SELECT o_orderkey,
       year(o_orderdate)                          AS yr,
       quarter(o_orderdate)                       AS qtr,
       month(o_orderdate)                         AS mon,
       day(o_orderdate)                           AS dom,
       dayofweek(o_orderdate) + 1                 AS dow,
       strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d')  AS plus30,
       strftime(CAST(o_orderdate AS DATE) - 7, '%Y-%m-%d')   AS minus7,
       date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k,
       strftime(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3mo,
       strftime(last_day(o_orderdate), '%Y-%m-%d')           AS month_end,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d %H:%M:%S') AS month_start,
       CAST(epoch(o_orderdate) AS BIGINT)                    AS unix_ts,
       strftime(to_timestamp(epoch(o_orderdate)), '%Y-%m-%d %H:%M:%S') AS roundtrip,
       strftime(make_date(year(o_orderdate), month(o_orderdate), 1), '%Y-%m-%d')
         AS first_of_month
FROM orders
WHERE o_orderkey < 200
ORDER BY o_orderkey
""",
    tags=("functions",),
    doc="Date/time family: extraction, arithmetic, trunc, epoch roundtrip.",
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    d = F.col("o_orderdate")
    return (
        o.select(
            "o_orderkey",
            F.year(d).alias("yr"),
            F.quarter(d).alias("qtr"),
            F.month(d).alias("mon"),
            F.dayofmonth(d).alias("dom"),
            F.dayofweek(d).alias("dow"),
            F.date_format(F.date_add(d.cast("date"), 30), "yyyy-MM-dd")
             .alias("plus30"),
            F.date_format(F.date_sub(d.cast("date"), 7), "yyyy-MM-dd")
             .alias("minus7"),
            F.datediff(F.lit("2000-01-01").cast("date"), d.cast("date"))
             .cast("long").alias("days_to_y2k"),
            F.date_format(F.add_months(d, 3), "yyyy-MM-dd").alias("plus3mo"),
            F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
            F.date_format(F.date_trunc("month", d), "yyyy-MM-dd HH:mm:ss")
             .alias("month_start"),
            F.unix_timestamp(d).alias("unix_ts"),
            F.from_unixtime(F.unix_timestamp(d), "yyyy-MM-dd HH:mm:ss")
             .alias("roundtrip"),
            F.date_format(F.make_date(F.year(d), F.month(d), F.lit(1)),
                          "yyyy-MM-dd").alias("first_of_month"))
        .orderBy("o_orderkey")
    )


@query(
    "date_parse_dual_format",
    oracle="""
WITH stamped AS (
  SELECT event_id,
         CASE WHEN event_id % 2 = 0
              THEN strftime(ts, '%Y-%m-%dT%H:%M:%S.%f') || 'Z'
              ELSE strftime(ts, '%Y-%m-%dT%H:%M:%S.%f') END AS raw_ts
  FROM events WHERE user_id < 5
)
SELECT event_id, raw_ts,
       strftime(
         coalesce(try_strptime(raw_ts, '%Y-%m-%dT%H:%M:%S.%fZ'),
                  try_strptime(raw_ts, '%Y-%m-%dT%H:%M:%S.%f')),
         '%Y-%m-%d %H:%M:%S.%f') AS parsed
FROM stamped
ORDER BY event_id
""",
    tags=("functions", "etl"),
    doc="Dual-format timestamp parse — the reference's indexed_on handling "
        "(CommCareAPIHandler.py:236-238) as a coalesce of try_to_timestamp.",
)
def date_parse_dual_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 5)
    raw = F.when(
        F.col("event_id") % 2 == 0,
        F.concat(F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"), F.lit("Z")),
    ).otherwise(F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"))
    stamped = ev.select("event_id", raw.alias("raw_ts"))
    parsed = F.coalesce(
        F.try_to_timestamp(F.col("raw_ts"), F.lit("yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")),
        F.try_to_timestamp(F.col("raw_ts"), F.lit("yyyy-MM-dd'T'HH:mm:ss.SSSSSS")))
    return (
        stamped.select(
            "event_id", "raw_ts",
            F.date_format(parsed, "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("parsed"))
        .orderBy("event_id")
    )


@query(
    "math_funcs",
    oracle="""
SELECT l_orderkey, l_linenumber,
       abs(l_discount - 0.05)                       AS abs_d,
       CAST(ceil(l_extendedprice / 1000) AS BIGINT)  AS ceil_k,
       CAST(floor(l_extendedprice / 1000) AS BIGINT) AS floor_k,
       round(l_extendedprice, 1)                    AS round1,
       round(pow(l_quantity, 2), 4)                 AS qty_sq,
       round(sqrt(l_extendedprice), 6)              AS sqrt_p,
       round(cbrt(l_extendedprice), 6)              AS cbrt_p,
       round(exp(l_discount), 8)                    AS exp_d,
       round(ln(l_extendedprice), 8)                AS ln_p,
       round(log10(l_extendedprice), 8)             AS log10_p,
       round(log2(l_extendedprice), 8)              AS log2_p,
       CAST(mod(l_orderkey, 7) AS BIGINT)           AS mod7,
       CAST(sign(l_discount - 0.05) AS DOUBLE)      AS sgn,
       greatest(l_quantity, l_linenumber * 10.0)    AS gr,
       least(l_quantity, l_linenumber * 10.0)       AS le,
       round(radians(l_quantity), 8)                AS rad,
       round(degrees(l_discount), 8)                AS deg,
       round(sin(l_discount), 8)                    AS sin_d,
       round(cos(l_discount), 8)                    AS cos_d,
       round(atan2(l_quantity, l_extendedprice), 8) AS at2,
       CAST(factorial(l_linenumber) AS BIGINT)      AS fact_line
FROM lineitem
WHERE l_orderkey < 60
ORDER BY l_orderkey, l_linenumber
""",
    tags=("functions",),
    priority=100,
    doc="Math family: rounding, roots, logs, trig, modular.",
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 60)
    return (
        li.select(
            "l_orderkey", "l_linenumber",
            F.abs(F.col("l_discount") - 0.05).alias("abs_d"),
            F.ceil(F.col("l_extendedprice") / 1000).alias("ceil_k"),
            F.floor(F.col("l_extendedprice") / 1000).alias("floor_k"),
            F.round("l_extendedprice", 1).alias("round1"),
            F.round(F.pow("l_quantity", F.lit(2)), 4).alias("qty_sq"),
            F.round(F.sqrt("l_extendedprice"), 6).alias("sqrt_p"),
            F.round(F.cbrt("l_extendedprice"), 6).alias("cbrt_p"),
            F.round(F.exp("l_discount"), 8).alias("exp_d"),
            F.round(F.log("l_extendedprice"), 8).alias("ln_p"),
            F.round(F.log10("l_extendedprice"), 8).alias("log10_p"),
            F.round(F.log2("l_extendedprice"), 8).alias("log2_p"),
            (F.col("l_orderkey") % 7).alias("mod7"),
            F.signum(F.col("l_discount") - 0.05).alias("sgn"),
            F.greatest(F.col("l_quantity"), F.col("l_linenumber") * 10.0).alias("gr"),
            F.least(F.col("l_quantity"), F.col("l_linenumber") * 10.0).alias("le"),
            F.round(F.radians("l_quantity"), 8).alias("rad"),
            F.round(F.degrees("l_discount"), 8).alias("deg"),
            F.round(F.sin("l_discount"), 8).alias("sin_d"),
            F.round(F.cos("l_discount"), 8).alias("cos_d"),
            F.round(F.atan2(F.col("l_quantity"), F.col("l_extendedprice")), 8)
             .alias("at2"),
            F.factorial("l_linenumber").alias("fact_line"))
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "array_funcs",
    oracle="""
WITH arr AS (
  SELECT p_partkey,
         string_split(p_name, ' ')   AS words,
         range(1, (p_size % 5) + 3)  AS seq
  FROM part WHERE p_partkey < 100
)
SELECT p_partkey,
       len(words)                                           AS n_words,
       list_contains(words, 'green')                        AS has_green,
       list_position(words, 'green')                        AS green_pos,
       words[1]                                             AS first_word,
       array_to_string(list_sort(words), ',')               AS sorted_words,
       array_to_string(list_sort(list_distinct(words)), ',') AS uniq_words,
       list_max(seq)                                        AS seq_max,
       list_min(seq)                                        AS seq_min,
       array_to_string(array_slice(words, 2, 3), ',')       AS mid_words,
       array_to_string(flatten([seq, [100, 200]]), ',')     AS flat,
       array_to_string(list_sort(list_intersect(seq, [2, 3, 4])), ',') AS inter,
       len(list_concat(words, ['x']))                       AS n_plus1
FROM arr
ORDER BY p_partkey
""",
    tags=("functions",),
    doc="Array family: construct, search, sort, slice, flatten, set ops.",
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 100)
    arr = p.select(
        "p_partkey",
        F.split("p_name", " ").alias("words"),
        F.sequence(F.lit(1), (F.col("p_size") % 5) + 2).alias("seq"))
    return (
        arr.select(
            "p_partkey",
            F.size("words").alias("n_words"),
            F.array_contains("words", "green").alias("has_green"),
            F.array_position("words", "green").cast("int").alias("green_pos"),
            F.element_at("words", 1).alias("first_word"),
            F.array_join(F.array_sort("words"), ",").alias("sorted_words"),
            F.array_join(F.array_sort(F.array_distinct("words")), ",")
             .alias("uniq_words"),
            F.array_max("seq").alias("seq_max"),
            F.array_min("seq").alias("seq_min"),
            F.array_join(F.slice("words", 2, 2), ",").alias("mid_words"),
            F.array_join(
                F.flatten(F.array("seq", F.array(F.lit(100), F.lit(200)))), ",")
             .alias("flat"),
            F.array_join(
                F.array_sort(F.array_intersect(
                    "seq", F.array(F.lit(2), F.lit(3), F.lit(4)))), ",")
             .alias("inter"),
            F.size(F.concat(F.col("words"), F.array(F.lit("x")))).alias("n_plus1"))
        .orderBy("p_partkey")
    )


@query(
    "array_explode_wordcount",
    oracle="""
SELECT word, count(*) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS word
      FROM documents WHERE doc_id < 100)
WHERE word <> ''
GROUP BY word
ORDER BY n DESC, word
LIMIT 30
""",
    tags=("functions", "text"),
    doc="explode (lateral unnest) → word frequency over documents.",
)
def array_explode_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return (
        d.select(F.explode(F.split("text", " ")).alias("word"))
         .filter(F.col("word") != "")
         .groupBy("word")
         .agg(F.count(F.lit(1)).alias("n"))
         .orderBy(F.desc("n"), F.asc("word"))
         .limit(30)
    )


@query(
    "higher_order_funcs",
    oracle="""
WITH arr AS (
  SELECT l_orderkey,
         list(CAST(l_quantity AS DOUBLE) ORDER BY l_linenumber, l_quantity) AS qtys
  FROM lineitem WHERE l_orderkey < 120
  GROUP BY l_orderkey
)
SELECT l_orderkey,
       array_to_string(list_transform(qtys, x -> round(x * 2, 2)), ',') AS doubled,
       len(list_filter(qtys, x -> x > 25))                              AS n_big,
       round(list_sum(qtys), 2)                                         AS total,
       round(list_reduce(qtys, (a, b) -> a + b), 2)                     AS total_reduce,
       len(list_filter(qtys, x -> x > 10)) > 0                          AS any_gt10,
       len(list_filter(qtys, x -> NOT (x > 1))) = 0                     AS all_gt1
FROM arr
ORDER BY l_orderkey
""",
    tags=("functions",),
    doc="Higher-order lambdas: transform, filter, aggregate/reduce, "
        "exists, forall.",
)
def higher_order_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 120)
    arr = (li.groupBy("l_orderkey")
             .agg(F.array_sort(
                 F.collect_list(F.struct("l_linenumber", F.col("l_quantity")
                                          .cast("double").alias("q"))))
                  .alias("pairs"))
             .select("l_orderkey",
                     F.transform("pairs", lambda s: s.q).alias("qtys")))
    return (
        arr.select(
            "l_orderkey",
            F.array_join(
                F.transform("qtys", lambda x: F.round(x * 2, 2)), ",")
             .alias("doubled"),
            F.size(F.filter("qtys", lambda x: x > 25)).alias("n_big"),
            F.round(F.aggregate(
                "qtys", F.lit(0.0),
                lambda acc, x: acc + x), 2).alias("total"),
            F.round(F.reduce(
                "qtys", F.lit(0.0),
                lambda acc, x: acc + x), 2).alias("total_reduce"),
            F.exists("qtys", lambda x: x > 10).alias("any_gt10"),
            F.forall("qtys", lambda x: x > 1).alias("all_gt1"))
        .orderBy("l_orderkey")
    )


@query(
    "map_funcs",
    oracle="""
SELECT n_nationkey,
       cardinality(m)                                    AS m_size,
       map_extract(m, 'name')[1]                         AS name_val,
       array_to_string(list_sort(map_keys(m)), ',')      AS keys_sorted,
       array_to_string(list_sort(map_values(m)), ',')    AS vals_sorted
FROM (
  SELECT n_nationkey,
         map(['name', 'region'],
             [n_name, CAST(n_regionkey AS VARCHAR)]) AS m
  FROM nation
)
ORDER BY n_nationkey
""",
    tags=("functions",),
    doc="Map family: construct from arrays, extract, keys/values.",
)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    m = F.map_from_arrays(
        F.array(F.lit("name"), F.lit("region")),
        F.array(F.col("n_name"), F.col("n_regionkey").cast("string")))
    return (
        n.select("n_nationkey", m.alias("m"))
         .select(
             "n_nationkey",
             F.size("m").alias("m_size"),
             F.element_at("m", "name").alias("name_val"),
             F.array_join(F.array_sort(F.map_keys("m")), ",").alias("keys_sorted"),
             F.array_join(F.array_sort(F.map_values("m")), ",").alias("vals_sorted"))
         .orderBy("n_nationkey")
    )


@query(
    "json_funcs",
    oracle="""
SELECT event_id,
       json_extract_string(props, '$.k')             AS k_str,
       CAST(json_extract(props, '$.k') AS INTEGER)   AS k_int,
       CAST(json_extract(props, '$.k') AS INTEGER) * 2 AS k_doubled,
       to_json(struct_pack(id := event_id, typ := event_type)) AS packed
FROM events
WHERE user_id < 5
ORDER BY event_id
""",
    tags=("functions",),
    doc="JSON family: extraction from the events.props JSON string, "
        "struct → JSON serialization.",
)
def json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 5)
    return (
        ev.select(
            "event_id",
            F.get_json_object("props", "$.k").alias("k_str"),
            F.get_json_object("props", "$.k").cast("int").alias("k_int"),
            (F.get_json_object("props", "$.k").cast("int") * 2).alias("k_doubled"),
            F.to_json(F.struct(F.col("event_id").alias("id"),
                               F.col("event_type").alias("typ"))).alias("packed"))
        .orderBy("event_id")
    )


@query(
    "hash_funcs",
    oracle="""
SELECT p_partkey,
       md5(p_name)    AS md5_name,
       sha256(p_name) AS sha256_name
FROM part
WHERE p_partkey < 80
ORDER BY p_partkey
""",
    tags=("functions",),
    doc="Cryptographic hashes shared across engines (md5, sha256).",
)
def hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 80)
    return (
        p.select(
            "p_partkey",
            F.md5(F.col("p_name").cast("binary")).alias("md5_name"),
            F.sha2(F.col("p_name").cast("binary"), 256).alias("sha256_name"))
        .orderBy("p_partkey")
    )


@query(
    "cast_funcs",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(trunc(l_extendedprice) AS BIGINT)     AS price_int,
       CAST(l_quantity AS VARCHAR)                AS qty_str,
       CAST(CAST(l_quantity AS VARCHAR) AS DOUBLE) AS qty_roundtrip,
       try_cast(l_returnflag AS INTEGER)          AS flag_as_int,
       try_cast('123' AS INTEGER)                 AS ok_int,
       CAST(l_quantity > 25 AS INTEGER)           AS bool_int,
       CAST(l_linenumber AS SMALLINT)             AS line_small,
       CAST(l_linenumber AS DOUBLE)               AS line_dbl,
       strftime(CAST('2024-06-01 12:30:45' AS TIMESTAMP), '%Y-%m-%d %H:%M:%S')
         AS ts_from_str
FROM lineitem
WHERE l_orderkey < 50
ORDER BY l_orderkey, l_linenumber
""",
    tags=("functions",),
    doc="Cast matrix incl. try_cast → NULL on bad input (non-ANSI).",
)
def cast_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 50)
    return (
        li.select(
            "l_orderkey", "l_linenumber",
            F.col("l_extendedprice").cast("long").alias("price_int"),
            F.col("l_quantity").cast("string").alias("qty_str"),
            F.col("l_quantity").cast("string").cast("double").alias("qty_roundtrip"),
            F.expr("try_cast(l_returnflag AS INT)").alias("flag_as_int"),
            F.expr("try_cast('123' AS INT)").alias("ok_int"),
            (F.col("l_quantity") > 25).cast("int").alias("bool_int"),
            F.col("l_linenumber").cast("short").alias("line_small"),
            F.col("l_linenumber").cast("double").alias("line_dbl"),
            F.date_format(F.lit("2024-06-01 12:30:45").cast("timestamp"),
                          "yyyy-MM-dd HH:mm:ss").alias("ts_from_str"))
        .orderBy("l_orderkey", "l_linenumber")
    )
