"""UDF-surface probes: each tier hash-checked against a pure-SQL oracle.

The oracle is the built-in formulation of the same logic, so a pass
proves the UDF tier produces identical results to the expression it
would replace — and documents that the expression form exists (the one
to prefer in hot paths, SURVEY §7.4).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table, register_all
from ..functions.udfs import (grouped_weighted_avg, price_band,
                              register_sql_udfs, tokenize_udtf,
                              vectorized_label)
from .registry import query


@query(
    "udf_scalar",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice < 50000 THEN 'low'
            WHEN o_totalprice < 150000 THEN 'mid'
            ELSE 'high' END AS band
FROM orders
WHERE o_orderkey < 2000
ORDER BY o_orderkey
""",
    tags=("udf",),
    priority=100,
    doc="Scalar Python @udf (row-at-a-time tier) == CASE expression.",
)
def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    return (o.select("o_orderkey",
                     price_band(F.col("o_totalprice")).alias("band"))
            .orderBy("o_orderkey"))


@query(
    "udf_pandas_scalar",
    oracle="""
SELECT p_partkey,
       upper(p_brand) || ':' || CAST(length(p_name) AS VARCHAR) AS label
FROM part
WHERE p_partkey < 500
ORDER BY p_partkey
""",
    tags=("udf",),
    priority=100,
    doc="Vectorized @pandas_udf (Arrow batch tier) == string built-ins.",
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 500)
    return (p.select("p_partkey",
                     vectorized_label(F.col("p_brand"), F.col("p_name"))
                     .alias("label"))
            .orderBy("p_partkey"))


@query(
    "udf_grouped_agg",
    oracle="""
SELECT l_returnflag,
       round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4)
         AS wavg_price
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    tags=("udf",),
    priority=100,
    doc="Grouped-agg pandas UDAF == sum(x*w)/sum(w) built-in form.",
)
def udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag")
            .agg(F.round(grouped_weighted_avg(
                F.col("l_extendedprice"), F.col("l_quantity")), 4)
                .alias("wavg_price"))
            .orderBy("l_returnflag"))


@query(
    "udf_table_function",
    oracle="""
SELECT p_partkey, t.token, CAST(t.pos AS INTEGER) AS pos
FROM (
  SELECT p_partkey,
         unnest(string_split(p_name, ' ')) AS token,
         CAST(generate_subscripts(string_split(p_name, ' '), 1) - 1
              AS INTEGER) AS pos
  FROM part WHERE p_partkey < 100
) t
ORDER BY p_partkey, pos
""",
    tags=("udf",),
    priority=100,
    doc="Python UDTF (Spark 4 @udtf, one row -> N rows via LATERAL) == "
        "unnest of string_split.",
)
def udf_table_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_all(spark, sf_dir)
    spark.udtf.register("tokenize_names", tokenize_udtf())
    return spark.sql("""
        SELECT p.p_partkey, t.token, t.pos
        FROM part p, LATERAL tokenize_names(p.p_name) t
        WHERE p.p_partkey < 100
        ORDER BY p.p_partkey, t.pos
    """)


@query(
    "udf_sql_registered",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CASE WHEN l_discount >= 0.07 THEN 'steep'
            WHEN l_discount >= 0.03 THEN 'moderate'
            ELSE 'slim' END AS dclass
FROM lineitem
WHERE l_orderkey < 300
ORDER BY l_orderkey, l_linenumber
""",
    tags=("udf",),
    priority=100,
    doc="spark.udf.register tier: Python fn addressable from SQL text "
        "== CASE expression.",
)
def udf_sql_registered(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_all(spark, sf_dir)
    register_sql_udfs(spark)
    return spark.sql("""
        SELECT l_orderkey, l_linenumber, discount_class(l_discount) AS dclass
        FROM lineitem WHERE l_orderkey < 300
        ORDER BY l_orderkey, l_linenumber
    """)


@query(
    "udf_nfc_normalize",
    oracle="""
SELECT doc_id,
       length(text || 'e' || chr(769)) AS raw_len,
       length(nfc_normalize(text || 'e' || chr(769))) AS norm_len,
       md5(nfc_normalize(text || 'e' || chr(769))) AS norm_md5
FROM documents
ORDER BY doc_id
""",
    tags=("udf", "text"),
    doc="Unicode NFC normalization (functions/udfs.py:nfc_normalize, "
        "Arrow-vectorized pandas_udf — Spark has no builtin): every "
        "document gets a decomposed 'e'+U+0301 suffix, normalization "
        "must compose it to é — norm_len = raw_len − 1 and the md5 of "
        "the normalized bytes matches DuckDB's utf8proc NFC exactly. "
        "The dedup/hashing stack upstream depends on this: decomposed "
        "and composed spellings must collapse to one key.",
)
def udf_nfc_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.udfs import nfc_normalize
    d = load_table(spark, sf_dir, "documents")
    raw = F.concat(F.col("text"), F.lit("e"), F.lit("́"))
    norm = nfc_normalize(raw)
    return (d.select("doc_id",
                     F.length(raw).alias("raw_len"),
                     F.length(norm).alias("norm_len"),
                     F.md5(norm.cast("binary")).alias("norm_md5"))
            .orderBy("doc_id"))


@query(
    "udf_compression_ratio",
    # rows-only: no SQL oracle ships zlib; tests/test_gaps.py pins
    # exact equality vs direct zlib per document plus the
    # repetitive-compresses-better property.
    tags=("udf", "text", "quality"),
    doc="zlib compression-ratio quality signal (functions/udfs.py:"
        "compression_ratio): per-source min/mean/max compressibility "
        "of the corpus — the Gopher-era repetition gate complement "
        "(templated text scores low, natural prose ~0.5-0.8). "
        "Arrow-vectorized, deterministic at fixed level 6.",
)
def udf_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.udfs import compression_ratio
    d = load_table(spark, sf_dir, "documents")
    r = compression_ratio(F.col("text"))
    return (d.select("source", r.alias("ratio"))
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.min("ratio"), 6).alias("min_ratio"),
                 F.round(F.avg("ratio"), 6).alias("avg_ratio"),
                 F.round(F.max("ratio"), 6).alias("max_ratio"))
            .orderBy("source"))
