"""ETL + file-format probes: partitioned sink round-trip, incremental
overlap+dedup, JSON/CSV scans (SURVEY §2.2 "Sources / sinks").

Each probe that writes does so to a fresh temp dir per invocation so the
driver can re-run queries in any order; the oracle side never sees the
intermediate files — it recomputes the same result straight from the
corpus views, which is exactly what "round-trip fidelity" means.
"""

from __future__ import annotations

import datetime as dt
import os
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..etl.checkpoint import CheckpointManifest
from ..etl.ingest import incremental_ingest
from ..etl.sink import write_partitioned
from ..operators.dedup import keyed_dedup
from .registry import query

_T1 = dt.datetime(2024, 1, 10)
_T2 = dt.datetime(2024, 1, 20)


@query(
    "etl_partitioned_roundtrip",
    oracle="""
SELECT year(ts)  AS year, month(ts) AS month,
       day(ts)   AS day,  hour(ts)  AS hour,
       count(*)  AS n,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
WHERE ts < TIMESTAMP '2024-01-05 00:00:00'
GROUP BY 1, 2, 3, 4
ORDER BY year, month, day, hour
""",
    tags=("etl", "sink"),
    doc="Hourly-partitioned sink round-trip (ref hourly S3 layout, "
        "CommCareAPIHandler.py:71-73): write partitionBy(y,m,d,h) with "
        "maxRecordsPerFile, read back, aggregate per partition — results "
        "must equal the same aggregate computed directly on the source.",
)
def etl_partitioned_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts") < F.lit(dt.datetime(2024, 1, 5)))
    dest = os.path.join(tempfile.mkdtemp(prefix="etl_rt_"), "data")
    write_partitioned(ev, dest, "ts", max_records_per_file=1000)
    back = spark.read.parquet(dest)
    return (back.groupBy("year", "month", "day", "hour")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("value").cast("decimal(18,2)"))
                  .cast("double").alias("sum_value"))
            .orderBy("year", "month", "day", "hour"))


@query(
    "etl_incremental_overlap_dedup",
    oracle="""
SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users
FROM events
WHERE ts <= TIMESTAMP '2024-01-20 00:00:00'
GROUP BY event_type
ORDER BY event_type
""",
    tags=("etl", "checkpoint"),
    priority=100,
    doc="At-least-once replay + dedup (ref write-then-commit ordering, "
        "CommCareAPIHandler.py:251-262): run window<=T1, drop the "
        "checkpoint (simulated crash), run window<=T2 — the sink holds "
        "the T1 window twice; keyed dedup restores exactly-once, "
        "matching a direct query of the source.",
)
def etl_incremental_overlap_dedup(spark: SparkSession, sf_dir: str,
                                  ) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    root = tempfile.mkdtemp(prefix="etl_inc_")
    dest = os.path.join(root, "data")
    zero = dt.timedelta(0)
    incremental_ingest(spark, ev, dest, root, "events", "ts",
                       event_time=_T1, lag=zero)
    os.unlink(CheckpointManifest(root, "events").path)  # crash simulation
    incremental_ingest(spark, ev, dest, root, "events", "ts",
                       event_time=_T2, lag=zero)
    deduped = keyed_dedup(spark.read.parquet(dest), ["event_id"],
                          [F.col("ts"), F.col("event_id")])
    return (deduped.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.countDistinct("user_id").alias("n_users"))
            .orderBy("event_type"))


@query(
    "scan_json",
    oracle="""
SELECT o_orderpriority,
       count(*)                    AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       min(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')) AS first_date
FROM orders
WHERE o_orderkey < 3000
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    tags=("source", "json"),
    doc="JSON scan round-trip with an explicit schema (the reference's "
        "record model is JSON envelopes, CommCareAPIHandler.py:204): "
        "write orders as JSON lines, read back schema-first (timestamps "
        "included), aggregate — must equal the parquet-direct result.",
)
def scan_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 3000)
    dest = os.path.join(tempfile.mkdtemp(prefix="scan_json_"), "orders")
    o.write.mode("overwrite").json(dest)
    schema = ("o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
              "o_totalprice double, o_orderdate timestamp, "
              "o_orderpriority string")
    back = spark.read.schema(schema).json(dest)
    return (back.groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                  .cast("double").alias("sum_price"),
                 F.min(F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"))
                  .alias("first_date"))
            .orderBy("o_orderpriority"))


@query(
    "scan_csv",
    oracle="""
SELECT c_nationkey,
       count(*) AS n,
       CAST(sum(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null_seg,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
FROM (
  SELECT c_nationkey, c_acctbal,
         CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE c_mktsegment END
           AS c_mktsegment
  FROM customer
)
GROUP BY c_nationkey
ORDER BY c_nationkey
""",
    tags=("source", "csv"),
    doc="CSV scan round-trip: pipe-delimited with header and empty-string "
        "nulls (every CSV option the declared surface names), read back "
        "schema-first; null handling must survive the trip.",
)
def scan_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal",
        F.when(F.col("c_custkey") % 5 == 0, None)
         .otherwise(F.col("c_mktsegment")).alias("c_mktsegment"))
    dest = os.path.join(tempfile.mkdtemp(prefix="scan_csv_"), "customer")
    (c.write.mode("overwrite").option("header", True).option("sep", "|")
     .csv(dest))
    schema = ("c_custkey bigint, c_nationkey bigint, c_acctbal double, "
              "c_mktsegment string")
    back = (spark.read.schema(schema)
            .option("header", True).option("sep", "|").csv(dest))
    return (back.groupBy("c_nationkey")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.when(F.col("c_mktsegment").isNull(), 1)
                       .otherwise(0)).alias("n_null_seg"),
                 # decimal sum: accumulation-order-independent (SURVEY §7.4)
                 F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
                  .cast("double").alias("sum_bal"))
            .orderBy("c_nationkey"))


@query(
    "scan_json_corrupt",
    oracle="""
SELECT count(CASE WHEN p_partkey % 7 <> 0 THEN 1 END) AS n_good,
       count(CASE WHEN p_partkey % 7 = 0  THEN 1 END) AS n_corrupt
FROM part
WHERE p_partkey < 400
""",
    tags=("source", "json"),
    priority=100,
    doc="Corrupt-record JSON mode (PERMISSIVE + columnNameOfCorruptRecord)"
        ": every 7th line is deliberately malformed; the scan must keep "
        "good rows typed and quarantine bad ones, never drop either.",
)
def scan_json_corrupt(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 400)
    lines = p.select(
        F.when(F.col("p_partkey") % 7 == 0,
               F.concat(F.lit("{broken json for key "),
                        F.col("p_partkey").cast("string")))
         .otherwise(F.to_json(F.struct("p_partkey", "p_name", "p_size")))
        .alias("value"))
    dest = os.path.join(tempfile.mkdtemp(prefix="scan_jc_"), "lines")
    lines.write.mode("overwrite").text(dest)
    back = (spark.read
            .schema("p_partkey bigint, p_name string, p_size bigint, "
                    "_corrupt string")
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt")
            .json(dest))
    return back.agg(
        F.count(F.col("p_partkey")).alias("n_good"),
        F.count(F.col("_corrupt")).alias("n_corrupt"))


@query(
    "rest_datasource_scan",
    oracle="""
SELECT CAST(i AS BIGINT) AS id, CAST((i * 31) % 97 AS BIGINT) AS k
FROM range(0, 5000) t(i)
ORDER BY id
""",
    tags=("source", "rest"),
    priority=100,
    doc="REST as a Spark 4 Python DataSource (etl/rest_datasource.py): "
        "windowed scan split into 8 InputPartitions, each pulling its "
        "sub-window via keyset-paginated, budget-guarded requests on the "
        "executor — the reference's serial pull loop "
        "(CommCareAPIHandler.py:217-258) made partition-parallel. The "
        "deterministic synthetic transport makes the scan oracle-exact.",
)
def rest_datasource_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..etl import rest_datasource
    rest_datasource.register(spark)
    return (spark.read.format("rest")
            .option("transport", "synthetic")
            .option("start", 0).option("end", 5000)
            .option("limit", 100).option("num_partitions", 8)
            .load()
            .orderBy("id"))


@query(
    "scan_orc",
    oracle="""
SELECT o_orderstatus,
       count(*) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders
WHERE o_orderkey < 4000
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
    tags=("source", "orc"),
    doc="ORC scan round-trip: write orders as ORC (native vectorized "
        "reader, predicate pushdown like parquet), read back, aggregate "
        "— must equal the parquet-direct result. Completes the columnar "
        "source formats alongside parquet/JSON/CSV.",
)
def scan_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (load_table(spark, sf_dir, "orders")
         .filter(F.col("o_orderkey") < 4000)
         .select("o_orderkey", "o_orderstatus", "o_totalprice"))
    dest = os.path.join(tempfile.mkdtemp(prefix="scan_orc_"), "orders")
    o.write.mode("overwrite").orc(dest)
    back = spark.read.orc(dest)
    return (back.groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                  .cast("double").alias("sum_price"))
            .orderBy("o_orderstatus"))


@query(
    "etl_merge_upsert",
    oracle="""
WITH existing AS (
  SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS o_totalprice
  FROM orders WHERE o_orderkey < 3000
), updates AS (
  SELECT o_orderkey, 'U' AS o_orderstatus,
         round(o_totalprice + 1000, 2) AS o_totalprice
  FROM orders WHERE o_orderkey >= 2000 AND o_orderkey < 4000
)
SELECT coalesce(u.o_orderkey, e.o_orderkey) AS o_orderkey,
       coalesce(u.o_orderstatus, e.o_orderstatus) AS o_orderstatus,
       coalesce(u.o_totalprice, e.o_totalprice) AS o_totalprice
FROM existing e FULL JOIN updates u ON e.o_orderkey = u.o_orderkey
ORDER BY o_orderkey
""",
    tags=("etl", "merge"),
    doc="MERGE INTO semantics (etl/merge.py:merge_upsert): updates beat "
        "existing rows per key, unmatched updates insert — expressed as "
        "union + one row_number window (ONE shuffle, no join; each row "
        "moves once). Oracle recomputes via FULL JOIN + coalesce.",
)
def etl_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..etl.merge import merge_upsert
    o = load_table(spark, sf_dir, "orders")
    existing = (o.filter(F.col("o_orderkey") < 3000)
                .select("o_orderkey", "o_orderstatus",
                        F.round("o_totalprice", 2).alias("o_totalprice")))
    updates = (o.filter((F.col("o_orderkey") >= 2000)
                        & (F.col("o_orderkey") < 4000))
               .select("o_orderkey", F.lit("U").alias("o_orderstatus"),
                       F.round(F.col("o_totalprice") + 1000, 2)
                       .alias("o_totalprice")))
    return (merge_upsert(existing, updates, keys=["o_orderkey"])
            .orderBy("o_orderkey"))


@query(
    "etl_merge_partitioned",
    oracle="""
WITH base AS (
  SELECT event_id, ts, value FROM events
  WHERE ts < TIMESTAMP '2024-01-03 00:00:00'
), upd AS (
  SELECT event_id, ts, value + 1000 AS value FROM events
  WHERE ts >= TIMESTAMP '2024-01-02 05:00:00'
    AND ts <  TIMESTAMP '2024-01-02 06:00:00'
  UNION ALL
  SELECT event_id, ts, value FROM events
  WHERE ts >= TIMESTAMP '2024-01-03 00:00:00'
    AND ts <  TIMESTAMP '2024-01-03 02:00:00'
), merged AS (
  SELECT * FROM upd
  UNION ALL
  SELECT * FROM base
  WHERE event_id NOT IN (SELECT event_id FROM upd)
)
SELECT year(ts) AS year, month(ts) AS month, day(ts) AS day,
       hour(ts) AS hour, count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM merged GROUP BY 1, 2, 3, 4
ORDER BY year, month, day, hour
""",
    tags=("etl", "merge", "sink"),
    doc="Partition-targeted persistent MERGE (etl/merge.py:"
        "merge_upsert_partitioned): updates to one hour + inserts into "
        "two new hours against an hourly-partitioned table rewrite ONLY "
        "the affected partitions via dynamic partition overwrite (the "
        "scale posture the reference delegates to Snowflake, util.py:51 "
        "context) — read-back per-hour aggregates must equal the oracle's "
        "recomputed post-merge state; untouched-partition byte identity "
        "is pinned in tests/test_etl.py.",
)
def etl_merge_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..etl.merge import merge_upsert_partitioned
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts",
                                                    "value")
    base = ev.filter(F.col("ts") < F.lit(dt.datetime(2024, 1, 3)))
    dest = os.path.join(tempfile.mkdtemp(prefix="etl_mrg_"), "data")
    write_partitioned(base, dest, "ts", max_records_per_file=1000)
    updated = (ev.filter(
        (F.col("ts") >= F.lit(dt.datetime(2024, 1, 2, 5)))
        & (F.col("ts") < F.lit(dt.datetime(2024, 1, 2, 6))))
        .withColumn("value", F.col("value") + 1000))
    inserts = ev.filter(
        (F.col("ts") >= F.lit(dt.datetime(2024, 1, 3)))
        & (F.col("ts") < F.lit(dt.datetime(2024, 1, 3, 2))))
    merge_upsert_partitioned(spark, dest, updated.unionByName(inserts),
                             keys=["event_id"], ts_col="ts")
    back = spark.read.parquet(dest)
    return (back.groupBy("year", "month", "day", "hour")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("value").cast("decimal(18,2)"))
                  .cast("double").alias("sum_value"))
            .orderBy("year", "month", "day", "hour"))


@query(
    "etl_snapshot_diff",
    oracle="""
WITH old_s AS (
  SELECT o_orderkey, o_totalprice, o_orderstatus
  FROM orders WHERE o_orderkey < 4000
), new_s AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1.0
              ELSE o_totalprice END AS o_totalprice,
         o_orderstatus
  FROM orders WHERE o_orderkey >= 500
)
SELECT coalesce(n.o_orderkey, o.o_orderkey) AS o_orderkey,
       CASE WHEN o.o_orderkey IS NULL THEN 'insert'
            WHEN n.o_orderkey IS NULL THEN 'delete'
            WHEN NOT (o.o_totalprice IS NOT DISTINCT FROM n.o_totalprice
                      AND o.o_orderstatus
                          IS NOT DISTINCT FROM n.o_orderstatus)
            THEN 'update' END AS change
FROM old_s o FULL OUTER JOIN new_s n ON o.o_orderkey = n.o_orderkey
WHERE CASE WHEN o.o_orderkey IS NULL THEN 'insert'
           WHEN n.o_orderkey IS NULL THEN 'delete'
           WHEN NOT (o.o_totalprice IS NOT DISTINCT FROM n.o_totalprice
                     AND o.o_orderstatus
                         IS NOT DISTINCT FROM n.o_orderstatus)
           THEN 'update' END IS NOT NULL
ORDER BY o_orderkey
""",
    tags=("etl", "incremental"),
    doc="Row-level change data capture between two table snapshots "
        "(operators/incremental.py:snapshot_diff): ONE full-outer join "
        "on the key, change classification by null-safe column "
        "equality (no value stringification/hashing to diverge across "
        "engines), unchanged keys dropped — recovers the minimal delta "
        "when upstream hands you full snapshots, the inverse of the "
        "MERGE sink. Probe plants disjoint key ranges (inserts/deletes)"
        " and a %5 price bump (updates).",
)
def etl_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.incremental import snapshot_diff
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus")
    old_s = o.filter(F.col("o_orderkey") < 4000)
    new_s = (o.filter(F.col("o_orderkey") >= 500)
             .withColumn("o_totalprice",
                         F.when(F.col("o_orderkey") % 5 == 0,
                                F.col("o_totalprice") + 1.0)
                         .otherwise(F.col("o_totalprice"))))
    return (snapshot_diff(old_s, new_s, ["o_orderkey"],
                          ["o_totalprice", "o_orderstatus"])
            .orderBy("o_orderkey"))


@query(
    "scan_parquet_merge_schema",
    oracle="""
WITH unioned AS (
  SELECT event_id, user_id, CAST(NULL AS DOUBLE) AS value
  FROM events WHERE ts < TIMESTAMP '2024-01-10 00:00:00'
  UNION ALL
  SELECT event_id, user_id, value
  FROM events WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
)
SELECT user_id, count(*) AS n, count(value) AS n_with_value,
       CAST(sum(CAST(coalesce(value, 0) AS DECIMAL(18,2))) AS DOUBLE)
         AS sum_value
FROM unioned GROUP BY user_id ORDER BY user_id
""",
    tags=("etl", "source"),
    doc="Schema-evolution-on-read: two parquet drops of the same feed, "
        "the older written BEFORE a 'value' column existed, read back "
        "as one table via mergeSchema (Spark's footer-union; the "
        "oracle states the same semantics as UNION ALL with a typed "
        "NULL). The schema-drift survival path every long-lived "
        "ingest needs — old files project NULL for later columns, no "
        "rewrite of historical data. Read-back aggregate must equal "
        "the source-computed one exactly.",
)
def scan_parquet_merge_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    cut = F.lit("2024-01-10 00:00:00").cast("timestamp")
    ev = load_table(spark, sf_dir, "events")
    dest = tempfile.mkdtemp(prefix="etl_msch_")
    (ev.filter(F.col("ts") < cut)
     .select("event_id", "user_id")
     .write.mode("overwrite").parquet(os.path.join(dest, "v1")))
    (ev.filter(F.col("ts") >= cut)
     .select("event_id", "user_id", "value")
     .write.mode("overwrite").parquet(os.path.join(dest, "v2")))
    back = (spark.read.option("mergeSchema", "true")
            .parquet(os.path.join(dest, "v1"),
                     os.path.join(dest, "v2")))
    return (back.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.count("value").alias("n_with_value"),
                 F.sum(F.coalesce(F.col("value"), F.lit(0.0))
                       .cast("decimal(18,2)"))
                 .cast("double").alias("sum_value"))
            .orderBy("user_id"))


@query(
    "rest_stream_scan",
    oracle="""
SELECT CAST(r.range AS BIGINT) AS id,
       CAST(r.range * 31 % 97 AS BIGINT) AS k
FROM range(0, 2000) r ORDER BY id
""",
    tags=("etl", "source", "streaming"),
    doc="Streaming REST source (etl/rest_datasource.py:RestStreamReader "
        "— spark.readStream.format('rest')): the reference's "
        "checkpointed poll loop mapped onto Structured Streaming's "
        "offset contract, where the engine checkpoint IS the manifest "
        "(exactly-once offset commit, deterministic replay via "
        "readBetweenOffsets). The probe drains a bounded synthetic "
        "feed with availableNow and must reproduce the generator "
        "formula exactly; multi-batch drain, offset resume, and "
        "exactly-once delivery are pinned in "
        "tests/test_streaming.py::TestRestStreamSource.",
)
def rest_stream_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..etl.rest_datasource import register
    from ..streaming.ops import run_stream_to_table
    register(spark)
    stream = (spark.readStream.format("rest")
              .option("transport", "synthetic")
              .option("start", 0).option("end", 2000)
              .option("rows_per_batch", 2000).load())
    return run_stream_to_table(stream).orderBy("id")


@query(
    "etl_compact_partitions",
    oracle="""
SELECT year(ts)  AS year, month(ts) AS month,
       day(ts)   AS day,  hour(ts)  AS hour,
       count(*)  AS n,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
WHERE ts < TIMESTAMP '2024-01-02 00:00:00'
GROUP BY 1, 2, 3, 4
ORDER BY year, month, day, hour
""",
    tags=("etl", "sink", "compact"),
    doc="Partition-targeted small-file compaction (etl/sink.py:"
        "compact_partitions): two interleaved append runs fragment every "
        "hour of the layout (>=2 files each, the incremental-sink "
        "failure mode); compaction censuses fragmentation from a "
        "DIRECTORY LISTING (no data scan), partition-prunes the read to "
        "fragmented hours only, and rewrites them via dynamic partition "
        "overwrite — content must be untouched, so the per-hour read-back "
        "aggregates equal the oracle's straight recompute. File-count "
        "reduction and untouched-partition byte identity are pinned in "
        "tests/test_etl.py.",
)
def etl_compact_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..etl.sink import compact_partitions
    ev = (load_table(spark, sf_dir, "events")
          .select("event_id", "ts", "value")
          .filter(F.col("ts") < F.lit(dt.datetime(2024, 1, 2))))
    dest = os.path.join(tempfile.mkdtemp(prefix="etl_cmp_"), "data")
    for i in range(2):
        write_partitioned(ev.filter(F.col("event_id") % 2 == i), dest,
                          "ts", max_records_per_file=500)
    compact_partitions(spark, dest, min_files=2)
    back = spark.read.parquet(dest)
    return (back.groupBy("year", "month", "day", "hour")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("value").cast("decimal(18,2)"))
                  .cast("double").alias("sum_value"))
            .orderBy("year", "month", "day", "hour"))


@query(
    "etl_schema_drift",
    oracle="""
SELECT * FROM (VALUES
  ('o_ingested_at', 'added',        CAST(NULL AS VARCHAR), 'timestamp'),
  ('o_orderpriority', 'removed',    'string', CAST(NULL AS VARCHAR)),
  ('o_totalprice', 'type_changed',  'double', 'string')
) AS t("column", change, old_type, new_type)
ORDER BY "column"
""",
    tags=("etl", "quality"),
    doc="Schema drift detection (operators/profile.py:schema_diff): a "
        "new extract that adds an audit column, drops a field, and "
        "stringifies a price must report exactly {added, removed, "
        "type_changed} rows. Pure Catalyst-metadata computation — no "
        "job, no scan, free at 100 TB — feeding the same quality-gate "
        "surface as the Deequ-style checks; the reference's schemaless "
        "verbatim dump (CommCareAPIHandler.py:204) made this class of "
        "corruption invisible.",
)
def etl_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import schema_diff
    old = load_table(spark, sf_dir, "orders")
    new = (old.drop("o_orderpriority")
           .withColumn("o_totalprice",
                       F.col("o_totalprice").cast("string"))
           .withColumn("o_ingested_at",
                       F.to_timestamp(F.lit("2024-01-01"))))
    return schema_diff(old, new).orderBy("column")


@query(
    "etl_version_travel",
    oracle="""
SELECT year(ts) AS year, day(ts) AS day, count(*) AS n_v1,
       CAST(NULL AS BIGINT) AS n_delta
FROM events WHERE ts < TIMESTAMP '2024-01-02 00:00:00'
GROUP BY 1, 2
UNION ALL
SELECT year(ts) AS year, day(ts) AS day,
       CAST(NULL AS BIGINT) AS n_v1, count(*) AS n_delta
FROM events
WHERE ts >= TIMESTAMP '2024-01-02 00:00:00'
  AND ts <  TIMESTAMP '2024-01-03 00:00:00'
GROUP BY 1, 2
ORDER BY year, day, n_v1 NULLS LAST
""",
    tags=("etl", "sink", "versioning"),
    doc="Snapshot time travel + incremental change reads "
        "(etl/versioning.py): day-1 events commit as v1, day-2 append "
        "commits as v2; reading AS OF v1 must see ONLY day 1 even "
        "though day 2 is already on disk, and read_changes(v1, v2) "
        "must read exactly the appended files — the Delta-style "
        "transaction-log idea reduced to the append-only hourly sink "
        "(manifest = directory listing, no data scan at commit time). "
        "Probe returns v1 per-day counts plus the delta's per-day "
        "counts; the oracle recomputes both windows straight from the "
        "corpus.",
)
def etl_version_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..etl.versioning import (commit_version, read_changes,
                                  read_version)
    ev = (load_table(spark, sf_dir, "events")
          .select("event_id", "ts", "value"))
    dest = os.path.join(tempfile.mkdtemp(prefix="etl_ver_"), "data")
    write_partitioned(ev.filter(F.col("ts") < F.lit(
        dt.datetime(2024, 1, 2))), dest, "ts")
    v1 = commit_version(dest)
    write_partitioned(ev.filter(
        (F.col("ts") >= F.lit(dt.datetime(2024, 1, 2)))
        & (F.col("ts") < F.lit(dt.datetime(2024, 1, 3)))), dest, "ts")
    v2 = commit_version(dest)
    as_of_v1 = (read_version(spark, dest, v1)
                .groupBy("year", "day")
                .agg(F.count(F.lit(1)).alias("n_v1"))
                .withColumn("n_delta", F.lit(None).cast("long")))
    delta = (read_changes(spark, dest, since=v1, until=v2)
             .groupBy("year", "day")
             .agg(F.count(F.lit(1)).alias("n_delta"))
             .withColumn("n_v1", F.lit(None).cast("long"))
             .select("year", "day", "n_v1", "n_delta"))
    return (as_of_v1.unionByName(delta)
            .orderBy("year", "day", F.asc_nulls_last("n_v1")))


def _cksum_digit_sql(h: str, p: int) -> str:
    a = f"ascii(substr({h}, {p}, 1))"
    return f"(CASE WHEN {a} >= 97 THEN {a} - 87 ELSE {a} - 48 END)"


def _cksum_sql(cols: str) -> str:
    h = f"md5(concat_ws('|', {cols}))"
    expr = "CAST(0 AS BIGINT)"
    for p in range(1, 13):
        expr = f"({expr} * 16 + {_cksum_digit_sql(h, p)})"
    return expr


@query(
    "etl_partition_checksums",
    oracle=f"""
SELECT year(ts) AS year, day(ts) AS day,
       count(*) AS n_rows,
       CAST(CAST(sum({_cksum_sql("CAST(event_id AS VARCHAR), "
                                 "CAST(user_id AS VARCHAR), event_type")})
                 AS DECIMAL(38,0)) AS VARCHAR) AS checksum
FROM events
WHERE ts < TIMESTAMP '2024-01-05 00:00:00'
GROUP BY 1, 2
ORDER BY year, day
""",
    tags=("etl", "quality", "audit"),
    doc="Per-partition content checksums (operators/profile.py:"
        "partition_checksums): Σ of each row's 48-bit md5 prefix per "
        "(year, day) — commutative, so independent of partitioning, "
        "task order and file layout: the audit manifest for comparing "
        "two copies of a table (replication, post-compaction, "
        "post-merge) with one aggregate per side. Portable "
        "ascii-arithmetic hash (the bloom-index rule) so the oracle "
        "recomputes the manifest bit-for-bit; DECIMAL(38,0) "
        "accumulation so no partition size overflows.",
)
def etl_partition_checksums(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    from ..operators.profile import partition_checksums
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("ts") < F.lit(dt.datetime(2024, 1, 5)))
          .withColumn("year", F.year("ts"))
          .withColumn("day", F.dayofmonth("ts")))
    out = partition_checksums(
        ev, ["year", "day"],
        ["event_id", "user_id", "event_type"])
    # string-render the decimal checksum at the probe boundary: the
    # registry lint forbids DECIMAL/HUGEINT probe outputs (driver
    # canonicalizers render them inconsistently across engines)
    return (out.withColumn("checksum",
                           F.col("checksum").cast("string"))
            .orderBy("year", "day"))


@query(
    "etl_delete_partitioned",
    oracle="""
WITH base AS (
  SELECT event_id, ts, user_id, value FROM events
  WHERE ts < TIMESTAMP '2024-01-03 00:00:00'
), kept AS (
  SELECT * FROM base WHERE user_id % 37 <> 0
)
SELECT year(ts) AS year, month(ts) AS month, day(ts) AS day,
       hour(ts) AS hour, count(*) AS n,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM kept GROUP BY 1, 2, 3, 4
ORDER BY year, month, day, hour
""",
    tags=("etl", "merge", "sink", "governance"),
    doc="Partition-targeted key deletion (etl/merge.py:"
        "delete_keys_partitioned): a GDPR-style erasure of every 37th "
        "user against the hourly-partitioned events table rewrites "
        "ONLY partitions where a matched key lives (broadcast semi-"
        "join discovery, partition-pruned read-back, anti-join, "
        "dynamic partition overwrite) — the read-back per-hour state "
        "must equal the oracle's recomputed post-delete table. "
        "Untouched-partition byte identity, emptied-partition purge, "
        "and second-pass no-op are pinned in tests/test_etl.py.",
)
def etl_delete_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..etl.merge import delete_keys_partitioned
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "value")
    base = ev.filter(F.col("ts") < F.lit(dt.datetime(2024, 1, 3)))
    dest = os.path.join(tempfile.mkdtemp(prefix="etl_del_"), "data")
    write_partitioned(base, dest, "ts", max_records_per_file=1000)
    doomed = (base.filter(F.col("user_id") % 37 == 0)
              .select("user_id").distinct())
    delete_keys_partitioned(spark, dest, doomed, keys=["user_id"])
    back = spark.read.parquet(dest)
    return (back.groupBy("year", "month", "day", "hour")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.countDistinct("user_id").alias("n_users"),
                 F.sum(F.col("value").cast("decimal(18,2)"))
                  .cast("double").alias("sum_value"))
            .orderBy("year", "month", "day", "hour"))


@query(
    "etl_cdc_apply",
    oracle="""
WITH ch AS (
  SELECT o_custkey AS c_custkey,
         'upd#' || CAST(o_orderkey AS VARCHAR) AS c_name,
         o_totalprice AS c_acctbal,
         o_orderkey AS seq,
         CASE WHEN o_orderkey % 7 = 0 THEN 'D' ELSE 'U' END AS op
  FROM orders
), u AS (
  SELECT c_custkey, c_name, c_acctbal,
         CAST(NULL AS BIGINT) AS seq, 'U' AS op
  FROM customer
  UNION ALL SELECT * FROM ch
), r AS (
  SELECT *, row_number() OVER (
      PARTITION BY c_custkey
      ORDER BY seq DESC NULLS LAST, op DESC) AS rn
  FROM u
)
SELECT c_custkey, c_name, c_acctbal
FROM r WHERE rn = 1 AND op <> 'D'
ORDER BY c_custkey
""",
    tags=("etl", "incremental"),
    doc="CDC changelog apply (operators/incremental.py:apply_changelog "
        "— the Debezium/binlog-consumer shape, reference per-record "
        "push replay CommCareAPIHandler.py:214-260): orders become a "
        "keyed changelog over customer (seq = orderkey, every 7th a "
        "delete), base rows rank as seq -inf upserts, ONE window picks "
        "the highest-sequence survivor and the delete filter drops "
        "erased keys. The oracle replays the same log with row_number.",
)
def etl_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.incremental import apply_changelog
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal")
    o = load_table(spark, sf_dir, "orders")
    changes = o.select(
        F.col("o_custkey").alias("c_custkey"),
        F.concat(F.lit("upd#"),
                 F.col("o_orderkey").cast("string")).alias("c_name"),
        F.col("o_totalprice").alias("c_acctbal"),
        F.col("o_orderkey").alias("seq"),
        F.when(F.col("o_orderkey") % 7 == 0, "D")
         .otherwise("U").alias("op"))
    return (apply_changelog(c, changes, ["c_custkey"], "seq", "op")
            .orderBy("c_custkey"))


@query(
    "etl_write_audit_publish",
    oracle="""
SELECT year(ts) AS year, day(ts) AS day, count(*) AS n_rows,
       CAST(1 AS BIGINT) AS n_versions
FROM events WHERE ts < TIMESTAMP '2024-01-02 00:00:00'
GROUP BY 1, 2 ORDER BY year, day
""",
    tags=("etl", "sink", "versioning"),
    doc="Write-Audit-Publish capstone (etl/publish.py:"
        "write_audit_publish, the Iceberg WAP pattern on the versioned "
        "store): a clean day-1 batch passes its constraint audit and "
        "publishes as v1; a poisoned day-2 batch (values nulled) fails "
        "the gate, is rolled back through the Hadoop FS API, and the "
        "table stays at v1 — the probe reads the LATEST version after "
        "both attempts and must see only day 1, with exactly one "
        "version in the log. Audit cost is one scan + one wide "
        "aggregate over the staged files only.",
)
def etl_write_audit_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..etl.publish import QualityGateError, write_audit_publish
    from ..etl.versioning import list_versions, read_version
    ev = (load_table(spark, sf_dir, "events")
          .select("event_id", "ts", "value"))
    dest = os.path.join(tempfile.mkdtemp(prefix="etl_wap_"), "data")
    checks = {"value_present": F.col("value").isNotNull()}
    good = ev.filter(F.col("ts") < F.lit(dt.datetime(2024, 1, 2)))
    write_audit_publish(spark, good, dest, checks)
    poisoned = (ev.filter(
        (F.col("ts") >= F.lit(dt.datetime(2024, 1, 2)))
        & (F.col("ts") < F.lit(dt.datetime(2024, 1, 3))))
        .withColumn("value", F.when(F.col("event_id") % 7 == 0,
                                    F.col("value"))))
    try:
        write_audit_publish(spark, poisoned, dest, checks)
    except QualityGateError:
        pass  # the gate doing its job; table must still be v1
    n_versions = len(list_versions(dest))
    return (read_version(spark, dest)
            .groupBy(F.year("ts").alias("year"), F.dayofmonth("ts")
                     .alias("day"))
            .agg(F.count(F.lit(1)).alias("n_rows"))
            .withColumn("n_versions", F.lit(n_versions).cast("long"))
            .orderBy("year", "day"))


@query(
    "etl_merge_schema_evolution",
    oracle="""
WITH merged AS (
  SELECT event_id, ts, value, CAST(NULL AS VARCHAR) AS src
  FROM events
  WHERE ts < TIMESTAMP '2024-01-02 00:00:00'
  UNION ALL
  SELECT event_id, ts, value * 2, 'v2' AS src
  FROM events
  WHERE ts >= TIMESTAMP '2024-01-02 00:00:00'
    AND ts < TIMESTAMP '2024-01-03 00:00:00'
)
SELECT year(ts) AS year, day(ts) AS day,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         AS cents,
       CAST(sum(CASE WHEN src = 'v2' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_v2
FROM merged GROUP BY 1, 2 ORDER BY year, day
""",
    tags=("etl", "sink", "merge"),
    doc="Additive schema evolution through the partition-targeted "
        "MERGE (etl/merge.py:merge_upsert_evolving — Delta's "
        "mergeSchema add-column case on plain parquet): a day-2 update "
        "batch carrying a NEW src column upserts into a two-day table; "
        "day-1 partitions keep their old footers (and read back NULL "
        "src under mergeSchema), day-2 rewrites with the evolved "
        "schema, type changes refuse loudly. Write amplification "
        "stays bounded by touched partitions regardless of the schema "
        "delta; byte-identity of untouched partitions is pytest-pinned "
        "(TestMergeSchemaEvolution).",
)
def etl_merge_schema_evolution(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    from ..etl.merge import merge_upsert_evolving
    from ..etl.sink import write_partitioned
    ev = (load_table(spark, sf_dir, "events")
          .select("event_id", "ts", "value"))
    dest = os.path.join(tempfile.mkdtemp(prefix="etl_evo_"), "data")
    write_partitioned(ev.filter(F.col("ts") < F.lit(
        dt.datetime(2024, 1, 3))), dest, "ts")
    upd = (ev.filter((F.col("ts") >= F.lit(dt.datetime(2024, 1, 2)))
                     & (F.col("ts") < F.lit(dt.datetime(2024, 1, 3))))
           .withColumn("value", F.col("value") * 2)
           .withColumn("src", F.lit("v2")))
    merge_upsert_evolving(spark, dest, upd, ["event_id"], "ts")
    back = spark.read.option("mergeSchema", "true").parquet(dest)
    return (back.groupBy(F.year("ts").alias("year"),
                         F.dayofmonth("ts").alias("day"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.round(F.col("value") * 100).cast("long"))
                 .alias("cents"),
                 F.sum(F.when(F.col("src") == "v2", 1).otherwise(0))
                 .cast("long").alias("n_v2"))
            .orderBy("year", "day"))
