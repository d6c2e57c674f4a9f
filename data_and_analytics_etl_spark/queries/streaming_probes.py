"""Streaming probes: file-stream replay of `events` with availableNow.

Each probe runs a genuine Structured Streaming query (file source →
stateful operator → memory sink, checkpointed) to completion and returns
the materialized result; the oracle recomputes the same answer as batch
SQL — the stream-batch equivalence contract (SURVEY §5.2 item 2). The
reference analog: its pull loop IS a hand-rolled stream with watermark
restore and 5-minute lag (CommCareAPIHandler.py:65-69, 87-94).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..streaming.ops import (events_stream, run_stream_to_table,
                             session_window_agg, sliding_window_agg,
                             stateful_user_stats, streaming_dedup,
                             tumbling_window_agg)
from .registry import query

_TS_FMT = "yyyy-MM-dd HH:mm:ss"


@query(
    "stream_tumbling_agg",
    oracle="""
SELECT strftime(time_bucket(INTERVAL 10 MINUTE, ts), '%Y-%m-%d %H:%M:%S')
         AS window_start,
       strftime(time_bucket(INTERVAL 10 MINUTE, ts) + INTERVAL 10 MINUTE,
                '%Y-%m-%d %H:%M:%S') AS window_end,
       count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY window_start
""",
    tags=("streaming",),
    doc="Tumbling 10-minute window agg over the event stream (complete "
        "mode) == batch time-bucket aggregation.",
)
def stream_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = run_stream_to_table(
        tumbling_window_agg(events_stream(spark, sf_dir)),
        output_mode="complete")
    return (out.select(
        F.date_format("window_start", _TS_FMT).alias("window_start"),
        F.date_format("window_end", _TS_FMT).alias("window_end"),
        "n", "sum_value")
        .orderBy("window_start"))


@query(
    "stream_watermark_tumbling",
    oracle="""
WITH w AS (
  SELECT time_bucket(INTERVAL 10 MINUTE, ts) AS s,
         count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
  FROM events GROUP BY 1
)
SELECT strftime(s, '%Y-%m-%d %H:%M:%S') AS window_start, n, sum_value
FROM w
WHERE s + INTERVAL 10 MINUTE <= (SELECT max(ts) - INTERVAL 5 MINUTE
                                 FROM events)
ORDER BY window_start
""",
    tags=("streaming",),
    doc="Watermarked append-mode tumbling agg: the 5-minute watermark is "
        "the reference's use_lag shift (CommCareAPIHandler.py:65-69) — "
        "only windows the watermark has passed emit; late state is "
        "dropped, keeping state bounded at scale.",
)
def stream_watermark_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = run_stream_to_table(
        tumbling_window_agg(events_stream(spark, sf_dir),
                            watermark="5 minutes"),
        output_mode="append")
    return (out.select(
        F.date_format("window_start", _TS_FMT).alias("window_start"),
        "n", "sum_value")
        .orderBy("window_start"))


@query(
    "stream_sliding_agg",
    oracle="""
WITH hits AS (
  SELECT time_bucket(INTERVAL 5 MINUTE, ts) AS s FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL 5 MINUTE, ts) - INTERVAL 5 MINUTE FROM events
)
SELECT strftime(s, '%Y-%m-%d %H:%M:%S') AS window_start, count(*) AS n
FROM hits GROUP BY s ORDER BY window_start
""",
    tags=("streaming",),
    priority=100,
    doc="Sliding 10-minute/5-minute window agg: every event contributes "
        "to two overlapping windows == batch union of shifted buckets.",
)
def stream_sliding_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = run_stream_to_table(
        sliding_window_agg(events_stream(spark, sf_dir)),
        output_mode="complete")
    return (out.select(
        F.date_format("window_start", _TS_FMT).alias("window_start"), "n")
        .orderBy("window_start"))


@query(
    "stream_session_window",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER w) >= 1800 THEN 1
              ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sessions AS (
  SELECT user_id, ts, value,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       strftime(max(ts) + INTERVAL 30 MINUTE,
                '%Y-%m-%d %H:%M:%S.%f')          AS session_end,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM sessions
GROUP BY user_id, sid
ORDER BY user_id, session_start
""",
    tags=("streaming",),
    doc="Native session_window (30-minute gap) == batch sessionization; "
        "session_window merges while the next event starts strictly "
        "before session_end (gap >= 1800s starts a new session), and "
        "its end is last_ts + gap.",
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = run_stream_to_table(
        session_window_agg(events_stream(spark, sf_dir), gap="30 minutes"),
        output_mode="complete")
    return (out.select(
        "user_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss.SSSSSS")
         .alias("session_start"),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss.SSSSSS")
         .alias("session_end"),
        "n_events", "sum_value")
        .orderBy("user_id", "session_start"))


@query(
    "stream_dedup_keys",
    oracle="""
SELECT DISTINCT user_id, event_type FROM events
ORDER BY user_id, event_type
""",
    tags=("streaming",),
    priority=100,
    doc="Streaming dropDuplicates over (user_id, event_type) == batch "
        "DISTINCT; keys-only projection so the result is deterministic "
        "regardless of arrival order.",
)
def stream_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    st = events_stream(spark, sf_dir).select("user_id", "event_type")
    out = run_stream_to_table(streaming_dedup(st, ["user_id", "event_type"]),
                              output_mode="append")
    return out.orderBy("user_id", "event_type")


@query(
    "stream_stateful_user_stats",
    oracle="""
WITH ordered AS (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS rn_asc,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC,
                            event_id DESC) AS rn_desc
  FROM events
)
SELECT user_id,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
       max(CASE WHEN rn_asc = 1 THEN event_id END)  AS first_event,
       max(CASE WHEN rn_desc = 1 THEN event_id END) AS last_event
FROM ordered
GROUP BY user_id
ORDER BY user_id
""",
    tags=("streaming",),
    doc="Arbitrary stateful per-key processing (applyInPandasWithState): "
        "running per-user count/sum/first/last across micro-batches == "
        "batch grouped aggregation when the replay completes.",
)
def stream_stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = run_stream_to_table(
        stateful_user_stats(events_stream(spark, sf_dir)),
        output_mode="update")
    return out.orderBy("user_id")


@query(
    "stream_stream_join",
    oracle="""
SELECT v.user_id,
       v.event_id AS view_id,
       p.event_id AS purchase_id,
       strftime(v.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_view,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_purchase
FROM events v
JOIN events p
  ON v.user_id = p.user_id
 AND p.ts >= v.ts
 AND p.ts <= v.ts + INTERVAL 10 MINUTE
WHERE v.event_type = 'view' AND p.event_type = 'purchase'
ORDER BY view_id, purchase_id
""",
    tags=("streaming", "join"),
    doc="Stream-stream interval join (streaming/ops.py:"
        "stream_stream_interval_join): views matched to same-user "
        "purchases within 10 minutes, both sides watermarked so join "
        "state is evictable — equals the batch interval join on replay "
        "completion.",
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.ops import stream_stream_interval_join
    src = events_stream(spark, sf_dir)
    views = src.filter(F.col("event_type") == "view")
    purchases = events_stream(spark, sf_dir).filter(
        F.col("event_type") == "purchase")
    # state-sized store count (see run_stream_to_table): ~40k state
    # rows across FOUR stores/partition; 8 instances bounds the fixed
    # per-batch store open/commit cost that dominated this replay at 32
    out = run_stream_to_table(
        stream_stream_interval_join(views, purchases),
        output_mode="append", state_partitions=8)
    return (out.select(
        "user_id", "view_id", "purchase_id",
        F.date_format("ts_view", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .alias("ts_view"),
        F.date_format("ts_purchase", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .alias("ts_purchase"))
        .orderBy("view_id", "purchase_id"))


@query(
    "stream_stream_left_outer",
    oracle="""
SELECT v.user_id,
       v.event_id AS view_id,
       p.event_id AS purchase_id,
       strftime(v.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_view,
       CASE WHEN p.event_id IS NOT NULL
            THEN strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') END AS ts_purchase
FROM events v
LEFT JOIN events p
  ON v.user_id = p.user_id
 AND p.event_type = 'purchase'
 AND p.ts >= v.ts
 AND p.ts <= v.ts + INTERVAL 10 MINUTE
WHERE v.event_type = 'view'
ORDER BY view_id, purchase_id
""",
    tags=("streaming", "join"),
    doc="Stream-stream LEFT OUTER interval join (streaming/ops.py:"
        "stream_stream_interval_join, how='left_outer'): every view "
        "emits — matched within 10 minutes or with NULL purchase "
        "columns once the watermark passes its window. Outer emission "
        "needs the watermark to move PAST the tail of a finite "
        "stream, so the probe stages the events plus two trailing "
        "far-future sentinel micro-batches (filtered from the "
        "output) — the replay-side stand-in for the next real events "
        "of an unbounded stream. Must equal the batch LEFT JOIN with "
        "the same interval condition.",
)
def stream_stream_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    return outer_interval_join_replay(spark, sf_dir, how="left_outer")


def outer_interval_join_replay(spark: SparkSession, sf_dir: str,
                               how: str) -> DataFrame:
    """Shared staged replay for the OUTER stream-stream interval-join
    probes (left_outer since r6, full_outer since r13 — round13.py
    imports this so the sentinel protocol cannot drift between them):
    stage the events as the first micro-batch, append two TRAILING
    far-future sentinel micro-batches carrying BOTH event types (the
    first advances the watermark past every real row's match window
    on both sides, the second gives the engine a batch in which to
    emit the flushed unmatched rows), run the watermarked join, and
    filter the sentinels (user_id < 0) from the output."""
    import datetime as dt
    import tempfile
    import time

    from ..streaming.ops import (run_stream_to_table,
                                 stream_stream_interval_join)
    cols = ("event_id long, ts timestamp, user_id long, "
            "event_type string")
    ev = (load_table(spark, sf_dir, "events")
          .select("event_id", "ts", "user_id", "event_type"))
    d = tempfile.mkdtemp(prefix="ssoj_")
    ev.coalesce(2).write.parquet(d + "/data/f1")
    for i, day in enumerate(("2030-01-01", "2030-01-02"), start=1):
        time.sleep(0.05)
        sent = [(-(2 * i - 1), dt.datetime.fromisoformat(day), -1,
                 "view"),
                (-(2 * i), dt.datetime.fromisoformat(day), -1,
                 "purchase")]
        # one-slice parallelize, NOT createDataFrame(...).coalesce(1):
        # plain createDataFrame splits even 2 rows over
        # defaultParallelism Python slices, and coalesce(1) then walks
        # all of them serially in ONE task — ~0.2 s of Python-runner
        # round trip per slice, measured 5.5-7 s per 2-row sentinel
        # write on local[32] vs ~0.5 s for the single-slice form
        (spark.createDataFrame(
            spark.sparkContext.parallelize(sent, numSlices=1), cols)
         .write.parquet(d + f"/data/f{i + 1}"))

    def src():
        return (spark.readStream.schema(cols)
                .option("maxFilesPerTrigger", 1).parquet(d + "/data/*"))

    # state-sized store count (see run_stream_to_table): the sentinel
    # micro-batches carry 4 rows each, so at 32 partitions their cost
    # was pure per-(partition x store) commit machinery — A/B measured
    # 10-12 s -> ~3.7-4.2 s replay at 8, identical output hash
    out = run_stream_to_table(
        stream_stream_interval_join(
            src().filter(F.col("event_type") == "view"),
            src().filter(F.col("event_type") == "purchase"),
            how=how),
        output_mode="append", state_partitions=8)
    return (out.filter(F.col("user_id") >= 0)
            .select(
        "user_id", "view_id", "purchase_id",
        F.date_format("ts_view", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .alias("ts_view"),
        F.date_format("ts_purchase", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .alias("ts_purchase"))
        .orderBy("view_id", "purchase_id"))


@query(
    "stream_windowed_distinct_users",
    oracle="""
SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M:%S')
         AS window_start,
       event_type,
       count(DISTINCT user_id) AS n_distinct
FROM events
GROUP BY 1, 2
ORDER BY window_start, event_type
""",
    tags=("streaming",),
    doc="Exact hourly distinct users per event type on the stream "
        "(streaming/ops.py:windowed_distinct_users) — COUNT(DISTINCT) "
        "decomposed into its streaming-native dual, a stateful "
        "dropDuplicates on (user, type, hour) CHAINED into a windowed "
        "count (the Spark 3.4+ multi-stateful-operator capability). "
        "The hour bucket rides the dedup key, so any arrival order "
        "yields the same counts; must equal batch countDistinct.",
)
def stream_windowed_distinct_users(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    from ..streaming.ops import windowed_distinct_users
    out = run_stream_to_table(
        windowed_distinct_users(events_stream(spark, sf_dir)),
        output_mode="complete")
    return (out.select(
        F.date_format(F.col("window.start"), _TS_FMT)
        .alias("window_start"),
        "event_type", "n_distinct")
        .orderBy("window_start", "event_type"))


@query(
    "stream_versioned_sink",
    oracle="""
SELECT year(ts) AS year, day(ts) AS day, count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY year, day
""",
    tags=("streaming", "etl", "versioning"),
    doc="Streaming sink with a snapshot version per micro-batch "
        "(streaming/ops.py:stream_to_versioned_sink): the full events "
        "replay lands in the hourly layout, each micro-batch commits a "
        "manifest, and the probe reads back the LATEST version AS OF "
        "its commit — per-day aggregates must equal the batch "
        "recompute, proving the stream's exactly-once write and the "
        "version manifest agree on table contents. Version-by-version "
        "delta reconstruction and checkpoint-re-run idempotence are "
        "pytest-pinned (TestVersionedStreamSink).",
)
def stream_versioned_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from ..etl.versioning import list_versions, read_version
    from ..streaming.ops import events_stream, stream_to_versioned_sink
    root = tempfile.mkdtemp(prefix="stream_ver_")
    dest = os.path.join(root, "data")
    q = stream_to_versioned_sink(events_stream(spark, sf_dir), dest,
                                 "ts", os.path.join(root, "ckpt"))
    q.awaitTermination()
    back = read_version(spark, dest, list_versions(dest)[-1])
    return (back.groupBy("year", "day")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("value").cast("decimal(18,2)"))
                 .cast("double").alias("sum_value"))
            .orderBy("year", "day"))


@query(
    "stream_static_join",
    oracle="""
SELECT strftime(time_bucket(INTERVAL 1 DAY, e.ts),
                '%Y-%m-%d %H:%M:%S') AS window_start,
       c.c_mktsegment,
       count(*) AS n,
       CAST(CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS DOUBLE)
            / 100 AS DOUBLE) AS sum_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1, 2
ORDER BY window_start, c_mktsegment
""",
    tags=("streaming", "join"),
    doc="Stream-static enrichment join (streaming/ops.py:"
        "stream_static_enrich_agg): the events stream joins the "
        "BROADCAST customer dimension per micro-batch (no join state "
        "at all — the streaming analog of the star join) and rolls up "
        "per (day window, market segment); must equal the batch "
        "join+aggregate. Money sums ride integer cents (the stateful-"
        "op float rule).",
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.ops import stream_static_enrich_agg
    dim = (load_table(spark, sf_dir, "customer")
           .select(F.col("c_custkey"), F.col("c_mktsegment")))
    ev = events_stream(spark, sf_dir).withColumnRenamed("user_id",
                                                        "c_custkey")
    out = run_stream_to_table(
        stream_static_enrich_agg(ev, dim, "c_custkey", "c_mktsegment"),
        output_mode="complete")
    return (out.select(
        F.date_format("window_start", _TS_FMT).alias("window_start"),
        "c_mktsegment", "n", "sum_value")
        .orderBy("window_start", "c_mktsegment"))


@query(
    "stream_cdc_apply_sink",
    oracle="""
WITH ch AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN event_id % 10 = 0 THEN 'delete' ELSE 'upsert' END AS op
  FROM events
), last AS (
  SELECT user_id, max(event_id) AS m FROM ch GROUP BY 1
)
SELECT c.user_id AS user_id, c.event_id AS event_id,
       strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
       c.value
FROM ch c JOIN last l ON c.user_id = l.user_id AND c.event_id = l.m
WHERE c.op <> 'delete'
ORDER BY c.user_id
""",
    tags=("streaming", "etl", "sink"),
    doc="Streaming CDC consumer capstone (streaming/ops.py:"
        "stream_cdc_to_partitioned): the events replay becomes a "
        "changelog (every 10th event a delete, seq = event_id, key = "
        "user_id), applied per micro-batch through the partition-"
        "targeted seq-dominant merge (deletes persist as tombstones, "
        "so cross-batch OUT-OF-ORDER seqs resolve to the log order, "
        "not the arrival order). Final table state read through "
        "read_cdc_table must equal the batch rule: each user's "
        "highest-seq change, kept iff it is an upsert — the Debezium "
        "tail brought to rest with the write-amplification bound. "
        "Cross-batch reordering, resurrection, and delete-then-upsert "
        "sequences are pytest-pinned (TestStreamCdcApply).",
)
def stream_cdc_apply_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from ..streaming.ops import read_cdc_table, stream_cdc_to_partitioned
    ch = (events_stream(spark, sf_dir)
          .withColumn("op", F.when(F.col("event_id") % 10 == 0,
                                   F.lit("delete"))
                      .otherwise(F.lit("upsert")))
          .withColumn("seq", F.col("event_id")))
    root = tempfile.mkdtemp(prefix="stream_cdc_")
    dest = os.path.join(root, "data")
    q = stream_cdc_to_partitioned(ch, dest, ["user_id"], "ts",
                                  os.path.join(root, "ckpt"))
    q.awaitTermination()
    back = read_cdc_table(spark, dest)
    return (back.select("user_id", "event_id",
                        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS")
                        .alias("ts"), "value")
            .orderBy("user_id"))


@query(
    "stream_novelty_filter",
    oracle=r"""
WITH fp AS (
  SELECT doc_id,
         md5(trim(regexp_replace(regexp_replace(lower(text),
             '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g'))) AS fingerprint
  FROM documents
), hist AS (
  SELECT DISTINCT fingerprint FROM fp WHERE doc_id < 250
)
SELECT f.doc_id, f.fingerprint
FROM fp f LEFT JOIN hist h USING (fingerprint)
WHERE h.fingerprint IS NULL
ORDER BY f.doc_id
""",
    tags=("streaming", "llm", "dedup"),
    doc="Incremental-crawl novelty gate (streaming/ops.py:"
        "novelty_filter): the documents replay streams against the "
        "historical fingerprint manifest (docs < 250) and only "
        "never-seen content survives — fingerprint projection + "
        "stream-static broadcast LEFT ANTI join, no state store (the "
        "manifest IS the state; 16-byte fingerprints, never bodies). "
        "Batch/stream parity is the oracle: the same anti join "
        "recomputed relationally.",
)
def stream_novelty_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.ops import novelty_filter, table_stream
    from ..operators.text import fingerprint
    hist = (load_table(spark, sf_dir, "documents")
            .filter(F.col("doc_id") < 250)
            .select(fingerprint(F.col("text")).alias("fingerprint"))
            .distinct())
    stream = table_stream(spark, sf_dir, "documents")
    novel = novelty_filter(stream, hist).select("doc_id", "fingerprint")
    return run_stream_to_table(novel).orderBy("doc_id")


@query(
    "stream_hourly_topk_trending",
    oracle="""
WITH w AS (
  SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts),
                  '%Y-%m-%d %H:%M:%S') AS window_start,
         event_type, count(*) AS n
  FROM events GROUP BY 1, 2
), r AS (
  SELECT window_start, event_type, n,
         row_number() OVER (PARTITION BY window_start
                            ORDER BY n DESC, event_type) AS rank
  FROM w
)
SELECT window_start, event_type, CAST(n AS BIGINT) AS n,
       CAST(rank AS INTEGER) AS rank
FROM r WHERE rank <= 3
ORDER BY window_start, rank
""",
    tags=("streaming", "analytics"),
    doc="Hourly trending top-3 event types from the stream — the "
        "'what's hot right now' dashboard feed. Ranking is not an "
        "incremental streaming operator (a rank can demote on any "
        "arrival), so the probe runs the STREAMABLE half as a real "
        "streaming query (hourly tumbling counts, complete mode — one "
        "stateful agg) and applies the rank as a bounded batch window "
        "over the materialized per-window counts (rows = windows x "
        "event types, never raw events). The oracle recomputes both "
        "halves relationally — the stream-batch equivalence contract.",
)
def stream_hourly_topk_trending(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    counts = (events_stream(spark, sf_dir)
              .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
              .agg(F.count(F.lit(1)).alias("n")))
    out = run_stream_to_table(
        counts.select(F.col("w.start").alias("window_start"),
                      "event_type", "n"),
        output_mode="complete")
    rk = Window.partitionBy("window_start").orderBy(F.desc("n"),
                                                    F.asc("event_type"))
    return (out.withColumn("rank", F.row_number().over(rk))
            .filter(F.col("rank") <= 3)
            .select(F.date_format("window_start", _TS_FMT)
                    .alias("window_start"),
                    "event_type", F.col("n").cast("long").alias("n"),
                    F.col("rank").cast("int").alias("rank"))
            .orderBy("window_start", "rank"))
