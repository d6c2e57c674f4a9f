"""Scale-pattern probes (round-4, second wave): interval-overlap join,
event-sequence matching, hash-prefiltered semi-join, key-skew
profiling, per-group top-p selection.

Each probe exercises a technique whose value is the 100 TB plan shape
(binned equi-join instead of a nested loop, broadcast prefilter ahead
of a big shuffle, bounded-output diagnostics) while staying
oracle-checkable at sf0.01. Determinism follows SURVEY §7.5: BIGINT
casts on oracle integer sums/lengths, DECIMAL(18,2) for money crossing
aggregates (cast DOUBLE at the boundary), exact-decimal keep
predicates where a double comparison would make the boundary row
engine-dependent, total ORDER BY everywhere.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from .registry import query

#: Single-char codes for the event alphabet (sequence probes).
EVENT_CODES = {"view": "v", "click": "c", "purchase": "p",
               "signup": "s", "error": "e"}


@query(
    "join_interval_overlap",
    oracle="""
WITH a AS (
  SELECT event_id AS l_id, value AS l_lo, value + 2.0 AS l_hi
  FROM events WHERE event_id % 101 = 0
), b AS (
  SELECT event_id AS r_id, value AS r_lo, value + 1.0 AS r_hi
  FROM events WHERE event_id % 103 = 0
)
SELECT l_id, r_id,
       round(least(l_hi, r_hi) - greatest(l_lo, r_lo), 2) AS ov_len
FROM a JOIN b ON l_lo <= r_hi AND r_lo <= l_hi
ORDER BY l_id, r_id
""",
    tags=("join", "range", "scale"),
    doc="Interval-vs-interval overlap join via the binned equi-join "
        "rewrite (operators/rangejoin.py interval_overlap_join): both "
        "sides explode to touched bins, candidates meet on the bin "
        "key, the pair survives only in its overlap-start bin (exactly "
        "once, no dedup shuffle). The oracle is the naive inequality "
        "join the rewrite replaces — same rows, but the Spark plan is "
        "a shuffled hash join, not BroadcastNestedLoop.",
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rangejoin import interval_overlap_join
    ev = load_table(spark, sf_dir, "events")
    a = (ev.filter(F.col("event_id") % 101 == 0)
         .select(F.col("event_id").alias("l_id"),
                 F.col("value").alias("l_lo"),
                 (F.col("value") + 2.0).alias("l_hi")))
    b = (ev.filter(F.col("event_id") % 103 == 0)
         .select(F.col("event_id").alias("r_id"),
                 F.col("value").alias("r_lo"),
                 (F.col("value") + 1.0).alias("r_hi")))
    out = interval_overlap_join(a, b, "l_lo", "l_hi", "r_lo", "r_hi",
                                bin_width=1.0)
    return (out.select(
        "l_id", "r_id",
        F.round(F.least("l_hi", "r_hi") - F.greatest("l_lo", "r_lo"), 2)
        .alias("ov_len"))
        .orderBy("l_id", "r_id"))


@query(
    "sequence_match_events",
    oracle="""
WITH coded AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts_us, event_id,
         CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
              WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'
              WHEN 'error' THEN 'e' ELSE '_' END AS c
  FROM events
), seqs AS (
  SELECT user_id, string_agg(c, '' ORDER BY ts_us, event_id) AS seq
  FROM coded GROUP BY user_id
)
SELECT user_id, CAST(length(seq) AS BIGINT) AS n_events,
       CAST(length(regexp_extract_all(seq, 'vc*p')) AS BIGINT)
         AS n_matches
FROM seqs ORDER BY user_id
""",
    tags=("sequence", "analytics"),
    doc="MATCH_RECOGNIZE-lite (operators/sequence.py): each user's "
        "history becomes one code string (array_sort over (ts, "
        "event_id) structs -> transform -> array_join, one shuffle), "
        "then regexp_count('vc*p') counts view->clicks->purchase runs "
        "JVM-side. Oracle: string_agg ORDER BY + regexp_extract_all. "
        "Both engines order by the µs-truncated timestamp (the "
        "catalog's ns->µs normalization) with event_id tiebreak.",
)
def sequence_match_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sequence import sequence_match
    ev = load_table(spark, sf_dir, "events")
    out = sequence_match(ev, "user_id", "ts", "event_type",
                         EVENT_CODES, "vc*p", tiebreak_col="event_id")
    return out.orderBy("user_id")


@query(
    "sequence_transition_matrix",
    oracle="""
WITH pairs AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS from_type,
         event_type AS to_type
  FROM events
), cells AS (
  SELECT from_type, to_type, count(*) AS n
  FROM pairs WHERE from_type IS NOT NULL GROUP BY 1, 2
)
SELECT from_type, to_type, n,
       CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT) AS n_from,
       round(n / CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT), 6)
         AS p
FROM cells ORDER BY from_type, to_type
""",
    tags=("sequence", "analytics"),
    doc="First-order Markov transition matrix over per-user event "
        "histories (operators/sequence.py:transition_matrix): lag "
        "pairs over one (user) window shuffle, (from,to) cell counts, "
        "row-normalized P(to|from) as one double division from exact "
        "integer counts. The normalizing window runs over the |types|² "
        "cell table, bounded by construction.",
)
def sequence_transition_matrix(spark: SparkSession, sf_dir: str,
                               ) -> DataFrame:
    from ..operators.sequence import transition_matrix
    ev = load_table(spark, sf_dir, "events")
    out = transition_matrix(ev, "user_id", "ts", "event_type",
                            tiebreak_col="event_id")
    return out.orderBy("from_type", "to_type")


@query(
    "join_hashset_prefilter",
    oracle="""
SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
         AS sum_qty
FROM lineitem WHERE l_orderkey IN (
  SELECT o_orderkey FROM orders
  WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 150000)
GROUP BY l_returnflag ORDER BY l_returnflag
""",
    tags=("join", "semi", "scale"),
    doc="Semi-join behind a broadcast hash-bucket prefilter "
        "(operators/skew.py hash_prefilter_semi_join) — the manual "
        "runtime-bloom-filter join: the key side collapses to distinct "
        "xxhash64%2^17 buckets (broadcastable even when the key table "
        "is not), non-matching fact rows drop before the shuffle, the "
        "exact semi-join over survivors removes bucket collisions. "
        "Result == plain IN-subquery semi-join (the oracle).",
)
def join_hashset_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import hash_prefilter_semi_join
    li = load_table(spark, sf_dir, "lineitem")
    keys = (load_table(spark, sf_dir, "orders")
            .filter((F.col("o_orderpriority") == "1-URGENT")
                    & (F.col("o_totalprice") > 150000))
            .select(F.col("o_orderkey").alias("l_orderkey")))
    out = hash_prefilter_semi_join(li, keys, ["l_orderkey"])
    return (out.groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                 .cast("double").alias("sum_qty"))
            .orderBy("l_returnflag"))


@query(
    "key_skew_profile",
    oracle="""
SELECT user_id, CAST(count(*) AS BIGINT) AS n_rows
FROM events GROUP BY user_id
ORDER BY n_rows DESC, user_id LIMIT 15
""",
    tags=("diagnostics", "skew"),
    doc="Heavy-key histogram (operators/skew.py key_histogram): the "
        "bounded-output diagnostic that decides whether a join needs "
        "salting — one aggregate, top-15 by row count with a "
        "deterministic key tiebreak.",
)
def key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import key_histogram
    ev = load_table(spark, sf_dir, "events")
    return key_histogram(ev, ["user_id"], top=15)


@query(
    "select_top_p_group",
    oracle="""
WITH s AS (
  SELECT o_orderpriority, o_orderkey,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
           PARTITION BY o_orderpriority
           ORDER BY o_totalprice DESC, o_orderkey
           ROWS UNBOUNDED PRECEDING) AS cum,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
           PARTITION BY o_orderpriority) AS tot
  FROM orders WHERE o_orderkey < 20000
)
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_kept,
       min(o_orderkey) AS first_key, max(o_orderkey) AS last_key,
       CAST(sum(price) AS DOUBLE) AS kept_price
FROM s
WHERE cum - price < CAST('0.25' AS DECIMAL(9,6)) * tot
GROUP BY 1 ORDER BY 1
""",
    tags=("sampling", "curation"),
    doc="Nucleus (top-p) selection per group (operators/sampling.py "
        "top_p_by_group): keep each priority class's highest-priced "
        "orders until 25% of its price mass is covered. Running and "
        "total sums ride ONE window sort; the keep predicate is exact "
        "DECIMAL arithmetic so the boundary row is engine- and "
        "fold-order-independent.",
)
def select_top_p_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import top_p_by_group
    o = (load_table(spark, sf_dir, "orders")
         .filter(F.col("o_orderkey") < 20000))
    kept = top_p_by_group(o, ["o_orderpriority"], "o_totalprice",
                          p="0.25", tiebreak_cols=["o_orderkey"])
    return (kept.groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_kept"),
                 F.min("o_orderkey").alias("first_key"),
                 F.max("o_orderkey").alias("last_key"),
                 F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                 .cast("double").alias("kept_price"))
            .orderBy("o_orderpriority"))


@query(
    "embedding_label_centroids",
    oracle="""
WITH x AS (
  SELECT label, generate_subscripts(embedding, 1) - 1 AS pos,
         unnest(embedding) AS v
  FROM embeddings
)
SELECT label, pos,
       CAST(sum(CAST(floor(CAST(v AS DOUBLE) * 1000000000.0) AS BIGINT))
            AS DOUBLE) / 1000000000.0 / count(*) AS c
FROM x GROUP BY 1, 2 ORDER BY 1, 2
""",
    tags=("embedding", "aggregate"),
    doc="Per-label mean embedding (operators/similarity.py "
        "label_centroids): posexplode to (label, dim) cells, exact "
        "integer sums on a floor(v*1e9) grid + one double division "
        "(fold-order- and engine-independent; double->DECIMAL casts "
        "are not), reassembled via pos-sorted collect. "
        "The probe explodes the assembled centroid back to long form "
        "so the round-trip (explode -> agg -> collect -> explode) is "
        "itself verified against DuckDB's unnest/generate_subscripts.",
)
def embedding_label_centroids(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    from ..operators.similarity import label_centroids
    emb = load_table(spark, sf_dir, "embeddings")
    cent = label_centroids(emb, "label", "embedding")
    return (cent.select("label",
                        F.posexplode("centroid").alias("pos", "c"))
            .orderBy("label", "pos"))


@query(
    "graph_pagerank",
    oracle=None,  # iterative double accumulation: bit-identity across
                  # engines isn't defined; NumPy power-iteration
                  # agreement within 1e-9 + mass conservation are
                  # pytest-pinned (tests/test_scale_ops.py), the same
                  # evidence contract as the LSH family
    tags=("graph", "analytics"),
    priority=150,
    doc="PageRank over the customer->supplier order graph (operators/"
        "graph.py:pagerank): fixed-iteration power method, one "
        "equi-join + one aggregate per round, per-round lineage "
        "truncation, dangling mass redistributed via a broadcast 1-row "
        "aggregate. The second iterative-algorithm family next to "
        "connected components (dedup_clusters).",
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import pagerank
    o = load_table(spark, sf_dir, "orders").select("o_orderkey",
                                                   "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey",
                                                      "l_suppkey")
    edges = (o.join(li, o.o_orderkey == li.l_orderkey)
             .select(F.concat(F.lit("c"), "o_custkey").alias("src"),
                     F.concat(F.lit("s"), "l_suppkey").alias("dst")))
    pr = pagerank(edges, iters=10)
    return (pr.select("node", F.round("rank", 6).alias("rank"))
            .orderBy(F.desc("rank"), F.asc("node")).limit(20))


def _bloom_digit_sql(h: str, p: int) -> str:
    a = f"ascii(substr({h}, {p}, 1))"
    return f"(CASE WHEN {a} >= 97 THEN {a} - 87 ELSE {a} - 48 END)"


def _bloom_bucket_sql(j: int, key: str) -> str:
    h = f"md5(concat('{j}|', CAST({key} AS VARCHAR)))"
    return (f"({_bloom_digit_sql(h, 1)} * 256 + "
            f"{_bloom_digit_sql(h, 2)} * 16 + {_bloom_digit_sql(h, 3)})")


@query(
    "layout_bloom_prune",
    oracle=f"""
WITH ev AS (
  SELECT CAST(ts AS DATE) AS day, user_id FROM events
), idx AS (
  SELECT DISTINCT day, bucket FROM (
    SELECT day, unnest([{_bloom_bucket_sql(0, 'user_id')},
                        {_bloom_bucket_sql(1, 'user_id')},
                        {_bloom_bucket_sql(2, 'user_id')}]) AS bucket
    FROM ev
  )
), probe_keys AS (
  SELECT DISTINCT user_id FROM events WHERE user_id % 37 = 0
), pk AS (
  SELECT DISTINCT user_id, bucket FROM (
    SELECT user_id, unnest([{_bloom_bucket_sql(0, 'user_id')},
                            {_bloom_bucket_sql(1, 'user_id')},
                            {_bloom_bucket_sql(2, 'user_id')}]) AS bucket
    FROM probe_keys
  )
), need AS (
  SELECT user_id, count(*) AS nd FROM pk GROUP BY 1
), hits AS (
  SELECT pk.user_id, idx.day, count(*) AS nb
  FROM pk JOIN idx USING (bucket)
  GROUP BY 1, 2
)
SELECT h.user_id, h.day
FROM hits h JOIN need n ON h.user_id = n.user_id
WHERE h.nb = n.nd
ORDER BY h.user_id, h.day
""",
    tags=("layout", "scale"),
    doc="Bloom-filter partition index + point-lookup pruning "
        "(operators/layout.py:bloom_partition_index/bloom_prune): "
        "per-day bloom filters over user_id stored AS A TABLE of set "
        "bits (k=3 salted md5 buckets in [0,4096)), then the qualified "
        "(probe key, day) pairs by the all-buckets-present "
        "conjunction. High-cardinality point lookups that min/max "
        "footer stats (zorder) cannot skip become an index-table "
        "equi-join — Delta/Hudi's bloom index relationally. The "
        "portable ascii-arithmetic hash family means the oracle "
        "recomputes the INDEX CONTENT bit-for-bit; no-false-negative "
        "and pruning-power properties are pytest-pinned.",
)
def layout_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.layout import bloom_partition_index, bloom_prune
    ev = (load_table(spark, sf_dir, "events")
          .withColumn("day", F.to_date("ts")))
    idx = bloom_partition_index(ev, ["day"], "user_id", k=3)
    probes = ev.filter(F.col("user_id") % 37 == 0).select("user_id")
    out = bloom_prune(idx, probes, "user_id", ["day"], k=3)
    return out.orderBy("user_id", "day")


@query(
    "layout_zonemap_prune",
    oracle="""
WITH zm AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS n_rows,
         min(value) AS lo_value, max(value) AS hi_value
  FROM events GROUP BY 1
)
SELECT day, n_rows, lo_value, hi_value FROM zm
WHERE lo_value <= 500.0 AND hi_value >= 300.0
ORDER BY day
""",
    tags=("scale", "layout"),
    doc="Zone-map scan planning (operators/layout.py:zonemap_index / "
        "zonemap_prune — the Iceberg/Delta manifest-stats idea as a "
        "relational op): per-day min/max/count manifest over events "
        "(one map-side-combined hash aggregate), then the partitions a "
        "value BETWEEN 300 AND 500 scan must read via interval overlap "
        "on the index table — index-sized planning work, no false "
        "negatives by min/max definition. Complements the bloom index "
        "(point lookups) and zorder_key (making ranges prunable).",
)
def layout_zonemap_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.layout import zonemap_index, zonemap_prune
    ev = (load_table(spark, sf_dir, "events")
          .withColumn("day", F.to_date("ts")))
    idx = zonemap_index(ev, ["day"], ["value"])
    return (zonemap_prune(idx, "value", 300.0, 500.0)
            .select("day", "n_rows", "lo_value", "hi_value")
            .orderBy("day"))
