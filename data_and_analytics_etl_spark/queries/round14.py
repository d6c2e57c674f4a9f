"""Round-14 STAGED probe cohort — written in round 13, NOT registered.

The r13 verification window closed with its 5-probe cohort pinned at
registration (the r11 ≤5-per-round rule, re-affirmed by the r12
verdict task 4 and CI-pinned by tests/test_registry.py); registering
more probes mid-round would either breach the cap or reopen the
never-driver-verified set. These probes are therefore STAGED: the
operator code, probe callables, DuckDB oracles, and local oracle-
equivalence tests (tests/test_round14_staged.py) are complete and
green, but nothing here touches the registry. At r14 start the
round-open procedure (verify skill, "Registry r13" note) moves each
entry to a ``@query`` registration in this module with tier 30 in
``registry.ROUND_TIERS`` — a mechanical change, after which the
normal 3-scale sweep re-earns their records.

Every probe follows the determinism contract (registry module doc):
exact integer accumulation, ONE double chain per emitted value,
identical aliases both sides, pinned total ORDER BY, nonnegative DIV
parity, md5 as the only cross-engine hash.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from .registry import QuerySpec

#: name -> QuerySpec for every staged probe. Deliberately NOT fed into
#: registry.REGISTRY (see module doc); tests/test_round14_staged.py
#: runs the same oracle comparison the registered probes get.
STAGED: dict[str, QuerySpec] = {}


def _staged(name: str, oracle: str | None = None,
            tags: tuple[str, ...] = (), doc: str = ""):
    """@query's twin for staged probes: identical wrapping (runtime
    conf re-applied so results survive a hostile driver session),
    identical QuerySpec shape, NO registration side effect."""
    def deco(fn):
        import functools

        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            from ..session import apply_runtime_conf
            apply_runtime_conf(spark)
            return fn(spark, sf_dir)

        STAGED[name] = QuerySpec(name=name, fn=wrapped, oracle=oracle,
                                 tags=tags, doc=doc or (fn.__doc__ or ""))
        return fn
    return deco


# --------------------------------------------------------------------------
# 1. graph_scc — strongly connected components on a cyclic digraph
# --------------------------------------------------------------------------
#
# The probe graph must CONTAIN cycles (the digit hierarchy every other
# graph probe rides is a forest, where SCC is vacuously all-singletons):
# custkeys tile into directed 8-rings (u -> next offset in its block of
# 8), and one-way chords (offset-3 node -> the next block's offset-3
# node, chains capped at 3 blocks) make the condensation a nontrivial
# DAG without merging rings. Brute-force-verified at every test scale:
# max shortest-path distance is EXACTLY 16 (= the closure horizon:
# 7 ring steps + 2 chords + 7 ring steps), reach <= 24 nodes/node, so
# the bounded Spark closure and the oracle's unbounded recursive
# fixpoint provably agree. Partial trailing blocks lose their wrap
# edge (target key absent -> semi-join drops it) and become paths:
# singleton SCCs, exercised rather than avoided.

_SCC_ORACLE = """
WITH RECURSIVE e AS (
  SELECT k AS s, t AS d FROM (
    SELECT c_custkey AS k,
           (c_custkey - (c_custkey % 8)) + ((c_custkey % 8 + 1) % 8)
             AS t
    FROM customer
    UNION ALL
    SELECT c_custkey AS k, c_custkey + 8 AS t FROM customer
    WHERE c_custkey % 8 = 3 AND (c_custkey // 8) % 3 <> 2
  ) cand
  WHERE t IN (SELECT c_custkey FROM customer)
),
nodes AS (
  SELECT DISTINCT node FROM
    (SELECT s AS node FROM e UNION ALL SELECT d FROM e) t
),
reach AS (
  SELECT s AS node, d AS anc FROM e
  UNION
  SELECT r.node, e.d FROM reach r JOIN e ON e.s = r.anc
),
r2 AS (
  SELECT node, anc FROM reach
  UNION
  SELECT node, node AS anc FROM nodes
),
mutual AS (
  SELECT a.node, a.anc
  FROM r2 a JOIN r2 b ON a.node = b.anc AND a.anc = b.node
),
scc AS (SELECT node, min(anc) AS scc_id FROM mutual GROUP BY node),
sz AS (SELECT scc_id, CAST(count(*) AS BIGINT) AS scc_size
       FROM scc GROUP BY 1)
SELECT s.node, s.scc_id, z.scc_size
FROM scc s JOIN sz z USING (scc_id)
ORDER BY s.node
"""


@_staged(
    "graph_scc",
    oracle=_SCC_ORACLE,
    tags=("graph", "recursive"),
    doc="Strongly connected components (operators/graph.py:"
        "strongly_connected_components) over a derived cyclic digraph "
        "of custkey 8-rings chained by one-way chords — the directed "
        "counterpart of dedup_clusters' undirected connected "
        "components, and the condensation step cycle-safe DAG "
        "analytics start from. u,v share an SCC iff mutually "
        "reachable: ONE bounded min-plus closure (shared "
        "_minplus_doubling, 4 rounds), identity pairs, then reach ∩ "
        "reach-transpose as a single left-semi equi-join; scc_id is "
        "the min mutual node (min-label convention), sizes one more "
        "id-grain aggregate. The oracle replays it as an UNBOUNDED "
        "recursive-CTE fixpoint (UNION-distinct terminates on "
        "cycles), valid because the probe graph's max shortest path "
        "is brute-force-pinned at exactly the 16-hop horizon "
        "(tests/test_round14_staged.py). Complete 8-rings resolve to "
        "size-8 components, trailing partial blocks to singletons; "
        "chords never merge rings (one-way), making the answer "
        "structurally nontrivial in both directions.",
)
def graph_scc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import strongly_connected_components
    c = (load_table(spark, sf_dir, "customer")
         .select(F.col("c_custkey").alias("k")))
    ring = c.select(
        "k",
        ((F.col("k") - F.col("k") % 8)
         + ((F.col("k") % 8 + 1) % 8)).alias("t"))
    chord = (c.filter((F.col("k") % 8 == 3)
                      & (F.expr("k DIV 8") % 3 != 2))
             .select("k", (F.col("k") + 8).alias("t")))
    cand = ring.unionByName(chord)
    # eager lineage cut BEFORE the doubling loop: the closure's
    # logical tree replicates its seed 3^rounds times, and this
    # 5-operator edge construction (2 scans + union + semi-join)
    # multiplied out dominates analyzer time (the SCC measurement in
    # operators/graph.py:strongly_connected_components). The edge
    # list is O(nodes) rows — checkpointing it is cheap and flattens
    # every copy to one LogicalRDD scan.
    edges = (cand.join(c.select(F.col("k").alias("t")), "t",
                       "left_semi")
             .select(F.col("k").alias("src"), F.col("t").alias("dst"))
             .localCheckpoint(eager=True))
    return (strongly_connected_components(edges, max_depth=16)
            .orderBy("node"))


# --------------------------------------------------------------------------
# 2. sketch_kmv_set_ops — theta/KMV sketch set algebra, oracle-exact
# --------------------------------------------------------------------------

def _hex12_to_bigint(expr: str) -> str:
    """48-bit integer from the first 12 hex chars of ``expr`` (DuckDB
    has no conv()) — the sketch_join_cardinality per-character fold,
    generated instead of hand-pasted."""
    terms = []
    for i in range(12):
        c = f"substr({expr}, {i + 1}, 1)"
        d = (f"(CASE WHEN ascii({c}) >= 97 THEN ascii({c}) - 87 "
             f"ELSE ascii({c}) - 48 END)")
        # the power literal must be BIGINT-typed: DuckDB types small
        # literals INT32 and 13 * 16^7 overflows at execution time
        terms.append(f"{d} * CAST({16 ** (11 - i)} AS BIGINT)")
    return "(" + "\n     + ".join(terms) + ")"


_KMV_ORACLE = f"""
WITH base AS (
  SELECT DISTINCT o_orderpriority AS g, o_custkey AS v FROM orders
),
h AS (
  SELECT DISTINCT g,
         CAST({_hex12_to_bigint('hx')} + 1 AS DOUBLE)
           / CAST(281474976710656 AS DOUBLE) AS hv
  FROM (SELECT g, md5(CAST(v AS VARCHAR)) AS hx FROM base) t
),
sk AS (
  SELECT g, hv FROM (
    SELECT g, hv, row_number() OVER (PARTITION BY g ORDER BY hv) AS rn
    FROM h) r WHERE rn <= 64
),
gs AS (SELECT DISTINCT g FROM base),
pairs AS (SELECT a.g AS ga, b.g AS gb FROM gs a JOIN gs b ON a.g < b.g),
tag AS (
  SELECT ga, gb, hv, max(in_a) AS in_a, max(in_b) AS in_b FROM (
    SELECT p.ga, p.gb, s.hv, 1 AS in_a, 0 AS in_b
    FROM pairs p JOIN sk s ON s.g = p.ga
    UNION ALL
    SELECT p.ga, p.gb, s.hv, 0 AS in_a, 1 AS in_b
    FROM pairs p JOIN sk s ON s.g = p.gb) t
  GROUP BY 1, 2, 3
),
u AS (
  SELECT * FROM (
    SELECT ga, gb, hv, in_a, in_b,
           row_number() OVER (PARTITION BY ga, gb ORDER BY hv) AS rn
    FROM tag) r WHERE rn <= 64
),
agg AS (
  SELECT ga, gb,
         max(CASE WHEN rn = 64 THEN hv END) AS theta,
         CAST(sum(in_a * in_b) AS BIGINT) AS ci,
         CAST(sum(in_a * (1 - in_b)) AS BIGINT) AS ca_only
  FROM u GROUP BY 1, 2
),
ex AS (
  SELECT x.g AS ga, y.g AS gb, CAST(count(*) AS BIGINT) AS exact_inter
  FROM base x JOIN base y ON x.v = y.v AND x.g < y.g
  GROUP BY 1, 2
),
sizes AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM base GROUP BY 1)
SELECT a.ga, a.gb,
       CAST(63 AS DOUBLE) / a.theta AS union_est,
       CAST(a.ci AS DOUBLE) * (CAST(63 AS DOUBLE) / a.theta)
         / CAST(64 AS DOUBLE) AS inter_est,
       CAST(a.ca_only AS DOUBLE) * (CAST(63 AS DOUBLE) / a.theta)
         / CAST(64 AS DOUBLE) AS a_not_b_est,
       sa.n + sb.n - coalesce(e.exact_inter, 0) AS exact_union,
       coalesce(e.exact_inter, 0) AS exact_inter
FROM agg a
JOIN sizes sa ON sa.g = a.ga
JOIN sizes sb ON sb.g = a.gb
LEFT JOIN ex e ON e.ga = a.ga AND e.gb = a.gb
ORDER BY a.ga, a.gb
"""


@_staged(
    "sketch_kmv_set_ops",
    oracle=_KMV_ORACLE,
    tags=("sketch", "analytics"),
    doc="KMV/theta-sketch set algebra (operators/sketch.py:kmv_build/"
        "kmv_set_ops — Beyer et al. SIGMOD'07, the theta-sketch "
        "framework's bottom-k half): per-orderpriority sketches of "
        "the distinct custkey sets (k=64 smallest dyadic-exact "
        "md5-derived hashes, two-phase salted bottom-k), then per "
        "pair union/intersection/difference ESTIMATES from the "
        "sketches alone — (k-1)/theta and the membership-count "
        "scalings, fixed IEEE chains over dyadic inputs, so the "
        "APPROXIMATION hash-matches the oracle bit-for-bit (the "
        "hyperball move applied to set algebra). Exact truth columns "
        "ride along from one value-grain self-join (the "
        "sketch_join_cardinality convention), so the driver row "
        "checks estimate AND ground truth; the merge law (sketch of "
        "union == merge of sketches, exactly) plus error-vs-exact "
        "bounds are pytest-pinned in tests/test_round14_staged.py.",
)
def sketch_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketch import kmv_build, kmv_set_ops
    o = load_table(spark, sf_dir, "orders")
    base = (o.select(F.col("o_orderpriority").alias("g"),
                     F.col("o_custkey").alias("v"))
            .distinct())
    sk = kmv_build(base, ["g"], "v", k=64)
    ops = kmv_set_ops(sk, "g", k=64)
    sizes = base.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n"))
    ex = (base.alias("x")
          .join(base.alias("y"),
                (F.col("x.v") == F.col("y.v"))
                & (F.col("x.g") < F.col("y.g")))
          .groupBy(F.col("x.g").alias("ga"), F.col("y.g").alias("gb"))
          .agg(F.count(F.lit(1)).cast("long").alias("exact_inter")))
    return (ops
            .join(F.broadcast(sizes.select(F.col("g").alias("ga"),
                                           F.col("n").alias("na"))),
                  "ga")
            .join(F.broadcast(sizes.select(F.col("g").alias("gb"),
                                           F.col("n").alias("nb"))),
                  "gb")
            .join(ex, ["ga", "gb"], "left")
            .select("ga", "gb", "union_est", "inter_est",
                    "a_not_b_est",
                    (F.col("na") + F.col("nb")
                     - F.coalesce("exact_inter", F.lit(0)))
                    .alias("exact_union"),
                    F.coalesce("exact_inter", F.lit(0))
                    .alias("exact_inter"))
            .orderBy("ga", "gb"))


# --------------------------------------------------------------------------
# 3. corpus_dsir_weights — DSIR importance-resampling selection weights
# --------------------------------------------------------------------------

def _hex2_to_int(expr: str) -> str:
    """Bucket in [0, 256) from the first 2 hex chars of ``expr``."""
    out = []
    for i, mult in ((1, 16), (2, 1)):
        c = f"substr({expr}, {i}, 1)"
        out.append(f"(CASE WHEN ascii({c}) >= 97 THEN ascii({c}) - 87 "
                   f"ELSE ascii({c}) - 48 END) * {mult}")
    return "(" + " + ".join(out) + ")"


_DSIR_ORACLE = rf"""
WITH d AS (
  SELECT doc_id, lang = 'en' AS is_target,
         list_filter(string_split_regex(lower(text), '\s+'),
                     w -> w <> '') AS t
  FROM documents WHERE text IS NOT NULL
),
feats AS (
  SELECT doc_id, is_target,
         {_hex2_to_int("md5(feat)")} AS bucket
  FROM (
    SELECT doc_id, is_target, 'u|' || w AS feat
    FROM (SELECT doc_id, is_target, unnest(t) AS w FROM d) fu
    UNION ALL
    SELECT doc_id, is_target, 'b|' || bg AS feat
    FROM (SELECT doc_id, is_target,
                 unnest(list_transform(range(1, len(t)),
                                       i -> t[i] || ' ' || t[i + 1]))
                   AS bg
          FROM d) fb
  ) f
),
dbc AS (
  SELECT doc_id, is_target, bucket, CAST(count(*) AS BIGINT) AS c
  FROM feats GROUP BY 1, 2, 3
),
stats AS (
  SELECT bucket,
         CAST(sum(CASE WHEN is_target THEN c ELSE 0 END) AS BIGINT)
           AS ct,
         CAST(sum(CASE WHEN NOT is_target THEN c ELSE 0 END)
              AS BIGINT) AS cr
  FROM dbc GROUP BY 1
),
tot AS (
  SELECT CAST(sum(ct) AS BIGINT) AS nt, CAST(sum(cr) AS BIGINT) AS nr
  FROM stats
),
lam AS (
  SELECT bucket,
         ln(CAST((ct + 1) * (nr + 256) AS DOUBLE)
            / CAST((cr + 1) * (nt + 256) AS DOUBLE)) AS lam
  FROM stats, tot
),
q AS (
  SELECT dbc.doc_id, dbc.is_target, dbc.c,
         CAST(floor(CAST(dbc.c AS DOUBLE) * lam.lam
                    * CAST(1000000 AS DOUBLE)) AS BIGINT) AS q
  FROM dbc JOIN lam USING (bucket)
)
SELECT doc_id, is_target,
       CAST(sum(c) AS BIGINT) AS n_grams,
       CAST(sum(q) AS BIGINT) AS weight_q,
       CAST(CAST(sum(q) AS BIGINT) AS DOUBLE)
         / CAST(1000000 AS DOUBLE) AS weight
FROM q GROUP BY 1, 2
ORDER BY doc_id
"""


@_staged(
    "corpus_dsir_weights",
    oracle=_DSIR_ORACLE,
    tags=("llm", "corpus"),
    doc="DSIR importance-resampling weights (operators/corpus.py:"
        "dsir_importance_weights — Xie et al. 2023): every document "
        "scored by the log-likelihood ratio of its hashed unigram+"
        "bigram bag under the target domain (lang='en') vs the raw "
        "pool, add-1 smoothed over 256 md5 buckets — the pretraining "
        "data-selection step between quality gates and mixture "
        "planning. One tokenize+explode pass, one (doc,bucket) "
        "aggregate, a 256-row broadcast model (bucket hashing bounds "
        "model size regardless of corpus scale — DSIR's own trick); "
        "each per-(doc,bucket) c·ln-ratio term floor-quantizes to "
        "the 1e-6 grid BEFORE the per-doc sum (unigram-KL rule), so "
        "weight_q is an exact integer cross-engine. The "
        "target-separation property (target docs skew positive) is "
        "pytest-pinned.",
)
def corpus_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.corpus import dsir_importance_weights
    d = load_table(spark, sf_dir, "documents")
    return (dsir_importance_weights(d, target=F.col("lang") == "en")
            .orderBy("doc_id"))


# --------------------------------------------------------------------------
# 4. timeseries_dtw_band — banded DTW between consecutive daily shapes
# --------------------------------------------------------------------------

_DTW_INF = 1 << 50


def _dtw_oracle(n: int = 24, band: int = 2) -> str:
    """Recursive-CTE replay of operators/timeseries.py:
    dtw_band_distance — the SAME anti-diagonal fold, one recursion
    step per diagonal d, state = the two previous diagonals as
    BIGINT lists. DuckDB list indexing is 1-based and returns NULL
    out of range, so the i−1 accesses coalesce to the sentinel
    instead of guarding (the Spark side clamps indices — same
    values, dialect-appropriate spelling). All min-plus integer
    arithmetic: hash-exact with no float until the final /100."""
    inf = f"CAST({_DTW_INF} AS BIGINT)"
    return f"""
WITH RECURSIVE hourly AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(EXTRACT(hour FROM ts) AS INTEGER) AS h,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s
  FROM events GROUP BY 1, 2, 3
),
grid AS (
  SELECT d.event_type, d.day, g.h
  FROM (SELECT DISTINCT event_type, day FROM hourly) d,
       (SELECT CAST(unnest(range(0, {n})) AS INTEGER) AS h) g
),
filled AS (
  SELECT g.event_type, g.day, g.h, coalesce(hh.s, 0) AS s
  FROM grid g LEFT JOIN hourly hh
    ON hh.event_type = g.event_type AND hh.day = g.day
   AND hh.h = g.h
),
serie AS (
  SELECT event_type, day, list(s ORDER BY h) AS arr
  FROM filled GROUP BY 1, 2
),
pairs AS (
  SELECT x.event_type, x.day AS da, y.day AS db,
         x.arr AS a, y.arr AS b
  FROM serie x JOIN serie y
    ON x.event_type = y.event_type AND y.day = x.day + 1
),
dp AS (
  SELECT event_type, da, db, a, b, -1 AS d,
         list_transform(range(0, {n}), x -> {inf}) AS p2,
         list_transform(range(0, {n}), x -> {inf}) AS p1
  FROM pairs
  UNION ALL
  SELECT event_type, da, db, a, b, d + 1,
         p1 AS p2,
         list_transform(range(0, {n}), i ->
           CASE WHEN abs(2 * i - (d + 1)) <= {band}
                 AND i <= d + 1 AND (d + 1) - i <= {n - 1}
                THEN least(
                  abs(a[i + 1] - b[(d + 1) - i + 1])
                  + CASE WHEN d + 1 = 0 AND i = 0 THEN 0
                         ELSE least(coalesce(p1[i], {inf}),
                                    coalesce(p1[i + 1], {inf}),
                                    coalesce(p2[i], {inf}))
                    END,
                  {inf})
                ELSE {inf}
           END) AS p1
  FROM dp WHERE d < {2 * n - 2}
)
SELECT event_type, da, db, p1[{n}] AS dtw_q,
       CAST(p1[{n}] AS DOUBLE) / CAST(100 AS DOUBLE) AS dtw
FROM dp WHERE d = {2 * n - 2}
ORDER BY event_type, da
"""


@_staged(
    "timeseries_dtw_band",
    oracle=_dtw_oracle(),
    tags=("timeseries",),
    doc="Banded Dynamic Time Warping between consecutive days' "
        "hourly shapes (operators/timeseries.py:dtw_band_distance — "
        "Sakoe & Chiba '78, band r=2): per (event_type, day) the "
        "24-hour cents-quantized value series, zero-filled from an "
        "explicit hour grid (collect order never trusted), DTW'd "
        "against the next calendar day — the elastic distance SAX "
        "indexing shortlists for. The WHOLE O(n²) DP runs as one "
        "codegen F.aggregate fold over anti-diagonals (no UDF, no "
        "driver loop, integer min-plus only), and the oracle replays "
        "the identical fold as a 47-step recursive CTE — exact "
        "integer equality end to end, verified additionally against "
        "a Python DP reference on hand series "
        "(tests/test_round14_staged.py). Scale: one (type,day,hour) "
        "aggregate, one day-adjacent self-join at (type,day) grain, "
        "~1.1k expression ops per pair row; pairs = types x days, "
        "never data x data.",
)
def timeseries_dtw_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import dtw_band_distance
    ev = load_table(spark, sf_dir, "events")
    hourly = (ev.groupBy("event_type",
                         F.to_date("ts").alias("day"),
                         F.hour("ts").alias("h"))
              .agg(F.sum(F.round(F.col("value") * 100).cast("long"))
                   .alias("s")))
    serie = (hourly.groupBy("event_type", "day")
             .agg(F.map_from_entries(
                 F.collect_list(F.struct("h", "s"))).alias("m"))
             .select("event_type", "day",
                     F.transform(
                         F.sequence(F.lit(0), F.lit(23)),
                         lambda h: F.coalesce(
                             F.element_at(F.col("m"), h),
                             F.lit(0).cast("long"))).alias("arr")))
    pairs = (serie.alias("x")
             .join(serie.alias("y"),
                   (F.col("x.event_type") == F.col("y.event_type"))
                   & (F.col("y.day") == F.date_add(F.col("x.day"), 1)))
             .select(F.col("x.event_type").alias("event_type"),
                     F.col("x.day").alias("da"),
                     F.col("y.day").alias("db"),
                     F.col("x.arr").alias("a"),
                     F.col("y.arr").alias("b")))
    q = dtw_band_distance(F.col("a"), F.col("b"), 24, band=2)
    return (pairs.select("event_type", "da", "db",
                         q.alias("dtw_q"),
                         (q.cast("double") / F.lit(100.0))
                         .alias("dtw"))
            .orderBy("event_type", "da"))


# --------------------------------------------------------------------------
# 5. feature_best_gini_split — CART split finding over bucketized features
# --------------------------------------------------------------------------

_GINI_ORACLE = """
WITH o AS (
  SELECT o_custkey, o_orderdate, o_totalprice,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y
  FROM orders
),
long AS (
  SELECT 'custmod16' AS feature, o_custkey % 16 AS v, y FROM o
  UNION ALL
  SELECT 'day' AS feature,
         CAST(EXTRACT(day FROM o_orderdate) AS BIGINT) AS v, y FROM o
  UNION ALL
  SELECT 'price_10k' AS feature,
         CAST(floor(o_totalprice / 10000) AS BIGINT) AS v, y FROM o
),
agg AS (
  SELECT feature, v, CAST(count(*) AS BIGINT) AS cnt,
         CAST(sum(y) AS BIGINT) AS pos
  FROM long GROUP BY 1, 2
),
tot AS (
  SELECT feature, CAST(sum(cnt) AS BIGINT) AS n,
         CAST(sum(pos) AS BIGINT) AS p
  FROM agg GROUP BY 1
),
cum AS (
  SELECT feature, v,
         CAST(sum(cnt) OVER (PARTITION BY feature ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS nl,
         CAST(sum(pos) OVER (PARTITION BY feature ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS pl
  FROM agg
),
scored AS (
  SELECT c.feature, c.v AS threshold, c.nl AS n_left,
         c.pl AS pos_left, t.n - c.nl AS n_right,
         t.p - c.pl AS pos_right,
         CAST((c.pl * c.pl + (c.nl - c.pl) * (c.nl - c.pl))
                * (t.n - c.nl)
              + ((t.p - c.pl) * (t.p - c.pl)
                 + ((t.n - c.nl) - (t.p - c.pl))
                   * ((t.n - c.nl) - (t.p - c.pl))) * c.nl
              AS DOUBLE)
           / CAST(c.nl * (t.n - c.nl) AS DOUBLE) AS score,
         t.n
  FROM cum c JOIN tot t USING (feature)
  WHERE c.nl < t.n
)
SELECT feature, threshold, n_left, pos_left, n_right, pos_right,
       score,
       (CAST(n AS DOUBLE) - score) / CAST(n AS DOUBLE) AS gini
FROM (
  SELECT *, row_number() OVER (PARTITION BY feature
                               ORDER BY score DESC, threshold) AS rk
  FROM scored) r
WHERE rk = 1
ORDER BY feature
"""


@_staged(
    "feature_best_gini_split",
    oracle=_GINI_ORACLE,
    tags=("analytics", "features"),
    doc="Best binary split per feature by Gini impurity (operators/"
        "features.py:best_gini_splits — the CART node primitive, "
        "Breiman et al. '84), predicting URGENT orders from three "
        "bucketized features (custkey mod 16, order day-of-month, "
        "totalprice in 10k bands). Candidate stats are exact integer "
        "cumulative counts over ONE (feature,value)-grain aggregate; "
        "the split score S_L/n_L + S_R/n_R (monotone twin of "
        "weighted Gini) is one double division of exact products, so "
        "the argmax threshold is bit-deterministic cross-engine. "
        "Everything after the single data-sized aggregate runs at "
        "candidate grain (features x buckets). Supervised sharpening "
        "of the feature-ranking family (woe_iv / chi2 / mutual_info: "
        "rank only) to an actionable threshold; exactness vs a "
        "brute-force Python reference is pytest-pinned.",
)
def feature_best_gini_split(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    from ..operators.features import best_gini_splits
    o = load_table(spark, sf_dir, "orders")
    y = F.when(F.col("o_orderpriority") == "1-URGENT",
               F.lit(1)).otherwise(F.lit(0))
    feats = F.array(
        F.struct(F.lit("custmod16").alias("feature"),
                 (F.col("o_custkey") % 16).cast("long").alias("v")),
        F.struct(F.lit("day").alias("feature"),
                 F.dayofmonth("o_orderdate").cast("long").alias("v")),
        F.struct(F.lit("price_10k").alias("feature"),
                 F.floor(F.col("o_totalprice") / 10000).cast("long")
                 .alias("v")))
    long_df = (o.select(y.alias("y"), F.explode(feats).alias("f"))
               .select(F.col("f.feature").alias("feature"),
                       F.col("f.v").alias("v"), "y"))
    return best_gini_splits(long_df).orderBy("feature")
