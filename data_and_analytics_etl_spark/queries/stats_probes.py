"""Round-9 probe cohort: inequality/variance decomposition, rank
correlation, community detection, density clustering, frequency
sketching, PR curves, and symbolic time-series encoding.

Every probe follows the determinism contract (registry module doc):
exact integer/DECIMAL accumulation, ONE double chain per emitted
value, identical aliases on both sides, a pinned total ORDER BY.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from .registry import query

_CENTS = "CAST(round(o_totalprice * 100) AS BIGINT)"


@query(
    "agg_theil_index",
    oracle=f"""
WITH g AS (
  SELECT o_orderpriority AS category, count(*) AS n,
         CAST(sum({_CENTS}) AS BIGINT) AS sum_cents
  FROM orders GROUP BY 1
), t AS (
  SELECT CAST(sum(n) AS BIGINT) AS tn,
         CAST(sum(sum_cents) AS BIGINT) AS ts
  FROM g
)
SELECT category, CAST(n AS BIGINT) AS n, sum_cents,
       round(CAST(sum_cents AS DOUBLE) / CAST(ts AS DOUBLE), 6)
         AS value_share,
       round((CAST(sum_cents AS DOUBLE) / CAST(ts AS DOUBLE))
             * ln((CAST(sum_cents AS DOUBLE) / CAST(ts AS DOUBLE))
                  / (CAST(n AS DOUBLE) / CAST(tn AS DOUBLE))), 6)
         AS theil_contrib
FROM g, t ORDER BY category
""",
    tags=("analytics", "stats"),
    doc="Between-group Theil T inequality decomposition of order value "
        "across priorities (operators/profile.py:theil_between) — the "
        "additive complement of analytics_gini_concentration "
        "(Theil decomposes across subgroups; Gini does not). One hash "
        "aggregate on the group key + a 1-row broadcast grand-total "
        "rollup; shares from exact BIGINT cents sums, each emitted "
        "value one double chain (ln over exact-ratio operands, the "
        "categorical_entropy precedent); the scalar between-Theil is "
        "a caller-side sum over the bounded group rows.",
)
def agg_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import theil_between
    o = load_table(spark, sf_dir, "orders")
    return theil_between(o, "o_orderpriority",
                         F.round(F.col("o_totalprice") * 100))


@query(
    "stats_anova_oneway",
    oracle=f"""
WITH g AS (
  SELECT o_orderpriority AS category, count(*) AS n,
         CAST(sum({_CENTS}) AS BIGINT) AS s1,
         sum(CAST({_CENTS} AS DECIMAL(38,0))
             * CAST({_CENTS} AS DECIMAL(38,0))) AS s2
  FROM orders GROUP BY 1
), t AS (
  SELECT CAST(sum(n) AS BIGINT) AS tn, CAST(sum(s1) AS BIGINT) AS ts
  FROM g
)
SELECT category, CAST(n AS BIGINT) AS n, s1 AS sum_cents,
       CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) / 100.0 AS mean,
       CAST(CAST(n AS DECIMAL(38,0)) * CAST(s2 AS DECIMAL(38,0))
            - CAST(s1 AS DECIMAL(38,0)) * CAST(s1 AS DECIMAL(38,0))
            AS DOUBLE)
         / CAST(n AS DOUBLE) / 1e4 AS ss_within,
       CAST(n AS DOUBLE)
         * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)
            - CAST(ts AS DOUBLE) / CAST(tn AS DOUBLE))
         * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)
            - CAST(ts AS DOUBLE) / CAST(tn AS DOUBLE)) / 1e4
         AS ss_between_contrib
FROM g, t ORDER BY category
""",
    tags=("analytics", "stats"),
    doc="One-way ANOVA sum-of-squares decomposition of order value by "
        "priority (operators/profile.py:anova_oneway) — the parametric "
        "k-group generalization of ab_welch_ttest. Counts/Σcents as "
        "BIGINT and Σcents² in DECIMAL(38,0) keep every moment exact; "
        "per-group mean, SSW_g and SSB_g are each ONE double chain; "
        "the F statistic assembles caller-side from the bounded group "
        "rows. One hash aggregate + a 1-row broadcast total — no "
        "window, no second scan.",
)
def stats_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import anova_oneway
    o = load_table(spark, sf_dir, "orders")
    return anova_oneway(o, "o_orderpriority",
                        F.round(F.col("o_totalprice") * 100))


def _mr2_sql(var: str) -> str:
    # per-(group, value) DOUBLED midrank via a plain prefix window —
    # the oracle recomputes what Spark does with the bucketed form
    return f"""
  SELECT g, {var} AS v,
         2 * CAST(coalesce(sum(c) OVER (PARTITION BY g ORDER BY {var}
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) + c + 1 AS mr2
  FROM (SELECT g, {var}, count(*) AS c FROM rows_ GROUP BY 1, 2)
"""


@query(
    "stats_spearman_corr",
    oracle=f"""
WITH rows_ AS (
  SELECT l_returnflag AS g, l_quantity AS x, l_extendedprice AS y
  FROM lineitem
), rx AS ({_mr2_sql("x")}), ry AS ({_mr2_sql("y")}),
j AS (
  SELECT r.g, rx.mr2 AS rx2, ry.mr2 AS ry2
  FROM rows_ r
  JOIN rx ON r.g = rx.g AND r.x = rx.v
  JOIN ry ON r.g = ry.g AND r.y = ry.v
), a AS (
  SELECT g, count(*) AS n,
         sum(CAST(rx2 AS DECIMAL(38,0)) * CAST(ry2 AS DECIMAL(38,0)))
           AS sxy,
         sum(CAST(rx2 AS DECIMAL(38,0)) * CAST(rx2 AS DECIMAL(38,0)))
           AS sxx,
         sum(CAST(ry2 AS DECIMAL(38,0)) * CAST(ry2 AS DECIMAL(38,0)))
           AS syy
  FROM j GROUP BY g
)
SELECT g AS category, CAST(n AS BIGINT) AS n,
       round(CAST(CAST(n AS DECIMAL(38,0)) * sxy
                  - CAST(n * (n + 1) AS DECIMAL(38,0))
                    * CAST(n * (n + 1) AS DECIMAL(38,0)) AS DOUBLE)
             / sqrt(CAST(CAST(n AS DECIMAL(38,0)) * sxx
                         - CAST(n * (n + 1) AS DECIMAL(38,0))
                           * CAST(n * (n + 1) AS DECIMAL(38,0))
                         AS DOUBLE)
                    * CAST(CAST(n AS DECIMAL(38,0)) * syy
                           - CAST(n * (n + 1) AS DECIMAL(38,0))
                             * CAST(n * (n + 1) AS DECIMAL(38,0))
                           AS DOUBLE)), 6) AS rho
FROM a ORDER BY category
""",
    tags=("analytics", "stats"),
    doc="Per-returnflag Spearman rank correlation between quantity and "
        "extended price (operators/profile.py:spearman_corr) — the "
        "nonparametric sibling of agg_stats' Pearson corr. Midranks "
        "carried DOUBLED (the mann_whitney convention) so heavy "
        "quantity ties stay exact; all rank moments accumulate in "
        "DECIMAL(38,0); rho is ONE double chain per group (sqrt is "
        "IEEE-correctly-rounded). The strictly-below prefix uses the "
        "bucketed decomposition (per-(group,bucket) windows + an "
        "nbins-row offset table); the oracle recomputes with plain "
        "per-group rank windows, proving the bucketed form exact.",
)
def stats_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import spearman_corr
    li = load_table(spark, sf_dir, "lineitem")
    return spearman_corr(li, "l_returnflag", "l_quantity",
                         "l_extendedprice", (0.0, 51.0), (0.0, 120000.0))


def _lpa_round(prev: str, out: str) -> str:
    return f"""
{out}_c AS (
  SELECT e.a AS node, l.label, count(*) AS c
  FROM e JOIN {prev} l ON e.b = l.node GROUP BY 1, 2
), {out} AS (
  SELECT node, label FROM (
    SELECT node, label,
           row_number() OVER (PARTITION BY node
                              ORDER BY c DESC, label) AS rn
    FROM {out}_c) WHERE rn = 1
)"""


@query(
    "graph_label_propagation_sync",
    oracle=f"""
WITH e0 AS (
  SELECT c_custkey // 10 AS src, c_custkey AS dst
  FROM customer WHERE c_custkey > 0
), e AS (
  SELECT src AS a, dst AS b FROM e0
  UNION
  SELECT dst AS a, src AS b FROM e0
), n0 AS (SELECT DISTINCT a AS node FROM e),
l0 AS (SELECT node, node AS label FROM n0),
{_lpa_round("l0", "l1")},
{_lpa_round("l1", "l2")},
{_lpa_round("l2", "l3")}
SELECT n0.node AS node, CAST(coalesce(l3.label, n0.node) AS BIGINT) AS label
FROM n0 LEFT JOIN l3 ON n0.node = l3.node
ORDER BY node
""",
    tags=("analytics", "graph"),
    doc="Three synchronous rounds of mode-label propagation over the "
        "customer digit-hierarchy graph (operators/graph.py:"
        "label_propagation) — deterministic community detection "
        "(Raghavan et al. 2007: mode of neighbor labels, ties to the "
        "smallest), vs dedup_clusters' min-label which converges to "
        "components. Per round ONE equi-join + TWO hash aggregates "
        "(mode via a single max(struct), no window); the round count "
        "is fixed so the whole closure is oracle-checkable as chained "
        "CTEs. The oracle picks the mode with a per-node rank window — "
        "bounded by each node's distinct neighbor labels.",
)
def graph_label_propagation_sync(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    from ..operators.graph import label_propagation
    c = load_table(spark, sf_dir, "customer")
    edges = (c.filter(F.col("c_custkey") > 0)
             .select((F.col("c_custkey") / 10).cast("long").alias("src"),
                     F.col("c_custkey").alias("dst")))
    return (label_propagation(edges, rounds=3)
            .select("node", F.col("label").cast("long").alias("label"))
            .orderBy("node"))


@query(
    "geo_dbscan_core_points",
    oracle="""
WITH pts AS (
  SELECT c_custkey AS id,
         CAST(round(c_acctbal * 1e6) AS BIGINT) AS xq,
         CAST(round(((c_custkey * 7919) % 20000) / 10.0 * 1e6)
              AS BIGINT) AS yq
  FROM customer
), cnt AS (
  SELECT a.id, count(*) AS n_neighbors
  FROM pts a JOIN pts b ON a.id <> b.id
  WHERE CAST(a.xq - b.xq AS DECIMAL(38,0))
        * CAST(a.xq - b.xq AS DECIMAL(38,0))
        + CAST(a.yq - b.yq AS DECIMAL(38,0))
        * CAST(a.yq - b.yq AS DECIMAL(38,0))
        <= CAST(20000000 AS DECIMAL(38,0))
           * CAST(20000000 AS DECIMAL(38,0))
  GROUP BY 1
)
SELECT p.id AS id, CAST(coalesce(c.n_neighbors, 0) AS BIGINT) AS n_neighbors,
       coalesce(c.n_neighbors, 0) >= 2 AS is_core
FROM pts p LEFT JOIN cnt c ON p.id = c.id
ORDER BY id
""",
    tags=("analytics", "spatial"),
    doc="DBSCAN core-point detection over the geo_grid_proximity "
        "coordinates (operators/geo.py:grid_core_points): per-point "
        "radius-neighbor counts via the same COMPLETE 3x3 grid "
        "decomposition + exact integer distance verify, aggregated to "
        "counts and the min_pts density test (core points seed the "
        "clusters; expansion is dedup_clusters' connected components "
        "over core-core edges). One candidate-join shuffle on the cell "
        "key + one hash aggregate; zero-neighbor points kept by a "
        "left join back onto the point set. The oracle recomputes "
        "with the plain O(n^2) theta join, proving the grid exact.",
)
def geo_dbscan_core_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.geo import grid_core_points
    c = load_table(spark, sf_dir, "customer")
    y = ((F.col("c_custkey") * 7919) % 20000) / 10.0
    return grid_core_points(c, "c_custkey", F.col("c_acctbal"), y,
                            radius=20.0, min_pts=2)


@query(
    "sketch_freq_heavy_hitters",
    oracle=r"""
WITH tok AS (
  SELECT unnest(regexp_extract_all(lower(text), '\w+|[^\w\s]')) AS t
  FROM documents WHERE text IS NOT NULL
), tt AS (SELECT count(*) AS n FROM tok),
g AS (SELECT t, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY 1)
SELECT t AS key, cnt
FROM g, tt WHERE cnt * 30 > n * 1
ORDER BY cnt DESC, key
""",
    tags=("llm", "sketch"),
    doc="phi-heavy-hitter tokens over the document corpus "
        "(operators/sketch.py:heavy_hitters, phi = 1/30): per-"
        "partition Misra-Gries summaries (O(1/phi) state, Arrow-"
        "batched mapInPandas — the declared Python-sketch path) whose "
        "union is a pigeonhole-guaranteed SUPERSET of the global "
        "heavy hitters, then one exact broadcast-semi-join verify "
        "pass, so the output is exact and partitioning-invariant — "
        "what makes a sketch oracle-checkable (cms_topk's estimate-"
        "only cousin). Threshold is integer arithmetic (cnt·den > "
        "N·num), never a double. The oracle recomputes with a plain "
        "exact GROUP BY + HAVING.",
)
def sketch_freq_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketch import heavy_hitters
    d = load_table(spark, sf_dir, "documents")
    toks = (d.filter(F.col("text").isNotNull())
            .select(F.explode(
                F.regexp_extract_all(F.lower("text"),
                                     F.lit(r"\w+|[^\w\s]"), 0))
                .alias("token")))
    return heavy_hitters(toks, "token", phi_num=1, phi_den=30)


@query(
    "eval_pr_auc",
    oracle="""
WITH d AS (
  SELECT CAST(label % 2 AS BIGINT) AS y,
         CAST(floor(CAST(embedding[1] AS DOUBLE) * 500) AS BIGINT)
           AS bucket
  FROM embeddings
  WHERE label IS NOT NULL AND embedding[1] IS NOT NULL
), per AS (
  SELECT bucket, count(*) AS c, CAST(sum(y) AS BIGINT) AS p
  FROM d GROUP BY 1
), t AS (SELECT CAST(sum(p) AS BIGINT) AS np FROM per),
cum AS (
  SELECT bucket, p, c,
         CAST(sum(p) OVER (ORDER BY bucket DESC ROWS BETWEEN UNBOUNDED
              PRECEDING AND CURRENT ROW) AS BIGINT) AS tp,
         CAST(sum(c - p) OVER (ORDER BY bucket DESC ROWS BETWEEN
              UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS fp
  FROM per
)
SELECT bucket AS threshold_bucket, tp, fp,
       CAST(np - tp AS BIGINT) AS fn,
       round(CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE), 6)
         AS "precision",
       round(CAST(tp AS DOUBLE) / CAST(np AS DOUBLE), 6) AS recall,
       round(CAST(p AS DOUBLE)
             * (CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE))
             / CAST(np AS DOUBLE), 6) AS ap_contrib
FROM cum, t ORDER BY threshold_bucket DESC
""",
    tags=("llm", "eval"),
    doc="Exact precision-recall curve of the first embedding component "
        "scoring the odd-label class (operators/evaluation.py:"
        "pr_curve) — the imbalanced-data complement of "
        "eval_binary_auc; average precision = the caller-side sum of "
        "the emitted per-bucket ap_contrib (the per-row-contribution "
        "contract). The score is quantized to an integer grid "
        "(floor(s*500) — floor, no rounding-mode boundary) so the "
        "single ordered cumulative window runs over the bounded "
        "bucket table, never raw rows (the drift_ks bucketed-prefix "
        "rule). Exact BIGINT tp/fp/fn; precision/recall one-chain.",
)
def eval_pr_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.evaluation import pr_curve
    e = (load_table(spark, sf_dir, "embeddings")
         .filter(F.col("label").isNotNull()
                 & F.element_at("embedding", 1).isNotNull()))
    return pr_curve(
        e, F.col("label") % 2,
        F.floor(F.element_at("embedding", 1).cast("double") * 500))


@query(
    "timeseries_sax_symbols",
    oracle="""
WITH d AS (
  SELECT event_type AS series,
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
         CAST(floor(value * 100) AS BIGINT) AS c
  FROM events WHERE value IS NOT NULL
), daily AS (
  SELECT series, day, count(*) AS n, CAST(sum(c) AS BIGINT) AS s
  FROM d GROUP BY 1, 2
), sym AS (
  SELECT series, day, day // 7 AS word_window,
         CASE WHEN CAST(s AS DOUBLE) / CAST(n AS DOUBLE) < 4600 THEN 'a'
              WHEN CAST(s AS DOUBLE) / CAST(n AS DOUBLE) < 4950 THEN 'b'
              WHEN CAST(s AS DOUBLE) / CAST(n AS DOUBLE) < 5300 THEN 'c'
              ELSE 'd' END AS sy
  FROM daily
)
SELECT series, word_window, CAST(count(*) AS BIGINT) AS n_days,
       string_agg(sy, '' ORDER BY day) AS word
FROM sym GROUP BY 1, 2 ORDER BY series, word_window
""",
    tags=("analytics", "timeseries"),
    doc="Weekly SAX words over per-type daily event-value means "
        "(operators/timeseries.py:sax_encode) — symbolic aggregate "
        "approximation (Lin et al. 2003), the indexing/motif encoding "
        "for time-series similarity at scale. Values pre-quantized "
        "floor(v*100) to integer cents (floor: no rounding-mode "
        "boundary), daily sums exact BIGINT, each PAA mean ONE double "
        "division compared against integer breakpoints; letters "
        "concatenate under an explicit in-group day ordering "
        "(array_sort struct — never raw collect_list order). Two "
        "map-side-combinable hash aggregates, no window function.",
)
def timeseries_sax_symbols(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import sax_encode
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("value").isNotNull()))
    day = F.datediff(F.to_date("ts"), F.lit("1970-01-01")).cast("long")
    return sax_encode(ev, "event_type", day,
                      F.floor(F.col("value") * 100), word_days=7,
                      breakpoints_cents=(4600, 4950, 5300))


# --- r9 second cohort: registered after the 50-slot window filled; ---
# --- FULLVERIFY carries their rows this round, r10 pins them.      ---


@query(
    "stats_levene_bf",
    oracle=f"""
WITH t AS (
  SELECT o_orderpriority AS category, {_CENTS} AS c FROM orders
), m AS (
  SELECT category, CAST(quantile_cont(c, 0.5) * 2 AS BIGINT) AS m2
  FROM t GROUP BY 1
), z AS (
  SELECT t.category AS category, abs(2 * c - m2) AS z2
  FROM t JOIN m ON t.category = m.category
), g AS (
  SELECT category, count(*) AS n,
         CAST(sum(z2) AS BIGINT) AS s1,
         sum(CAST(z2 AS DECIMAL(38,0)) * CAST(z2 AS DECIMAL(38,0)))
           AS s2
  FROM z GROUP BY 1
), tt AS (
  SELECT CAST(sum(n) AS BIGINT) AS tn, CAST(sum(s1) AS BIGINT) AS ts
  FROM g
)
SELECT category, CAST(n AS BIGINT) AS n, s1 AS sum_cents,
       CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) / 100.0 AS mean,
       CAST(CAST(n AS DECIMAL(38,0)) * CAST(s2 AS DECIMAL(38,0))
            - CAST(s1 AS DECIMAL(38,0)) * CAST(s1 AS DECIMAL(38,0))
            AS DOUBLE)
         / CAST(n AS DOUBLE) / 1e4 AS ss_within,
       CAST(n AS DOUBLE)
         * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)
            - CAST(ts AS DOUBLE) / CAST(tn AS DOUBLE))
         * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)
            - CAST(ts AS DOUBLE) / CAST(tn AS DOUBLE)) / 1e4
         AS ss_between_contrib
FROM g, tt ORDER BY category
""",
    tags=("analytics", "stats"),
    doc="Brown-Forsythe robust equal-variance test core (operators/"
        "profile.py:brown_forsythe): the anova_oneway decomposition on "
        "absolute deviations from each group's exact MEDIAN — the "
        "pre-flight heteroskedasticity check for stats_anova_oneway. "
        "Deviations carried DOUBLED (2*median of integer cents is an "
        "exact integer), so no half-cent float exists anywhere; the "
        "emitted columns are in doubled-cent units and the F ratio is "
        "scale-invariant. One bounded median aggregate broadcast back "
        "+ one hash aggregate + a 1-row broadcast total.",
)
def stats_levene_bf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import brown_forsythe
    o = load_table(spark, sf_dir, "orders")
    return brown_forsythe(o, "o_orderpriority",
                          F.round(F.col("o_totalprice") * 100))


@query(
    "timeseries_bollinger",
    oracle="""
WITH d AS (
  SELECT event_type AS series,
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
         CAST(floor(value * 100) AS BIGINT) AS c
  FROM events WHERE value IS NOT NULL
), daily AS (
  SELECT series, day,
         CAST(round(CAST(sum(c) AS DOUBLE) / count(*)) AS BIGINT) AS v
  FROM d GROUP BY 1, 2
), w AS (
  SELECT series, day,
         CAST(count(*) OVER win AS BIGINT) AS n,
         sum(CAST(v AS DECIMAL(38,0))) OVER win AS s1,
         sum(CAST(v AS DECIMAL(38,0)) * CAST(v AS DECIMAL(38,0)))
           OVER win AS s2
  FROM daily
  WINDOW win AS (PARTITION BY series ORDER BY day
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT series, day, n AS n_days,
       round(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) / 100.0, 6) AS mid,
       round((CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)
              + 2 * (sqrt(CAST(CAST(n AS DECIMAL(38,0)) * s2 - s1 * s1
                               AS DOUBLE)) / CAST(n AS DOUBLE)))
             / 100.0, 6) AS upper,
       round((CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)
              - 2 * (sqrt(CAST(CAST(n AS DECIMAL(38,0)) * s2 - s1 * s1
                               AS DOUBLE)) / CAST(n AS DOUBLE)))
             / 100.0, 6) AS lower
FROM w ORDER BY series, day
""",
    tags=("analytics", "timeseries"),
    doc="7-day Bollinger envelope (rolling mean ± 2σ) over per-type "
        "daily event-value means (operators/timeseries.py:"
        "bollinger_bands). The ROWS window runs over the DAILY rollup "
        "— bounded by (series × days), never raw rows — partitioned "
        "by series; Σc and Σc² ride the frame in DECIMAL(38,0), so "
        "mid and σ are each one double chain (√ correctly rounded). "
        "One rollup shuffle reused by the window.",
)
def timeseries_bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import bollinger_bands
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("value").isNotNull()))
    day = F.datediff(F.to_date("ts"), F.lit("1970-01-01")).cast("long")
    return bollinger_bands(ev, "event_type", day,
                           F.floor(F.col("value") * 100),
                           window_days=7, k_sigma=2)


@query(
    "join_asof_nearest",
    oracle="""
WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
c AS (SELECT * FROM events WHERE event_type = 'click'),
b AS (
  SELECT p.event_id AS event_id, c.event_id AS bid, c.ts AS bts
  FROM p ASOF LEFT JOIN c
    ON p.user_id = c.user_id AND p.ts >= c.ts
), f AS (
  SELECT p.event_id AS event_id, c.event_id AS fid, c.ts AS fts
  FROM p ASOF LEFT JOIN c
    ON p.user_id = c.user_id AND p.ts < c.ts
)
SELECT p.event_id AS event_id, p.user_id AS user_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
       CASE WHEN bts IS NOT NULL AND (fts IS NULL
                 OR epoch_us(p.ts) - epoch_us(bts)
                    <= epoch_us(fts) - epoch_us(p.ts))
            THEN bid ELSE fid END AS click_event_id,
       strftime(CASE WHEN bts IS NOT NULL AND (fts IS NULL
                     OR epoch_us(p.ts) - epoch_us(bts)
                        <= epoch_us(fts) - epoch_us(p.ts))
                THEN bts ELSE fts END,
                '%Y-%m-%d %H:%M:%S.%f') AS click_ts
FROM p LEFT JOIN b ON p.event_id = b.event_id
       LEFT JOIN f ON p.event_id = f.event_id
ORDER BY event_id
""",
    tags=("join", "ext"),
    doc="As-of join, direction='nearest' (operators/asof.py:"
        "_asof_nearest — pandas merge_asof parity): the closer of the "
        "backward and forward matches, ties to backward, gaps compared "
        "in exact integer microseconds. ONE union-and-carry pass — "
        "both directional carries evaluate over the same (key, ts) "
        "sort, so the plan costs exactly what join_asof costs (one "
        "shuffle), not two joins. The oracle recomputes with TWO "
        "native DuckDB ASOF joins + a CASE pick — a structurally "
        "different formulation proving the single-pass form.",
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import asof_join
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    clicks = ev.filter(F.col("event_type") == "click")
    joined = asof_join(purchases, clicks, on="user_id", left_ts="ts",
                       right_ts="ts", right_values=["event_id"],
                       how="left", direction="nearest")
    return (joined.select(
        "event_id", "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .alias("purchase_ts"),
        F.col("event_id_right").alias("click_event_id"),
        F.date_format("ts_right", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .alias("click_ts"))
        .orderBy("event_id"))


@query(
    "sample_systematic",
    oracle="""
WITH r AS (
  SELECT o_orderkey,
         row_number() OVER (ORDER BY md5(CAST(o_orderkey AS VARCHAR)))
           - 1 AS pos
  FROM orders
)
SELECT o_orderkey FROM r WHERE pos % 10 = 0 ORDER BY o_orderkey
""",
    tags=("sampling",),
    doc="Systematic every-10th sample over the md5 order of the order "
        "key (operators/sampling.py:systematic_sample) — exact sample "
        "size ceil(n/10) where hash-threshold sampling only hits the "
        "fraction in expectation. Global positions come from "
        "ids.assign_dense_ids (bucketed renumbering: sketch cutpoints "
        "+ per-bucket offsets — never a single-task row_number "
        "window); the md5 walk de-correlates the stride from storage "
        "order. The oracle recomputes with the plain global "
        "row_number window.",
)
def sample_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import systematic_sample
    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    return (systematic_sample(o, "o_orderkey", every_k=10)
            .orderBy("o_orderkey"))


@query(
    "stats_logrank_split",
    oracle="""
WITH u AS (
  SELECT user_id,
         (max(epoch_us(ts)) - min(epoch_us(ts))) // 21600000000 AS t,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS e,
         CAST(max(user_id) % 2 = 0 AS BIGINT) AS a
  FROM events GROUP BY 1
), p AS (
  SELECT t,
         CAST(sum(a) AS BIGINT) AS c_a,
         CAST(count(*) - sum(a) AS BIGINT) AS c_b,
         CAST(sum(e * a) AS BIGINT) AS d_a,
         CAST(sum(e * (1 - a)) AS BIGINT) AS d_b
  FROM u GROUP BY 1
), tt AS (
  SELECT CAST(sum(c_a) AS BIGINT) AS na, CAST(sum(c_b) AS BIGINT) AS nb
  FROM p
), w AS (
  SELECT t, d_a, d_b,
         CAST(tt.na - coalesce(sum(c_a) OVER (ORDER BY t ROWS BETWEEN
              UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS n_risk_a,
         CAST(tt.nb - coalesce(sum(c_b) OVER (ORDER BY t ROWS BETWEEN
              UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS n_risk_b
  FROM p, tt
), f AS (
  SELECT t, n_risk_a, n_risk_b, d_a, d_b,
         CAST(n_risk_a AS DOUBLE) AS na, CAST(n_risk_b AS DOUBLE) AS nb,
         CAST(d_a + d_b AS DOUBLE) AS dt
  FROM w WHERE d_a + d_b > 0
)
SELECT t, n_risk_a, n_risk_b, d_a, d_b,
       round(dt * na / (na + nb), 6) AS e_a_contrib,
       round(CASE WHEN na + nb > 1
             THEN dt * na * nb * ((na + nb) - dt)
                  / ((na + nb) * (na + nb) * ((na + nb) - 1))
             ELSE 0 END, 6) AS var_contrib
FROM f ORDER BY t
""",
    tags=("analytics", "survival"),
    doc="Log-rank (Mantel-Cox) test core between the survival curves "
        "of even- vs odd-id users (operators/evaluation.py:"
        "logrank_split) — the hypothesis-test completion of "
        "kaplan_meier/nelson_aalen. One row per distinct EVENT time "
        "with exact-long per-arm risk sets (per-arm prefix sums over "
        "the bounded distinct-duration table, the kaplan_meier "
        "bucketing rule) and one-chain expected/variance "
        "contributions; the z statistic assembles caller-side over "
        "the bounded event-time rows.",
)
def stats_logrank_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.evaluation import logrank_split
    ev = load_table(spark, sf_dir, "events")
    u = (ev.groupBy("user_id")
         .agg(F.max(F.unix_micros("ts")).alias("__mx"),
              F.min(F.unix_micros("ts")).alias("__mn"),
              F.max(F.when(F.col("event_type") == "purchase", 1)
                    .otherwise(0)).alias("e"))
         .withColumn("t", F.expr("(__mx - __mn) div 21600000000")))
    return logrank_split(u, F.col("user_id") % 2 == 0,
                         F.col("t"), F.col("e"))


_ETYPES_SQL = "['click', 'error', 'purchase', 'signup', 'view']"


@query(
    "eval_mcnemar_paired",
    oracle=f"""
WITH p AS (
  SELECT event_type AS truth,
         CASE WHEN event_id % 7 < 5 THEN event_type
              ELSE ({_ETYPES_SQL})[CAST(event_id % 5 AS INTEGER) + 1]
         END AS pred_a,
         CASE WHEN event_id % 3 < 2 THEN event_type
              ELSE ({_ETYPES_SQL})[CAST((event_id + 1) % 5 AS INTEGER) + 1]
         END AS pred_b
  FROM events
), i AS (
  SELECT CAST(truth = pred_a AS BIGINT) AS ra,
         CAST(truth = pred_b AS BIGINT) AS rb
  FROM p
), agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(ra * rb) AS BIGINT) AS both_right,
         CAST(sum((1 - ra) * (1 - rb)) AS BIGINT) AS both_wrong,
         CAST(sum(ra * (1 - rb)) AS BIGINT) AS b,
         CAST(sum((1 - ra) * rb) AS BIGINT) AS c
  FROM i
)
SELECT n, both_right, both_wrong, b, c,
       round(CASE WHEN b + c > 0
             THEN CAST(b - c AS DOUBLE) * CAST(b - c AS DOUBLE)
                  / CAST(b + c AS DOUBLE)
             ELSE 0 END, 6) AS chi2
FROM agg
""",
    tags=("llm", "eval"),
    doc="McNemar's paired test between two deterministic synthetic "
        "classifiers over the same events (operators/evaluation.py:"
        "mcnemar) — the paired complement of eval_accuracy_overall "
        "(accuracy deltas ignore that both models score the SAME "
        "rows; only the discordant b/c cells carry signal). One "
        "map-side-combinable aggregate, exact longs, a single closing "
        "double chain.",
)
def eval_mcnemar_paired(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.evaluation import mcnemar
    types = ["click", "error", "purchase", "signup", "view"]
    arr = F.array(*[F.lit(t) for t in types])
    ev = load_table(spark, sf_dir, "events")
    pred_a = (F.when(F.col("event_id") % 7 < 5, F.col("event_type"))
              .otherwise(F.element_at(arr, (F.col("event_id") % 5 + 1)
                                      .cast("int"))))
    pred_b = (F.when(F.col("event_id") % 3 < 2, F.col("event_type"))
              .otherwise(F.element_at(arr,
                                      ((F.col("event_id") + 1) % 5 + 1)
                                      .cast("int"))))
    return mcnemar(ev, F.col("event_type"), pred_a, pred_b)


@query(
    "timeseries_cross_correlation",
    oracle="""
WITH d AS (
  SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
         event_type
  FROM events
), a AS (
  SELECT day, CAST(count(*) AS BIGINT) AS v FROM d
  WHERE event_type = 'click' GROUP BY 1
), b AS (
  SELECT day, CAST(count(*) AS BIGINT) AS v FROM d
  WHERE event_type = 'purchase' GROUP BY 1
), lags AS (SELECT unnest(generate_series(-5, 5)) AS lag),
j AS (
  SELECT l.lag AS lag, a.v AS va, b.v AS vb
  FROM lags l, a JOIN b ON TRUE
  WHERE b.day = a.day + l.lag
), g AS (
  SELECT lag, count(*) AS n,
         sum(CAST(va AS DECIMAL(38,0))) AS sa,
         sum(CAST(vb AS DECIMAL(38,0))) AS sb,
         sum(CAST(va AS DECIMAL(38,0)) * CAST(va AS DECIMAL(38,0)))
           AS saa,
         sum(CAST(vb AS DECIMAL(38,0)) * CAST(vb AS DECIMAL(38,0)))
           AS sbb,
         sum(CAST(va AS DECIMAL(38,0)) * CAST(vb AS DECIMAL(38,0)))
           AS sab
  FROM j GROUP BY lag
)
SELECT CAST(lag AS INTEGER) AS lag, CAST(n AS BIGINT) AS n_days,
       round(CAST(CAST(n AS DECIMAL(38,0)) * sab - sa * sb AS DOUBLE)
             / sqrt(CAST(CAST(n AS DECIMAL(38,0)) * saa - sa * sa
                         AS DOUBLE)
                    * CAST(CAST(n AS DECIMAL(38,0)) * sbb - sb * sb
                           AS DOUBLE)), 6) AS r
FROM g ORDER BY lag
""",
    tags=("analytics", "timeseries"),
    doc="Lagged cross-correlation between daily click and purchase "
        "counts, lags -5..+5 (operators/timeseries.py:"
        "cross_correlation) — the lead/lag detector. One map-side lag "
        "explode + ONE equi-join on the shifted day key + one hash "
        "aggregate per lag (never a per-lag job loop); counts are "
        "exact integers so all five moments ride DECIMAL(38,0) and "
        "each r is one double chain over the bounded lag rows.",
)
def timeseries_cross_correlation(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    from ..operators.timeseries import cross_correlation
    ev = load_table(spark, sf_dir, "events")
    day = F.datediff(F.to_date("ts"), F.lit("1970-01-01")).cast("long")
    daily = (ev.select(day.alias("day"), "event_type")
             .groupBy("day", "event_type")
             .agg(F.count(F.lit(1)).alias("v")))
    a = daily.filter(F.col("event_type") == "click").select("day", "v")
    b = daily.filter(F.col("event_type") == "purchase") \
             .select("day", "v")
    return cross_correlation(a, b, "day", "v", max_lag=5)


@query(
    "analytics_cohort_ltv",
    oracle="""
WITH rows_ AS (
  SELECT o_custkey AS u,
         CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT)
           AS m,
         CAST(round(o_totalprice * 100) AS BIGINT) AS c
  FROM orders
), first_ AS (
  SELECT u, min(m) AS m0 FROM rows_ GROUP BY 1
), cell AS (
  SELECT f.m0 AS cohort_month, r.m - f.m0 AS age_months,
         CAST(count(DISTINCT r.u) AS BIGINT) AS n_users,
         CAST(sum(c) AS BIGINT) AS revenue_cents
  FROM rows_ r JOIN first_ f ON r.u = f.u
  GROUP BY 1, 2
), size_ AS (
  SELECT m0 AS cohort_month, CAST(count(*) AS BIGINT) AS cohort_size
  FROM first_ GROUP BY 1
)
SELECT c.cohort_month AS cohort_month, c.age_months AS age_months,
       n_users, cohort_size, revenue_cents,
       CAST(sum(revenue_cents) OVER (PARTITION BY c.cohort_month
            ORDER BY c.age_months ROWS BETWEEN UNBOUNDED PRECEDING AND
            CURRENT ROW) AS BIGINT) AS cum_revenue_cents,
       round(CAST(CAST(sum(revenue_cents) OVER (PARTITION BY
                  c.cohort_month ORDER BY c.age_months ROWS BETWEEN
                  UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                  AS DOUBLE)
             / CAST(cohort_size AS DOUBLE) / 100.0, 6) AS ltv_per_user
FROM cell c JOIN size_ s ON c.cohort_month = s.cohort_month
ORDER BY cohort_month, age_months
""",
    tags=("analytics", "cohort"),
    doc="Cohort lifetime-value curves over orders (operators/"
        "cohort.py:cohort_ltv) — the monetary completion of "
        "cohort_retention: customers cohort by first-order month, "
        "each (cohort, age) cell carries exact BIGINT-cents revenue "
        "and a bounded cumulative window (cohorts × months rows); "
        "ltv_per_user is the single closing double chain.",
)
def analytics_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cohort import cohort_ltv
    o = load_table(spark, sf_dir, "orders")
    return cohort_ltv(o, "o_custkey", "o_orderdate",
                      F.round(F.col("o_totalprice") * 100))


@query(
    "feature_chi2_ranking",
    oracle="""
WITH src AS (
  SELECT CAST(event_id % 2 AS BIGINT) AS label,
         event_type,
         CAST((epoch_us(ts) // 86400000000) % 7 AS VARCHAR) AS dow7
  FROM events
), unp AS (
  SELECT 'event_type' AS feature, event_type AS value, label FROM src
  UNION ALL
  SELECT 'dow7', dow7, label FROM src
), cells AS (
  SELECT feature, value, label, CAST(count(*) AS BIGINT) AS obs
  FROM unp GROUP BY 1, 2, 3
), m AS (
  SELECT feature, value, label, obs,
         CAST(sum(obs) OVER (PARTITION BY feature) AS BIGINT) AS n,
         CAST(sum(obs) OVER (PARTITION BY feature, value) AS BIGINT)
           AS row_t,
         CAST(sum(obs) OVER (PARTITION BY feature, label) AS BIGINT)
           AS col_t
  FROM cells
)
SELECT feature, value, label, obs,
       round(CAST(row_t AS DOUBLE) * CAST(col_t AS DOUBLE)
             / CAST(n AS DOUBLE), 6) AS expected,
       round((CAST(obs AS DOUBLE) - CAST(row_t AS DOUBLE)
              * CAST(col_t AS DOUBLE) / CAST(n AS DOUBLE))
             * (CAST(obs AS DOUBLE) - CAST(row_t AS DOUBLE)
                * CAST(col_t AS DOUBLE) / CAST(n AS DOUBLE))
             / (CAST(row_t AS DOUBLE) * CAST(col_t AS DOUBLE)
                / CAST(n AS DOUBLE)), 6) AS chi2_contrib
FROM m ORDER BY feature, value, label
""",
    tags=("analytics", "feature"),
    doc="Chi-squared-of-independence feature screening over event "
        "features vs a synthetic parity label (operators/features.py:"
        "chi2_cells) — the sklearn-SelectKBest shape. One stack "
        "unpivot (map-side) + one hash aggregate on (feature, value, "
        "label); marginals via windows PARTITIONED BY FEATURE over "
        "the bounded cells table; expected and contribution each one "
        "double chain from exact longs; per-feature chi2/dof assemble "
        "caller-side over the bounded cell rows. The day-of-week "
        "feature uses integer day-number mod 7 — no locale-dependent "
        "weekday function on either engine.",
)
def feature_chi2_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.features import chi2_cells
    ev = load_table(spark, sf_dir, "events")
    day = F.datediff(F.to_date("ts"), F.lit("1970-01-01")).cast("long")
    src = ev.select("event_type",
                    (day % 7).cast("string").alias("dow7"),
                    (F.col("event_id") % 2).alias("__label"))
    return chi2_cells(src, ["event_type", "dow7"], F.col("__label"))
