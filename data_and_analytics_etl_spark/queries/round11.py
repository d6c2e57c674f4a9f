"""Round-11 probe cohort: ordered-alternative and median rank tests
(Jonckheere-Terpstra, Mood's median), Matthews correlation, maximum
drawdown, Durbin-Watson residual autocorrelation, degree-class local
clustering, Adamic-Adar link prediction, Yule's K vocabulary richness
and the Zipf rank-frequency slope.

Capped at NINE probes by design (r10 verdict task 2): the driver
window is 21 bench + 1 changed + 9 backlog + these 9 = 40 fixed
slots, leaving 10 to the rotation pool
(tests/test_registry.py::test_rotation_slot_floor).

Every probe follows the determinism contract (registry module doc):
exact integer/DECIMAL(38,0) accumulation, ONE double chain per
emitted value, identical aliases on both sides, a pinned total
ORDER BY. ln()-crossing values are integer-quantized BEFORE
summation (the vocab_logrank rule) or taken from a Python literal
table when the domain is bounded (the NDCG rule — Zipf's ln(rank)
grid); integer division keeps NONNEGATIVE operands so Spark DIV and
DuckDB // agree everywhere.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..operators.text import zipf_log_rank_grid
from .registry import query


# --------------------------------------------------------------------------
# 1. stats_jonckheere_terpstra — ordered-alternative trend test
# --------------------------------------------------------------------------

@query(
    "stats_jonckheere_terpstra",
    oracle="""
WITH r AS (
  SELECT o_orderpriority AS g,
         CAST(date_part('day', o_orderdate) AS BIGINT) AS v
  FROM orders
), cells AS (
  SELECT g, v, CAST(count(*) AS HUGEINT) AS t FROM r GROUP BY 1, 2
), pair AS (
  SELECT a.g AS group_lo, b.g AS group_hi,
         CAST(sum(CASE WHEN a.v < b.v THEN 2 * a.t * b.t
                       WHEN a.v = b.v THEN a.t * b.t
                       ELSE 0 END) AS HUGEINT) AS u2
  FROM cells a JOIN cells b ON a.g < b.g
  GROUP BY 1, 2
), gs AS (SELECT g, CAST(sum(t) AS HUGEINT) AS n FROM cells GROUP BY 1),
tot AS (
  SELECT CAST(sum(n) AS HUGEINT) AS nn,
         CAST(sum(n * n) AS HUGEINT) AS sn2,
         CAST(sum(n * n * (2 * n + 3)) AS HUGEINT) AS sn23
  FROM gs
), jr AS (SELECT CAST(sum(u2) AS HUGEINT) AS j2 FROM pair)
SELECT group_lo, group_hi, CAST(u2 AS BIGINT) AS u2,
       CAST(j2 AS BIGINT) AS j2,
       CAST((nn * nn - sn2) // 2 AS BIGINT) AS mu2,
       CAST(2 * j2 - (nn * nn - sn2) AS DOUBLE)
         / (4.0 * sqrt(CAST(nn * nn * (2 * nn + 3) - sn23 AS DOUBLE)
                       / 72.0)) AS z_stat
FROM pair, tot, jr
ORDER BY group_lo, group_hi
""",
    tags=("stats",),
    doc="Jonckheere-Terpstra ordered-alternative trend test across "
        "the 5 order priorities with day-of-month as the bounded "
        "value domain (operators/profile.py:jonckheere_terpstra): "
        "pairwise 2*U counts from a broadcast (group, value)-cell "
        "contingency self-join (<= 155 cells, the kendall_tau rule — "
        "never row x row), classic no-tie moments cancelled in "
        "DECIMAL(38,0), z ONE double chain. Emits one row per "
        "ordered group pair with the shared j2/mu2/z_stat.",
)
def stats_jonckheere_terpstra(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    from ..operators.profile import jonckheere_terpstra
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("prio"),
        F.dayofmonth("o_orderdate").cast("long").alias("dom"))
    return jonckheere_terpstra(o, "prio", "dom")


# --------------------------------------------------------------------------
# 2. stats_mood_median — k-sample median test
# --------------------------------------------------------------------------

@query(
    "stats_mood_median",
    oracle="""
WITH r AS (
  SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS v FROM lineitem
), hist AS (SELECT v, count(*) AS t FROM r GROUP BY 1),
nt AS (SELECT CAST(count(*) AS BIGINT) AS ntot FROM r),
med AS (
  SELECT min(v) AS medv FROM (
    SELECT v, sum(t) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS cum
    FROM hist) c, nt
  WHERE c.cum >= (nt.ntot + 1) // 2
), g AS (
  SELECT r.g, CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(CASE WHEN r.v > med.medv THEN 1 ELSE 0 END)
              AS HUGEINT) AS a,
         CAST(max(med.medv) AS BIGINT) AS medv
  FROM r, med GROUP BY 1
), tot AS (
  SELECT CAST(sum(n) AS HUGEINT) AS nn, CAST(sum(a) AS HUGEINT) AS aa
  FROM g
), gq AS (
  SELECT g.g, g.n, g.a, g.medv,
         CASE WHEN g.n * tot.aa * (tot.nn - tot.aa) > 0 THEN
           CAST(floor(CAST((g.a * tot.nn - g.n * tot.aa)
                           * (g.a * tot.nn - g.n * tot.aa) AS DOUBLE)
                      / CAST(g.n * tot.aa * (tot.nn - tot.aa) AS DOUBLE)
                      * 1000000.0) AS BIGINT)
         END AS grid
  FROM g, tot
), chi AS (
  SELECT sum(grid) AS chigrid,
         sum(CASE WHEN grid IS NULL THEN 1 ELSE 0 END) AS ndeg
  FROM gq
)
SELECT gq.g AS category, CAST(gq.n AS BIGINT) AS n,
       CAST(gq.a AS BIGINT) AS above, gq.medv AS median,
       CASE WHEN chi.ndeg = 0
            THEN CAST(chi.chigrid AS DOUBLE) / 1000000.0 END AS chi2
FROM gq, chi ORDER BY category
""",
    tags=("stats",),
    doc="Mood's median test of lineitem quantity across the 3 return "
        "flags (operators/profile.py:mood_median_test): the grand "
        "LOWER median comes from a cumulative window over the "
        "bounded 50-distinct-value quantity histogram (never a "
        "data-sized sort), above-counts are exact longs, and the "
        "margin-cancelled chi-square terms are 10^-6 "
        "integer-quantized per group BEFORE the cross-group sum (the "
        "vocab_logrank rule) with 1-row broadcast totals.",
)
def stats_mood_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import mood_median_test
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").cast("long").alias("qty"))
    return mood_median_test(li, "flag", "qty")


# --------------------------------------------------------------------------
# 3. eval_matthews_corrcoef — balanced binary-classifier summary
# --------------------------------------------------------------------------

@query(
    "eval_matthews_corrcoef",
    oracle="""
WITH p AS (
  SELECT event_type AS category,
         CAST(event_id % 3 = 0 AS BIGINT) AS y,
         CASE WHEN event_id % 5 < 3 THEN CAST(event_id % 3 = 0 AS BIGINT)
              ELSE 1 - CAST(event_id % 3 = 0 AS BIGINT) END AS pr
  FROM events
), g AS (
  SELECT category,
         CAST(sum(y * pr) AS HUGEINT) AS tp,
         CAST(sum((1 - y) * pr) AS HUGEINT) AS fp,
         CAST(sum(y * (1 - pr)) AS HUGEINT) AS fn,
         CAST(sum((1 - y) * (1 - pr)) AS HUGEINT) AS tn
  FROM p GROUP BY 1
)
SELECT category, CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
       CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
       CASE WHEN (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn) > 0
            THEN CAST(tp * tn - fp * fn AS DOUBLE)
                 / sqrt(CAST((tp + fp) * (tp + fn) * (tn + fp)
                             * (tn + fn) AS DOUBLE))
       END AS mcc
FROM g ORDER BY category
""",
    tags=("llm", "eval"),
    doc="Per-event-type Matthews correlation coefficient of a "
        "deterministic synthetic binary classifier (operators/"
        "evaluation.py:matthews_corrcoef) — the imbalance-honest phi "
        "that eval_accuracy_overall and the F1 report both miss. "
        "Confusion cells are exact longs from one map-side aggregate; "
        "margin products in DECIMAL(38,0) (n^4 passes 2^63 at corpus "
        "scale), MCC ONE double chain; degenerate margins emit NULL.",
)
def eval_matthews_corrcoef(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.evaluation import matthews_corrcoef
    ev = load_table(spark, sf_dir, "events")
    truth = (F.col("event_id") % 3 == 0).cast("long")
    pred = F.when(F.col("event_id") % 5 < 3, truth).otherwise(1 - truth)
    return matthews_corrcoef(ev, "event_type", truth, pred)


# --------------------------------------------------------------------------
# 4. timeseries_max_drawdown — peak-to-trough of a cumulative walk
# --------------------------------------------------------------------------

@query(
    "timeseries_max_drawdown",
    oracle="""
WITH r AS (
  SELECT o_custkey % 1000 AS s, o_orderdate AS d, o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) % 2001 - 1000 AS st
  FROM orders
), w1 AS (
  SELECT s, d, k, st,
         sum(st) OVER (PARTITION BY s ORDER BY d, k
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS v
  FROM r
), w2 AS (
  SELECT s, st, v,
         max(v) OVER (PARTITION BY s ORDER BY d, k
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS rm
  FROM w1
)
SELECT s AS series, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(st) AS BIGINT) AS final_value,
       CAST(max(v) AS BIGINT) AS peak,
       CAST(max(rm - v) AS BIGINT) AS max_drawdown
FROM w2 GROUP BY 1 ORDER BY series
""",
    tags=("timeseries",),
    doc="Maximum drawdown of the signed integer-cents walk per "
        "customer bucket (operators/timeseries.py:max_drawdown, 1000 "
        "series as the parallelism grain): cumulative sum, running "
        "max, and peak-to-trough gap are ALL exact longs — no float "
        "anywhere — over one shuffle and two frame-sharing running "
        "windows ordered by (date, key).",
)
def timeseries_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import max_drawdown
    o = load_table(spark, sf_dir, "orders").select(
        (F.col("o_custkey") % 1000).alias("bucket"),
        F.col("o_orderdate").alias("d"),
        F.col("o_orderkey").alias("k"),
        (F.round(F.col("o_totalprice") * 100).cast("long") % 2001
         - 1000).alias("step"))
    return max_drawdown(o, "bucket", ["d", "k"], F.col("step"))


# --------------------------------------------------------------------------
# 5. timeseries_durbin_watson — residual lag-1 autocorrelation check
# --------------------------------------------------------------------------

@query(
    "timeseries_durbin_watson",
    oracle="""
WITH daily AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS ym,
         CAST(date_part('day', o_orderdate) AS BIGINT) AS t,
         CAST(count(*) AS HUGEINT) AS y
  FROM orders GROUP BY 1, 2
), m AS (
  SELECT ym, CAST(count(*) AS HUGEINT) AS n, CAST(sum(t) AS HUGEINT) AS st,
         CAST(sum(t * t) AS HUGEINT) AS st2,
         CAST(sum(y) AS HUGEINT) AS sy,
         CAST(sum(t * y) AS HUGEINT) AS sty
  FROM daily GROUP BY 1
), mm AS (
  SELECT ym, n, st, sy,
         n * st2 - st * st AS dd, n * sty - st * sy AS bb
  FROM m
), res AS (
  SELECT d.ym, d.t, mm.n, mm.dd,
         mm.dd * (mm.n * d.y - mm.sy) - mm.bb * (mm.n * d.t - mm.st)
           AS ee
  FROM daily d JOIN mm ON d.ym = mm.ym
), lagd AS (
  SELECT ym, n, dd, ee,
         ee - lag(ee) OVER (PARTITION BY ym ORDER BY t) AS de
  FROM res
), agg AS (
  SELECT ym, max(n) AS n, max(dd) AS dd,
         sum(de * de) AS snum, sum(ee * ee) AS sden
  FROM lagd GROUP BY 1
)
SELECT ym AS series, CAST(n AS BIGINT) AS n,
       CASE WHEN dd > 0 AND sden > 0
            THEN CAST(snum AS DOUBLE) / CAST(sden AS DOUBLE)
       END AS dw_stat
FROM agg ORDER BY series
""",
    tags=("timeseries", "stats"),
    doc="Durbin-Watson statistic of OLS-detrended daily order counts "
        "per calendar month (operators/timeseries.py:durbin_watson) — "
        "the residual lag-1 autocorrelation diagnostic the holt/OLS "
        "family omits. Residuals are scaled by the integer OLS "
        "denominator so both quadratic sums are exact DECIMAL(38,0) "
        "over the <= 31-row calendar-bounded series; DW is ONE double "
        "division. Month count is the parallelism grain; the design "
        "is calendar-cell-bounded and flat at 10x data.",
)
def timeseries_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import durbin_watson
    daily = (load_table(spark, sf_dir, "orders")
             .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
                      F.dayofmonth("o_orderdate").cast("long").alias("t"))
             .agg(F.count(F.lit(1)).alias("y")))
    return durbin_watson(daily, "ym", "t", "y")


# --------------------------------------------------------------------------
# 6. graph_local_clustering — degree-class clustering profile
# --------------------------------------------------------------------------

@query(
    "graph_local_clustering",
    oracle="""
WITH li AS (SELECT l_orderkey AS o, l_partkey AS p FROM lineitem
            WHERE l_orderkey % 8 = 0),
e AS (
  SELECT DISTINCT x.p AS a, y.p AS b
  FROM li x JOIN li y ON x.o = y.o AND x.p < y.p
), adj AS (SELECT a, b FROM e UNION ALL SELECT b AS a, a AS b FROM e),
deg AS (SELECT a AS node, CAST(count(*) AS BIGINT) AS deg
        FROM adj GROUP BY 1),
tr AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e e1 JOIN e e2 ON e2.a = e1.b
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
), corners AS (
  SELECT x AS node FROM tr
  UNION ALL SELECT y FROM tr
  UNION ALL SELECT z FROM tr
), tpn AS (
  SELECT node, CAST(count(*) AS BIGINT) AS tric FROM corners GROUP BY 1
), pn AS (
  SELECT d.deg, coalesce(t.tric, 0) AS tric
  FROM deg d LEFT JOIN tpn t ON d.node = t.node
  WHERE d.deg >= 2
), byk AS (
  SELECT deg, CAST(count(*) AS HUGEINT) AS n_nodes,
         CAST(sum(tric) AS HUGEINT) AS triangles
  FROM pn GROUP BY 1
)
SELECT CAST(deg AS BIGINT) AS deg, CAST(n_nodes AS BIGINT) AS n_nodes,
       CAST(triangles AS BIGINT) AS triangles,
       CAST(2 * triangles AS DOUBLE)
         / CAST(n_nodes * CAST(deg AS HUGEINT) * (deg - 1) AS DOUBLE)
         AS avg_lcc
FROM byk ORDER BY deg
""",
    tags=("graph",),
    doc="Degree-class local clustering C(k) of the part co-occurrence "
        "graph (parts sharing an order, <= 21 pairs per order; "
        "operators/graph.py:local_clustering_by_degree). PROBE GRAIN "
        "(r11 verdict task 4): the probe graph is bounded to orders "
        "with l_orderkey % 8 = 0 — a deterministic ~1/8 order sample "
        "that cuts wedge volume ~60x (wedges scale with sum deg^2), "
        "keeping the registry's densest probe inside the per-probe "
        "time budget at every sweep scale while exercising the "
        "identical operator and plan shape; the OPERATOR is "
        "unsampled — sizing is the probe boundary's job. Per-node "
        "triangle credits from the degree-ordered wedge join (the "
        "triangle_count O(m^1.5) family, hub-proof), rolled up by "
        "degree so avg_lcc = 2*sum_tri/(n_k*k*(k-1)) is EXACT "
        "rational with one closing division — no per-node float "
        "exists. The oracle re-enumerates triangles with simple "
        "id-orientation (the triangle SET is orientation-invariant).",
)
def graph_local_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import local_clustering_by_degree
    li = (load_table(spark, sf_dir, "lineitem")
          .filter(F.col("l_orderkey") % 8 == 0)
          .select(F.col("l_orderkey").alias("o"),
                  F.col("l_partkey").alias("p")))
    x = li.select(F.col("o"), F.col("p").alias("p1"))
    yy = li.select(F.col("o"), F.col("p").alias("p2"))
    e = (x.join(yy, "o")
         .filter(F.col("p1") < F.col("p2"))
         .select(F.col("p1").alias("src"), F.col("p2").alias("dst")))
    return local_clustering_by_degree(e)


# --------------------------------------------------------------------------
# 7. graph_adamic_adar — inverse-log-degree link prediction
# --------------------------------------------------------------------------

@query(
    "graph_adamic_adar",
    oracle="""
WITH e AS (
  SELECT DISTINCT c_custkey // 10 AS a, c_custkey AS b
  FROM customer WHERE c_custkey < 500 AND c_custkey // 10 <> c_custkey
), adj AS (SELECT a, b FROM e UNION ALL SELECT b AS a, a AS b FROM e),
deg AS (SELECT a AS node, CAST(count(*) AS BIGINT) AS deg
        FROM adj GROUP BY 1),
w AS (
  SELECT node,
         CAST(floor(1000000.0 / ln(CAST(deg AS DOUBLE))) AS BIGINT) AS wgt
  FROM deg
), common AS (
  SELECT l.b AS u, r.b AS v, CAST(count(*) AS BIGINT) AS common,
         CAST(sum(w.wgt) AS BIGINT) AS aa_grid
  FROM adj l JOIN adj r ON l.a = r.a AND l.b < r.b
  JOIN w ON w.node = l.a
  GROUP BY 1, 2
), newp AS (
  SELECT c.u, c.v, c.common, c.aa_grid FROM common c
  LEFT JOIN e ON c.u = e.a AND c.v = e.b
  WHERE e.a IS NULL
)
SELECT u, v, common, aa_grid,
       CAST(aa_grid AS DOUBLE) / 1000000.0 AS aa
FROM newp ORDER BY u, v
""",
    tags=("graph",),
    doc="Adamic-Adar link prediction over the customer digit "
        "hierarchy (operators/graph.py:adamic_adar_scores, custkey < "
        "500 — the jaccard_link_prediction graph): non-adjacent pairs "
        "scored by sum of inverse-log-degree of shared neighbors. "
        "Every wedge center has deg >= 2, each contributes "
        "floor(10^6/ln(deg)) as an INTEGER before the pair sum (the "
        "vocab_logrank ln-quantization rule), aa one closing double "
        "division; wedge equi-joins only, never node x node.",
)
def graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import adamic_adar_scores
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") < 500)
    edges = c.select(
        F.floor(F.col("c_custkey") / 10).cast("long").alias("src"),
        F.col("c_custkey").cast("long").alias("dst")).filter(
        F.col("src") != F.col("dst"))
    return adamic_adar_scores(edges, min_common=1)


# --------------------------------------------------------------------------
# 8. text_yule_k — vocabulary-richness characteristic
# --------------------------------------------------------------------------

@query(
    "text_yule_k",
    oracle=r"""
WITH tok AS (
  SELECT source AS g,
         unnest(string_split_regex(lower(text), '\s+')) AS token
  FROM documents
), tf AS (
  SELECT g, token, CAST(count(*) AS HUGEINT) AS f
  FROM tok WHERE token <> '' GROUP BY 1, 2
), agg AS (
  SELECT g, CAST(sum(f) AS HUGEINT) AS nn, CAST(count(*) AS BIGINT) AS vv,
         CAST(sum(f * f) AS HUGEINT) AS s2
  FROM tf GROUP BY 1
)
SELECT g AS category, CAST(nn AS BIGINT) AS n_tokens, vv AS n_types,
       CAST(s2 AS BIGINT) AS sum_f2,
       CASE WHEN nn > 0 THEN 10000.0 * CAST(s2 - nn AS DOUBLE)
                             / CAST(nn * nn AS DOUBLE) END AS yule_k
FROM agg ORDER BY category
""",
    tags=("llm", "text"),
    doc="Yule's characteristic K per document source (operators/"
        "text.py:yule_k_by_group) — the length-stable vocabulary-"
        "richness statistic corpus nutrition labels pair with TTR. "
        "K = 10^4*(sum f^2 - N)/N^2 over the source's token frequency "
        "spectrum: everything left of the single closing division is "
        "an exact DECIMAL(38,0) integer (sum f^2 IS sum m^2 V_m — no "
        "spectrum pivot). One token explode into a map-side "
        "combinable (source, token) aggregate, then a source-grain "
        "rollup.",
)
def text_yule_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import yule_k_by_group
    d = load_table(spark, sf_dir, "documents")
    return yule_k_by_group(d, "source")


# --------------------------------------------------------------------------
# 9. text_zipf_slope — rank-frequency log-log slope
# --------------------------------------------------------------------------

_ZIPF_TOP_R = 100
_ZIPF_X_SQL = "[" + ", ".join(
    str(v) for v in zipf_log_rank_grid(_ZIPF_TOP_R)) + "]"

@query(
    "text_zipf_slope",
    oracle=rf"""
WITH tok AS (
  SELECT lang AS g,
         unnest(string_split_regex(lower(text), '\s+')) AS token
  FROM documents
), tf AS (
  SELECT g, token, count(*) AS f
  FROM tok WHERE token <> '' GROUP BY 1, 2
), rk AS (
  SELECT g, f,
         row_number() OVER (PARTITION BY g ORDER BY f DESC, token) AS r
  FROM tf
), top AS (
  SELECT g, CAST(({_ZIPF_X_SQL})[r] AS HUGEINT) AS x,
         CAST(floor(ln(CAST(f AS DOUBLE)) * 1000000.0) AS HUGEINT) AS y
  FROM rk WHERE r <= {_ZIPF_TOP_R}
), m AS (
  SELECT g, CAST(count(*) AS HUGEINT) AS n, sum(x) AS sx,
         sum(x * x) AS sx2, sum(y) AS sy, sum(x * y) AS sxy
  FROM top GROUP BY 1
)
SELECT g AS category, CAST(n AS BIGINT) AS n_ranks,
       CASE WHEN n * sx2 - sx * sx > 0
            THEN CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sx2 - sx * sx AS DOUBLE)
       END AS slope
FROM m ORDER BY category
""",
    tags=("llm", "text"),
    doc="Zipf rank-frequency slope per language over each slice's "
        "top-100 token types (operators/text.py:zipf_slope) — natural "
        "text sits near -1; templated corpora drift flat. "
        "x = floor(ln(rank)*10^6) comes from a PYTHON literal table "
        "(bounded rank domain, the NDCG literal-weight rule); "
        "y = floor(ln(f)*10^6) integer-quantizes the engine-side log "
        "BEFORE the exact DECIMAL(38,0) OLS moments over <= 100 rows "
        "per slice; slope ONE double chain. The rank window "
        "partitions by slice over the Heaps-bounded type table (the "
        "build_vocab precedent).",
)
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import zipf_slope
    d = load_table(spark, sf_dir, "documents")
    return zipf_slope(d, "lang", top_r=_ZIPF_TOP_R)
