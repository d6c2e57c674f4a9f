"""Round-12 probe cohort (capped at FIVE by the r11 verdict task 2 —
coverage is asymptotic, rotation slots are the scarce resource):

1. ann_ivf_grid — the float-index class upgrade (verdict task 6): a
   deterministic integer-grid Lloyd's k-means IVF whose ENTIRE index
   build is oracle-reproducible, the pagerank_iter move applied to
   k-means centroid training.
2. graph_weighted_shortest_paths — the min-plus pointer-doubling
   closure generalized from hop counting to integer weight
   accumulation (verdict task 7's named frontier item).
3. graph_effective_diameter — distance-distribution rollup on the
   closure machinery: exact diameter + 90th-percentile effective
   diameter in pure integer arithmetic.
4. agg_percentile_cont_disc — SQL-standard ordered-set aggregates
   (percentile_cont / percentile_disc WITHIN GROUP), dyadic
   fractions over integer domains so the interpolation is EXACT in
   binary on both engines.
5. timeseries_theil_sen — median-of-pairwise-slopes robust trend,
   the Mann-Kendall companion, calendar-bounded series.

Every probe follows the determinism contract (registry module doc):
exact integer/DECIMAL accumulation, ONE double chain per emitted
value, identical aliases both sides, pinned total ORDER BY, and
nonnegative integer division only (Spark DIV ≡ DuckDB //).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from .registry import query


# --------------------------------------------------------------------------
# 1. ann_ivf_grid — integer-grid k-means IVF (float-index class upgrade)
# --------------------------------------------------------------------------

def _ivf_grid_oracle(n_cells: int = 4, n_probe: int = 2,
                     iters: int = 2, k: int = 5, scale: int = 1000,
                     offset: int = 1000, probe_max_id: int = 10) -> str:
    """Unrolled-CTE DuckDB twin of operators/similarity.py:ivf_grid_ann
    — long-format (id, pos, val) grids joined on pos replace Spark's
    zip_with folds; every training value is an exact integer, so both
    engines build the IDENTICAL index (the graph_pagerank_iter
    pattern for iterative algorithms). Positions come from
    unnest + generate_subscripts over the array ITSELF (r12 ADVICE:
    a hardcoded range(1, 65) would silently truncate or pad if the
    embeddings dimension ever drifted from 64 — deriving them keeps
    the oracle dim-agnostic, like the Spark side's zip_with folds)."""
    sql = f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * {scale}) AS BIGINT)
                + {offset}) AS qv,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dv
  FROM embeddings
),
qd AS (SELECT vec_id, u.pos - 1 AS pos, u.val
       FROM q, LATERAL (SELECT unnest(qv) AS val,
                               generate_subscripts(qv, 1) AS pos) u),
c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER)
           AS cell, qv
  FROM (SELECT vec_id, qv FROM q ORDER BY vec_id LIMIT {n_cells})
),
c0d AS (SELECT cell, u.pos - 1 AS pos, u.val
        FROM c0, LATERAL (SELECT unnest(qv) AS val,
                                 generate_subscripts(qv, 1) AS pos) u)"""
    prev = "c0d"
    for it in range(1, iters + 1):
        sql += f""",
a{it} AS (
  SELECT qd.vec_id, cd.cell,
         sum((qd.val - cd.val) * (qd.val - cd.val)) AS d2
  FROM qd JOIN {prev} cd USING (pos) GROUP BY 1, 2
), s{it} AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY d2, cell) AS rn
    FROM a{it}) WHERE rn = 1
), u{it} AS (
  SELECT s{it}.cell, qd.pos,
         CAST(sum(qd.val) // count(*) AS BIGINT) AS val
  FROM qd JOIN s{it} USING (vec_id) GROUP BY 1, 2
), c{it}d AS (
  SELECT p.cell, p.pos, coalesce(u{it}.val, p.val) AS val
  FROM {prev} p LEFT JOIN u{it}
    ON p.cell = u{it}.cell AND p.pos = u{it}.pos
)"""
        prev = f"c{it}d"
    sql += f""",
af AS (
  SELECT qd.vec_id, cd.cell,
         sum((qd.val - cd.val) * (qd.val - cd.val)) AS d2
  FROM qd JOIN {prev} cd USING (pos) GROUP BY 1, 2
), idx AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY d2, cell) AS rn
    FROM af) WHERE rn = 1
), p AS (
  SELECT vec_id AS probe_id, qv, dv FROM q
  WHERE vec_id < {probe_max_id}
), pd AS (
  SELECT probe_id, u.pos - 1 AS pos, u.val
  FROM p, LATERAL (SELECT unnest(qv) AS val,
                          generate_subscripts(qv, 1) AS pos) u
), pa AS (
  SELECT pd.probe_id, cd.cell,
         sum((pd.val - cd.val) * (pd.val - cd.val)) AS d2
  FROM pd JOIN {prev} cd USING (pos) GROUP BY 1, 2
), pc AS (
  SELECT probe_id, cell FROM (
    SELECT probe_id, cell,
           row_number() OVER (PARTITION BY probe_id
                              ORDER BY d2, cell) AS rn
    FROM pa) WHERE rn <= {n_probe}
), cand AS (
  SELECT pc.probe_id, idx.vec_id
  FROM pc JOIN idx USING (cell)
  WHERE pc.probe_id <> idx.vec_id
), scored AS (
  SELECT c.probe_id, c.vec_id,
         round(list_dot_product(p.dv, q.dv)
               / (sqrt(list_dot_product(p.dv, p.dv))
                  * sqrt(list_dot_product(q.dv, q.dv))), 6) AS cosine
  FROM cand c
  JOIN p ON c.probe_id = p.probe_id
  JOIN q ON c.vec_id = q.vec_id
), ranked AS (
  SELECT probe_id, vec_id, cosine,
         row_number() OVER (PARTITION BY probe_id
                            ORDER BY cosine DESC, vec_id) AS rank
  FROM scored
)
SELECT probe_id, vec_id, cosine, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= {k}
ORDER BY probe_id, rank"""
    return sql


@query(
    "ann_ivf_grid",
    oracle=_ivf_grid_oracle(),
    tags=("llm", "similarity"),
    doc="IVF approximate nearest neighbors with a DETERMINISTIC "
        "integer-grid Lloyd's k-means index (operators/similarity.py:"
        "ivf_grid_ann) — the r11-verdict task-6 upgrade proving the "
        "float-index rows-only class is not terminal: quantize "
        "vectors to a long grid (floor, exact), seed centroids from "
        "the n_cells smallest ids (a k-row TakeOrdered — the "
        "row_number runs over that bounded k-row frame only), two "
        "Lloyd rounds of exact-integer argmin assignment (broadcast "
        "centroids, map-side) + sum-DIV-count centroid refresh, then "
        "n_probe-cell pruned search with exact double-cosine re-rank "
        "(the cosine_topk fold). Same output contract as cosine_topk; "
        "candidate generation is a cell equi-join, never all-pairs. "
        "ann_ivf (pyspark.ml float KMeans) remains the production "
        "engine path; this twin carries the oracle for the shared "
        "IVF pipeline shape.",
)
def ann_ivf_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import ivf_grid_ann
    e = load_table(spark, sf_dir, "embeddings")
    probes = e.filter(F.col("vec_id") < 10)
    return (ivf_grid_ann(e, probes, k=5, n_cells=4, n_probe=2, iters=2)
            .orderBy("probe_id", "rank"))


# --------------------------------------------------------------------------
# 2. graph_weighted_shortest_paths — min-plus closure with weights
# --------------------------------------------------------------------------

@query(
    "graph_weighted_shortest_paths",
    oracle="""
WITH RECURSIVE e AS (
  SELECT c_custkey AS child, c_custkey // 10 AS parent,
         c_custkey % 5 + 1 AS w
  FROM customer WHERE c_custkey > 0
), sp AS (
  SELECT child AS node, parent AS anc, w AS cost FROM e
  UNION ALL
  SELECT s.node, e.parent, s.cost + e.w
  FROM sp s JOIN e ON s.anc = e.child
)
SELECT node, anc, CAST(min(cost) AS BIGINT) AS cost
FROM sp GROUP BY node, anc
ORDER BY node, anc
""",
    tags=("graph", "recursive"),
    doc="Weighted shortest-path cost over the custkey decimal-digit "
        "hierarchy with deterministic integer edge weights "
        "(custkey%5+1; operators/graph.py:weighted_shortest_paths): "
        "the transitive_closure min-plus pointer doubling with the "
        "relax step generalized from +1 hops to +w integer weight — "
        "ceil(log2(16)) self-join rounds, each one bucketed equi-join "
        "+ one groupBy-min, never node x node. All-long arithmetic; "
        "the oracle is the weighted recursive CTE Spark SQL lacks.",
)
def graph_weighted_shortest_paths(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    from ..operators.graph import weighted_shortest_paths
    c = load_table(spark, sf_dir, "customer")
    edges = (c.filter(F.col("c_custkey") > 0)
             .select(F.col("c_custkey").alias("src"),
                     (F.col("c_custkey") / 10).cast("long").alias("dst"),
                     (F.col("c_custkey") % 5 + 1).cast("long")
                     .alias("w")))
    out = weighted_shortest_paths(edges, max_depth=16)
    return (out.select("node", "anc",
                       F.col("cost").cast("long").alias("cost"))
            .orderBy("node", "anc"))


# --------------------------------------------------------------------------
# 3. graph_effective_diameter — closure distance distribution rollup
# --------------------------------------------------------------------------

@query(
    "graph_effective_diameter",
    oracle="""
WITH RECURSIVE e AS (
  SELECT c_custkey AS child, c_custkey // 10 AS parent
  FROM customer WHERE c_custkey > 0
), anc AS (
  SELECT child AS node, parent AS anc, 1 AS depth FROM e
  UNION ALL
  SELECT a.node, e.parent, a.depth + 1
  FROM anc a JOIN e ON a.anc = e.child
), d AS (
  SELECT node, anc, min(depth) AS depth FROM anc GROUP BY 1, 2
), h AS (SELECT depth, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1),
c AS (
  SELECT depth,
         CAST(sum(n) OVER (ORDER BY depth
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS BIGINT) AS cum,
         CAST(sum(n) OVER () AS BIGINT) AS total
  FROM h
)
SELECT (SELECT CAST(sum(n) AS BIGINT) FROM h) AS n_pairs,
       (SELECT CAST(max(depth) AS BIGINT) FROM h) AS diameter,
       (SELECT CAST(min(depth) AS BIGINT) FROM c
        WHERE 100 * cum >= 90 * total) AS effective_diameter
""",
    tags=("graph", "recursive"),
    doc="Effective diameter (90th-percentile reachable-pair hop "
        "distance) + exact diameter of the custkey digit hierarchy "
        "closure (operators/graph.py:effective_diameter): the min-plus "
        "doubling closure feeds a distance histogram of at most "
        "max_depth rows, so the cumulative window is a bounded "
        "<=16-row single-task rollup (the drift_ks bounded-global-"
        "window rule) and the percentile threshold is pure integer "
        "arithmetic (100*cum >= 90*total) — no float percentile "
        "exists. ONE output row (n_pairs, diameter, "
        "effective_diameter).",
)
def graph_effective_diameter(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    from ..operators.graph import effective_diameter
    c = load_table(spark, sf_dir, "customer")
    edges = (c.filter(F.col("c_custkey") > 0)
             .select(F.col("c_custkey").alias("src"),
                     (F.col("c_custkey") / 10).cast("long")
                     .alias("dst")))
    return effective_diameter(edges, pct=90, max_depth=16)


# --------------------------------------------------------------------------
# 4. agg_percentile_cont_disc — SQL-standard ordered-set aggregates
# --------------------------------------------------------------------------

@query(
    "agg_percentile_cont_disc",
    oracle="""
SELECT l_returnflag AS flag, l_linestatus AS status,
  percentile_cont(0.25) WITHIN GROUP (ORDER BY CAST(l_quantity AS BIGINT))
    AS qty_q1,
  percentile_cont(0.5)  WITHIN GROUP (ORDER BY CAST(l_quantity AS BIGINT))
    AS qty_q2,
  percentile_cont(0.75) WITHIN GROUP (ORDER BY CAST(l_quantity AS BIGINT))
    AS qty_q3,
  CAST(percentile_disc(0.5)
       WITHIN GROUP (ORDER BY CAST(l_quantity AS BIGINT)) AS BIGINT)
    AS qty_med_disc,
  percentile_cont(0.5) WITHIN GROUP (
    ORDER BY CAST(round(l_extendedprice * 100) AS BIGINT))
    AS cents_median,
  CAST(count(*) AS BIGINT) AS n
FROM lineitem
GROUP BY 1, 2 ORDER BY 1, 2
""",
    tags=("agg",),
    doc="SQL-standard ordered-set aggregates percentile_cont / "
        "percentile_disc WITHIN GROUP over the (returnflag, "
        "linestatus) groups — the interpolating + discrete "
        "complement of the existing exact-percentile family. "
        "Determinism: every fraction is DYADIC (0.25/0.5/0.75) and "
        "every order column an exact integer (quantity; price cents "
        "via round*100), so the linear interpolation a+(b-a)*f is "
        "EXACT in binary on both engines regardless of formula "
        "association — raw doubles emitted, no rounding needed.",
)
def agg_percentile_cont_disc(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    li = li.select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_linestatus").alias("status"),
        F.col("l_quantity").cast("long").alias("qty"),
        F.round(F.col("l_extendedprice") * 100).cast("long")
        .alias("cents"))
    return (li.groupBy("flag", "status")
            .agg(F.expr("percentile_cont(0.25) WITHIN GROUP "
                        "(ORDER BY qty)").alias("qty_q1"),
                 F.expr("percentile_cont(0.5) WITHIN GROUP "
                        "(ORDER BY qty)").alias("qty_q2"),
                 F.expr("percentile_cont(0.75) WITHIN GROUP "
                        "(ORDER BY qty)").alias("qty_q3"),
                 F.expr("CAST(percentile_disc(0.5) WITHIN GROUP "
                        "(ORDER BY qty) AS BIGINT)")
                 .alias("qty_med_disc"),
                 F.expr("percentile_cont(0.5) WITHIN GROUP "
                        "(ORDER BY cents)").alias("cents_median"),
                 F.count(F.lit(1)).alias("n"))
            .orderBy("flag", "status"))


# --------------------------------------------------------------------------
# 5. timeseries_theil_sen — median pairwise slope per calendar month
# --------------------------------------------------------------------------

@query(
    "timeseries_theil_sen",
    oracle="""
WITH daily AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS ym,
         CAST(date_part('day', o_orderdate) AS BIGINT) AS t,
         CAST(count(*) AS BIGINT) AS y
  FROM orders GROUP BY 1, 2
), pairs AS (
  SELECT a.ym,
         CAST(b.y - a.y AS DOUBLE) / CAST(b.t - a.t AS DOUBLE) AS slope
  FROM daily a JOIN daily b ON a.ym = b.ym AND a.t < b.t
), ranked AS (
  SELECT ym, slope,
         row_number() OVER (PARTITION BY ym ORDER BY slope) AS rn,
         count(*) OVER (PARTITION BY ym) AS m
  FROM pairs
), med AS (
  SELECT ym, avg(slope) AS sen_slope, CAST(max(m) AS BIGINT) AS n_pairs
  FROM ranked
  WHERE rn = (m + 1) // 2 OR rn = (m + 2) // 2
  GROUP BY 1
), pts AS (
  SELECT ym, CAST(count(*) AS BIGINT) AS n_points FROM daily GROUP BY 1
)
SELECT pts.ym, n_points, n_pairs, sen_slope
FROM pts JOIN med USING (ym) ORDER BY ym
""",
    tags=("timeseries", "stats"),
    doc="Theil-Sen robust trend slope of daily order counts per "
        "calendar month (operators/timeseries.py:theil_sen_slope) — "
        "the median-of-pairwise-slopes companion to Mann-Kendall's S "
        "over the same calendar-cell-bounded grain (<= 31 points -> "
        "<= 465 pairs per series; the self-join is a bounded per-key "
        "cell product, never data x data). Each slope is ONE double "
        "division over exact integer differences; the median is an "
        "order statistic (two middle VALUES averaged via nonnegative "
        "(m+1) DIV 2 indices), so slope ties cannot skew it and the "
        "raw double is bit-stable — no rounding.",
)
def timeseries_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import theil_sen_slope
    daily = (load_table(spark, sf_dir, "orders")
             .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
                      F.dayofmonth("o_orderdate").cast("long").alias("t"))
             .agg(F.count(F.lit(1)).alias("y")))
    return theil_sen_slope(daily, "ym", "t", "y")
