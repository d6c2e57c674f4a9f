"""Round-13 probe cohort (capped at FIVE — the r11 rule, re-affirmed
by the r12 verdict task 4):

1. ann_pq_grid — integer-grid product quantization: per-subspace
   Lloyd's codebooks + ADC scan, the r12-verdict task-2 twin that
   (with 2.) EMPTIES the float-index rows-only class.
2. ann_ivfpq_grid — IVF + PQ composed on the grid (the FAISS IVFPQ
   shape): the whole composite index — coarse cells AND fine
   codebooks — replayed by one unrolled-CTE oracle.
3. agg_string_agg_ordered — ordered string_agg/listagg WITHIN GROUP,
   the one common SQL aggregate with no probe (r12 verdict task 4c).
4. stream_stream_full_outer — stream-stream FULL OUTER interval join
   (task 4d): both sides' unmatched rows must flush on watermark.
5. graph_hyperball_nf — the HyperBall/HLL neighborhood function
   (task 4a) with DETERMINISTIC md5-derived registers, dyadic-exact
   harmonic sums, and Python-precomputed ln literals, so even the
   APPROXIMATE sketch is oracle-exact (the approx-distinct analog of
   the grid-twin move); accuracy vs the exact closure is
   pytest-pinned.

Every probe follows the determinism contract (registry module doc):
exact integer/DECIMAL accumulation, ONE double chain per emitted
value (IEEE +,*,/ are correctly rounded, hence engine-portable;
transcendentals are NOT and never touch a hashed value), identical
aliases both sides, pinned total ORDER BY, nonnegative DIV parity.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from .registry import query

# --------------------------------------------------------------------------
# shared CTE fragments for the grid-ANN oracles
# --------------------------------------------------------------------------

_GRID_Q = """
q AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * {scale}) AS BIGINT)
                + {offset}) AS qv,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dv
  FROM embeddings
)"""


def _pq_train_ctes(dsub: int, n_codes: int, iters: int) -> tuple[str, str]:
    """Unrolled per-subspace Lloyd's k-means over the long grid —
    the DuckDB replay of operators/similarity.py:_grid_codebook_train
    at m>1: long-format (vec_id, sub, spos, val) with sub = pos DIV
    dsub; seeds row_number BEFORE any dim explosion (the r12 pitfall);
    argmin ties -> lowest code; sum // count refresh; emptied code
    keeps its previous centroid. Returns (ctes, final_codebook_name).
    """
    sql = f""",
qd AS (
  SELECT vec_id, (u.pos - 1) // {dsub} AS sub,
         (u.pos - 1) % {dsub} AS spos, u.val
  FROM q, LATERAL (SELECT unnest(qv) AS val,
                          generate_subscripts(qv, 1) AS pos) u
),
sd AS (
  SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1
                      AS INTEGER) AS code
  FROM (SELECT vec_id FROM q ORDER BY vec_id LIMIT {n_codes})
),
cb0 AS (
  SELECT qd.sub, sd.code, qd.spos, qd.val
  FROM qd JOIN sd USING (vec_id)
)"""
    prev = "cb0"
    for it in range(1, iters + 1):
        sql += f""",
fa{it} AS (
  SELECT qd.vec_id, qd.sub, cb.code,
         sum((qd.val - cb.val) * (qd.val - cb.val)) AS d2
  FROM qd JOIN {prev} cb ON qd.sub = cb.sub AND qd.spos = cb.spos
  GROUP BY 1, 2, 3
), fs{it} AS (
  SELECT vec_id, sub, code FROM (
    SELECT vec_id, sub, code,
           row_number() OVER (PARTITION BY vec_id, sub
                              ORDER BY d2, code) AS rn
    FROM fa{it}) WHERE rn = 1
), fu{it} AS (
  SELECT s.sub, s.code, qd.spos,
         CAST(sum(qd.val) // count(*) AS BIGINT) AS val
  FROM qd JOIN fs{it} s ON qd.vec_id = s.vec_id AND qd.sub = s.sub
  GROUP BY 1, 2, 3
), cb{it} AS (
  SELECT p.sub, p.code, p.spos, coalesce(u.val, p.val) AS val
  FROM {prev} p LEFT JOIN fu{it} u
    ON p.sub = u.sub AND p.code = u.code AND p.spos = u.spos
)"""
        prev = f"cb{it}"
    sql += f""",
faf AS (
  SELECT qd.vec_id, qd.sub, cb.code,
         sum((qd.val - cb.val) * (qd.val - cb.val)) AS d2
  FROM qd JOIN {prev} cb ON qd.sub = cb.sub AND qd.spos = cb.spos
  GROUP BY 1, 2, 3
), idx AS (
  SELECT vec_id, sub, code FROM (
    SELECT vec_id, sub, code,
           row_number() OVER (PARTITION BY vec_id, sub
                              ORDER BY d2, code) AS rn
    FROM faf) WHERE rn = 1
)"""
    return sql, prev


def _pq_search_tail(dsub: int, k: int, refine: int, probe_max_id: int,
                    final_cb: str, routed: bool) -> str:
    """ADC scan + exact re-rank: per-probe LUT of exact integer
    subvector distances against the final codebook, summed per
    (probe, vec) over the code table (``routed``: only over vectors
    in the probe's n_probe coarse cells — requires ivcell/pcell CTEs),
    refine·k candidates by exact-long approx_d2, exact double-cosine
    finish (the cosine_topk fold both sides)."""
    if routed:
        approx = """
approx AS (
  SELECT pc.probe_id, i.vec_id, sum(l.pd2) AS approx_d2
  FROM idx i
  JOIN ivcell c ON i.vec_id = c.vec_id
  JOIN pcell pc ON pc.cell = c.cell
  JOIN lut l ON l.probe_id = pc.probe_id
            AND l.sub = i.sub AND l.code = i.code
  WHERE i.vec_id <> pc.probe_id
  GROUP BY 1, 2
)"""
    else:
        approx = """
approx AS (
  SELECT l.probe_id, i.vec_id, sum(l.pd2) AS approx_d2
  FROM idx i JOIN lut l ON i.sub = l.sub AND i.code = l.code
  WHERE i.vec_id <> l.probe_id
  GROUP BY 1, 2
)"""
    return f""",
pr AS (
  SELECT vec_id AS probe_id, qv, dv FROM q
  WHERE vec_id < {probe_max_id}
), prd AS (
  SELECT probe_id, (u.pos - 1) // {dsub} AS sub,
         (u.pos - 1) % {dsub} AS spos, u.val
  FROM pr, LATERAL (SELECT unnest(qv) AS val,
                           generate_subscripts(qv, 1) AS pos) u
), lut AS (
  SELECT prd.probe_id, prd.sub, cb.code,
         sum((prd.val - cb.val) * (prd.val - cb.val)) AS pd2
  FROM prd JOIN {final_cb} cb
    ON prd.sub = cb.sub AND prd.spos = cb.spos
  GROUP BY 1, 2, 3
),{approx}, cand AS (
  SELECT probe_id, vec_id FROM (
    SELECT probe_id, vec_id,
           row_number() OVER (PARTITION BY probe_id
                              ORDER BY approx_d2, vec_id) AS rn
    FROM approx) WHERE rn <= {k * refine}
), scored AS (
  SELECT c.probe_id, c.vec_id,
         round(list_dot_product(pr.dv, q.dv)
               / (sqrt(list_dot_product(pr.dv, pr.dv))
                  * sqrt(list_dot_product(q.dv, q.dv))), 6) AS cosine
  FROM cand c
  JOIN pr ON c.probe_id = pr.probe_id
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


def _ivf_train_ctes(n_cells: int, iters: int) -> tuple[str, str]:
    """Unrolled whole-vector Lloyd's (the coarse quantizer) — the
    _ivf_grid_oracle training chain, v-prefixed so it composes with
    the PQ chain in one statement. Ends with ivcell (vec_id, cell)."""
    sql = """,
vqd AS (SELECT vec_id, u.pos - 1 AS pos, u.val
        FROM q, LATERAL (SELECT unnest(qv) AS val,
                                generate_subscripts(qv, 1) AS pos) u),
vc0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER)
           AS cell, qv
  FROM (SELECT vec_id, qv FROM q ORDER BY vec_id LIMIT {n_cells})
),
vc0d AS (SELECT cell, u.pos - 1 AS pos, u.val
         FROM vc0, LATERAL (SELECT unnest(qv) AS val,
                                   generate_subscripts(qv, 1) AS pos) u)
""".format(n_cells=n_cells)
    prev = "vc0d"
    for it in range(1, iters + 1):
        sql += f""",
va{it} AS (
  SELECT vqd.vec_id, cd.cell,
         sum((vqd.val - cd.val) * (vqd.val - cd.val)) AS d2
  FROM vqd JOIN {prev} cd USING (pos) GROUP BY 1, 2
), vs{it} AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY d2, cell) AS rn
    FROM va{it}) WHERE rn = 1
), vu{it} AS (
  SELECT vs{it}.cell, vqd.pos,
         CAST(sum(vqd.val) // count(*) AS BIGINT) AS val
  FROM vqd JOIN vs{it} USING (vec_id) GROUP BY 1, 2
), vc{it}d AS (
  SELECT p.cell, p.pos, coalesce(vu{it}.val, p.val) AS val
  FROM {prev} p LEFT JOIN vu{it}
    ON p.cell = vu{it}.cell AND p.pos = vu{it}.pos
)"""
        prev = f"vc{it}d"
    sql += f""",
vaf AS (
  SELECT vqd.vec_id, cd.cell,
         sum((vqd.val - cd.val) * (vqd.val - cd.val)) AS d2
  FROM vqd JOIN {prev} cd USING (pos) GROUP BY 1, 2
), ivcell AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY d2, cell) AS rn
    FROM vaf) WHERE rn = 1
)"""
    return sql, prev


def _pq_grid_oracle(m: int = 4, dsub: int = 16, n_codes: int = 4,
                    iters: int = 2, k: int = 5, refine: int = 4,
                    scale: int = 1000, offset: int = 1000,
                    probe_max_id: int = 10) -> str:
    """Unrolled-CTE DuckDB twin of operators/similarity.py:pq_grid_ann
    — the complete per-subspace codebook training + ADC scan + exact
    re-rank in one statement. Positions derive from the array itself
    (dim-agnostic up to the fixed subvector width dsub)."""
    train, final_cb = _pq_train_ctes(dsub, n_codes, iters)
    tail = _pq_search_tail(dsub, k, refine, probe_max_id, final_cb,
                           routed=False)
    return ("WITH " + _GRID_Q.format(scale=scale, offset=offset)
            + train + tail)


def _ivfpq_grid_oracle(n_cells: int = 4, n_probe: int = 2, m: int = 4,
                       dsub: int = 16, n_codes: int = 4, iters: int = 2,
                       k: int = 5, refine: int = 4, scale: int = 1000,
                       offset: int = 1000, probe_max_id: int = 10) -> str:
    """The composite index replay: coarse whole-vector Lloyd's (v*
    CTEs -> ivcell) + per-subspace PQ chain (cb* -> idx) + probe cell
    routing (pcell) + routed ADC + exact re-rank."""
    ivf, _ = _ivf_train_ctes(n_cells, iters)
    pq, final_cb = _pq_train_ctes(dsub, n_codes, iters)
    route = f""",
pcd AS (
  SELECT pr0.probe_id, cd.cell,
         sum((pu.val - cd.val) * (pu.val - cd.val)) AS d2
  FROM (SELECT vec_id AS probe_id, qv FROM q
        WHERE vec_id < {probe_max_id}) pr0,
       LATERAL (SELECT unnest(qv) AS val,
                       generate_subscripts(qv, 1) AS pos) pu
  JOIN vc{iters}d cd ON pu.pos - 1 = cd.pos
  GROUP BY 1, 2
), pcell AS (
  SELECT probe_id, cell FROM (
    SELECT probe_id, cell,
           row_number() OVER (PARTITION BY probe_id
                              ORDER BY d2, cell) AS rn
    FROM pcd) WHERE rn <= {n_probe}
)"""
    tail = _pq_search_tail(dsub, k, refine, probe_max_id, final_cb,
                           routed=True)
    return ("WITH " + _GRID_Q.format(scale=scale, offset=offset)
            + ivf + pq + route + tail)


# --------------------------------------------------------------------------
# 1. ann_pq_grid — integer-grid product quantization
# --------------------------------------------------------------------------

@query(
    "ann_pq_grid",
    oracle=_pq_grid_oracle(),
    tags=("llm", "similarity"),
    doc="Product-quantization ANN with DETERMINISTIC integer-grid "
        "codebooks (operators/similarity.py:pq_grid_ann) — with "
        "ann_ivfpq_grid this EMPTIES the float-index rows-only class "
        "(r12 verdict task 2): the vector splits into m=4 disjoint "
        "16-dim subvectors, each subspace trains its own 4-centroid "
        "codebook with the shared exact-integer Lloyd's trainer "
        "(_grid_codebook_train — the ann_ivf_grid loop generalized "
        "to per-subspace grain), and search is the FAISS asymmetric-"
        "distance scan as relational algebra: a broadcast per-probe "
        "(sub, code) -> exact-long-distance lookup table joined to "
        "the corpus code lists and summed per (probe, vec), top "
        "refine*k by exact integer approx_d2, exact double-cosine "
        "re-rank. ann_pq (pyspark.ml float KMeans codebooks) remains "
        "the production trainer; this twin carries the oracle for "
        "the shared PQ pipeline shape.",
)
def ann_pq_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import pq_grid_ann
    e = load_table(spark, sf_dir, "embeddings")
    probes = e.filter(F.col("vec_id") < 10)
    return (pq_grid_ann(e, probes, k=5, m=4, n_codes=4, iters=2,
                        refine=4, dim=64)
            .orderBy("probe_id", "rank"))


# --------------------------------------------------------------------------
# 2. ann_ivfpq_grid — IVF + PQ composed on the grid
# --------------------------------------------------------------------------

@query(
    "ann_ivfpq_grid",
    oracle=_ivfpq_grid_oracle(),
    tags=("llm", "similarity"),
    doc="IVF+PQ composed on the integer grid (operators/similarity."
        "py:ivfpq_grid_ann) — the FAISS IVFPQ shape with the ENTIRE "
        "composite index build oracle-replayed: coarse cells bound "
        "WHICH vectors are scanned (n_probe/n_cells of the corpus "
        "via the posting-list cell equi-join), grid-PQ codes bound "
        "the BYTES per scanned vector, exact cosine re-ranks "
        "refine*k finalists. Both quantizers train through "
        "_grid_codebook_train (m=1 whole-vector vs m=4 subvector), "
        "so ONE unrolled-CTE statement replays coarse training, fine "
        "training, routing, ADC, and re-rank bit-for-bit. "
        "ann_ivfpq (float) remains the production path.",
)
def ann_ivfpq_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import ivfpq_grid_ann
    e = load_table(spark, sf_dir, "embeddings")
    probes = e.filter(F.col("vec_id") < 10)
    return (ivfpq_grid_ann(e, probes, k=5, n_cells=4, n_probe=2,
                           m=4, n_codes=4, iters=2, refine=4, dim=64)
            .orderBy("probe_id", "rank"))


# --------------------------------------------------------------------------
# 3. agg_string_agg_ordered — ordered string_agg / listagg WITHIN GROUP
# --------------------------------------------------------------------------

@query(
    "agg_string_agg_ordered",
    oracle="""
SELECT c_nationkey AS nation,
       string_agg(c_name, '|' ORDER BY c_custkey) AS names_by_key,
       string_agg(c_mktsegment, ',' ORDER BY c_acctbal DESC, c_custkey)
         AS segs_by_bal_desc,
       CAST(count(*) AS BIGINT) AS n
FROM customer WHERE c_custkey % 50 = 0
GROUP BY 1 ORDER BY 1
""",
    tags=("agg",),
    doc="Ordered string_agg / listagg WITHIN GROUP (ORDER BY ...) — "
        "the one common SQL aggregate with no probe until r13 (r12 "
        "verdict task 4c). Spark 4 ships both spellings natively "
        "(listagg == string_agg); the probe exercises an ascending "
        "single-key order and a DESC multi-key order (acctbal DESC "
        "with custkey tiebreak — ties on the double sort key cannot "
        "reorder output because the integer tiebreak is total). "
        "Determinism: concatenation order is fully specified by the "
        "ORDER BY, so the emitted string is exact on both engines — "
        "no float accumulation exists. Scale: ordered aggregation is "
        "sort-based within groups (one shuffle on the group key, "
        "sort within partitions); the %50 slice bounds probe output, "
        "not the operator.",
)
def agg_string_agg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (load_table(spark, sf_dir, "customer")
         .filter(F.col("c_custkey") % 50 == 0))
    return (c.groupBy(F.col("c_nationkey").alias("nation"))
            .agg(F.expr("listagg(c_name, '|') WITHIN GROUP "
                        "(ORDER BY c_custkey)").alias("names_by_key"),
                 F.expr("string_agg(c_mktsegment, ',') WITHIN GROUP "
                        "(ORDER BY c_acctbal DESC, c_custkey)")
                 .alias("segs_by_bal_desc"),
                 F.count(F.lit(1)).alias("n"))
            .orderBy("nation"))


# --------------------------------------------------------------------------
# 4. stream_stream_full_outer — FULL OUTER interval join
# --------------------------------------------------------------------------

@query(
    "stream_stream_full_outer",
    oracle="""
SELECT coalesce(v.user_id, p.user_id) AS user_id,
       v.event_id AS view_id,
       p.event_id AS purchase_id,
       CASE WHEN v.event_id IS NOT NULL
            THEN strftime(v.ts, '%Y-%m-%d %H:%M:%S.%f') END AS ts_view,
       CASE WHEN p.event_id IS NOT NULL
            THEN strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') END AS ts_purchase
FROM (SELECT * FROM events WHERE event_type = 'view') v
FULL JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON v.user_id = p.user_id
 AND p.ts >= v.ts
 AND p.ts <= v.ts + INTERVAL 10 MINUTE
ORDER BY view_id, purchase_id
""",
    tags=("streaming", "join"),
    doc="Stream-stream FULL OUTER interval join (streaming/ops.py:"
        "stream_stream_interval_join, how='full_outer' — r12 verdict "
        "task 4d): every view AND every purchase emits — matched "
        "within 10 minutes, or with NULL other-side columns once the "
        "watermark passes its window. Outer emission on a finite "
        "replay needs the watermark to move PAST both sides' tails, "
        "so the probe stages the events plus two trailing far-future "
        "sentinel micro-batches carrying BOTH event types (filtered "
        "from the output). Must equal the batch FULL JOIN with the "
        "same interval condition; state stays evictable because the "
        "interval bounds each side relative to the other.",
)
def stream_stream_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the staged replay (sentinels on BOTH tails, sentinel filter,
    # output shape) is shared with stream_stream_left_outer — ONE
    # helper so the sentinel protocol cannot drift between the two
    from .streaming_probes import outer_interval_join_replay
    return outer_interval_join_replay(spark, sf_dir, how="full_outer")


# --------------------------------------------------------------------------
# 5. graph_hyperball_nf — HyperBall neighborhood function, oracle-exact
# --------------------------------------------------------------------------

def _hexdig(expr: str) -> str:
    """DuckDB decode of one lowercase hex char (DuckDB has no conv())
    — the sketch_join_cardinality pattern."""
    return (f"(CASE WHEN ascii({expr}) >= 97 THEN ascii({expr}) - 87 "
            f"ELSE ascii({expr}) - 48 END)")


def _hyperball_oracle(max_radius: int = 6, pct: int = 90) -> str:
    """Unrolled-CTE DuckDB twin of operators/graph.py:
    hyperball_neighborhood over the custkey digit hierarchy — the
    whole HLL machinery replayed in SQL: md5 registers (bucket = 1st
    hex digit, rho = 1 + leading zero bits of the next 12, capped),
    max_radius register-max propagation rounds up the out-edges, and
    the per-node estimate chain with ln LITERALS precomputed in
    Python (operators/graph.py:HLL_LC_TABLE — ln never runs
    engine-side) and micro-quantization before the cross-node sum."""
    from ..operators.graph import (HLL_ALPHA_NUM, HLL_LC_TABLE, HLL_M,
                                   HLL_RHO_CAP)
    nz = "length(regexp_extract(substr(hx, 2, 12), '^0*'))"
    d1 = _hexdig(f"substr(substr(hx, 2, 12), {nz} + 1, 1)")
    clz4 = (f"(CASE WHEN {d1} >= 8 THEN 0 WHEN {d1} >= 4 THEN 1 "
            f"WHEN {d1} >= 2 THEN 2 ELSE 3 END)")
    lc = "CASE v " + " ".join(
        f"WHEN {v} THEN CAST('{HLL_LC_TABLE[v]!r}' AS DOUBLE)"
        for v in range(1, HLL_M)) + " ELSE NULL END"
    alpha = f"CAST('{HLL_ALPHA_NUM!r}' AS DOUBLE)"
    sql = f"""
WITH e AS (
  SELECT DISTINCT c_custkey AS s, c_custkey // 10 AS d
  FROM customer WHERE c_custkey > 0
),
nodes AS (
  SELECT DISTINCT node FROM
    (SELECT s AS node FROM e UNION ALL SELECT d FROM e) t
),
h AS (SELECT node, md5(CAST(node AS VARCHAR)) AS hx FROM nodes),
s0 AS MATERIALIZED (
  SELECT node,
         {_hexdig("substr(hx, 1, 1)")} AS bucket,
         CASE WHEN {nz} >= 12 THEN {min(49, HLL_RHO_CAP)}
              ELSE LEAST(4 * {nz} + {clz4} + 1, {HLL_RHO_CAP})
         END AS reg
  FROM h
)"""
    # AS MATERIALIZED is load-bearing, not a hint: each round
    # references the previous state TWICE (identity + propagation)
    # and its estimate a third time, and DuckDB's default CTE
    # inlining re-expands every reference — a 2^max_radius blowup
    # that hangs even at sf0.001 (observed; the SQL mirror of the
    # Spark-side analyzer OOM the eager localCheckpoint fixes).
    for i in range(1, max_radius + 1):
        sql += f""",
s{i} AS MATERIALIZED (
  SELECT node, bucket, max(reg) AS reg FROM (
    SELECT node, bucket, reg FROM s{i - 1}
    UNION ALL
    SELECT e.s AS node, p.bucket, p.reg
    FROM e JOIN s{i - 1} p ON p.node = e.d
  ) t GROUP BY 1, 2
)"""
    for i in range(max_radius + 1):
        sql += f""",
est{i} AS (
  SELECT {i} AS r, CAST(sum(micro) AS BIGINT) AS est_micro FROM (
    SELECT CAST(floor((CASE WHEN v > 0 AND {alpha} / sd <= 40.0
                       THEN {lc}
                       ELSE {alpha} / sd END) * 1000000.0) AS BIGINT)
           AS micro
    FROM (
      SELECT node, {HLL_M} - count(*) AS v,
             CAST({HLL_M} - count(*) AS DOUBLE)
             + sum(1.0 / CAST((CAST(1 AS BIGINT) << reg) AS DOUBLE))
               AS sd
      FROM s{i} GROUP BY node) pn) ag
)"""
    unions = " UNION ALL ".join(f"SELECT * FROM est{i}"
                                for i in range(max_radius + 1))
    sql += f""",
nf AS ({unions}),
mx AS (SELECT max(est_micro) AS mx FROM nf),
eff AS (SELECT CAST(min(r) AS BIGINT) AS effective_radius
        FROM nf, mx WHERE 100 * est_micro >= {pct} * mx)
SELECT CAST(nf.r AS BIGINT) AS r, nf.est_micro, eff.effective_radius
FROM nf, eff ORDER BY nf.r"""
    return sql


@query(
    "graph_hyperball_nf",
    oracle=_hyperball_oracle(),
    tags=("graph", "sketch"),
    doc="HyperBall neighborhood function N(r) + effective radius over "
        "the custkey digit hierarchy (operators/graph.py:"
        "hyperball_neighborhood — Boldi & Vigna 2013; r12 verdict "
        "task 4a): per-node HyperLogLog counters (m=16 md5-derived "
        "registers) propagate by register-max up the out-edges, so "
        "diameter-class metrics cost nodes×16 state instead of the "
        "exact closure's O(reachable pairs) — THE scale path for "
        "social-graph topologies where graph_effective_diameter's "
        "exact materialization explodes. The approx-distinct analog "
        "of the grid-twin move: registers are md5 (portable), the "
        "harmonic sum is dyadic-exact under the rho cap, x and / are "
        "IEEE-correctly-rounded, the linear-counting branch reads ln "
        "literals precomputed in Python, and per-node estimates "
        "quantize to micro-units before summing — so even the "
        "APPROXIMATION hash-matches the oracle bit-for-bit. Accuracy "
        "vs the exact closure is pytest-pinned "
        "(tests/test_properties.py::test_hyperball_*).",
)
def graph_hyperball_nf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import hyperball_neighborhood
    c = load_table(spark, sf_dir, "customer")
    edges = (c.filter(F.col("c_custkey") > 0)
             .select(F.col("c_custkey").alias("src"),
                     (F.col("c_custkey") / 10).cast("long")
                     .alias("dst")))
    # radius 6 covers the digit hierarchy's diameter at every
    # verified scale (5 at sf0.1, 6 at sf1: a 6-digit custkey is 6
    # hops from the root), and the probe budget rule (SCALE.md r12
    # §1) sizes the grain at registration: radius 8 with per-round
    # checkpoints measured 15.3 s at sf0.1; radius 6 with every-3rd-
    # round checkpointing + the single-aggregation estimate fold
    # lands ~10.5 s steady-state (job count, not data, is the cost).
    return hyperball_neighborhood(edges, max_radius=6, pct=90)
