"""Round-10 probe cohort: exact substring-span removal (the Lee et
al. dedup completion), md5-twin oracle upgrades for three formerly
rows-only families (CMS top-k, weighted sampling, PageRank), rank
statistics (Kendall τ-b, Kruskal-Wallis, Wilcoxon signed-rank),
paired t, two-factor OLS, calibration bins, Cramér's V, link
prediction, n-gram novelty, randomized response, unigram KL, rolling
medians and gaps-and-islands interval merge, plus the post-window
fourth/fifth/sixth mini-cohorts: Friedman repeated-measures test,
Mann-Kendall trend + Sen's slope, degree assortativity, Wald SPRT
first crossing, quantile normalization, integer-grid HITS,
Jensen-Shannon divergence, Cochran's Q and the Wald-Wolfowitz runs
test. (Two further upgrades — corpus_chunk_sentences and
timeseries_holt_winters — live with their original registrations in
llmdata.py / analytics.py.)

Every probe follows the determinism contract (registry module doc):
exact integer/DECIMAL accumulation, ONE double chain per emitted
value, identical aliases on both sides, a pinned total ORDER BY.
ln()-crossing values are integer-quantized BEFORE summation (the
vocab_logrank rule); integer division is kept to NONNEGATIVE
operands so Spark's truncating DIV and DuckDB's truncating // agree
with floor everywhere they're used.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from .registry import query


# --------------------------------------------------------------------------
# 1. corpus_span_removal — the Lee et al. exact-substring dedup completion
# --------------------------------------------------------------------------

@query(
    "corpus_span_removal",
    oracle=r"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\s+'), w -> w != '') AS words
  FROM documents WHERE text IS NOT NULL
), sp AS (
  SELECT doc_id, i - 1 AS start,
         concat_ws(' ', words[i], words[i+1], words[i+2]) AS span
  FROM (SELECT doc_id, words,
               unnest(range(1, greatest(len(words) - 2, 0) + 1)) AS i
        FROM t)
), occ AS (
  SELECT doc_id, start,
         row_number() OVER (PARTITION BY span ORDER BY doc_id, start) AS rn
  FROM sp
), rmpos AS (
  SELECT DISTINCT doc_id, start + o.j AS pos
  FROM occ, (SELECT unnest(range(3)) AS j) o
  WHERE rn > 1
), rml AS (
  SELECT doc_id, list(pos ORDER BY pos) AS rm FROM rmpos GROUP BY 1
)
SELECT t.doc_id,
       CAST(len(t.words) AS BIGINT) AS n_words,
       CAST(coalesce(len(r.rm), 0) AS BIGINT) AS n_removed,
       coalesce(array_to_string(
         list_transform(
           list_filter(range(1, len(t.words) + 1),
                       i -> NOT list_contains(coalesce(r.rm, []), i - 1)),
           i -> t.words[i]), ' '), '') AS text_kept
FROM t LEFT JOIN rml r ON t.doc_id = r.doc_id
ORDER BY t.doc_id
""",
    tags=("llm", "dedup"),
    doc="Exact duplicated-span REMOVAL with in-order reassembly "
        "(operators/corpus.py:span_removal, n=3): every occurrence of "
        "a corpus-duplicated 3-word span except the (id, start)-first "
        "one has its words dropped; overlapping removals merge into "
        "maximal regions like suffix-array substring dedup — the step "
        "that turns span_duplication's profile into the actual Lee et "
        "al. '22 pipeline. The oracle recomputes occurrence ranking, "
        "position fan-out and indexed reassembly with plain windows "
        "and list functions.",
)
def corpus_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.corpus import span_removal
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull())
    return span_removal(d, "doc_id", "text", n=3).orderBy("doc_id")


# --------------------------------------------------------------------------
# 2. sketch_cms_topk_md5 — oracle upgrade of the rows-only sketch_cms_topk
# --------------------------------------------------------------------------

_CMS_BUCKET = ("CAST(('0x' || substring(md5(CAST({j} AS VARCHAR) || '|' || "
               "CAST({key} AS VARCHAR)), 30, 3)) AS INTEGER) % 512")

@query(
    "sketch_cms_topk_md5",
    oracle=f"""
WITH g AS (
  SELECT o_custkey AS key, CAST(count(*) AS BIGINT) AS exact_n
  FROM orders GROUP BY 1
), top AS (
  SELECT key, exact_n FROM g ORDER BY exact_n DESC, key LIMIT 20
), cnt AS (
  SELECT j, bucket, CAST(count(*) AS BIGINT) AS cnt FROM (
    SELECT d.j AS j,
           {_CMS_BUCKET.format(j='d.j', key='o_custkey')} AS bucket
    FROM orders, (SELECT unnest(range(4)) AS j) d
  ) GROUP BY 1, 2
), probe AS (
  SELECT t.key, t.exact_n, d.j AS j,
         {_CMS_BUCKET.format(j='d.j', key='t.key')} AS bucket
  FROM top t, (SELECT unnest(range(4)) AS j) d
)
SELECT p.key, CAST(min(coalesce(c.cnt, 0)) AS BIGINT) AS est, p.exact_n
FROM probe p LEFT JOIN cnt c ON p.j = c.j AND p.bucket = c.bucket
GROUP BY p.key, p.exact_n
ORDER BY p.exact_n DESC, p.key
""",
    tags=("analytics", "sketch"),
    doc="Count-min top-20 estimates with the PORTABLE md5 hash family "
        "(operators/sketch.py:cms_build/cms_query, depth=4 width=512 — "
        "the r9-verdict task-5 oracle upgrade of the rows-only "
        "sketch_cms_topk): CMS counters are an exact deterministic "
        "function of the key multiset under a fixed hash family, so "
        "the oracle recomputes buckets, counters and the min-over-rows "
        "estimate bit-for-bit. The xxhash64 probe stays the throughput "
        "path; est >= exact_n always (pytest).",
)
def sketch_cms_topk_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketch import cms_build, cms_query
    o = load_table(spark, sf_dir, "orders")
    counters = cms_build(o, "o_custkey", depth=4, width=512,
                         hash_family="md5")
    exact = (o.groupBy(F.col("o_custkey").alias("key"))
             .agg(F.count(F.lit(1)).alias("exact_n")))
    top = exact.orderBy(F.desc("exact_n"), "key").limit(20)
    est = cms_query(counters, top.select(F.col("key").alias("o_custkey")),
                    "o_custkey", depth=4, width=512, hash_family="md5")
    return (est.join(top, "key")
            .select("key", F.col("est").cast("long").alias("est"),
                    "exact_n")
            .orderBy(F.desc("exact_n"), "key"))


# --------------------------------------------------------------------------
# 3. sample_weighted_md5 — oracle upgrade of sample_weighted_reservoir
# --------------------------------------------------------------------------

@query(
    "sample_weighted_md5",
    oracle="""
WITH d AS (
  SELECT o_orderkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS w,
         md5(CAST(o_orderkey AS VARCHAR)) || CAST(o_orderkey AS VARCHAR)
           AS ord
  FROM orders
), p AS (
  SELECT o_orderkey, w,
         coalesce(sum(w) OVER (ORDER BY ord ROWS BETWEEN UNBOUNDED
                  PRECEDING AND 1 PRECEDING), 0) AS c,
         sum(w) OVER () AS tw
  FROM d
), j AS (
  SELECT o_orderkey,
         least(50, (greatest(100 * c - tw, 0) + 2 * tw - 1) // (2 * tw))
           AS jlo,
         least(50, (greatest(100 * (c + w) - tw, 0) + 2 * tw - 1)
               // (2 * tw)) AS jhi
  FROM p
)
SELECT o_orderkey, CAST(jhi - jlo AS BIGINT) AS n_hits
FROM j WHERE jhi - jlo > 0 ORDER BY o_orderkey
""",
    tags=("sampling",),
    doc="PPS-systematic weighted sample, 50 draws by order value "
        "(operators/sampling.py:weighted_systematic_sample — the "
        "r9-verdict task-5 oracle upgrade of the rows-only A-Res "
        "reservoir, whose u^(1/w) pow chain is engine-specific in the "
        "last ulp): rows lie on the md5(key) line with integer-cent "
        "segments, 50 odd-grid points select them, multiplicity in "
        "n_hits — Σ n_hits = 50 exactly (pytest). Every comparison is "
        "cross-multiplied integers with NONNEGATIVE numerators, so "
        "truncating and flooring division agree. The only single-task "
        "window is over the 64-row bucket-offset table (the "
        "assign_dense_ids bucketed-prefix shape — bounded by the "
        "bucket count, never data-sized); the oracle replays the grid "
        "walk with a plain prefix-sum window.",
)
def sample_weighted_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import weighted_systematic_sample
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice")
    out = weighted_systematic_sample(
        o, "o_orderkey", F.round(F.col("o_totalprice") * 100).cast("long"),
        k=50)
    return out.select("o_orderkey", "n_hits").orderBy("o_orderkey")


# --------------------------------------------------------------------------
# 4. graph_pagerank_iter — integer-arithmetic PageRank, the md5-twin move
#    applied to an iterative algorithm (oracle upgrade of graph_pagerank)
# --------------------------------------------------------------------------

def _pagerank_oracle(iters: int = 3) -> str:
    sql = """
WITH e AS (SELECT DISTINCT c_custkey // 10 AS src, c_custkey AS dst
           FROM customer),
nodes AS (SELECT src AS node FROM e UNION SELECT dst AS node FROM e),
od AS (SELECT n.node AS node, coalesce(o.c, 0) AS outdeg
       FROM nodes n LEFT JOIN (SELECT src, CAST(count(*) AS BIGINT) AS c
                               FROM e GROUP BY 1) o ON n.node = o.src),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM od),
r0 AS (SELECT node, outdeg,
              CAST(1000000000000 // (SELECT n FROM nn) AS BIGINT) AS pr
       FROM od)"""
    for i in range(1, iters + 1):
        prev = f"r{i - 1}"
        sql += f""",
d{i} AS (SELECT coalesce(sum(pr), 0) AS dang FROM {prev}
         WHERE outdeg = 0),
c{i} AS (SELECT e.dst AS node,
                sum((85 * r.pr) // (100 * r.outdeg)) AS s
         FROM {prev} r JOIN e ON r.node = e.src
         WHERE r.outdeg > 0 GROUP BY 1),
r{i} AS (SELECT od.node, od.outdeg,
                CAST((15 * 1000000000000) // (100 * (SELECT n FROM nn))
                     + (85 * (SELECT dang FROM d{i}))
                       // (100 * (SELECT n FROM nn))
                     + coalesce(c{i}.s, 0) AS BIGINT) AS pr
         FROM od LEFT JOIN c{i} ON od.node = c{i}.node)"""
    return sql + f"\nSELECT node, pr FROM r{iters} ORDER BY node"


@query(
    "graph_pagerank_iter",
    oracle=_pagerank_oracle(3),
    tags=("graph",),
    doc="PageRank in EXACT integer arithmetic, 3 rounds over the "
        "customer digit hierarchy (operators/graph.py:pagerank_integer "
        "— the r9-verdict task-5 oracle upgrade of the rows-only float "
        "graph_pagerank, whose per-dst double sums are partition-order "
        "sensitive): ranks live on a 1e12 integer grid, shares/teleport"
        "/dangling use floor division of NONNEGATIVE integers, so every "
        "round is a pure function of the graph and the oracle unrolls "
        "the 3 rounds as chained CTEs. Same plan family as the float "
        "path: one equi-join + one aggregate per round, 1-row dangling "
        "broadcast, lazy localCheckpoint lineage truncation.",
)
def graph_pagerank_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import pagerank_integer
    c = load_table(spark, sf_dir, "customer")
    edges = c.select((F.col("c_custkey") / 10).cast("long").alias("src"),
                     F.col("c_custkey").alias("dst"))
    return (pagerank_integer(edges, iters=3)
            .select("node", F.col("rank").alias("pr"))
            .orderBy("node"))


# --------------------------------------------------------------------------
# 5. stats_kendall_tau — contingency-table τ-b over bounded domains
# --------------------------------------------------------------------------

@query(
    "stats_kendall_tau",
    oracle="""
WITH r AS (
  SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS x,
         CAST(round(l_discount * 100) AS BIGINT) AS y
  FROM lineitem
), cells AS (
  SELECT g, x, y, CAST(count(*) AS BIGINT) AS n FROM r GROUP BY 1, 2, 3
), cd AS (
  SELECT a.g,
         CAST(sum(CASE WHEN a.y < b.y
                  THEN CAST(a.n AS HUGEINT) * b.n ELSE 0 END) AS BIGINT)
           AS concordant,
         CAST(sum(CASE WHEN a.y > b.y
                  THEN CAST(a.n AS HUGEINT) * b.n ELSE 0 END) AS BIGINT)
           AS discordant
  FROM cells a JOIN cells b ON a.g = b.g AND a.x < b.x
  GROUP BY 1
), tx AS (
  SELECT g, sum(CAST(t AS HUGEINT) * (t - 1)) // 2 AS n1t FROM (
    SELECT g, x, CAST(sum(n) AS BIGINT) AS t FROM cells GROUP BY 1, 2)
  GROUP BY 1
), ty AS (
  SELECT g, sum(CAST(t AS HUGEINT) * (t - 1)) // 2 AS n2t FROM (
    SELECT g, y, CAST(sum(n) AS BIGINT) AS t FROM cells GROUP BY 1, 2)
  GROUP BY 1
), tot AS (
  SELECT g, CAST(sum(n) AS BIGINT) AS n FROM cells GROUP BY 1
)
SELECT tot.g AS category, tot.n AS n, cd.concordant, cd.discordant,
       round(CAST(cd.concordant - cd.discordant AS DOUBLE)
             / sqrt(CAST((CAST(tot.n AS HUGEINT) * (tot.n - 1) // 2 - tx.n1t)
                         * (CAST(tot.n AS HUGEINT) * (tot.n - 1) // 2
                            - ty.n2t) AS DOUBLE)), 6) AS tau_b
FROM tot JOIN cd ON tot.g = cd.g JOIN tx ON tot.g = tx.g
JOIN ty ON tot.g = ty.g
ORDER BY category
""",
    tags=("stats",),
    doc="Per-returnflag Kendall tau-b between quantity and discount "
        "(operators/profile.py:kendall_tau_b): rows collapse to the "
        "bounded 50x11 contingency cells, every pair count (concordant"
        "/discordant/tied) is an exact integer from the CELL "
        "self-join under x<x' — never a row-pair product — and tau_b "
        "is ONE double chain. The oracle recomputes the same "
        "decomposition with HUGEINT pair arithmetic.",
)
def stats_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import kendall_tau_b
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").cast("long").alias("q"),
        F.round(F.col("l_discount") * 100).cast("long").alias("d100"))
    return kendall_tau_b(li, "flag", "q", "d100")


# --------------------------------------------------------------------------
# 6. stats_kruskal_wallis — pooled-midrank H decomposition
# --------------------------------------------------------------------------

@query(
    "stats_kruskal_wallis",
    oracle="""
WITH r AS (
  SELECT l_returnflag AS category,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS v
  FROM lineitem
), dv AS (
  SELECT v, CAST(count(*) AS BIGINT) AS t FROM r GROUP BY 1
), mr AS (
  SELECT v, 2 * coalesce(sum(t) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
             PRECEDING AND 1 PRECEDING), 0) + t + 1 AS mr2
  FROM dv
), g AS (
  SELECT category, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(m.mr2) AS BIGINT) AS rank_sum2
  FROM r JOIN mr m ON r.v = m.v GROUP BY 1
), tie AS (
  SELECT CAST(sum(CAST(t AS HUGEINT) * t * t - t) AS BIGINT) AS tie3
  FROM dv
)
SELECT category, n, rank_sum2,
       CAST(CAST(rank_sum2 AS HUGEINT) * rank_sum2 AS DOUBLE)
         / (4.0 * CAST(n AS DOUBLE)) AS h_contrib,
       tie.tie3 AS tie3
FROM g, tie ORDER BY category
""",
    tags=("stats",),
    doc="Kruskal-Wallis rank-sum decomposition of extended price by "
        "return flag (operators/profile.py:kruskal_wallis): POOLED "
        "doubled midranks from the bucketed rank core (no data-sized "
        "single-task window), exact BIGINT rank sums per group, "
        "h_contrib = rank_sum2^2/(4n_g) one double chain, exact tie "
        "cubes for the correction — H assembles caller-side over the "
        "3 bounded group rows (the anova_oneway contract). The oracle "
        "pools ranks with a plain cumulative window.",
)
def stats_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import kruskal_wallis
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"))
    return kruskal_wallis(li, "flag", "cents", lo=0.0, hi=12_000_000.0,
                          nbins=256)


# --------------------------------------------------------------------------
# 7. eval_calibration_bins — reliability diagram + ECE contributions
# --------------------------------------------------------------------------

@query(
    "eval_calibration_bins",
    oracle="""
WITH r AS (
  SELECT CAST(o_custkey % 101 AS BIGINT) AS s,
         CAST(CAST(round(o_totalprice * 100) AS BIGINT) % 100
              < o_custkey % 101 AS BIGINT) AS y
  FROM orders
), b AS (
  SELECT least((s * 10) // 100, 9) AS bin, s, y FROM r
), g AS (
  SELECT bin, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS n_pos,
         CAST(sum(s) AS BIGINT) AS sum_score
  FROM b GROUP BY 1
), t AS (SELECT CAST(sum(n) AS BIGINT) AS tn FROM g)
SELECT bin, n, n_pos,
  round(CAST(sum_score AS DOUBLE) / (100.0 * CAST(n AS DOUBLE)), 6)
    AS mean_score,
  round(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE), 6) AS frac_pos,
  round(abs(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE)
            - CAST(sum_score AS DOUBLE) / (100.0 * CAST(n AS DOUBLE)))
        * CAST(n AS DOUBLE) / CAST(t.tn AS DOUBLE), 6) AS ece_contrib
FROM g, t ORDER BY bin
""",
    tags=("eval",),
    doc="Reliability-diagram bins with per-bin ECE contributions "
        "(operators/evaluation.py:calibration_bins, 10 bins): integer "
        "per-cent scores (custkey mod 101) against a label calibrated "
        "by construction (price-cents mod 100 under the score), bin "
        "edges in integer DIV arithmetic, per-bin mean/frac/gap each "
        "one double chain from exact counts. ECE = Σ ece_contrib over "
        "the <= 10 bounded rows, assembled caller-side.",
)
def eval_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.evaluation import calibration_bins
    o = load_table(spark, sf_dir, "orders")
    prepared = o.select(
        (F.col("o_custkey") % 101).cast("long").alias("score"),
        ((F.round(F.col("o_totalprice") * 100).cast("long") % 100)
         < (F.col("o_custkey") % 101)).alias("label"))
    return calibration_bins(prepared, F.col("score"), F.col("label"),
                            nbins=10)


# --------------------------------------------------------------------------
# 8. stats_ttest_paired — within-row paired differences, exact moments
# --------------------------------------------------------------------------

@query(
    "stats_ttest_paired",
    oracle="""
WITH r AS (
  SELECT l_returnflag AS category,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS x,
         CAST(round(l_discount * 100) AS BIGINT) AS d
  FROM lineitem
), p AS (
  SELECT category, x, (x * (100 - d)) // 100 AS y FROM r
), g AS (
  SELECT category, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x - y) AS BIGINT) AS sum_d_cents,
         sum(CAST(x - y AS HUGEINT) * (x - y)) AS s2
  FROM p GROUP BY 1
)
SELECT category, n, sum_d_cents,
  round(CAST(sum_d_cents AS DOUBLE) * sqrt(CAST(n AS DOUBLE) - 1.0)
        / sqrt(CAST(CAST(n AS HUGEINT) * s2
                    - CAST(sum_d_cents AS HUGEINT) * sum_d_cents
                    AS DOUBLE)), 6) AS t_stat
FROM g ORDER BY category
""",
    tags=("stats",),
    doc="Paired-sample t statistic per return flag between gross and "
        "integer-discounted price (operators/profile.py:paired_ttest): "
        "the pair (x, y) is exact by construction — y = x*(100-d) DIV "
        "100, all-integer, so d = x-y never passes through a float "
        "product's half-cent rounding. Moments exact (BIGINT + "
        "DECIMAL(38,0)); t = sum_d*sqrt(n-1)/sqrt(n*sum_d2 - sum_d^2) "
        "is ONE double chain. One hash aggregate, no join.",
)
def stats_ttest_paired(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import paired_ttest
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("__x"),
        F.round(F.col("l_discount") * 100).cast("long").alias("__d"))
    li = li.withColumn("__y", F.expr("(__x * (100 - __d)) DIV 100"))
    return paired_ttest(li, "flag", F.col("__x"), F.col("__y"))


# --------------------------------------------------------------------------
# 9. graph_jaccard_link_prediction — common-neighbor candidates
# --------------------------------------------------------------------------

@query(
    "graph_jaccard_link_prediction",
    oracle="""
WITH e AS (
  SELECT DISTINCT c_custkey // 10 AS a, c_custkey AS b
  FROM customer WHERE c_custkey < 500 AND c_custkey // 10 <> c_custkey
), adj AS (SELECT a, b FROM e UNION ALL SELECT b AS a, a AS b FROM e),
deg AS (SELECT a AS node, CAST(count(*) AS BIGINT) AS deg
        FROM adj GROUP BY 1),
common AS (
  SELECT l.b AS u, r.b AS v, CAST(count(*) AS BIGINT) AS common
  FROM adj l JOIN adj r ON l.a = r.a AND l.b < r.b
  GROUP BY 1, 2
), newp AS (
  SELECT c.u, c.v, c.common FROM common c
  LEFT JOIN e ON c.u = e.a AND c.v = e.b
  WHERE e.a IS NULL
)
SELECT u, v, common,
       du.deg + dv.deg - common AS union_size,
       round(CAST(common AS DOUBLE)
             / CAST(du.deg + dv.deg - common AS DOUBLE), 6) + 0.0
         AS jaccard
FROM newp JOIN deg du ON newp.u = du.node JOIN deg dv ON newp.v = dv.node
ORDER BY u, v
""",
    tags=("graph",),
    doc="Jaccard link prediction over the customer digit hierarchy "
        "(operators/graph.py:jaccard_link_scores, custkey < 500): "
        "non-adjacent pairs sharing >= 1 neighbor scored by exact "
        "integer common/union counts from the wedge self-join (the "
        "triangle_count fan-out family, never node x node), existing "
        "edges anti-joined away, J one double division. In the digit "
        "tree siblings share their parent; the hierarchy edge is "
        "canonical (parent < child for custkey >= 1), which the "
        "oracle's e CTE mirrors.",
)
def graph_jaccard_link_prediction(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    from ..operators.graph import jaccard_link_scores
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") < 500)
    edges = c.select((F.col("c_custkey") / 10).cast("long").alias("src"),
                     F.col("c_custkey").alias("dst"))
    return jaccard_link_scores(edges, min_common=1)


# --------------------------------------------------------------------------
# 10. corpus_ngram_novelty — first-seen n-gram fraction per document
# --------------------------------------------------------------------------

@query(
    "corpus_ngram_novelty",
    oracle=r"""
WITH s AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(len(string_split_regex(text, '\s+')) - 1, 1)),
           i -> concat_ws(' ',
                string_split_regex(text, '\s+')[i],
                string_split_regex(text, '\s+')[i+1],
                string_split_regex(text, '\s+')[i+2]))) AS sh
  FROM documents WHERE text IS NOT NULL
), g AS (
  SELECT doc_id, unnest(sh) AS gram FROM s
), f AS (
  SELECT doc_id, min(doc_id) OVER (PARTITION BY gram) AS first_doc
  FROM g
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT)
         AS n_novel,
       round(CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
                  AS DOUBLE) / CAST(count(*) AS DOUBLE), 4) + 0.0
         AS novelty_ratio
FROM f GROUP BY doc_id ORDER BY doc_id
""",
    tags=("llm", "dedup"),
    doc="Per-document n-gram novelty against all earlier documents "
        "(operators/corpus.py:ngram_novelty, n=3): fraction of the "
        "document's distinct 3-gram spans whose min-owner doc_id is "
        "itself — the crawl-increment curation signal complementary "
        "to span_duplication. Same two-shuffle plan (span window + "
        "doc rollup); the oracle recomputes with the minhash probes' "
        "shingle SQL and a min window.",
)
def corpus_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.corpus import ngram_novelty
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull())
    return ngram_novelty(d, "doc_id", "text", n=3).orderBy("doc_id")


# --------------------------------------------------------------------------
# 11. privacy_randomized_response — md5-coin Warner mechanism
# --------------------------------------------------------------------------

@query(
    "privacy_randomized_response",
    oracle="""
WITH r AS (
  SELECT o_orderpriority AS category,
         CASE WHEN CAST(('0x' || substring(md5('rr|' ||
                    CAST(o_orderkey AS VARCHAR)), 1, 2)) AS INTEGER) < 192
              THEN CAST(o_orderstatus = 'F' AS BIGINT)
              ELSE CAST(NOT (o_orderstatus = 'F') AS BIGINT) END AS rep
  FROM orders
), g AS (
  SELECT category, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(rep) AS BIGINT) AS noisy_yes
  FROM r GROUP BY 1
)
SELECT category, n, noisy_yes,
       round((256.0 * CAST(noisy_yes AS DOUBLE)
              - 64.0 * CAST(n AS DOUBLE)) / 128.0, 6) AS est_true_yes
FROM g ORDER BY category
""",
    tags=("privacy",),
    doc="Warner randomized response with a deterministic md5 coin "
        "(operators/profile.py:randomized_response, p = 192/256): each "
        "order reports its true 'F'-status bit iff its coin byte lands "
        "under 192, else inverted — locally deniable per row — and the "
        "per-priority debiased estimate inverts the expectation as one "
        "double chain from exact counts. Pure codegen coin + one hash "
        "aggregate; the oracle replays coin, inversion and debias.",
)
def privacy_randomized_response(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    from ..operators.profile import randomized_response
    o = load_table(spark, sf_dir, "orders")
    return randomized_response(
        o, "o_orderpriority", truth=F.col("o_orderstatus") == "F",
        key=F.col("o_orderkey"), p256=192)


# --------------------------------------------------------------------------
# 12. text_unigram_kl_divergence — per-source distribution drift
# --------------------------------------------------------------------------

@query(
    "text_unigram_kl_divergence",
    oracle=r"""
WITH tok AS (
  SELECT source AS g,
         unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            w -> w != '')) AS t
  FROM documents WHERE text IS NOT NULL
), gt AS (
  SELECT g, t, CAST(count(*) AS BIGINT) AS cgt FROM tok GROUP BY 1, 2
), gtot AS (SELECT g, CAST(sum(cgt) AS BIGINT) AS ng FROM gt GROUP BY 1),
tm AS (SELECT t, CAST(sum(cgt) AS BIGINT) AS ct FROM gt GROUP BY 1),
tt AS (SELECT CAST(sum(ct) AS BIGINT) AS n FROM tm),
c AS (
  SELECT gt.g,
         CAST(floor((CAST(cgt AS DOUBLE) / CAST(ng AS DOUBLE))
              * ln((CAST(cgt AS DOUBLE) / CAST(ng AS DOUBLE))
                   / (CAST(ct AS DOUBLE) / CAST(tt.n AS DOUBLE)))
              * 1000000.0) AS BIGINT) AS q,
         cgt
  FROM gt JOIN gtot ON gt.g = gtot.g JOIN tm ON gt.t = tm.t, tt
)
SELECT g AS category, CAST(sum(cgt) AS BIGINT) AS n_tokens,
       CAST(sum(q) AS BIGINT) AS kl_q,
       CAST(sum(q) AS DOUBLE) / 1000000.0 AS kl
FROM c GROUP BY 1 ORDER BY category
""",
    tags=("llm", "text"),
    doc="Per-source unigram KL divergence from the corpus blend "
        "(operators/text.py:unigram_kl_by_group): the mixture-planner "
        "drift gate. Each (source, token) contribution p*ln(p/q) "
        "crosses an engine-side ln, so it is floor-quantized to the "
        "1e-6 integer grid BEFORE the per-source sum (the "
        "vocab_logrank rule); kl_q is an exact integer and kl one "
        "division. Vocabulary-grain joins only after the single "
        "data-sized explode+aggregate.",
)
def text_unigram_kl_divergence(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    from ..operators.text import unigram_kl_by_group
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull())
    return unigram_kl_by_group(d, "source", "text")


# --------------------------------------------------------------------------
# 13. stats_ols_two_factor — closed-form two-predictor regression
# --------------------------------------------------------------------------

@query(
    "stats_ols_two_factor",
    oracle="""
WITH r AS (
  SELECT l_returnflag AS category, CAST(l_quantity AS BIGINT) AS x1,
         CAST(round(l_discount * 100) AS BIGINT) AS x2,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS y
  FROM lineitem
), g AS (
  SELECT category, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x1) AS BIGINT) AS s1, CAST(sum(x2) AS BIGINT) AS s2,
         CAST(sum(y) AS BIGINT) AS sy,
         sum(CAST(x1 AS HUGEINT) * x1) AS s11,
         sum(CAST(x2 AS HUGEINT) * x2) AS s22,
         sum(CAST(x1 AS HUGEINT) * x2) AS s12,
         sum(CAST(x1 AS HUGEINT) * y) AS s1y,
         sum(CAST(x2 AS HUGEINT) * y) AS s2y
  FROM r GROUP BY 1
), m AS (
  SELECT category, n, s1, s2, sy,
         CAST(n AS HUGEINT) * s11 - CAST(s1 AS HUGEINT) * s1 AS c11,
         CAST(n AS HUGEINT) * s22 - CAST(s2 AS HUGEINT) * s2 AS c22,
         CAST(n AS HUGEINT) * s12 - CAST(s1 AS HUGEINT) * s2 AS c12,
         CAST(n AS HUGEINT) * s1y - CAST(s1 AS HUGEINT) * sy AS c1y,
         CAST(n AS HUGEINT) * s2y - CAST(s2 AS HUGEINT) * sy AS c2y
  FROM g
), b AS (
  SELECT category, n, s1, s2, sy,
         (CAST(c1y AS DOUBLE) * CAST(c22 AS DOUBLE)
          - CAST(c2y AS DOUBLE) * CAST(c12 AS DOUBLE))
           / (CAST(c11 AS DOUBLE) * CAST(c22 AS DOUBLE)
              - CAST(c12 AS DOUBLE) * CAST(c12 AS DOUBLE)) AS beta1,
         (CAST(c2y AS DOUBLE) * CAST(c11 AS DOUBLE)
          - CAST(c1y AS DOUBLE) * CAST(c12 AS DOUBLE))
           / (CAST(c11 AS DOUBLE) * CAST(c22 AS DOUBLE)
              - CAST(c12 AS DOUBLE) * CAST(c12 AS DOUBLE)) AS beta2
  FROM m
)
SELECT category, n, beta1, beta2,
       (CAST(sy AS DOUBLE) - beta1 * CAST(s1 AS DOUBLE)
        - beta2 * CAST(s2 AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept
FROM b ORDER BY category
""",
    tags=("stats",),
    doc="Two-predictor OLS per return flag — price-cents on quantity "
        "and discount-pct (operators/profile.py:ols_two_factor): "
        "centered normal equations solved by Cramer's rule with every "
        "moment exact (BIGINT + DECIMAL(38,0) vs the oracle's "
        "HUGEINT); each coefficient is one fixed IEEE chain over "
        "correctly-rounded casts of exact integers, emitted RAW (the "
        "anova round-6 lesson). One hash aggregate, no join.",
)
def stats_ols_two_factor(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import ols_two_factor
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").cast("long").alias("__q"),
        F.round(F.col("l_discount") * 100).cast("long").alias("__d"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("__y"))
    return ols_two_factor(li, "flag", F.col("__q"), F.col("__d"),
                          F.col("__y"))


# --------------------------------------------------------------------------
# 14. timeseries_rolling_median — exact doubled rolling median
# --------------------------------------------------------------------------

@query(
    "timeseries_rolling_median",
    oracle="""
WITH d AS (
  SELECT event_type AS series,
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
         CAST(floor(value * 100) AS BIGINT) AS c
  FROM events WHERE value IS NOT NULL
), daily AS (
  SELECT series, day, CAST(sum(c) AS BIGINT) AS v FROM d GROUP BY 1, 2
), w AS (
  SELECT series, day,
         list_sort(list(v) OVER (PARTITION BY series ORDER BY day
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS arr
  FROM daily
)
SELECT series, day,
       CAST(arr[(len(arr) + 1) // 2] + arr[len(arr) // 2 + 1] AS BIGINT)
         AS med_cents2
FROM w ORDER BY series, day
""",
    tags=("analytics", "timeseries"),
    doc="Trailing 7-day rolling MEDIAN of daily event-value totals "
        "(operators/timeseries.py:rolling_median): the robust twin of "
        "the Bollinger mean. Daily totals are exact integer cents; "
        "the median is carried DOUBLED (sum of the two middle order "
        "statistics — brown_forsythe's trick on a sliding frame), so "
        "med_cents2 is an exact BIGINT with no float anywhere. One "
        "window per series over the day-grain rollup, bounded state "
        "of 7; ramp-up rows take the median of what exists.",
)
def timeseries_rolling_median(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    from ..operators.timeseries import rolling_median
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("value").isNotNull()))
    daily = (ev.select(
        F.col("event_type").alias("series"),
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).cast("long")
        .alias("day"),
        F.floor(F.col("value") * 100).cast("long").alias("c"))
        .groupBy("series", "day").agg(F.sum("c").alias("v")))
    return (rolling_median(daily, "series", "day", F.col("v"), window_n=7)
            .select("series", "day", "med_cents2")
            .orderBy("series", "day"))


# --------------------------------------------------------------------------
# 15. stats_wilcoxon_signed_rank — paired nonparametric day-over-day test
# --------------------------------------------------------------------------

@query(
    "stats_wilcoxon_signed_rank",
    oracle="""
WITH daily AS (
  SELECT event_type AS g,
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
         CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS v
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
), pairs AS (
  SELECT g, v AS x,
         lag(v) OVER (PARTITION BY g ORDER BY day) AS y
  FROM daily
), d AS (
  SELECT g, x - y AS d, abs(x - y) AS ad FROM pairs
  WHERE y IS NOT NULL AND x - y <> 0
), dv AS (
  SELECT g, ad, CAST(count(*) AS BIGINT) AS t FROM d GROUP BY 1, 2
), mr AS (
  SELECT g, ad,
         2 * coalesce(sum(t) OVER (PARTITION BY g ORDER BY ad ROWS
             BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + t + 1
           AS mr2
  FROM dv
), agg AS (
  SELECT d.g, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN d.d > 0 THEN m.mr2 ELSE 0 END) AS BIGINT)
           AS w2_pos
  FROM d JOIN mr m ON d.g = m.g AND d.ad = m.ad GROUP BY 1
), ties AS (
  SELECT g, CAST(sum(CAST(t AS HUGEINT) * t * t - t) AS BIGINT) AS tie3
  FROM dv GROUP BY 1
)
SELECT a.g AS category, a.n, a.w2_pos, tt.tie3,
       round(CAST(2 * CAST(a.w2_pos AS HUGEINT)
                  - CAST(a.n AS HUGEINT) * (a.n + 1) AS DOUBLE)
             / sqrt(CAST(2 * CAST(a.n AS HUGEINT) * (a.n + 1)
                         * (2 * a.n + 1) - tt.tie3 AS DOUBLE) / 3.0), 6)
         AS z_stat
FROM agg a JOIN ties tt ON a.g = tt.g
ORDER BY category
""",
    tags=("stats",),
    doc="Wilcoxon signed-rank z on day-over-day per-type revenue "
        "deltas (operators/profile.py:wilcoxon_signed_rank): the "
        "paired nonparametric member completing the rank-test family "
        "(Mann-Whitney = independent, Kruskal-Wallis = k-sample, this "
        "= matched pairs). Zero deltas drop; |d| midranks come from "
        "the bucketed rank core; w2_pos = 2*W+ and the tie cubes are "
        "exact BIGINTs; z is ONE double chain with every cancellation "
        "done in integer arithmetic first.",
)
def stats_wilcoxon_signed_rank(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from ..operators.profile import wilcoxon_signed_rank
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("value").isNotNull()))
    daily = (ev.select(
        F.col("event_type").alias("series"),
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).cast("long")
        .alias("day"),
        F.floor(F.col("value") * 100).cast("long").alias("c"))
        .groupBy("series", "day").agg(F.sum("c").alias("v")))
    w = Window.partitionBy("series").orderBy("day")
    pairs = (daily.withColumn("__prev", F.lag("v").over(w))
             .filter(F.col("__prev").isNotNull()))
    return wilcoxon_signed_rank(pairs, "series", F.col("v"),
                                F.col("__prev"), hi_abs=1e7)


# --------------------------------------------------------------------------
# 16. feature_cramers_v — effect-size ranking over categorical features
# --------------------------------------------------------------------------

@query(
    "feature_cramers_v",
    oracle="""
WITH r AS (
  SELECT l_returnflag, l_linestatus,
         CAST(month(l_shipdate) AS BIGINT) AS ship_month,
         CAST(l_quantity > 25 AS BIGINT) AS y
  FROM lineitem
), cells AS (
  SELECT 'l_returnflag' AS f, CAST(l_returnflag AS VARCHAR) AS v, y,
         CAST(count(*) AS BIGINT) AS obs FROM r GROUP BY 2, 3
  UNION ALL
  SELECT 'l_linestatus', CAST(l_linestatus AS VARCHAR), y,
         CAST(count(*) AS BIGINT) FROM r GROUP BY 2, 3
  UNION ALL
  SELECT 'ship_month', CAST(ship_month AS VARCHAR), y,
         CAST(count(*) AS BIGINT) FROM r GROUP BY 2, 3
), m AS (
  SELECT f, v, y, obs,
         sum(obs) OVER (PARTITION BY f) AS n,
         sum(obs) OVER (PARTITION BY f, v) AS rr,
         sum(obs) OVER (PARTITION BY f, y) AS cc
  FROM cells
), qq AS (
  SELECT f, CAST(max(n) AS BIGINT) AS n,
         CAST(count(DISTINCT v) AS BIGINT) AS nv,
         CAST(count(DISTINCT y) AS BIGINT) AS nl,
         CAST(sum(CAST(floor(
           CAST((CAST(obs AS HUGEINT) * n - CAST(rr AS HUGEINT) * cc)
                * (CAST(obs AS HUGEINT) * n - CAST(rr AS HUGEINT) * cc)
                AS DOUBLE)
           / CAST(CAST(n AS HUGEINT) * rr * cc AS DOUBLE)
           * 1000000000.0) AS BIGINT)) AS BIGINT) AS chi2_q
  FROM m GROUP BY 1
)
SELECT f AS feature, n, chi2_q,
       round(sqrt(CAST(chi2_q AS DOUBLE) / 1000000000.0
                  / (CAST(n AS DOUBLE)
                     * CAST(least(nv, nl) - 1 AS DOUBLE))), 6)
         AS cramers_v
FROM qq ORDER BY feature
""",
    tags=("stats", "features"),
    doc="Cramer's V effect size for three categorical lineitem "
        "features (return flag, line status, ship month) against a "
        "quantity label "
        "(operators/features.py:cramers_v): chi2_cells' unpivot + "
        "hash aggregate, per-cell chi-square contributions recomputed "
        "as exact-integer rationals and floor-quantized to the 1e-9 "
        "grid BEFORE the per-feature sum (the vocab_logrank rule "
        "applied to rationals), V one double chain. The oracle "
        "unpivots with UNION ALL and mirrors the quantized sum.",
)
def feature_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.features import cramers_v
    li = (load_table(spark, sf_dir, "lineitem")
          .withColumn("ship_month",
                      F.month("l_shipdate").cast("long")))
    return cramers_v(li, ["l_returnflag", "l_linestatus", "ship_month"],
                     (F.col("l_quantity") > 25))


# --------------------------------------------------------------------------
# 17. interval_gaps_islands — merged-interval rollup
# --------------------------------------------------------------------------

@query(
    "interval_gaps_islands",
    oracle="""
WITH iv AS (
  SELECT event_type,
         epoch_us(ts) AS s,
         epoch_us(ts) + greatest(CAST(floor(value * 100) AS BIGINT), 0)
           * 1000000 AS e
  FROM events WHERE value IS NOT NULL
), f AS (
  SELECT event_type, s, e,
         CASE WHEN s > coalesce(max(e) OVER (PARTITION BY event_type
              ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING AND 1
              PRECEDING), -4611686018427387904) THEN 1 ELSE 0 END AS nf
  FROM iv
), g AS (
  SELECT event_type, s, e,
         sum(nf) OVER (PARTITION BY event_type ORDER BY s, e
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS isl
  FROM f
)
SELECT event_type, CAST(min(s) AS BIGINT) AS island_start_us,
       CAST(max(e) AS BIGINT) AS island_end_us,
       CAST(count(*) AS BIGINT) AS n_intervals
FROM g GROUP BY event_type, isl
ORDER BY event_type, island_start_us
""",
    tags=("analytics", "timeseries"),
    doc="Gaps-and-islands rollup of event intervals per type "
        "(operators/timeseries.py:gaps_and_islands; duration = "
        "value*100 seconds, clamped nonnegative, exact integer "
        "microseconds): overlapping/touching intervals merge into "
        "maximal islands — the merged-interval complement of "
        "interval_coverage's total-length view. Two expressions over "
        "ONE ordered window per key (running max end -> new-island "
        "flag -> running island id), one hash aggregate.",
)
def interval_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import gaps_and_islands
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("value").isNotNull()))
    iv = ev.select(
        "event_type",
        F.unix_micros(F.col("ts")).alias("__s"),
        (F.unix_micros(F.col("ts"))
         + F.greatest(F.floor(F.col("value") * 100).cast("long"),
                      F.lit(0)) * F.lit(1000000)).alias("__e"))
    return gaps_and_islands(iv, "event_type", F.col("__s"), F.col("__e"))


# --------------------------------------------------------------------------
# 18. stats_friedman — repeated-measures rank test over complete blocks
# --------------------------------------------------------------------------

@query(
    "stats_friedman",
    oracle="""
WITH r AS (
  SELECT o_custkey % 500 AS b, o_orderpriority AS tr,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS v
  FROM orders GROUP BY 1, 2
), kk AS (SELECT count(DISTINCT tr) AS k FROM r),
c AS (
  SELECT b FROM r GROUP BY b
  HAVING count(DISTINCT tr) = (SELECT k FROM kk)
), rows2 AS (SELECT r.* FROM r JOIN c USING (b)),
tv AS (SELECT b, v, CAST(count(*) AS BIGINT) AS t FROM rows2 GROUP BY 1, 2),
mr AS (
  SELECT b, v, 2 * coalesce(sum(t) OVER (PARTITION BY b ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + t + 1
           AS mr2
  FROM tv
), tie AS (
  SELECT CAST(sum(CAST(t AS HUGEINT) * t * t - t) AS BIGINT) AS tie3 FROM tv
), g AS (
  SELECT tr AS treatment, CAST(count(*) AS BIGINT) AS n_blocks,
         CAST(sum(m.mr2) AS BIGINT) AS rank_sum2
  FROM rows2 JOIN mr m ON rows2.b = m.b AND rows2.v = m.v GROUP BY 1
)
SELECT treatment, n_blocks, CAST((SELECT k FROM kk) AS BIGINT) AS k,
       rank_sum2,
       CAST(CAST(rank_sum2 AS HUGEINT) * rank_sum2 AS DOUBLE) / 4.0
         AS q_contrib,
       tie.tie3 AS tie3
FROM g, tie ORDER BY treatment
""",
    tags=("stats",),
    doc="Friedman repeated-measures rank test of per-customer-block "
        "spend across the 5 order priorities "
        "(operators/profile.py:friedman_test): blocks = custkey % 500, "
        "value = exact cent totals; incomplete blocks drop (the "
        "complete-block design), within-block DOUBLED midranks keep "
        "rank_sum2 an exact BIGINT, q_contrib = R_j^2 is ONE double "
        "chain and Q assembles caller-side with the exact tie cubes — "
        "the within-subjects completion of the kruskal_wallis/"
        "wilcoxon rank family. The oracle replays the same midrank "
        "windows per block.",
)
def stats_friedman(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import friedman_test
    o = load_table(spark, sf_dir, "orders")
    cells = (o.groupBy((F.col("o_custkey") % 500).alias("block"),
                       F.col("o_orderpriority").alias("prio"))
             .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
                  .alias("cents")))
    return friedman_test(cells, "block", "prio", "cents")


# --------------------------------------------------------------------------
# 19. timeseries_mann_kendall — monotonic trend + Sen's slope per series
# --------------------------------------------------------------------------

@query(
    "timeseries_mann_kendall",
    oracle="""
WITH s AS (
  SELECT o_orderpriority AS g,
         CAST(date_diff('day', DATE '1992-01-01', o_orderdate) // 7
              AS BIGINT) AS t,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS v
  FROM orders GROUP BY 1, 2
), p AS (
  SELECT a.g, a.t AS t1, b.t AS t2, a.v AS v1, b.v AS v2,
         CAST(b.v - a.v AS DOUBLE) / CAST(b.t - a.t AS DOUBLE) AS slope
  FROM s a JOIN s b ON a.g = b.g AND a.t < b.t
), st AS (
  SELECT g, CAST(sum(sign(v2 - v1)) AS BIGINT) AS s_stat,
         CAST(count(*) AS BIGINT) AS m
  FROM p GROUP BY 1
), rk AS (
  SELECT g, v2 - v1 AS sen_num, t2 - t1 AS sen_den, slope,
         row_number() OVER (PARTITION BY g ORDER BY slope, t1, t2) AS rn
  FROM p
), med AS (
  SELECT rk.g, CAST(sen_num AS BIGINT) AS sen_num,
         CAST(sen_den AS BIGINT) AS sen_den,
         round(slope, 6) AS sen_slope
  FROM rk JOIN st ON rk.g = st.g AND rk.rn = (st.m + 1) // 2
), nt AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM s GROUP BY 1),
tie AS (
  SELECT g, CAST(sum(CAST(c AS HUGEINT) * (c - 1) * (2 * c + 5))
                AS HUGEINT) AS tie_term
  FROM (SELECT g, v, CAST(count(*) AS BIGINT) AS c FROM s GROUP BY 1, 2)
  GROUP BY 1
), vn AS (
  SELECT nt.g, nt.n,
         CAST(CAST(nt.n AS HUGEINT) * (nt.n - 1) * (2 * nt.n + 5)
              - tie.tie_term AS BIGINT) AS var_num
  FROM nt JOIN tie ON nt.g = tie.g
)
SELECT vn.g AS priority, vn.n, st.s_stat, vn.var_num,
       round(CAST(st.s_stat - sign(st.s_stat) AS DOUBLE)
             / sqrt(CAST(vn.var_num AS DOUBLE) / 18.0), 6) AS z_stat,
       med.sen_num, med.sen_den, med.sen_slope
FROM vn JOIN st ON vn.g = st.g JOIN med ON vn.g = med.g
ORDER BY priority
""",
    tags=("timeseries", "stats"),
    doc="Mann-Kendall monotonic-trend test with Theil-Sen slope on "
        "weekly revenue per order priority "
        "(operators/timeseries.py:mann_kendall): the series rolls up "
        "to the calendar-bounded weekly grain first so the pair "
        "self-join under t<t' is bounded x bounded; S and the "
        "tie-corrected variance numerator are exact integers, z ONE "
        "double chain, and Sen's slope is emitted as the EXACT "
        "(num, den) integer pair of the lower-median element under "
        "(slope, t1, t2) ordering plus the rounded double. The "
        "oracle replays the pair join and median pick with plain "
        "windows.",
)
def timeseries_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import mann_kendall
    o = load_table(spark, sf_dir, "orders")
    weekly = (o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.floor(F.datediff(F.col("o_orderdate"), F.lit("1992-01-01")) / 7)
        .cast("long").alias("week"))
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
             .alias("cents")))
    return mann_kendall(weekly, "priority", "week", "cents")


# --------------------------------------------------------------------------
# 20. graph_degree_assortativity — endpoint-degree Pearson over edges
# --------------------------------------------------------------------------

@query(
    "graph_degree_assortativity",
    oracle="""
WITH e AS (
  SELECT DISTINCT c_custkey // 10 AS a, c_custkey AS b
  FROM customer WHERE c_custkey // 10 <> c_custkey
), adj AS (SELECT a, b FROM e UNION ALL SELECT b AS a, a AS b FROM e),
deg AS (SELECT a AS node, CAST(count(*) AS BIGINT) AS deg
        FROM adj GROUP BY 1),
pts AS (
  SELECT dx.deg AS x, dy.deg AS y FROM adj
  JOIN deg dx ON adj.a = dx.node JOIN deg dy ON adj.b = dy.node
), m AS (
  SELECT CAST(count(*) AS HUGEINT) AS m2,
         CAST(sum(x) AS HUGEINT) AS sx,
         CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sx2,
         CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
  FROM pts
)
SELECT CAST(m2 AS BIGINT) AS m2, CAST(sx AS BIGINT) AS sum_deg,
       CAST(sx2 AS BIGINT) AS sum_deg2, CAST(sxy AS BIGINT) AS sum_dxdy,
       round(CAST(m2 * sxy - sx * sx AS DOUBLE)
             / CAST(m2 * sx2 - sx * sx AS DOUBLE), 6) AS assortativity
FROM m
""",
    tags=("graph",),
    doc="Degree assortativity of the customer digit-tree hierarchy "
        "(operators/graph.py:degree_assortativity): Pearson "
        "correlation of endpoint degrees over the symmetrized edge "
        "multiset (Newman '02, full-degree variant) — exact "
        "DECIMAL(38,0) moments, r ONE double chain; the digit tree is "
        "strongly disassortative (hubs attach to leaves), a shape "
        "check the sign makes visible. In the digit tree the parent "
        "c//10 < child always, which the oracle's e CTE mirrors; "
        "degrees come from equi-joins on the node-sized degree table, "
        "never a collect.",
)
def graph_degree_assortativity(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    from ..operators.graph import degree_assortativity
    c = load_table(spark, sf_dir, "customer")
    edges = c.select(
        F.floor(F.col("c_custkey") / 10).cast("long").alias("src"),
        F.col("c_custkey").cast("long").alias("dst")).filter(
        F.col("src") != F.col("dst"))
    return degree_assortativity(edges)


# --------------------------------------------------------------------------
# 21. analytics_sprt_boundary — Wald sequential test first crossing
# --------------------------------------------------------------------------

@query(
    "analytics_sprt_boundary",
    oracle="""
WITH r AS (
  SELECT o_orderpriority AS g, o_orderdate AS d, o_orderkey AS k,
         CAST(CAST(('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)),
                                      1, 6)) AS BIGINT) % 10 < 6
              AS BIGINT) AS y
  FROM orders
), c AS (
  SELECT g,
         row_number() OVER (PARTITION BY g ORDER BY d, k) AS i,
         CAST(sum(y) OVER (PARTITION BY g ORDER BY d, k
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS n1
  FROM r
), l AS (
  SELECT g, i, n1,
         CAST(n1 AS DOUBLE) * 0.20067069546215124
           + CAST(i - n1 AS DOUBLE) * (-0.20067069546215124) AS llr
  FROM c
), x AS (
  SELECT g, CAST(min(i) AS BIGINT) AS cross_n FROM l
  WHERE llr >= 2.9444389791664403 OR llr <= -2.9444389791664403
  GROUP BY 1
), hit AS (
  SELECT l.g, x.cross_n, l.n1 AS n1_at_cross,
         round(l.llr, 6) AS llr_at_cross,
         CASE WHEN l.llr >= 2.9444389791664403
              THEN 'H1' ELSE 'H0' END AS decision
  FROM l JOIN x ON l.g = x.g AND l.i = x.cross_n
), t AS (SELECT g, CAST(count(*) AS BIGINT) AS n_total FROM r GROUP BY 1)
SELECT t.g AS category, t.n_total, hit.cross_n, hit.n1_at_cross,
       hit.llr_at_cross, hit.decision
FROM t LEFT JOIN hit ON t.g = hit.g
ORDER BY category
""",
    tags=("analytics", "stats"),
    doc="Wald SPRT first boundary crossing per order priority "
        "(operators/profile.py:sprt_boundary, p0=0.45 vs p1=0.55, "
        "alpha=beta=0.05): the Bernoulli stream is the portable "
        "md5-bit of the order key replayed in date-then-key order; "
        "the cumulative llr carries only two exact window-cumulative "
        "BIGINTs and crosses ln(19) as ONE double chain per row with "
        "the log constants as LITERAL doubles on both sides (the "
        "ln-portability rule) — the sequential member of the "
        "ab_power_mde/ab_welch_ttest family. Streams that never "
        "leave the continuation region emit NULLs (exercised at "
        "sf0.001).",
)
def analytics_sprt_boundary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import sprt_boundary
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("g"),
        F.col("o_orderdate").alias("d"), F.col("o_orderkey").alias("k"))
    y = (F.conv(F.substring(F.md5(F.col("k").cast("string")), 1, 6),
                16, 10).cast("long") % 10 < 6)
    return sprt_boundary(o, "g", ["d", "k"], y,
                         llr_pos=0.20067069546215124,
                         llr_neg=-0.20067069546215124,
                         upper=2.9444389791664403,
                         lower=-2.9444389791664403)


# --------------------------------------------------------------------------
# 22. feature_quantile_normalize — cross-feature distribution equalizer
# --------------------------------------------------------------------------

@query(
    "feature_quantile_normalize",
    oracle="""
WITH r AS (
  SELECT 'qty' AS f, CAST(l_quantity AS BIGINT) AS v,
         l_orderkey AS k1, l_linenumber AS k2 FROM lineitem
  UNION ALL
  SELECT 'disc', CAST(round(l_discount * 100) AS BIGINT),
         l_orderkey, l_linenumber FROM lineitem
  UNION ALL
  SELECT 'tax', CAST(round(l_tax * 100) AS BIGINT),
         l_orderkey, l_linenumber FROM lineitem
), rk AS (
  SELECT f, v,
         row_number() OVER (PARTITION BY f ORDER BY v, k1, k2) AS rank
  FROM r
)
SELECT CAST(rank AS BIGINT) AS rank,
       CAST(count(*) AS BIGINT) AS n_features,
       CAST(sum(v) AS BIGINT) AS sum_v,
       CAST(sum(v) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS norm
FROM rk GROUP BY 1 ORDER BY rank
""",
    tags=("features", "llm"),
    doc="Quantile normalization (Bolstad '03) of three lineitem "
        "measures onto one common distribution "
        "(operators/features.py:quantile_normalize): per-feature "
        "POSITIONAL ranks built with the assign_dense_ids bucket "
        "trick — value-derived buckets, per-feature exclusive prefix "
        "offsets over <= nbins bounded rows, row_number within "
        "(feature, bucket) — never a single-task window; the rank "
        "table carries the exact cross-feature value sum and the "
        "normalized mean as ONE double division. (orderkey, "
        "linenumber) is the uniqueness tiebreak. The oracle uses the "
        "plain per-feature window the bucket plan must equal exactly.",
)
def feature_quantile_normalize(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    from ..operators.features import quantile_normalize
    li = load_table(spark, sf_dir, "lineitem")
    long_rows = None
    for name, col in (("qty", F.col("l_quantity").cast("long")),
                      ("disc", F.round(F.col("l_discount") * 100)
                       .cast("long")),
                      ("tax", F.round(F.col("l_tax") * 100).cast("long"))):
        part = li.select(F.lit(name).alias("feat"), col.alias("v"),
                         F.col("l_orderkey").alias("k1"),
                         F.col("l_linenumber").alias("k2"))
        long_rows = part if long_rows is None \
            else long_rows.unionByName(part)
    return quantile_normalize(long_rows, "feat", "v", ["k1", "k2"],
                              lo=0.0, hi=51.0, nbins=64)


# --------------------------------------------------------------------------
# 23. graph_hits_iter — integer-grid HITS, the pagerank_iter move
# --------------------------------------------------------------------------

def _hits_oracle(iters: int = 2) -> str:
    s = 1000000000000
    sql = f"""
WITH e AS (SELECT DISTINCT c_custkey // 10 AS src, c_custkey AS dst
           FROM customer),
nodes AS (SELECT src AS node FROM e UNION SELECT dst AS node FROM e),
h0 AS (SELECT node, CAST({s} AS HUGEINT) AS h FROM nodes)"""
    for i in range(1, iters + 1):
        sql += f""",
ar{i} AS (SELECT e.dst AS node, sum(h.h) AS a
          FROM e JOIN h{i - 1} h ON e.src = h.node GROUP BY 1),
at{i} AS (SELECT sum(a) AS t FROM ar{i}),
a{i} AS (SELECT n.node,
                CAST(coalesce((ar.a * {s}) // (SELECT t FROM at{i}), 0)
                     AS HUGEINT) AS a
         FROM nodes n LEFT JOIN ar{i} ar ON n.node = ar.node),
hr{i} AS (SELECT e.src AS node, sum(a.a) AS hh
          FROM e JOIN a{i} a ON e.dst = a.node GROUP BY 1),
ht{i} AS (SELECT sum(hh) AS t FROM hr{i}),
h{i} AS (SELECT n.node,
                CAST(coalesce((hr.hh * {s}) // (SELECT t FROM ht{i}), 0)
                     AS HUGEINT) AS h
         FROM nodes n LEFT JOIN hr{i} hr ON n.node = hr.node)"""
    return sql + f"""
SELECT CAST(n.node AS BIGINT) AS node, CAST(a.a AS BIGINT) AS authority,
       CAST(h.h AS BIGINT) AS hub
FROM nodes n JOIN a{iters} a ON n.node = a.node
JOIN h{iters} h ON n.node = h.node
ORDER BY node"""


@query(
    "graph_hits_iter",
    oracle=_hits_oracle(2),
    tags=("graph",),
    doc="HITS hubs/authorities in EXACT integer arithmetic, 2 rounds "
        "over the customer digit hierarchy "
        "(operators/graph.py:hits_integer — the pagerank_integer "
        "md5-twin move applied to Kleinberg '99): scores on a 1e12 "
        "grid, every half-step normalizes by the grid total with "
        "floor division of NONNEGATIVE integers (the *scale products "
        "run in DECIMAL(38,0)/HUGEINT), so each round is an "
        "order-insensitive pure function of the graph and the oracle "
        "unrolls both rounds as chained CTEs. Two equi-joins + two "
        "aggregates + two 1-row broadcast totals per round, lazy "
        "localCheckpoint truncation — no node-sized collect.",
)
def graph_hits_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import hits_integer
    c = load_table(spark, sf_dir, "customer")
    edges = c.select(
        F.floor(F.col("c_custkey") / 10).cast("long").alias("src"),
        F.col("c_custkey").cast("long").alias("dst"))
    return hits_integer(edges, iters=2)


# --------------------------------------------------------------------------
# 24. text_js_divergence — symmetric bounded corpus-drift divergence
# --------------------------------------------------------------------------

@query(
    "text_js_divergence",
    oracle=r"""
WITH tok AS (
  SELECT source AS g,
         unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            w -> w != '')) AS t
  FROM documents WHERE text IS NOT NULL
), gt AS (
  SELECT g, t, CAST(count(*) AS BIGINT) AS cgt FROM tok GROUP BY 1, 2
), gtot AS (SELECT g, CAST(sum(cgt) AS BIGINT) AS ng FROM gt GROUP BY 1),
tm AS (SELECT t, CAST(sum(cgt) AS BIGINT) AS ct FROM gt GROUP BY 1),
tt AS (SELECT CAST(sum(ct) AS BIGINT) AS n FROM tm),
pq AS (
  SELECT gt.g, cgt, ng, tt.n, (ct - cgt) AS crt,
         CAST(cgt AS DOUBLE) / CAST(ng AS DOUBLE) AS p,
         CAST(ct - cgt AS DOUBLE) / CAST(tt.n - ng AS DOUBLE) AS q
  FROM gt JOIN gtot ON gt.g = gtot.g JOIN tm ON gt.t = tm.t, tt
), c AS (
  SELECT g, cgt, ng, n, crt,
         CAST(floor(((0.5 * p) * ln(p / ((p + q) / 2.0))
              + CASE WHEN crt > 0
                     THEN (0.5 * q) * ln(q / ((p + q) / 2.0))
                     ELSE 0.0 END) * 1000000.0) AS BIGINT) AS tq
  FROM pq
), g2 AS (
  SELECT g, CAST(sum(cgt) AS BIGINT) AS n_tokens,
         CAST(sum(tq) AS BIGINT) AS present_q,
         CAST(sum(crt) AS BIGINT) AS scrt,
         max(ng) AS ng, max(n) AS n
  FROM c GROUP BY 1
), f AS (
  SELECT g, n_tokens,
         present_q + CAST(floor(((CAST('0.34657359027997264' AS DOUBLE)
             * (CAST(n - ng AS DOUBLE) - CAST(scrt AS DOUBLE)))
             / CAST(n - ng AS DOUBLE)) * 1000000.0) AS BIGINT) AS js_q
  FROM g2
)
SELECT g AS category, n_tokens, js_q,
       CAST(js_q AS DOUBLE) / 1000000.0 AS js
FROM f ORDER BY category
""",
    tags=("llm", "text"),
    doc="Per-source Jensen-Shannon divergence vs the REST-of-corpus "
        "unigram distribution "
        "(operators/text.py:js_divergence_by_group) — the symmetric, "
        "ln2-bounded companion of text_unigram_kl_divergence that "
        "drift dashboards threshold on. Every (source, token) "
        "contribution is floor-quantized to the 1e-6 grid before "
        "summation (the vocab_logrank rule: js_q is an exact "
        "integer); tokens a source never saw contribute through ONE "
        "closed-form 0.5*ln2*(missing q-mass) term with ln2 a QUOTED "
        "literal double — the vocabulary x groups fan-out never "
        "materializes. Same two-vocabulary-shuffle plan as the KL "
        "probe; the grand-total token count is a 1-row scalar "
        "broadcast (the declared BNLJ shape).",
)
def text_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import js_divergence_by_group
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull())
    return js_divergence_by_group(d, "source", "text")


# --------------------------------------------------------------------------
# 25. stats_cochran_q — binary repeated-measures test (k-sample McNemar)
# --------------------------------------------------------------------------

@query(
    "stats_cochran_q",
    oracle="""
WITH cell AS (
  SELECT o_custkey % 200 AS b, o_orderpriority AS tr,
         CAST(count(*) % 2 AS BIGINT) AS x
  FROM orders GROUP BY 1, 2
), kk AS (SELECT count(DISTINCT tr) AS k FROM cell),
c AS (
  SELECT b FROM cell GROUP BY b
  HAVING count(DISTINCT tr) = (SELECT k FROM kk)
), r2 AS (SELECT cell.* FROM cell JOIN c USING (b)),
cj AS (
  SELECT tr, CAST(count(*) AS BIGINT) AS n_blocks,
         CAST(sum(x) AS BIGINT) AS c_j
  FROM r2 GROUP BY 1
), rb AS (SELECT b, CAST(sum(x) AS BIGINT) AS r FROM r2 GROUP BY 1),
tot AS (
  SELECT CAST(sum(r) AS BIGINT) AS t,
         CAST(sum(CAST(r AS HUGEINT) * r) AS BIGINT) AS srb2
  FROM rb
), cs AS (
  SELECT CAST(sum(CAST(c_j AS HUGEINT) * c_j) AS HUGEINT) AS scj2 FROM cj
)
SELECT tr AS treatment, n_blocks,
       CAST((SELECT k FROM kk) AS BIGINT) AS k, c_j,
       tot.t AS t_total, tot.srb2 AS sum_rb2,
       round(CAST(((SELECT k FROM kk) - 1)
                  * ((SELECT k FROM kk) * cs.scj2
                     - CAST(tot.t AS HUGEINT) * tot.t) AS DOUBLE)
             / CAST((SELECT k FROM kk) * CAST(tot.t AS HUGEINT)
                    - tot.srb2 AS DOUBLE), 6) AS q_stat
FROM cj, tot, cs ORDER BY treatment
""",
    tags=("stats",),
    doc="Cochran's Q over per-customer-block order-count parities "
        "across the 5 priorities (operators/profile.py:cochran_q): "
        "the binary-outcome member closing the repeated-measures "
        "family — Friedman's 0/1 specialization, McNemar's k-sample "
        "generalization. Multiplying the textbook form through by k "
        "leaves every moment an exact integer (column/row totals, "
        "their squares in DECIMAL(38,0)/HUGEINT) and Q is ONE double "
        "chain, identical on all k emitted rows; incomplete blocks "
        "drop. No window anywhere — two hash aggregates and two "
        "1-row scalar broadcasts.",
)
def stats_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import cochran_q
    o = load_table(spark, sf_dir, "orders")
    cells = (o.groupBy((F.col("o_custkey") % 200).alias("block"),
                       F.col("o_orderpriority").alias("prio"))
             .agg((F.count(F.lit(1)) % 2).alias("x")))
    return cochran_q(cells, "block", "prio", "x")


# --------------------------------------------------------------------------
# 26. stats_runs_test — Wald–Wolfowitz randomness check per stream
# --------------------------------------------------------------------------

@query(
    "stats_runs_test",
    oracle="""
WITH r AS (
  SELECT o_orderpriority AS g, o_orderdate AS d, o_orderkey AS k,
         CAST(CAST(('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)),
                                      1, 6)) AS BIGINT) % 2
              AS BIGINT) AS y
  FROM orders
), f AS (
  SELECT g, y,
         CASE WHEN lag(y) OVER (PARTITION BY g ORDER BY d, k) IS NULL
              THEN NULL
              WHEN y <> lag(y) OVER (PARTITION BY g ORDER BY d, k)
              THEN 1 ELSE 0 END AS chg
  FROM r
), gagg AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS n1,
         CAST(coalesce(sum(chg), 0) + 1 AS BIGINT) AS runs
  FROM f GROUP BY 1
)
SELECT g AS category, n, n1, runs,
       CASE WHEN (2 * CAST(n1 AS HUGEINT) * (n - n1))
                 * ((2 * CAST(n1 AS HUGEINT) * (n - n1)) - n) > 0
            THEN round(CAST(runs * CAST(n AS HUGEINT)
                  - 2 * CAST(n1 AS HUGEINT) * (n - n1) - n AS DOUBLE)
             / sqrt(CAST((2 * CAST(n1 AS HUGEINT) * (n - n1))
                         * ((2 * CAST(n1 AS HUGEINT) * (n - n1)) - n)
                         AS DOUBLE)
                    / CAST(n - 1 AS DOUBLE)), 6)
       END AS z_stat
FROM gagg ORDER BY category
""",
    tags=("stats",),
    doc="Wald–Wolfowitz runs test on the portable md5-parity stream "
        "per order priority in date-then-key order "
        "(operators/profile.py:runs_test): the randomness check the "
        "SPRT's independence assumption rests on. Run count and "
        "1-counts are exact window integers; the classic moments "
        "cancel in DECIMAL(38,0) first so z = (Rn - 2n1n0 - n) / "
        "sqrt(2n1n0(2n1n0-n)/(n-1)) is ONE double chain. One "
        "per-group lag window (the ordered scan, per-group "
        "parallelism grain) + one hash aggregate.",
)
def stats_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import runs_test
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("g"),
        F.col("o_orderdate").alias("d"), F.col("o_orderkey").alias("k"))
    y = (F.conv(F.substring(F.md5(F.col("k").cast("string")), 1, 6),
                16, 10).cast("long") % 2)
    return runs_test(o, "g", ["d", "k"], y == 1)
