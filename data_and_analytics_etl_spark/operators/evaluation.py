"""Model-evaluation operators: confusion matrix, per-class PR, AUC,
agreement (Cohen's kappa), ranking metrics, survival curves.

A training-data engine ends at an eval harness: classifier quality
gates (which documents did lang-id mislabel?), per-class
precision/recall for filter tuning, and ranking AUC for scorer
calibration. All three are exact relational computations — no sampling,
no sklearn — so they oracle-check cross-engine and scale like any
aggregate:

- confusion matrix: ONE hash agg on (truth, pred);
- per-class precision/recall: three marginal sums over the (classes²
  at most) matrix rows — the data-sized shuffle happened already;
- ROC-AUC: the Mann-Whitney rank-sum identity
  AUC = (Σ ranks(positives) − n⁺(n⁺+1)/2) / (n⁺·n⁻), with average
  ranks on ties — per-distinct-score aggregation first, then one
  running window over the score table; integer arithmetic until one
  final double division.
"""

from __future__ import annotations

import functools
import math

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def confusion_matrix(df: DataFrame, truth: Column,
                     pred: Column) -> DataFrame:
    """Exact confusion counts: one row per observed (truth, pred) pair.

    One partially-combined hash aggregate — the same plan as any
    groupBy-count, so 100 TB of predictions collapse map-side to at
    most |classes|² rows per partition.
    """
    return (df.select(truth.alias("truth"), pred.alias("pred"))
            .groupBy("truth", "pred")
            .agg(F.count(F.lit(1)).alias("n")))


def classification_report(df: DataFrame, truth: Column,
                          pred: Column) -> DataFrame:
    """Per-class support / precision / recall / F1 from exact counts.

    Derived entirely from the confusion matrix (classes² rows, persisted
    once), so the heavy data-sized aggregation happens exactly once;
    the three marginals are re-aggregations of that tiny frame. One
    report row per TRUE class. Classes that are never predicted get
    precision NULL (0/0), never a silent 0 — the honest divide-by-zero
    contract; a class predicted only incorrectly gets precision 0.0.
    Each ratio is ONE double division of two exact longs.
    """
    cm = confusion_matrix(df, truth, pred).persist()
    support = (cm.groupBy(F.col("truth").alias("cls"))
               .agg(F.sum("n").alias("support")))
    predicted = (cm.groupBy(F.col("pred").alias("cls"))
                 .agg(F.sum("n").alias("predicted")))
    tp = (cm.filter(F.col("truth") == F.col("pred"))
          .select(F.col("truth").alias("cls"), F.col("n").alias("tp")))
    out = (support
           .join(predicted, "cls", "left")      # class may never be
           .join(tp, "cls", "left")             # predicted / never hit
           .withColumn("tp", F.coalesce(F.col("tp"), F.lit(0)))
           .withColumn("precision",
                       F.when(F.col("predicted") > 0,
                              F.col("tp").cast("double")
                              / F.col("predicted")))
           .withColumn("recall",
                       F.col("tp").cast("double") / F.col("support"))
           .withColumn("f1",
                       F.when((F.col("precision") + F.col("recall")) > 0,
                              2 * F.col("precision") * F.col("recall")
                              / (F.col("precision") + F.col("recall")))))
    return out.select("cls", "support", "tp", "precision", "recall",
                      "f1")


def binary_auc(df: DataFrame, label: Column, score: Column) -> DataFrame:
    """Exact ROC-AUC via the Mann-Whitney rank-sum identity, with
    average ranks on score ties — bit-equal to the O(n log n)
    trapezoidal ROC integral.

    Tie-averaged rank of a row = (#rows with lower score) +
    (#rows with equal score + 1) / 2. Everything stays integral (ranks
    are halves: work in DOUBLED ranks) until the single final double
    division, so the result is engine-exact. Requires both classes
    present (NULL AUC otherwise, never a crash).
    """
    d = df.select(label.cast("int").alias("y"),
                  score.alias("s")).filter(F.col("y").isNotNull()
                                           & F.col("s").isNotNull())
    # aggregate per DISTINCT score first (map-side combined hash agg) so
    # the one unpartitioned running window scans score-cardinality rows,
    # not data rows — the drift_ks bucketed-prefix-sum rule. Model
    # scores are quantized in practice (float32 logits, calibrated
    # probabilities), which bounds the window input; raw data never
    # rides an unpartitioned window here.
    per_s = (d.groupBy("s")
             .agg(F.count(F.lit(1)).alias("c"),
                  F.sum("y").alias("p")))
    w_below = (Window.orderBy("s")
               .rowsBetween(Window.unboundedPreceding, -1))
    below = F.coalesce(F.sum("c").over(w_below), F.lit(0))
    # doubled tie-averaged rank shared by every row at this score:
    # 2*below + ties + 1; positives at the score contribute p of them
    agg = (per_s.withColumn("__r2", 2 * below + F.col("c") + 1)
           .agg(F.sum(F.col("p") * F.col("__r2")).alias("rsum2"),
                F.sum("p").alias("np"),
                (F.sum("c") - F.sum("p")).alias("nn")))
    auc = F.when(
        (F.col("np") > 0) & (F.col("nn") > 0),
        (F.col("rsum2") - F.col("np") * (F.col("np") + 1))
        .cast("double") / 2
        / (F.col("np") * F.col("nn")).cast("double"))
    return agg.select(F.col("np").cast("long").alias("n_pos"),
                      F.col("nn").cast("long").alias("n_neg"),
                      auc.alias("auc"))


def cohen_kappa(df: DataFrame, truth: Column, pred: Column) -> DataFrame:
    """Cohen's kappa inter-rater agreement as one exact rational.

    kappa = (p_o - p_e) / (1 - p_e) with observed agreement
    p_o = diag/n and chance agreement p_e = Σ_c support_c·predicted_c/n².
    Clearing denominators keeps everything integral:

        kappa = (n·diag − Σ_c s_c·p_c) / (n² − Σ_c s_c·p_c)

    — a single double division of two exact longs, so it oracle-checks
    bit-for-bit. The data-sized work is ONE confusion-matrix hash agg;
    the marginal products run over the (classes² at most) matrix rows.
    Perfect chance agreement (p_e = 1: both raters constant) yields NULL
    kappa — the honest 0/0, never a crash.
    """
    cm = confusion_matrix(df, truth, pred).persist()
    support = (cm.groupBy(F.col("truth").alias("cls"))
               .agg(F.sum("n").alias("s")))
    predicted = (cm.groupBy(F.col("pred").alias("cls"))
                 .agg(F.sum("n").alias("p")))
    # full outer: a class only ever predicted (or only ever true) still
    # contributes 0 to the product, not a dropped row
    marg = (support.join(predicted, "cls", "full")
            .agg(F.sum(F.coalesce(F.col("s"), F.lit(0))
                       * F.coalesce(F.col("p"), F.lit(0))).alias("pe_num")))
    base = cm.agg(
        F.sum("n").alias("n_total"),
        F.sum(F.when(F.col("truth") == F.col("pred"),
                     F.col("n")).otherwise(F.lit(0))).alias("n_agree"))
    out = base.crossJoin(F.broadcast(marg))
    kappa = F.when(
        F.col("n_total") * F.col("n_total") != F.col("pe_num"),
        (F.col("n_total") * F.col("n_agree") - F.col("pe_num"))
        .cast("double")
        / (F.col("n_total") * F.col("n_total") - F.col("pe_num"))
        .cast("double"))
    return out.select(F.col("n_total").cast("long").alias("n_total"),
                      F.col("n_agree").cast("long").alias("n_agree"),
                      F.col("pe_num").cast("long").alias("pe_num"),
                      kappa.alias("kappa"))


def dcg_weights(k: int) -> list[float]:
    """The fixed DCG position weights 1/log2(pos+1) for pos = 1..k.

    Computed ONCE driver-side and embedded as double literals in the
    plan (and, verbatim via repr, in any oracle SQL), so both engines
    multiply/add the exact same doubles — the cross-engine float rule:
    a fixed chain of IEEE ops over identical literals is bit-stable,
    while engine-side log2() may differ in the last ulp.
    """
    return [1.0 / math.log2(i + 1) for i in range(1, k + 1)]


def ideal_dcg_prefix(k: int) -> list[float]:
    """Left-fold prefix sums of dcg_weights(k): ideal DCG for 1..k
    relevant items, accumulated in the same order the metric fold uses
    so a perfect ranking scores ndcg exactly 1.0."""
    out, acc = [], 0.0
    for w in dcg_weights(k):
        acc = acc + w
        out.append(acc)
    return out


def ranking_metrics(df: DataFrame, query: Column, score: Column,
                    relevance: Column, tie: Column,
                    k: int = 10) -> DataFrame:
    """Per-query ranking evaluation: hits@k, precision/recall@k,
    reciprocal rank, DCG@k and NDCG@k — all exact or single-division.

    One row_number window (one shuffle on the query key) ranks items by
    (score DESC, tie ASC — the tie column makes the ranking total, so
    float score ties cannot flap the hash cross-engine). The per-query
    aggregate then extracts the relevance bit at each of the k fixed
    positions with k conditional MAXes; DCG is the LITERAL-weighted
    left-assoc sum of those k bits — never a groupBy SUM of doubles,
    whose accumulation order is partition-dependent. IDCG comes from
    the matching prefix-sum literal array, so NDCG = DCG/IDCG is one
    double division and a perfect ranking is exactly 1.0.

    Scales: no collect_list, no per-group arrays — group size is
    unbounded; only k (a constant) widens the aggregate.
    """
    d = df.select(query.alias("q"), score.alias("s"),
                  relevance.cast("int").alias("rel"), tie.alias("t")) \
          .filter(F.col("s").isNotNull())
    win = Window.partitionBy("q").orderBy(F.desc("s"), F.asc("t"))
    r = d.withColumn("rn", F.row_number().over(win))
    pos_bits = [F.max(F.when(F.col("rn") == i + 1, F.col("rel")))
                .alias(f"__r{i}") for i in range(k)]
    g = r.groupBy("q").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("rel").cast("long").alias("n_rel"),
        F.coalesce(F.sum(F.when(F.col("rn") <= k, F.col("rel"))),
                   F.lit(0)).cast("long").alias("hits_at_k"),
        F.min(F.when(F.col("rel") == 1, F.col("rn"))).alias("__fr"),
        *pos_bits)
    w = dcg_weights(k)
    dcg = functools.reduce(
        lambda acc, i: acc + F.coalesce(F.col(f"__r{i}"), F.lit(0))
        .cast("double") * F.lit(w[i]),
        range(1, k),
        F.coalesce(F.col("__r0"), F.lit(0)).cast("double") * F.lit(w[0]))
    prefix = F.array(*[F.lit(x) for x in ideal_dcg_prefix(k)])
    # clamp the index to ≥1: element_at(arr, 0) raises even with ANSI
    # off, and when() does not short-circuit evaluation — the n_rel=0
    # case is masked to NULL by the outer when() below
    idcg = F.element_at(
        prefix, F.greatest(F.lit(1), F.least(F.col("n_rel"),
                                             F.lit(k))).cast("int"))
    return g.select(
        "q", "n_items", "n_rel", "hits_at_k",
        (F.col("hits_at_k").cast("double") / k).alias("precision_at_k"),
        F.when(F.col("n_rel") > 0,
               F.col("hits_at_k").cast("double") / F.col("n_rel"))
        .alias("recall_at_k"),
        F.when(F.col("__fr").isNotNull(),
               F.lit(1.0) / F.col("__fr")).alias("rr"),
        dcg.alias("dcg_at_k"),
        F.when(F.col("n_rel") > 0, dcg / idcg).alias("ndcg_at_k"))


def kaplan_meier(df: DataFrame, duration: Column,
                 observed: Column) -> DataFrame:
    """Kaplan–Meier survival curve over (duration, observed-event) data.

    Classic product-limit estimator: at each distinct duration t with
    n_i subjects still at risk and d_i observed events,
    S(t) = Π_{t_i ≤ t} (1 − d_i/n_i). Censored subjects (observed = 0)
    leave the risk set at their duration without an event.

    Exactness: n_i and d_i are exact longs (one hash agg + one
    prefix-sum window over the DISTINCT-duration table); each factor is
    one double division of exact longs; the running product is a
    left fold (F.aggregate) over the ordered factor prefix collected by
    the same window — both Spark's fold and DuckDB's list_reduce
    multiply in ascending-duration order, so the IEEE chain is
    bit-identical cross-engine.

    Scale: every window here runs over the distinct-duration table, not
    raw rows — callers bucket continuous durations first (the
    drift_ks/calibration rule), which bounds the single-task window by
    construction.
    """
    d = (df.select(duration.alias("t"),
                   observed.cast("int").alias("e"))
         .filter(F.col("t").isNotNull()))
    per_t = d.groupBy("t").agg(F.count(F.lit(1)).alias("c"),
                               F.sum("e").cast("long").alias("d"))
    tot = per_t.agg(F.sum("c").cast("long").alias("__n"))
    w_before = (Window.orderBy("t")
                .rowsBetween(Window.unboundedPreceding, -1))
    w_cum = (Window.orderBy("t")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cur = (per_t.crossJoin(F.broadcast(tot))
           .withColumn("n_risk",
                       (F.col("__n")
                        - F.coalesce(F.sum("c").over(w_before),
                                     F.lit(0))).cast("long"))
           .withColumn("__f",
                       (F.col("n_risk") - F.col("d")).cast("double")
                       / F.col("n_risk").cast("double"))
           .withColumn("survival",
                       F.aggregate(F.collect_list("__f").over(w_cum),
                                   F.lit(1.0),
                                   lambda acc, x: acc * x)))
    return cur.select("t", "n_risk",
                      F.col("d").alias("events"),
                      (F.col("c") - F.col("d")).cast("long")
                      .alias("censored"),
                      "survival").orderBy("t")


def nelson_aalen(df: DataFrame, duration: Column,
                 observed: Column) -> DataFrame:
    """Nelson–Aalen cumulative-hazard estimator over (duration,
    observed-event) data — :func:`kaplan_meier`'s additive sibling
    (KM estimates survival S(t) by a product; NA estimates the
    cumulative hazard H(t) = Σ_{t_i ≤ t} d_i/n_i by a sum; for small
    per-step hazards S ≈ exp(−H), and NA is the standard input to
    hazard-ratio eyeballing and piecewise-exponential fits).

    Exactness: n_i and d_i are exact longs (the KM risk-set prefix
    window over the DISTINCT-duration table); each increment is one
    double division of exact longs; the running SUM is a left fold
    (F.aggregate, init 0.0) over the ordered increment prefix — the
    same ordered-fold trick that makes KM's product bit-identical
    cross-engine (DuckDB list_reduce folds in list order, and
    0.0 + x1 == x1 exactly, so the chains coincide term for term).

    Scale: identical shape to kaplan_meier — every window runs over
    the distinct-duration table; bucket continuous durations first.
    """
    d = (df.select(duration.alias("t"),
                   observed.cast("int").alias("e"))
         .filter(F.col("t").isNotNull()))
    per_t = d.groupBy("t").agg(F.count(F.lit(1)).alias("c"),
                               F.sum("e").cast("long").alias("d"))
    tot = per_t.agg(F.sum("c").cast("long").alias("__n"))
    w_before = (Window.orderBy("t")
                .rowsBetween(Window.unboundedPreceding, -1))
    w_cum = (Window.orderBy("t")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cur = (per_t.crossJoin(F.broadcast(tot))
           .withColumn("n_risk",
                       (F.col("__n")
                        - F.coalesce(F.sum("c").over(w_before),
                                     F.lit(0))).cast("long"))
           .withColumn("__h",
                       F.col("d").cast("double")
                       / F.col("n_risk").cast("double"))
           .withColumn("cum_hazard",
                       F.aggregate(F.collect_list("__h").over(w_cum),
                                   F.lit(0.0),
                                   lambda acc, x: acc + x)))
    return cur.select("t", "n_risk",
                      F.col("d").alias("events"),
                      F.col("__h").alias("hazard_step"),
                      "cum_hazard").orderBy("t")


def calibration_lift(df: DataFrame, label: Column, score: Column,
                     n_buckets: int = 10, lo: float = 0.0,
                     hi: float = 1.0) -> DataFrame:
    """Reliability-diagram + gains-table statistics over fixed-width
    score buckets: per bucket (descending score) the exact count,
    positive count, positive rate, cumulative capture of all
    positives, and lift vs the base rate.

    Fixed-width bucketing (not ntile) keeps the bucket id a pure
    codegen expression — no global sort, the drift_psi histogram rule;
    the cumulative pass is a running window over the N_BUCKETS-row
    aggregate. Rates and lift are single double divisions of exact
    longs, so the whole table oracle-checks. Scores outside [lo, hi]
    clamp into the edge buckets (scorer overflow must not drop rows).
    """
    d = df.select(label.cast("long").alias("y"), score.alias("s")) \
          .filter(F.col("y").isNotNull() & F.col("s").isNotNull())
    width = (hi - lo) / n_buckets
    raw = F.floor((F.col("s") - lo) / width).cast("int")
    bucket = F.least(F.greatest(raw, F.lit(0)), F.lit(n_buckets - 1))
    agg = (d.withColumn("__b", bucket)
           .groupBy("__b")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum("y").alias("n_pos")))
    w = (Window.orderBy(F.desc("__b"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    tot = agg.agg(F.sum("n").alias("__tn"),
                  F.sum("n_pos").alias("__tp"))
    return (agg.crossJoin(F.broadcast(tot))
            .withColumn("cum_pos", F.sum("n_pos").over(w))
            .select(F.col("__b").alias("bucket"), "n", "n_pos",
                    (F.col("n_pos").cast("double") / F.col("n"))
                    .alias("pos_rate"),
                    F.col("cum_pos").cast("long").alias("cum_pos"),
                    F.when(F.col("__tp") > 0,
                           F.col("cum_pos").cast("double")
                           / F.col("__tp")).alias("capture"),
                    F.when(F.col("__tp") > 0,
                           (F.col("n_pos").cast("double") / F.col("n"))
                           / (F.col("__tp").cast("double")
                              / F.col("__tn"))).alias("lift"))
            .orderBy(F.desc("bucket")))


def regression_metrics(df: DataFrame, group_col: str, actual_col: str,
                       pred_col: str) -> DataFrame:
    """Per-group regression evaluation: n, MAE, RMSE, R² of a
    prediction column against the actual — the numeric twin of
    :func:`classification_report`.

    Exact under the float policy: actuals and predictions quantize to
    integer cents, so every residual is an exact long; Σ|r|, Σr², Σy,
    Σy² accumulate as DECIMAL(38,0); each metric finishes as ONE fixed
    double chain from those exact sums (sqrt is correctly rounded) —
    bit-stable cross-engine, no rounding needed. R² = 1 − Σr²/SST with
    SST = Σy² − (Σy)²/n derived from the exact sums (the welch_ttest
    shape); constant-actual groups yield NULL R² (honest 0/0). One
    hash agg; nothing leaves codegen before it.
    """
    y_c = F.round(F.col(actual_col) * 100).cast("long")
    p_c = F.round(F.col(pred_col) * 100).cast("long")
    r = y_c - p_c
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    stats = (df.filter(F.col(actual_col).isNotNull()
                       & F.col(pred_col).isNotNull())
             .groupBy(group_col)
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum(dec(F.abs(r))).alias("__sa"),
                  F.sum(dec(r * r)).alias("__sr2"),
                  F.sum(dec(y_c)).alias("__sy"),
                  F.sum(dec(y_c * y_c)).alias("__sy2")))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    sst = d("__sy2") - d("__sy") * d("__sy") / d("n")
    return stats.select(
        group_col, "n",
        (d("__sa") / d("n") / 100.0).alias("mae"),
        (F.sqrt(d("__sr2") / d("n")) / 100.0).alias("rmse"),
        F.when(sst > 0, F.lit(1.0) - d("__sr2") / sst).alias("r2"))


def rbo_weights(p: float, depth: int) -> list[float]:
    """The fixed RBO weight table (1−p)·p^(k−1) for k = 1..depth,
    computed ONCE in Python so the identical double literals feed both
    the Spark plan and any SQL oracle (the NDCG literal-weight rule:
    never compute pow() engine-side where bit-stability matters)."""
    return [(1.0 - p) * p ** (k - 1) for k in range(1, depth + 1)]


def rank_biased_overlap(ranks: DataFrame, rank_a: str, rank_b: str,
                        p: float = 0.9, depth: int = 20) -> DataFrame:
    """Rank-biased overlap (Webber et al. '10) between two rankings of
    the same item set, emitted as per-depth contribution rows — the
    ranking-churn readout (how much did the leaderboard move between
    snapshots / model versions / index builds?).

    Input: one row per item with its 1-based rank in each list.
    Per prefix depth k ≤ ``depth``: X_k = |top_k(A) ∩ top_k(B)| —
    which for full rankings of one item set is simply the count of
    items with max(rank_a, rank_b) ≤ k — agreement A_k = X_k/k, and
    rbo_contrib = (1−p)·p^(k−1)·X_k/k. Truncated RBO@depth is the
    caller-side sum over the ``depth`` rows (per-row-contribution
    contract; the weights come from :func:`rbo_weights` as literals).

    Plan: items collapse to a count per m = max(ra, rb) clamped into
    [1, depth+1] — one hash agg, so the downstream spine join and
    cumulative window run over at most depth+1 rows regardless of item
    count. No data-sized window, no theta join.
    """
    weights = rbo_weights(p, depth)
    m = F.greatest(F.col(rank_a), F.col(rank_b))
    per_m = (ranks
             .select(F.least(m, F.lit(depth + 1)).cast("int").alias("m"))
             .groupBy("m").agg(F.count(F.lit(1)).alias("c")))
    spine = ranks.sparkSession.range(1, depth + 1).select(
        F.col("id").cast("int").alias("k"))
    w_cum = (Window.orderBy("k")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wcol = F.element_at(F.array(*[F.lit(w) for w in weights]),
                        F.col("k"))
    return (spine.join(F.broadcast(per_m), spine["k"] == per_m["m"],
                       "left")
            .select("k", F.coalesce(F.col("c"), F.lit(0)).alias("__c"))
            .withColumn("x_k", F.sum("__c").over(w_cum))
            .select("k", "x_k",
                    (F.col("x_k").cast("double") / F.col("k"))
                    .alias("agreement"),
                    (wcol * F.col("x_k").cast("double") / F.col("k"))
                    .alias("rbo_contrib")))


def average_precision_at_k(df: DataFrame, query: Column, score: Column,
                           relevance: Column, tie: Column,
                           k: int = 10) -> DataFrame:
    """Per-query average precision at k — the order-sensitive ranking
    metric NDCG's log discount smooths over (AP@k credits EVERY
    relevant hit with the precision at its own position):

        AP@k = (1/min(R, k)) · Σ_{i<=k, rel_i=1} (cum_i / i)

    with R = the query's total relevant count and cum_i the running
    relevant count through position i. Mean over queries (MAP@k) is
    the caller's one-line rollup.

    NULL-score rows are UNRANKED (an unretrieved/unscored item can
    never occupy a top-k position) but they still count toward
    ``n_items`` and toward R — dropping them before the counts would
    shrink R and inflate AP@k for partially-scored inputs, turning
    "we failed to score a relevant item" into a better metric. The
    ranking window sorts NULL scores last and the position bits
    additionally require a non-NULL score, so an unscored row can't
    claim a position even when fewer than k rows are scored.

    Same determinism discipline as :func:`ranking_metrics`: one
    total-order ranking window (score DESC NULLS LAST, tie ASC), k
    conditional MAXes pull the position bits, cum_i is integer
    arithmetic, and the sum of the k per-position terms is a
    LEFT-ASSOC fixed expression — never an aggregate SUM of doubles,
    whose fold order is partition-dependent. R = 0 yields NULL (no
    relevant items = AP undefined, not zero). Group size is
    unbounded; only k widens the aggregate.
    """
    d = df.select(query.alias("q"), score.alias("s"),
                  relevance.cast("int").alias("rel"), tie.alias("t"))
    win = Window.partitionBy("q").orderBy(F.desc_nulls_last("s"),
                                          F.asc("t"))
    r = d.withColumn("rn", F.row_number().over(win))
    pos_bits = [F.coalesce(
        F.max(F.when((F.col("rn") == i + 1) & F.col("s").isNotNull(),
                     F.col("rel"))), F.lit(0))
        .alias(f"__b{i}") for i in range(k)]
    g = r.groupBy("q").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("rel").cast("long").alias("n_rel"),
        *pos_bits)
    cum = F.lit(0)
    chain = F.lit(0.0)
    for i in range(k):
        b = F.col(f"__b{i}")
        cum = cum + b
        chain = chain + b.cast("double") * (cum.cast("double")
                                            / F.lit(float(i + 1)))
    denom = F.least(F.col("n_rel"), F.lit(k)).cast("double")
    return g.select(
        "q", "n_items", "n_rel",
        F.when(F.col("n_rel") > 0, chain / denom).alias("ap_at_k"))


def cost_sensitive_report(df: DataFrame, truth: Column, pred: Column,
                          costs: dict[tuple[str, str], int],
                          default_cost: int = 0) -> DataFrame:
    """Cost-sensitive classification evaluation: accuracy treats every
    mistake the same; deployed classifiers rarely can (a spam
    false-negative and a false-positive have different prices). Each
    (truth, pred) cell is charged its cost from the caller's matrix
    (INTEGER costs — the money rule: cell totals are exact long sums,
    the only float is the final mean division), missing cells charge
    ``default_cost``.

    Output per truth class: n, n_correct, total_cost, mean_cost — the
    caller's 1-row rollup gives the overall expected cost. One hash
    aggregate on the (truth, pred) pair, then the literal cost matrix
    applies as a codegen CASE over the cells table (class-cardinality-
    bounded); nothing data-sized crosses a second shuffle.
    """
    cells = (df.select(truth.alias("__t"), pred.alias("__p"))
             .groupBy("__t", "__p").agg(F.count(F.lit(1)).alias("__n")))
    cost = F.lit(int(default_cost))
    for (t, p), c in sorted(costs.items()):
        cost = F.when((F.col("__t") == t) & (F.col("__p") == p),
                      F.lit(int(c))).otherwise(cost)
    per_cell = cells.withColumn("__cost", cost)
    return (per_cell.groupBy(F.col("__t").alias("truth"))
            .agg(F.sum("__n").alias("n"),
                 F.sum(F.when(F.col("__t") == F.col("__p"),
                              F.col("__n")).otherwise(0))
                 .cast("long").alias("n_correct"),
                 F.sum(F.col("__n") * F.col("__cost")).cast("long")
                 .alias("total_cost"))
            .withColumn("mean_cost",
                        F.col("total_cost").cast("double")
                        / F.col("n").cast("double")))


def brier_decomposition(df: DataFrame, label: Column, score: Column,
                        n_buckets: int = 10) -> DataFrame:
    """Murphy decomposition of the Brier score over fixed-width score
    bins — Brier = reliability − resolution + uncertainty: reliability
    reads miscalibration (bin's observed rate vs its mean forecast),
    resolution reads discrimination (bin rates vs the base rate), and
    uncertainty is the label's intrinsic variance. The diagnostic
    :func:`calibration_lift` eyeballs, made additive.

    Per bin k: rel_contrib = n_k·(ō_k − s̄_k)²/N and
    res_contrib = n_k·(ō_k − ō)²/N; the caller sums the (bounded)
    bin rows; every row also carries the shared ``uncertainty``
    ō·(1−ō). Exactness: scores quantize to the integer 10⁻⁶ grid
    BEFORE summation (a raw double mean is fold-order-dependent), so
    s̄_k is an exact-integer sum with one closing division, and every
    contribution is a fixed chain over exact longs. Fixed-width
    bucketing keeps the bin id a codegen expression; out-of-range
    scores clamp (the calibration_lift contract).
    """
    d = df.select(label.cast("long").alias("y"),
                  F.floor(score * 1_000_000).cast("long").alias("sq")) \
          .filter(F.col("y").isNotNull() & F.col("sq").isNotNull())
    width = 1_000_000 // n_buckets
    raw = F.floor(F.col("sq") / F.lit(width)).cast("int")
    bucket = F.least(F.greatest(raw, F.lit(0)), F.lit(n_buckets - 1))
    dec = "decimal(38,0)"
    agg = (d.withColumn("__b", bucket)
           .groupBy("__b")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum("y").cast("long").alias("n_pos"),
                F.sum(F.col("sq").cast(dec)).cast(dec).alias("__ssq")))
    wall = Window.partitionBy(F.lit(0)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    g = (agg.withColumn("__tn", F.sum("n").over(wall))
         .withColumn("__tp", F.sum("n_pos").over(wall)))
    ok = F.col("n_pos").cast("double") / F.col("n").cast("double")
    sk = (F.col("__ssq").cast("double") / F.lit(1e6)
          / F.col("n").cast("double"))
    obar = F.col("__tp").cast("double") / F.col("__tn").cast("double")
    nn = F.col("n").cast("double") / F.col("__tn").cast("double")
    return (g.select(F.col("__b").alias("bucket"), "n", "n_pos",
                     F.round(sk, 6).alias("mean_score"),
                     F.round(ok, 6).alias("obs_rate"),
                     F.round(nn * (ok - sk) * (ok - sk), 9)
                     .alias("rel_contrib"),
                     F.round(nn * (ok - obar) * (ok - obar), 9)
                     .alias("res_contrib"),
                     F.round(obar * (F.lit(1.0) - obar), 9)
                     .alias("uncertainty"))
            .orderBy("bucket"))


def pr_curve(df: DataFrame, label: Column, score_bucket: Column) -> DataFrame:
    """Exact precision-recall curve over a QUANTIZED score grid — the
    ranking-eval complement of :func:`binary_auc` (ROC ranks all pairs;
    PR is the imbalanced-data view, and its area is average precision).

    One row per distinct score bucket, descending (threshold = "predict
    positive at or above this bucket"): exact cumulative tp/fp/fn as
    BIGINTs, precision/recall as one-chain doubles, and the bucket's
    average-precision contribution ΔR·P = n_pos_at_bucket·P/n_pos — so
    scalar AP is a caller-side sum over the bounded curve rows (the
    categorical_profile per-row-contribution contract; a cross-engine
    double sum over the curve would be order-sensitive).

    The score is bucketed by the CALLER (an integer column, e.g.
    floor(score·500)) so the curve length — and the single ordered
    cumulative window — is bounded by the quantization grid, not the
    data: the drift_ks bucketed-prefix rule with the bucket width
    playing the band role. One hash aggregate + one grid-bounded
    window + a 1-row broadcast total.
    """
    y = label.cast("long")
    per = (df.select(score_bucket.cast("long").alias("bucket"),
                     y.alias("__y"))
           .filter(F.col("bucket").isNotNull() & F.col("__y").isNotNull())
           .groupBy("bucket")
           .agg(F.count(F.lit(1)).alias("__c"), F.sum("__y").alias("__p")))
    w = (Window.orderBy(F.desc("bucket"))
         .rowsBetween(Window.unboundedPreceding, 0))
    tot = per.agg(F.sum("__p").alias("__np"))
    cum = (per.withColumn("tp", F.sum("__p").over(w))
           .withColumn("fp", F.sum(F.col("__c") - F.col("__p")).over(w)))
    prec = F.col("tp").cast("double") / (F.col("tp")
                                         + F.col("fp")).cast("double")
    rec = F.col("tp").cast("double") / F.col("__np").cast("double")
    ap = (F.col("__p").cast("double") * prec
          / F.col("__np").cast("double"))
    return (cum.crossJoin(F.broadcast(tot))
            .select(F.col("bucket").alias("threshold_bucket"),
                    F.col("tp").cast("long").alias("tp"),
                    F.col("fp").cast("long").alias("fp"),
                    (F.col("__np") - F.col("tp")).cast("long").alias("fn"),
                    F.round(prec, 6).alias("precision"),
                    F.round(rec, 6).alias("recall"),
                    F.round(ap, 6).alias("ap_contrib"))
            .orderBy(F.desc("threshold_bucket")))


def logrank_split(df: DataFrame, is_a: Column, duration: Column,
                  observed: Column) -> DataFrame:
    """Log-rank (Mantel-Cox) test core between the two survival curves
    of one table split by a predicate — the hypothesis-test completion
    of :func:`kaplan_meier`/:func:`nelson_aalen` (KM draws the curves;
    log-rank says whether they differ).

    Emits one row per distinct EVENT time (d_t > 0): exact-long risk
    sets and event counts per arm, plus arm A's expected-event and
    variance contributions — each ONE double chain from exact longs
    (O_A − ΣE_A)/√ΣV is the caller-side statistic over the bounded
    event-time rows (the categorical_profile per-row-contribution
    contract; a cross-engine double sum over times would be
    order-sensitive).

    Scale: risk sets come from per-arm prefix sums over the
    DISTINCT-duration table (callers bucket continuous durations
    first — the kaplan_meier rule), one hash agg + one bounded window.
    """
    a = is_a.cast("long")
    d = (df.select(duration.alias("t"),
                   observed.cast("long").alias("e"),
                   a.alias("__a"))
         .filter(F.col("t").isNotNull()))
    per_t = (d.groupBy("t")
             .agg(F.sum("__a").alias("c_a"),
                  F.sum(1 - F.col("__a")).alias("c_b"),
                  F.sum(F.col("e") * F.col("__a")).alias("d_a"),
                  F.sum(F.col("e") * (1 - F.col("__a"))).alias("d_b")))
    tot = per_t.agg(F.sum("c_a").cast("long").alias("__na"),
                    F.sum("c_b").cast("long").alias("__nb"))
    wb = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    cur = (per_t.crossJoin(F.broadcast(tot))
           .withColumn("n_risk_a",
                       (F.col("__na")
                        - F.coalesce(F.sum("c_a").over(wb), F.lit(0)))
                       .cast("long"))
           .withColumn("n_risk_b",
                       (F.col("__nb")
                        - F.coalesce(F.sum("c_b").over(wb), F.lit(0)))
                       .cast("long"))
           .filter(F.col("d_a") + F.col("d_b") > 0))
    na, nb = F.col("n_risk_a").cast("double"), \
        F.col("n_risk_b").cast("double")
    nt = na + nb
    dt = (F.col("d_a") + F.col("d_b")).cast("double")
    e_a = dt * na / nt
    var = F.when(
        nt > F.lit(1.0),
        dt * na * nb * (nt - dt) / (nt * nt * (nt - F.lit(1.0)))
    ).otherwise(F.lit(0.0))
    return (cur.select("t", "n_risk_a", "n_risk_b",
                       F.col("d_a").cast("long").alias("d_a"),
                       F.col("d_b").cast("long").alias("d_b"),
                       F.round(e_a, 6).alias("e_a_contrib"),
                       F.round(var, 6).alias("var_contrib"))
            .orderBy("t"))


def mcnemar(df: DataFrame, truth: Column, pred_a: Column,
            pred_b: Column) -> DataFrame:
    """McNemar's paired-classifier test: of the rows where the two
    predictors DISAGREE in correctness, is the split symmetric?
    b = A-right/B-wrong, c = A-wrong/B-right, χ² = (b−c)²/(b+c) with
    1 df — the right test when both models predict the SAME examples
    (accuracy deltas ignore the pairing).

    One map-side-combinable aggregate over boolean indicator sums;
    exact longs until the single closing double chain. One row out:
    (n, both_right, both_wrong, b, c, chi2).
    """
    ra = (truth == pred_a).cast("long")
    rb = (truth == pred_b).cast("long")
    agg = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(ra * rb).cast("long").alias("both_right"),
        F.sum((1 - ra) * (1 - rb)).cast("long").alias("both_wrong"),
        F.sum(ra * (1 - rb)).cast("long").alias("b"),
        F.sum((1 - ra) * rb).cast("long").alias("c"))
    diff = (F.col("b") - F.col("c")).cast("double")
    tot = (F.col("b") + F.col("c")).cast("double")
    chi2 = F.when(tot > 0, diff * diff / tot).otherwise(F.lit(0.0))
    return agg.select("n", "both_right", "both_wrong", "b", "c",
                      F.round(chi2, 6).alias("chi2"))


def calibration_bins(df: DataFrame, score_pct: Column, label: Column,
                     nbins: int = 10) -> DataFrame:
    """Reliability-diagram bins + per-bin ECE contributions: the
    model-calibration readout (Guo et al. '17) that
    eval_calibration_lift's decile-lift view doesn't give — "when the
    model says 70%, does it happen 70% of the time?".

    ``score_pct`` is the prediction as an INTEGER per-cent score in
    [0, 100] (the caller quantizes; integer scores make the bin edge
    exact — a double score at a boundary is engine-ambiguous). Bin
    assignment is pure integer arithmetic: bin = min(score·nbins DIV
    100, nbins−1). Per bin: n, n_pos, Σscore (exact integers), then
    mean_score = Σscore/(100·n), frac_pos = n_pos/n and the weighted
    calibration gap |frac − mean|·n/N (whose sum over the ≤nbins
    bounded rows is the ECE) — each ONE double chain.

    Plan: one codegen bin expression + ONE hash aggregate on the bin
    id (≤ nbins rows) + a 1-row broadcast total. No window, no join.
    """
    s = score_pct.cast("long")
    g = (df.select((s * F.lit(nbins)).alias("__sn"), s.alias("__s"),
                   label.cast("long").alias("__y"))
         # integer DIV (never a double division at a bin edge)
         .select(F.least(F.expr("__sn DIV 100"), F.lit(nbins - 1))
                 .cast("long").alias("bin"), "__s", "__y")
         .groupBy("bin")
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum("__y").alias("n_pos"),
              F.sum("__s").alias("sum_score")))
    tot = g.agg(F.sum("n").alias("__N"))
    mean_score = F.col("sum_score").cast("double") \
        / (F.lit(100.0) * F.col("n").cast("double"))
    frac_pos = F.col("n_pos").cast("double") / F.col("n").cast("double")
    ece_w = (F.abs(frac_pos - mean_score) * F.col("n").cast("double")
             / F.col("__N").cast("double"))
    return (g.crossJoin(F.broadcast(tot))
            .select("bin", F.col("n").cast("long").alias("n"),
                    F.col("n_pos").cast("long").alias("n_pos"),
                    F.round(mean_score, 6).alias("mean_score"),
                    F.round(frac_pos, 6).alias("frac_pos"),
                    F.round(ece_w, 6).alias("ece_contrib"))
            .orderBy("bin"))


def matthews_corrcoef(df: DataFrame, group_col: str, label: Column,
                      pred: Column) -> DataFrame:
    """Per-group Matthews correlation coefficient (Matthews '75) — the
    balanced single-number binary-classifier summary that, unlike
    accuracy or F1, stays honest under class imbalance (it is the
    Pearson φ of the 2×2 confusion table):

        MCC = (TP·TN − FP·FN) / √((TP+FP)(TP+FN)(TN+FP)(TN+FN))

    Confusion cells are exact longs from ONE map-side-combinable
    aggregate; the numerator and the four margins multiply in
    DECIMAL(38,0) (margins ~ n each, so the product reaches n⁴ — far
    past 2⁶³ at corpus scale), and MCC is ONE double chain
    (cast → sqrt → divide). A zero margin (degenerate truth or
    prediction column) emits NULL, matching the undefined 0/0 case.

    Emitted per group: (category, tp, fp, fn, tn, mcc), total ORDER BY
    category. Plan: one hash aggregate; no join, no window.
    """
    dec = "decimal(38,0)"
    y = label.cast("long")
    p = pred.cast("long")
    g = (df.groupBy(F.col(group_col).alias("category"))
         .agg(F.sum(y * p).alias("tp"),
              F.sum((1 - y) * p).alias("fp"),
              F.sum(y * (1 - p)).alias("fn"),
              F.sum((1 - y) * (1 - p)).alias("tn")))
    tp, fp = F.col("tp").cast(dec), F.col("fp").cast(dec)
    fn, tn = F.col("fn").cast(dec), F.col("tn").cast(dec)
    num = (tp * tn - fp * fn).cast(dec)
    den = ((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)).cast(dec)
    mcc = F.when(den > 0,
                 num.cast("double") / F.sqrt(den.cast("double")))
    return (g.select("category",
                     F.col("tp").cast("long").alias("tp"),
                     F.col("fp").cast("long").alias("fp"),
                     F.col("fn").cast("long").alias("fn"),
                     F.col("tn").cast("long").alias("tn"),
                     mcc.alias("mcc"))
            .orderBy("category"))
