"""Model-evaluation operators: confusion matrix, per-class PR, AUC.

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
