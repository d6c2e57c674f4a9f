"""Market-basket association rules: pairwise co-occurrence mining.

For item pairs {a, b} co-occurring in baskets (Agrawal & Srikant's
Apriori surface restricted to 2-itemsets — the overwhelmingly common
production case):

  support(a,b)    = n_ab / N        (N = number of baskets)
  confidence(a→b) = n_ab / n_a
  lift(a,b)       = n_ab·N / (n_a·n_b)

All counts are exact longs from hash aggregates; every ratio is a
fixed chain of IEEE ops over doubles converted from those exact longs
(no accumulation of floats anywhere), so results hash bit-identically
cross-engine without rounding.

Scale shape: pair generation is the quadratic hazard — a basket of m
items yields C(m, 2) pairs. The fence is the Apriori prune: support is
anti-monotone, so an item below ``min_item_count`` cannot participate
in a frequent pair and the basket table is semi-joined against the
frequent-item dictionary BEFORE pairing. The pair join itself is an
equi-join on the basket key (one shuffle, co-partitioned by basket)
with an ``item_a < item_b`` theta residual — never item×item. The
basket total is a 1-row aggregate broadcast with a crossJoin (the
action-free pattern of profile.check_referential_integrity), so plan
construction runs no job.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def association_rules(baskets: DataFrame, basket_col: str, item_col: str,
                      min_item_count: int = 2,
                      min_pair_count: int = 2) -> DataFrame:
    """Frequent item-pair rules. Output one row per unordered frequent
    pair (item_a < item_b): (item_a, item_b, n_a, n_b, n_ab, n_baskets,
    support, conf_ab, conf_ba, lift).

    ``min_item_count`` is the Apriori frequent-item floor (applied
    before pairing — the scale fence); ``min_pair_count`` bounds the
    output to pairs seen together at least that often.
    """
    bi = (baskets.select(F.col(basket_col).alias("__basket"),
                         F.col(item_col).alias("__item"))
          .distinct())
    item_n = (bi.groupBy("__item")
              .agg(F.count(F.lit(1)).alias("__n_item"))
              .filter(F.col("__n_item") >= min_item_count))
    # Apriori prune: only frequent items can form frequent pairs. The
    # dictionary is the small side — broadcast it so the prune is
    # shuffle-free on the basket table.
    pruned = bi.join(F.broadcast(item_n), "__item")
    n_total = (bi.select("__basket").distinct()
               .agg(F.count(F.lit(1)).alias("n_baskets")))
    a = pruned.select(F.col("__basket"),
                      F.col("__item").alias("item_a"),
                      F.col("__n_item").alias("n_a"))
    b = pruned.select(F.col("__basket"),
                      F.col("__item").alias("item_b"),
                      F.col("__n_item").alias("n_b"))
    pairs = (a.join(b, "__basket")
             .filter(F.col("item_a") < F.col("item_b"))
             .groupBy("item_a", "item_b")
             .agg(F.count(F.lit(1)).alias("n_ab"),
                  F.max("n_a").alias("n_a"),
                  F.max("n_b").alias("n_b"))
             .filter(F.col("n_ab") >= min_pair_count))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    return (pairs.crossJoin(F.broadcast(n_total))
            .select("item_a", "item_b", "n_a", "n_b", "n_ab", "n_baskets",
                    (d("n_ab") / d("n_baskets")).alias("support"),
                    (d("n_ab") / d("n_a")).alias("conf_ab"),
                    (d("n_ab") / d("n_b")).alias("conf_ba"),
                    ((d("n_ab") * d("n_baskets"))
                     / (d("n_a") * d("n_b"))).alias("lift")))


def pareto_abc(df: DataFrame, key_col: str, amount_col: str,
               a_pct: int = 80, b_pct: int = 95) -> DataFrame:
    """Pareto / ABC revenue-concentration classification: keys ranked
    by descending exact-cents revenue; class A while the running share
    is ≤ ``a_pct``%, B while ≤ ``b_pct``%, else C.

    Entirely integer-exact: revenue is round(amount·100) summed as
    longs, and the share comparisons are cross-multiplied
    (cum·100 ≤ pct·total) in DECIMAL(38,0) so no float boundary (or
    long overflow at corpus scale) exists anywhere. Ranking ties break
    on the key for a total order.

    Scale shape: one hash agg collapses the fact table to one row per
    key; the ranking/cumulative window then runs over that AGGREGATE —
    single-task at the limit, bounded by the dimension cardinality
    (parts/SKUs, not fact rows). For dimensions too large for one
    task, renumber with ids.assign_dense_ids (sketch-bucketed
    row_number) and derive the cumulative from per-bucket offsets.

    Output: (key, cents, rank, abc_class).
    """
    per_key = (df.groupBy(F.col(key_col).alias("key"))
               .agg(F.sum(F.round(F.col(amount_col) * 100).cast("long"))
                    .alias("cents")))
    w = Window.orderBy(F.col("cents").desc(), F.col("key"))
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = Window.partitionBy(F.lit(0)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    # cast BEFORE the window sum (repo rule, cf. profile.partition_
    # checksums): a long accumulator would wrap silently at corpus scale
    # while the DuckDB oracle's HUGEINT does not
    cents_dec = F.col("cents").cast("decimal(38,0)")
    ranked = (per_key
              .withColumn("rank", F.row_number().over(w).cast("long"))
              .withColumn("__cum", F.sum(cents_dec).over(wc))
              .withColumn("__tot", F.sum(cents_dec).over(wall)))
    cls = (F.when(F.col("__cum") * 100 <= F.col("__tot") * a_pct, "A")
           .when(F.col("__cum") * 100 <= F.col("__tot") * b_pct, "B")
           .otherwise("C"))
    return ranked.select("key", "cents", "rank", cls.alias("abc_class"))
