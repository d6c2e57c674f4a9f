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


def item_neighbors(baskets: DataFrame, basket_col: str, item_col: str,
                   k: int = 10, min_item_count: int = 2,
                   min_pair_count: int = 2) -> DataFrame:
    """Item-to-item collaborative-filtering neighbors ("customers who
    bought X also bought Y", Linden et al. 2003): per item, the top-k
    most similar items by co-occurrence cosine, with Jaccard alongside.

        cosine(a,b)  = n_ab / sqrt(n_a · n_b)
        jaccard(a,b) = n_ab / (n_a + n_b − n_ab)

    Counts come from :func:`association_rules`'s Apriori-pruned pair
    aggregate (same scale fence: frequent-item semi-join before
    pairing, basket-key equi-join, never item×item). The n_a·n_b
    product runs in DECIMAL(38,0) before the sqrt (long·long would
    wrap at ~3e9-basket item counts); each similarity is then a fixed
    one-division IEEE chain over exact longs — cross-engine
    hash-stable. Ranking ties break on the neighbor id, so top-k is
    total.

    Output: (item, neighbor, n_item, n_neighbor, n_both, cosine,
    jaccard, rank), rank 1..k per item. The per-item ranking window
    partitions on the item — bounded by the pair fan-out of one item,
    not the catalog.
    """
    rules = association_rules(baskets, basket_col, item_col,
                              min_item_count=min_item_count,
                              min_pair_count=min_pair_count)
    fwd = rules.select(F.col("item_a").alias("item"),
                       F.col("item_b").alias("neighbor"),
                       F.col("n_a").alias("n_item"),
                       F.col("n_b").alias("n_neighbor"),
                       F.col("n_ab").alias("n_both"))
    rev = rules.select(F.col("item_b").alias("item"),
                       F.col("item_a").alias("neighbor"),
                       F.col("n_b").alias("n_item"),
                       F.col("n_a").alias("n_neighbor"),
                       F.col("n_ab").alias("n_both"))
    sym = fwd.unionByName(rev)
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    d = lambda c: F.col(c).cast("double")           # noqa: E731
    cosine = d("n_both") / F.sqrt((dec("n_item") * dec("n_neighbor"))
                                  .cast("double"))
    jaccard = d("n_both") / (d("n_item") + d("n_neighbor")
                             - d("n_both"))
    scored = (sym.withColumn("cosine", cosine)
              .withColumn("jaccard", jaccard))
    w = Window.partitionBy("item").orderBy(F.desc("cosine"),
                                           F.asc("neighbor"))
    return (scored.withColumn("rank",
                              F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k))
