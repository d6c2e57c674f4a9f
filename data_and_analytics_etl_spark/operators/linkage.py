"""Record linkage: blocked fuzzy matching over a value dictionary.

Entity resolution at scale never compares rows pairwise — it compares
the DISTINCT value dictionary (usually orders of magnitude smaller
than the table: names, brands, addresses repeat), inside blocks, with
an edit-distance filter:

  1. distinct values (one hash agg — the dictionary);
  2. block key per value (cheap expression: first token, prefix,
     length band — anything with high recall for true matches);
  3. self equi-join on the block key (hash join; candidate volume is
     sum of block sizes squared, never n²);
  4. ``levenshtein() <= max_dist`` verify + ``a < b`` dedup.

Matched pairs then broadcast back onto the full table as a mapping
(the dictionary is small by construction), or feed
``operators.dedup.dedup_clusters`` to form canonical entity groups —
the same candidate-pair contract the MinHash-LSH path emits.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def blocked_fuzzy_pairs(df: DataFrame, text_col: str, block: Column,
                        max_dist: int) -> DataFrame:
    """Matched (a, b, dist) pairs over the distinct values of text_col.

    ``block`` is the blocking expression evaluated on the value; only
    same-block candidates are compared. Output: value_a < value_b with
    levenshtein distance in (0, max_dist] — identical values are not a
    match (dedupe them upstream; they need no fuzzy logic).
    """
    dic = (df.select(F.col(text_col).alias("value"))
           .where(F.col("value").isNotNull())
           .distinct()
           .withColumn("__blk", block))
    a = dic.select(F.col("value").alias("value_a"),
                   F.col("__blk").alias("__blk"))
    b = dic.select(F.col("value").alias("value_b"),
                   F.col("__blk").alias("__blk"))
    dist = F.levenshtein("value_a", "value_b")
    return (a.join(b, "__blk")
            .where(F.col("value_a") < F.col("value_b"))
            .where(dist <= max_dist)
            .select("value_a", "value_b", dist.alias("dist")))


def edit_distance_pairs_banded(df: DataFrame, text_col: str,
                               max_dist: int) -> DataFrame:
    """ALL (value_a, value_b, dist) pairs with levenshtein in (0, k] —
    lossless length-band blocking, guaranteed-complete recall.

    :func:`blocked_fuzzy_pairs` trades recall for speed (a first-token
    block misses pairs whose first token differs). This variant's
    pruning is PROVABLY lossless: levenshtein(a, b) >= abs(len(a) -
    len(b)), so any pair within distance k has lengths within k. Lengths
    band into buckets of width k+1; |len_a - len_b| <= k forces the two
    buckets to differ by at most 1, so probing side B at buckets
    {b-1, b, b+1} against side A's single bucket covers every qualifying
    pair — and, because A emits exactly one row, matches each pair
    exactly once (no distinct needed).

    Still an equi-join on the bucket key over the DISTINCT value
    dictionary (never n² over rows); candidate volume within a band is
    bounded by the dictionary's length histogram, and the levenshtein
    verify runs per candidate. Output matches blocked_fuzzy_pairs:
    value_a < value_b, dist in (0, max_dist].
    """
    width = max_dist + 1
    dic = (df.select(F.col(text_col).alias("value"))
           .where(F.col("value").isNotNull())
           .distinct()
           .withColumn("__len", F.length("value"))
           .withColumn("__b", F.floor(F.col("__len") / width)))
    a = dic.select(F.col("value").alias("value_a"),
                   F.col("__len").alias("__la"),
                   F.col("__b").alias("__bkt"))
    b = (dic.select(F.col("value").alias("value_b"),
                    F.col("__len").alias("__lb"),
                    F.explode(F.array(F.col("__b") - 1, F.col("__b"),
                                      F.col("__b") + 1)).alias("__bkt")))
    dist = F.levenshtein("value_a", "value_b")
    return (a.join(b, "__bkt")
            .where(F.abs(F.col("__la") - F.col("__lb")) <= max_dist)
            .where(F.col("value_a") < F.col("value_b"))
            .where(dist <= max_dist)
            .select("value_a", "value_b", dist.alias("dist")))


def first_token(col: str | Column) -> Column:
    """Default blocking key: the first whitespace-delimited token."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")[0]
