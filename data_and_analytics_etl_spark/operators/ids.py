"""Stable dense row IDs at scale (0..n-1 by a total order).

``row_number() OVER (ORDER BY k)`` is the right SEMANTICS but the
wrong PLAN at 100 TB: an unpartitioned window moves every row through
ONE task. The scalable form splits the order into value-derived
buckets and renumbers inside each:

  1. sketch k-quantile cutpoints of the order key (one column-pruned
     pass, mergeable t-digest);
  2. bucket = count(cutpoints <= key) — a pure codegen expression, so
     bucket boundaries RESPECT the order (v1 < v2 => bucket(v1) <=
     bucket(v2)) and are a function of the value, never of physical
     partitioning;
  3. per-bucket row counts (second column-pruned pass, tiny result)
     -> exclusive prefix sums = per-bucket id offsets, broadcast;
  4. id = offset(bucket) + row_number within bucket - 1 — the only
     data shuffle, hash-partitioned on ~k even buckets (sketch error
     only skews bucket SIZES slightly, never correctness).

Equals the global row_number exactly for a unique key.
``monotonically_increasing_id`` gives neither density nor stability
(ids change with partitioning), which is why corpus sharding and
embedding-index builds can't use it.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.sql import types as T


def assign_dense_ids(df: DataFrame, order_col: str,
                     out_col: str = "row_id",
                     buckets: int = 200,
                     accuracy: int = 10000) -> DataFrame:
    """Add ``out_col`` = dense 0-based rank of ``order_col`` (must be
    unique for a deterministic assignment, and NUMERIC — the
    percentile_approx cutpoint sketch casts its input to double, so a
    string order key silently yields garbage bucket boundaries; r10's
    sf0.1 sweep caught systematic_sample doing exactly that)."""
    if not isinstance(df.schema[order_col].dataType,
                      (T.NumericType, T.DateType, T.TimestampType)):
        raise TypeError(
            f"assign_dense_ids needs a numeric/temporal order column; "
            f"got {df.schema[order_col].dataType} for {order_col!r} — "
            f"derive an ordered numeric bucket instead (the "
            f"systematic_sample hex-prefix pattern)")
    fracs = F.array(*[F.lit(i / buckets) for i in range(1, buckets)])
    cuts = df.agg(F.percentile_approx(F.col(order_col), fracs,
                                      F.lit(accuracy)).alias("__cuts"))
    bucketed = (df.join(F.broadcast(cuts))
                .withColumn("__b", F.size(F.filter(
                    "__cuts", lambda c: c <= F.col(order_col))))
                .drop("__cuts"))
    counts = bucketed.groupBy("__b").agg(F.count(F.lit(1)).alias("__c"))
    woff = (Window.partitionBy(F.lit(0)).orderBy("__b")
            .rowsBetween(Window.unboundedPreceding, -1))
    offsets = counts.withColumn(
        "__off", F.coalesce(F.sum("__c").over(woff), F.lit(0)))
    wrow = Window.partitionBy("__b").orderBy(order_col)
    return (bucketed.join(F.broadcast(offsets.select("__b", "__off")),
                          "__b")
            .withColumn(out_col,
                        (F.col("__off") + F.row_number().over(wrow) - 1)
                        .cast("long"))
            .drop("__b", "__off"))
