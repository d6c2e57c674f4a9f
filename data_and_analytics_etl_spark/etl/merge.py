"""Upsert / MERGE INTO semantics as a pure DataFrame composition.

The reference pipeline is append-only (S3 objects per pull window) and
delegates merge semantics to the warehouse loader downstream. A
standalone engine needs the merge itself: new extracts both UPDATE
matched keys and INSERT unmatched ones.

Expressed Spark-first: union the two sides with a source rank and keep
the best-ranked row per key with a single `row_number` window — ONE
shuffle on the merge key, no join at all (a join-based MERGE would
shuffle both sides AND re-shuffle the result; the union form moves each
row exactly once). Ties within a side break on ``order_by`` columns so
the winner is deterministic, which keeps the operation replay-safe
(at-least-once upstream delivery, SURVEY §7.4).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def merge_upsert(existing: DataFrame, updates: DataFrame,
                 keys: list[str],
                 order_by: list[Column] | None = None) -> DataFrame:
    """MERGE: update rows whose key exists in ``updates``, insert the rest.

    ``updates`` rows always beat ``existing`` rows on the same key;
    within a side, ``order_by`` (descending-preference list) breaks
    ties — pass the natural version/timestamp column. Columns must be
    union-compatible (same schema both sides).
    """
    lhs = existing.withColumn("__src", F.lit(1))
    rhs = updates.withColumn("__src", F.lit(0))   # 0 sorts first = wins
    order = [F.col("__src").asc()] + list(order_by or [])
    w = Window.partitionBy(*keys).orderBy(*order)
    return (lhs.unionByName(rhs)
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", "__src"))
