"""Top-k operators.

Global top-k is ``orderBy().limit(k)`` — Spark plans it as
``TakeOrderedAndProject`` (per-partition heap + driver merge of k·p rows,
never a total sort). Per-group top-k is the ``row_number`` window rewrite;
one shuffle on the group key, heap-bounded per partition via the window
sort, no driver involvement — this is the 100 TB-safe shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k(df: DataFrame, k: int, order: list[Column]) -> DataFrame:
    """Global top-k with a total tie-break expected in ``order``."""
    return df.orderBy(*order).limit(k)


def top_k_per_group(
    df: DataFrame,
    group: list[str],
    order: list[Column],
    k: int,
    rank_col: str = "rnk",
) -> DataFrame:
    """Top-k rows per group; ``order`` must break ties for determinism."""
    w = Window.partitionBy(*group).orderBy(*order)
    return (df.withColumn(rank_col, F.row_number().over(w))
              .filter(F.col(rank_col) <= k))
