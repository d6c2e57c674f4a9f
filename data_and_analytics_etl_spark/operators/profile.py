"""Table profiling: per-column health stats in ONE pass.

The profile every ingest should emit (and the reference never could):
null/non-null counts, approximate distincts, min/max — computed as a
single wide aggregate so the table is scanned exactly once regardless
of column count, never one job per column.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def profile(df: DataFrame, columns: list[str] | None = None,
            exact: bool = False) -> DataFrame:
    """One row per profiled column: (column, n_rows, n_null, n_distinct,
    min_str, max_str). Single aggregate job; stack/unpivot of a wide
    one-row result, no per-column scans. ``exact=False`` (default) uses
    HLL distincts — the right choice at scale; ``exact=True`` switches
    to countDistinct for oracle-verifiable output."""
    cols = columns or df.columns
    distinct = F.countDistinct if exact else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nn"),
            distinct(c).alias(f"{c}__nd"),
            F.min(F.col(c).cast("string")).alias(f"{c}__mn"),
            F.max(F.col(c).cast("string")).alias(f"{c}__mx"),
        ]
    wide = df.agg(*aggs)
    stacked = wide.select(
        F.explode(F.array(*[
            F.struct(F.lit(c).alias("column"),
                     F.col("__n").alias("n_rows"),
                     F.col(f"{c}__nn").alias("n_null"),
                     F.col(f"{c}__nd").alias("n_distinct_approx"),
                     F.col(f"{c}__mn").alias("min_str"),
                     F.col(f"{c}__mx").alias("max_str"))
            for c in cols])).alias("p"))
    return stacked.select("p.*")
