"""Time-series resample with gap filling (hypertable-style rollup).

Spark's `window()` aggregates only buckets that HAVE data; dashboards
and downstream models need the empty buckets too. The scalable rewrite:

  1. bucket + aggregate (one shuffle on (key, bucket));
  2. per-key bounds (min/max bucket — reuses the same shuffle output);
  3. spine = explode(sequence(lo, hi, step)) per key — generated
     row-count is bounded by (range/step)·keys, no data shuffle;
  4. left join aggregates onto the spine (broadcast-friendly: the
     aggregated side is already small relative to raw data).

Everything is built-in expressions; no driver-side date loops.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def resample(df: DataFrame, key: str, ts_col: str, interval: str = "1 hour",
             value_col: str | None = None) -> DataFrame:
    """Per-key fixed-interval rollup with empty buckets materialized.

    Output: (key, bucket_start, n, sum_value?) — one row per key per
    interval between that key's first and last event; gap buckets carry
    n=0 and NULL sum.
    """
    step = F.expr(f"INTERVAL {interval}")
    aggs = [F.count(F.lit(1)).alias("n")]
    if value_col:
        # decimal sum: accumulation-order-independent across engines
        aggs.append(F.sum(F.col(value_col).cast("decimal(18,2)"))
                    .cast("double").alias("sum_value"))
    agged = (df.groupBy(F.col(key),
                        F.window(ts_col, interval)["start"].alias("bucket"))
             .agg(*aggs))
    spine = (agged.groupBy(key)
             .agg(F.min("bucket").alias("__lo"), F.max("bucket").alias("__hi"))
             .select(key, F.explode(F.sequence(F.col("__lo"), F.col("__hi"),
                                               step)).alias("bucket")))
    out = (spine.join(agged, [key, "bucket"], "left")
           .withColumn("n", F.coalesce(F.col("n"), F.lit(0))))
    return out
