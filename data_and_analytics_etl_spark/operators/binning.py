"""Feature binning: quantile buckets and fixed-width histograms.

Two quantile paths with one contract (bucket ids 1..k):

* ``quantile_bucket`` (exact): ``ntile(k)`` over a TOTAL order
  (value, tie-break key). A global-order window is a single-partition
  sort at the limit — correct, oracle-checkable, and the right tool up
  to the tens of millions of rows where an exact decile table is
  actually wanted. NOT the 100 TB path.
* ``quantile_bucket_approx`` (scale): ``approx_percentile`` computes k
  cutpoints in one pass (t-digest, mergeable map-side), the tiny
  cutpoint array is broadcast as a literal-free cross join, and the
  bucket id is ``count(cuts <= v)`` via a SIZE(FILTER(..)) expression
  — fully distributed, no global sort, error bounded by the sketch
  accuracy. This is the 100 TB path; pytest bounds its disagreement
  with the exact path.

``fixed_histogram`` is plain arithmetic bucketing
(floor((v - lo) / width), clamped) — one groupBy shuffle, engine-
neutral semantics (no width_bucket dependency; DuckDB lacks it).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def quantile_bucket(df: DataFrame, value_col: str, k: int,
                    tie_col: str, out_col: str = "bucket") -> DataFrame:
    """Exact k-quantile bucket id (1..k) via ntile over a total order."""
    w = Window.orderBy(F.col(value_col), F.col(tie_col))
    return df.withColumn(out_col, F.ntile(k).over(w))


def quantile_bucket_approx(df: DataFrame, value_col: str, k: int,
                           out_col: str = "bucket",
                           accuracy: int = 10000) -> DataFrame:
    """Approximate k-quantile bucket id (1..k): sketch + broadcast.

    Bucket = 1 + (number of interior cutpoints <= value); cutpoints are
    the (1/k .. (k-1)/k) approx percentiles. One aggregation pass plus
    a broadcast of a k-element array — no global sort, no skew pivot.
    """
    fracs = F.array(*[F.lit(i / k) for i in range(1, k)])
    cuts = (df.agg(F.percentile_approx(F.col(value_col), fracs,
                                       F.lit(accuracy)).alias("__cuts")))
    joined = df.join(F.broadcast(cuts))
    bucket = (F.lit(1)
              + F.size(F.filter("__cuts",
                                lambda c: c <= F.col(value_col))))
    return joined.withColumn(out_col, bucket).drop("__cuts")


def fixed_histogram(df: DataFrame, value_col: str, lo: float, hi: float,
                    nbins: int) -> DataFrame:
    """Fixed-width histogram: (bucket 0..nbins-1, n). Out-of-range rows
    clamp into the edge buckets; one shuffle (the groupBy)."""
    width = (hi - lo) / nbins
    raw = F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width))
    b = F.least(F.greatest(raw, F.lit(0)), F.lit(nbins - 1)).cast("long")
    return (df.groupBy(b.alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n")))
