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


def winsorize_bounds(df: DataFrame, group_col: str, value_col: str,
                     alpha: float = 0.01) -> DataFrame:
    """Per-group winsorization thresholds by exact ORDER STATISTICS:
    lo = value at rank ceil(alpha*n), hi = value at rank ceil((1-alpha)*n)
    (1-based ranks over the ascending value order).

    Rank-based thresholds, not interpolated percentiles, on purpose:
    an order statistic is a member of the data multiset, so both engines
    agree bit-for-bit — interpolated quantiles differ in formula and ulp
    across engines, which would make every ``value < lo`` comparison a
    coin flip on boundary rows. The value at rank k is also invariant to
    how row_number breaks ties among equal values.

    Output: (group, n, lo, hi, n_below, n_above, winsorized_mean) where
    winsorized_mean averages clamp(value, lo, hi) in exact cents.
    Scale shape: one shuffle on the group key; ranks and thresholds ride
    the same per-group sort window, then one aggregation — no self-join
    of the fact table against its own percentiles.
    """
    g, v = F.col(group_col), F.col(value_col)
    w = Window.partitionBy(group_col).orderBy(value_col)
    wg = Window.partitionBy(group_col)
    d = (df.select(group_col, value_col)
         .withColumn("__r", F.row_number().over(w))
         .withColumn("__n", F.count(F.lit(1)).over(wg)))
    k_lo = F.greatest(F.ceil(F.lit(alpha) * F.col("__n")), F.lit(1))
    k_hi = F.ceil(F.lit(1.0 - alpha) * F.col("__n"))
    bounds = (d.groupBy(group_col).agg(
        F.max("__n").alias("n"),
        F.max(F.when(F.col("__r") == k_lo, v)).alias("lo"),
        F.max(F.when(F.col("__r") == k_hi, v)).alias("hi")))
    clamped = (d.join(F.broadcast(bounds), group_col)
               .select(g, F.col("n"), F.col("lo"), F.col("hi"),
                       v.alias("__v"),
                       F.least(F.greatest(v, F.col("lo")), F.col("hi"))
                        .cast("decimal(18,2)").alias("__cv")))
    return (clamped.groupBy(group_col, "n", "lo", "hi").agg(
        F.sum(F.when(F.col("__v") < F.col("lo"), 1).otherwise(0))
         .alias("n_below"),
        F.sum(F.when(F.col("__v") > F.col("hi"), 1).otherwise(0))
         .alias("n_above"),
        # exact decimal sum → ONE double division (the z-score rule:
        # derive floats from exact sums so both engines do the same
        # single IEEE operation)
        F.round(F.sum("__cv").cast("double") / F.count(F.lit(1)), 4)
         .alias("winsorized_mean")))


def group_percentiles(df: DataFrame, group_col: str, value_col: str,
                      percentiles: tuple[float, ...] = (0.5, 0.9, 0.99),
                      ) -> DataFrame:
    """Exact per-group percentiles by ORDER STATISTICS: for each p the
    value at 1-based rank ceil(p·n) of the ascending order — the same
    engine-portable rank rule as :func:`winsorize_bounds` (an order
    statistic is a data member, so there is no interpolation formula
    for engines to disagree on).

    One shuffle on the group key; all ranks ride one per-group sort
    window; the output is one row per group with a ``p50``-style column
    per requested percentile. For the 100 TB path where exactness is
    not required, use ``quantile_bucket_approx``'s sketch instead —
    this operator's contract is exact, oracle-checkable summaries.
    """
    w = Window.partitionBy(group_col).orderBy(value_col)
    wg = Window.partitionBy(group_col)
    d = (df.select(group_col, value_col)
         .withColumn("__r", F.row_number().over(w))
         .withColumn("__n", F.count(F.lit(1)).over(wg)))
    aggs = [F.max("__n").alias("n")]
    for p in percentiles:
        k = F.greatest(F.ceil(F.lit(p) * F.col("__n")), F.lit(1))
        name = f"p{str(p)[2:].ljust(2, '0')}" if p < 1 else "p100"
        aggs.append(F.max(F.when(F.col("__r") == k, F.col(value_col)))
                    .alias(name))
    return d.groupBy(group_col).agg(*aggs)


def mad_outlier_profile(df: DataFrame, group_col: str, value_col: str,
                        k: float = 3.0) -> DataFrame:
    """Robust per-group outlier profile via the Median Absolute
    Deviation: med = median(v), mad = median(|v - med|), a row is an
    outlier when |v - med| > k·mad.

    The robust twin of :func:`~.profile.outliers_zscore`: mean/stddev
    move with the outliers they're meant to flag, order statistics
    don't. Both medians use the ceil(0.5·n) rank rule of
    :func:`group_percentiles` — data members, no interpolation, so the
    whole computation is exact and engine-portable (the only doubles
    are |v-med| subtractions and the final k·mad comparison, each ONE
    expression from exact inputs).

    Two order-statistic passes over the SAME group partitioning (the
    second window sorts by the derived deviation): two sorts, but both
    inside one shuffle's partitioning; the deviation join-back is a
    window, not a join. Output: (group, n, median, mad, n_outliers).
    """
    w = Window.partitionBy(group_col).orderBy(value_col)
    wg = Window.partitionBy(group_col)
    rank = F.greatest(F.ceil(F.lit(0.5) * F.col("__n")), F.lit(1))
    d = (df.select(group_col, value_col)
         .filter(F.col(value_col).isNotNull())
         .withColumn("__r", F.row_number().over(w))
         .withColumn("__n", F.count(F.lit(1)).over(wg))
         .withColumn("__med", F.max(
             F.when(F.col("__r") == rank, F.col(value_col))).over(wg))
         .withColumn("__dev", F.abs(F.col(value_col) - F.col("__med"))))
    wd = Window.partitionBy(group_col).orderBy("__dev")
    d = (d.withColumn("__rd", F.row_number().over(wd))
         .withColumn("__mad", F.max(
             F.when(F.col("__rd") == rank, F.col("__dev"))).over(wg)))
    return (d.groupBy(group_col)
            .agg(F.max("__n").alias("n"),
                 F.round(F.max("__med"), 6).alias("median"),
                 F.round(F.max("__mad"), 6).alias("mad"),
                 F.sum(F.when(F.col("__dev") > F.lit(k) * F.col("__mad"),
                              1).otherwise(0)).alias("n_outliers")))


def weighted_percentiles(df: DataFrame, group_col: str, value_col: str,
                         weight_col: str,
                         percentiles: tuple[float, ...] = (0.5, 0.9),
                         ) -> DataFrame:
    """Exact per-group WEIGHTED percentiles with integer weights: the
    smallest value whose running cumulative weight reaches p·W (W =
    group weight total) — :func:`group_percentiles` generalized from
    "each row counts 1" to "each row counts w".

    Cumulative weights are exact integer sums over the per-group value
    sort; the only float is the p·W threshold, ONE multiply both
    engines evaluate identically. Ties in value are safe: whether the
    cumulative crosses the threshold mid-run or at its end, the
    SELECTED value is the tied value itself, so row order within ties
    can't change the answer. One shuffle on the group key; all
    thresholds share one sort window. Output: (group, w_total,
    wp<p> per requested percentile).
    """
    wv = (Window.partitionBy(group_col).orderBy(value_col)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wg = Window.partitionBy(group_col)
    d = (df.select(group_col, value_col,
                   F.col(weight_col).cast("long").alias("__w"))
         .filter(F.col(value_col).isNotNull())
         .withColumn("__cw", F.sum("__w").over(wv))
         .withColumn("__tw", F.sum("__w").over(wg)))
    aggs = [F.max("__tw").alias("w_total")]
    for p in percentiles:
        name = f"wp{str(p)[2:].ljust(2, '0')}" if p < 1 else "wp100"
        aggs.append(F.min(F.when(
            F.col("__cw") >= F.lit(p) * F.col("__tw"),
            F.col(value_col))).alias(name))
    return d.groupBy(group_col).agg(*aggs)


def merged_histogram_quantiles(hists: DataFrame, quantiles: list[float],
                               lo: float, hi: float,
                               nbins: int) -> DataFrame:
    """Quantile estimates from MERGED fixed-width histograms — the
    incremental-maintenance form of percentiles.

    Exact percentiles need the data; but per-increment histograms (the
    ``fixed_histogram`` shape an hourly pipeline persists alongside its
    partitions) are SUMS, so any window of increments merges with one
    tiny aggregate and yields every quantile to ±binwidth without
    rescanning raw history — the COUNT(DISTINCT)→HLL argument
    (hll_rollup) applied to order statistics.

    Estimate: smallest bucket whose cumulative count reaches
    ceil(q·total); the reported value is that bucket's RIGHT edge
    (cumulative(bucket) ≥ rank guarantees the true order statistic is
    ≤ the edge; the left edge bounds it below — so the error bound is
    one binwidth by construction, pytest-pinned). All arithmetic is
    exact integers + one fixed-chain edge expression, so the estimate
    is engine-portable. The cumulative window runs over the
    ≤ nbins-row merged table (single-task by bound, the drift_ks rule).
    """
    merged = hists.groupBy("bucket").agg(F.sum("n").alias("n"))
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding,
                                             Window.currentRow)
    wall = Window.partitionBy(F.lit(0)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    cum = (merged.withColumn("cum", F.sum("n").over(w))
           .withColumn("total", F.sum("n").over(wall)))
    width = (hi - lo) / nbins
    out = None
    for q in quantiles:
        rank = F.ceil(F.lit(q) * F.col("total")).cast("long")
        hit = (cum.filter(F.col("cum") >= rank)
               .orderBy("bucket").limit(1)
               .select(F.lit(q).alias("q"),
                       F.col("bucket"),
                       (F.lit(lo) + (F.col("bucket") + 1)
                        * F.lit(width)).alias("estimate"),
                       F.col("total").cast("long").alias("n_total")))
        out = hit if out is None else out.unionByName(hit)
    return out
