"""Binned range join: interval containment as an equi-join.

A naive range join (`lo <= p AND p < hi`) has no equi-key, so Spark
plans BroadcastNestedLoopJoin — O(n·m) comparisons, dead at scale when
neither side broadcasts. The standard rewrite (used by Databricks'
range-join optimization and interval libraries):

  1. pick a bin width ~ the typical interval length;
  2. every point maps to ONE bin: floor(p / width);
  3. every interval explodes to the bins it overlaps:
     floor(lo/width) .. floor(hi/width) — short intervals touch O(1)
     bins;
  4. equi-join on bin (hash/SMJ, shuffle-partitioned), then re-check the
     exact predicate.

No duplicates by construction: a (point, interval) pair meets only in
the point's single bin. Output == the naive join (probe-proven).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def binned_range_join(points: DataFrame, intervals: DataFrame,
                      point_col: str, lo_col: str, hi_col: str,
                      bin_width: float, how: str = "inner") -> DataFrame:
    """Join point rows to interval rows with ``lo <= point < hi``.

    ``bin_width`` tunes the tradeoff: smaller bins = more interval
    replicas but fewer false candidates per bin. Start near the median
    interval length.
    """
    p = points.withColumn(
        "__bin", F.floor(F.col(point_col) / bin_width).cast("long"))
    i = intervals.withColumn(
        "__bin", F.explode(F.sequence(
            F.floor(F.col(lo_col) / bin_width).cast("long"),
            F.floor(F.col(hi_col) / bin_width).cast("long"))))
    out = (p.join(i, "__bin", how)
           .filter((F.col(lo_col) <= F.col(point_col))
                   & (F.col(point_col) < F.col(hi_col)))
           .drop("__bin"))
    return out


def interval_overlap_join(left: DataFrame, right: DataFrame,
                          l_lo: str, l_hi: str, r_lo: str, r_hi: str,
                          bin_width: float) -> DataFrame:
    """Inner-join interval rows to interval rows on closed-interval
    overlap: ``l_lo <= r_hi AND r_lo <= l_hi``.

    Same binning rewrite as :func:`binned_range_join`, generalized to
    interval-vs-interval: both sides explode to every bin they touch
    (short intervals -> O(1) replicas), candidates meet via an
    equi-join on bin, and the exact predicate re-checks. An
    overlapping pair shares every bin the overlap spans, so the join
    keeps only the bin containing the overlap's START
    (``floor(greatest(l_lo, r_lo) / width)`` — inside both intervals
    by definition of overlap): each matching pair survives exactly
    once with no distinct/dedup shuffle.
    """
    def binned(df: DataFrame, lo: str, hi: str) -> DataFrame:
        return df.withColumn("__bin", F.explode(F.sequence(
            F.floor(F.col(lo) / bin_width).cast("long"),
            F.floor(F.col(hi) / bin_width).cast("long"))))

    start_bin = F.floor(
        F.greatest(F.col(l_lo), F.col(r_lo)) / bin_width).cast("long")
    return (binned(left, l_lo, l_hi)
            .join(binned(right, r_lo, r_hi), "__bin")
            .filter((F.col(l_lo) <= F.col(r_hi))
                    & (F.col(r_lo) <= F.col(l_hi))
                    & (F.col("__bin") == start_bin))
            .drop("__bin"))
