"""Two-dimensional skyline (Pareto frontier) via range-bucketed pruning.

``skyline_2d`` returns the distinct (x, y) pairs not dominated by any
other pair, where dominance means "at least as good in both dimensions
and strictly better in at least one" (Borzsony, Kossmann & Stocker,
"The Skyline Operator", ICDE 2001). x is always minimized; y is
minimized or maximized per ``maximize_y``.

Scale shape — the naive formulation (NOT EXISTS over the full table,
which is exactly the DuckDB oracle) is an O(n²) nested-loop; a single
global window ordered by x is exact but collapses the corpus into one
task. This implementation keeps both properties without either cost:

1. distinct (x, y) pairs (one hash aggregate — the skyline of the
   distinct set equals the skyline of the bag);
2. a 1-row min/max(x) rollup, broadcast back (the drift_ks totals
   rule: never a data-sized single-task window for a global scalar),
   assigns each pair a fixed-width x-bin — equal x always lands in one
   bin, so cross-bin rows differ strictly in x;
3. per-bin windows (parallel across bins) compute the running
   strictly-preceding min of y in (x asc, y asc) order — the classic
   2-D sweep, but restricted to each bin's rows;
4. the per-bin min-y table (``n_bins`` rows, tiny by construction) is
   the only single-task window: its strictly-preceding cumulative min
   gives each bin the best y seen in any lower-x bin, broadcast back.

A pair survives iff its y beats BOTH the local strictly-preceding min
and the lower-bins min. Correct because any dominator of p sorts
before p within p's bin (x <, or x = and y <) or lives in a lower bin
(x strictly <); in either case its y is <= p's y and is captured by
one of the two minima. Equal-(x,y) duplicates were already collapsed
by the distinct, and dominance requires strictness in one dimension,
so the strict ``<`` comparison is exact.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def skyline_2d(df: DataFrame, x_col: str, y_col: str,
               maximize_y: bool = False, n_bins: int = 64) -> DataFrame:
    """Distinct non-dominated (x, y) pairs; x minimized, y per flag.

    Returns columns (x_col, y_col). Rows with a NULL in either
    dimension are excluded (NULL is incomparable under dominance).
    """
    pairs = (df.select(F.col(x_col).alias("__x"), F.col(y_col).alias("__y"))
             .filter(F.col("__x").isNotNull() & F.col("__y").isNotNull())
             .distinct())
    # internal canonical form: minimize both dimensions
    ym = (-F.col("__y")) if maximize_y else F.col("__y")
    pairs = pairs.withColumn("__ym", ym.cast("double"))

    # global x extent: 1-row rollup broadcast back, never a global window
    extent = pairs.agg(F.min(F.col("__x").cast("double")).alias("__xlo"),
                       F.max(F.col("__x").cast("double")).alias("__xhi"))
    binned = (pairs.crossJoin(F.broadcast(extent))
              .withColumn(
                  "__bin",
                  F.when(F.col("__xhi") == F.col("__xlo"), F.lit(0))
                  .otherwise(F.least(
                      F.floor((F.col("__x").cast("double") - F.col("__xlo"))
                              / ((F.col("__xhi") - F.col("__xlo"))
                                 / F.lit(float(n_bins)))).cast("int"),
                      F.lit(n_bins - 1))))
              .drop("__xlo", "__xhi"))

    # per-bin sweep: strictly-preceding running min of ym in (x, ym) order
    wl = (Window.partitionBy("__bin").orderBy("__x", "__ym")
          .rowsBetween(Window.unboundedPreceding, -1))
    local = binned.withColumn("__prev_local", F.min("__ym").over(wl))

    # lower-bins best ym: n_bins-row table, the only single-task window
    wb = Window.orderBy("__bin").rowsBetween(Window.unboundedPreceding, -1)
    bins = (binned.groupBy("__bin").agg(F.min("__ym").alias("__bmin"))
            .withColumn("__prev_bins", F.min("__bmin").over(wb))
            .select("__bin", "__prev_bins"))

    out = (local.join(F.broadcast(bins), "__bin")
           .filter((F.col("__prev_local").isNull()
                    | (F.col("__ym") < F.col("__prev_local")))
                   & (F.col("__prev_bins").isNull()
                      | (F.col("__ym") < F.col("__prev_bins")))))
    return out.select(F.col("__x").alias(x_col), F.col("__y").alias(y_col))
