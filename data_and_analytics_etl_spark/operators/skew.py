"""Skew mitigation helpers (SURVEY §4.3 "100 TB posture").

AQE's skew-join splitting handles most hot keys at runtime
(`spark.sql.adaptive.skewJoin.enabled`, on in session.py); explicit
salting is the fallback for the cases AQE can't fix — e.g. a single
key holding >1 partition of data on BOTH sides, or aggregations (AQE
skew handling only applies to joins).

`salted_join` produces results identical to a plain equi-join (probe
`join_salted` hash-checks that), so it is a drop-in under skew.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def salted_join(big: DataFrame, small: DataFrame, on: list[str],
                salt_source: Column, buckets: int = 16,
                how: str = "inner") -> DataFrame:
    """Equi-join with the big side's hot keys split across ``buckets``.

    - big side: deterministic salt in [0, buckets) derived from
      ``salt_source`` (any expression that varies within a key group —
      a line number, a unique id); rows of one hot key now spread over
      ``buckets`` shuffle partitions.
    - small side: replicated ``buckets`` x via an exploded sequence, so
      every (key, salt) bucket finds its match.

    Wire cost: small side inflates by ``buckets`` (use only when the
    small side is modest and the key histogram is genuinely skewed);
    result is exactly the plain join — same rows, no dupes, because
    each big row joins exactly one replica.
    """
    salted_big = big.withColumn("__salt",
                                F.pmod(F.xxhash64(salt_source), buckets)
                                .cast("int"))
    salted_small = (small
                    .withColumn("__salt",
                                F.explode(F.sequence(F.lit(0),
                                                     F.lit(buckets - 1))))
                    .withColumn("__salt", F.col("__salt").cast("int")))
    return (salted_big.join(salted_small, [*on, "__salt"], how)
            .drop("__salt"))


#: partial-aggregate expression and merge expression per supported kind.
#: Every kind is algebraically mergeable, so phase 2 is exact.
_SALTED_KINDS = ("count", "sum", "min", "max", "avg")


def salted_agg(df: DataFrame, keys: list[str], salt_source: Column,
               aggs: list[tuple[str, str | None, str]],
               buckets: int = 16) -> DataFrame:
    """Two-phase GROUP BY with hot keys split across ``buckets`` salts.

    AQE's skew handling only applies to JOINS — a skewed aggregation
    key still lands one monster task. Spark's partial (map-side)
    aggregation usually absorbs it, but high-cardinality-per-key
    payloads (e.g. count DISTINCT-ish state, wide agg buffers) can
    defeat the partial layer; this operator makes the split explicit:

    - phase 1 groups by (keys, salt) where salt = hash(salt_source) %
      ``buckets`` — one hot key now fans over ``buckets`` reducers;
    - phase 2 merges the ``buckets`` partial states per key — input is
      at most ``buckets`` rows per key, never the raw payload.

    ``aggs`` is a list of (kind, column, alias) with kind in
    ``count|sum|min|max|avg`` (``column`` ignored for count). All kinds
    are algebraically mergeable, so the result is EXACTLY the plain
    single-phase GROUP BY (probe ``agg_salted_twophase`` hash-checks
    that). Sums over doubles should pre-cast to DECIMAL per the float
    determinism rule — pass the cast column name via a withColumn.
    """
    for kind, _, _ in aggs:
        if kind not in _SALTED_KINDS:
            raise ValueError(f"unsupported agg kind {kind!r}")
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(salt_source), F.lit(buckets)))
    partials: list[Column] = []
    merges: list[Column] = []
    for i, (kind, col, alias) in enumerate(aggs):
        p = f"__p{i}"
        if kind == "count":
            partials.append(F.count(F.lit(1)).alias(p))
            merges.append(F.sum(p).alias(alias))
        elif kind == "sum":
            partials.append(F.sum(col).alias(p))
            merges.append(F.sum(p).alias(alias))
        elif kind == "min":
            partials.append(F.min(col).alias(p))
            merges.append(F.min(p).alias(alias))
        elif kind == "max":
            partials.append(F.max(col).alias(p))
            merges.append(F.max(p).alias(alias))
        else:  # avg: merge (sum, count) partial states, ONE division
            partials.append(F.sum(col).alias(p))
            partials.append(F.count(col).alias(p + "n"))
            merges.append(
                (F.sum(p) / F.sum(p + "n")).alias(alias))
    return (salted.groupBy(*keys, "__salt").agg(*partials)
            .groupBy(*keys).agg(*merges))


def key_histogram(df: DataFrame, key_cols: list[str], top: int = 20,
                  ) -> DataFrame:
    """Per-key row counts, heaviest first — the diagnostic that decides
    whether salting is warranted (one aggregate, bounded output)."""
    return (df.groupBy(*key_cols)
            .agg(F.count(F.lit(1)).alias("n_rows"))
            .orderBy(F.desc("n_rows"), *key_cols)
            .limit(top))


def hash_prefilter_semi_join(fact: DataFrame, keys: DataFrame,
                             on: list[str], buckets: int = 1 << 17,
                             ) -> DataFrame:
    """Semi-join ``fact`` to ``keys`` with a broadcast hash-bucket
    prefilter — the manual form of Spark's runtime bloom-filter join
    (`spark.sql.optimizer.runtime.bloomFilter.enabled`), for when the
    key side is too big to broadcast whole but its bucket fingerprint
    is not.

    Stage 1 collapses the key side to DISTINCT ``xxhash64(key) %
    buckets`` ints (<= buckets rows ~= 1 MB broadcast); fact rows
    whose bucket misses cannot match and drop BEFORE the shuffle —
    at low selectivity this cuts the big side's shuffle volume by the
    miss rate, which is the whole cost of a semi-join at 100 TB.
    Stage 2 is the exact semi-join over survivors, so false bucket
    collisions are removed and the result equals the plain semi-join
    row-for-row (probe-verified).
    """
    kcols = [F.col(c) for c in on]
    kb = (keys.select(F.pmod(F.xxhash64(*kcols), F.lit(buckets))
                      .alias("__kb"))
          .distinct())
    pruned = (fact.withColumn("__kb", F.pmod(F.xxhash64(*kcols),
                                             F.lit(buckets)))
              .join(F.broadcast(kb), "__kb", "leftsemi")
              .drop("__kb"))
    return pruned.join(keys.select(*on).distinct(), on, "leftsemi")
