"""Data layout: Z-order (Morton) clustering for multi-dim file pruning.

At 100 TB the scan you avoid beats any scan you optimize. Sorting a
table by one column gives tight per-file min/max on that column only;
interleaving the bits of several columns (Morton order) gives every
participating column partially-clustered files, so footer-level
min/max pruning works for predicates on ANY of them. This is the same
idea behind Delta/Iceberg OPTIMIZE ZORDER — here as a plain column
expression + repartitionByRange write, no table format required.

The interleave is pure integer arithmetic (shifts/masks inside
codegen), deterministic and engine-neutral — the probe oracle spells
the identical arithmetic in SQL.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def zorder_key(cols: list[Column], bits: int = 16) -> Column:
    """Morton-interleave ``bits`` low bits of each (integer) column.

    Column i contributes bit b to output position b*len(cols)+i. With
    the default 16 bits and up to 4 columns the key fits a long.
    Inputs must already be non-negative ints in [0, 2^bits) — scale
    floats with ``normalize_to_bits`` first.
    """
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    if bits * len(cols) > 63:
        raise ValueError("interleaved key would overflow a long")
    n = len(cols)
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            key = key + (F.shiftleft(bit, b * n + i))
    return key


def normalize_to_bits(col: Column, lo: float, hi: float,
                      bits: int = 16) -> Column:
    """Min-max scale a numeric column onto [0, 2^bits) integers.
    (lo, hi) usually come from a tiny pre-aggregation; values outside
    clamp to the edges."""
    span = hi - lo
    scaled = (col.cast("double") - F.lit(lo)) / F.lit(span) * F.lit(
        float(2 ** bits))
    return F.least(F.greatest(F.floor(scaled), F.lit(0)),
                   F.lit(2 ** bits - 1)).cast("long")


def zorder_write(df: DataFrame, cols: list[Column], path: str,
                 num_files: int, bits: int = 16) -> None:
    """Write parquet clustered by Z-order: range-partition on the
    Morton key (sampled range bounds -> balanced files), sort within
    partitions, drop the key. One shuffle, same cost shape as any
    global sort write."""
    keyed = df.withColumn("__zkey", zorder_key(cols, bits))
    (keyed.repartitionByRange(num_files, "__zkey")
     .sortWithinPartitions("__zkey")
     .drop("__zkey")
     .write.mode("overwrite").parquet(path))


# --- Bloom-filter partition index: key-level data skipping -----------------

def _hex_digit(h: Column, p: int) -> Column:
    """Value of lowercase hex digit ``p`` (1-based) of a digest string —
    pure ascii arithmetic every SQL engine computes identically (the
    simhash bit-extraction rule, dedup.py)."""
    a = F.ascii(F.substring(h, p, 1))
    return F.when(a >= 97, a - 87).otherwise(a - 48)


def _bloom_bucket(key: Column, j: int) -> Column:
    """Hash function j of the portable bloom family: the first three
    hex digits of md5('<j>|' || key) as an integer in [0, 4096)."""
    h = F.md5(F.concat(F.lit(f"{j}|"), key.cast("string")))
    return (_hex_digit(h, 1) * 256 + _hex_digit(h, 2) * 16
            + _hex_digit(h, 3))


BLOOM_M = 4096  # 16^3: three hex digits index the bit array exactly


def bloom_partition_index(df: DataFrame, part_cols: list[str],
                          key_col: str, k: int = 3) -> DataFrame:
    """Per-partition bloom filter over a key column, AS A TABLE:
    (partition cols…, bucket) — the set bits of each partition's
    filter.

    The min/max footer stats Z-ordering exploits (zorder_write) cannot
    skip on a HIGH-CARDINALITY point lookup (every partition's
    [min,max] spans the key space); a bloom index can — this is
    Delta/Hudi's bloom index re-expressed relationally. Each row
    contributes k = 3 salted md5 buckets in [0, 4096); ONE distinct
    aggregate collapses 100 TB to ≤ partitions × 4096 index rows,
    map-side combined. The portable hash family (ascii-arithmetic hex
    digits) makes the whole index an exact cross-engine expression —
    the index CONTENT oracle-checks, not just its behavior.
    """
    buckets = F.array(*[_bloom_bucket(F.col(key_col), j)
                        for j in range(k)])
    return (df.select(*part_cols, F.explode(buckets).alias("bucket"))
            .distinct())


def bloom_prune(index: DataFrame, probes: DataFrame, key_col: str,
                part_cols: list[str], k: int = 3) -> DataFrame:
    """Qualify partitions for point-lookup keys: (probe key, partition)
    survives iff ALL k of the key's buckets are set in that
    partition's filter — the standard bloom conjunction, as one
    equi-join on bucket + a count filter.

    NO FALSE NEGATIVES by construction (a partition holding the key
    set all k of its buckets — pytest-pinned); false positives only
    waste a partition read. The join runs index-size × probe-size,
    never data-size: this is the scan-planning step that turns a
    100 TB point lookup into a handful of partition reads.
    """
    pk = (probes.select(F.col(key_col).alias("__key"))
          .distinct()
          .select("__key",
                  F.explode(F.array_distinct(
                      F.array(*[_bloom_bucket(F.col("__key"), j)
                                for j in range(k)])))
                  .alias("bucket")))
    # the k salted hashes of one key may collide into fewer DISTINCT
    # buckets — require presence of the key's own distinct set, not a
    # literal k, or a self-colliding key could never qualify anywhere
    need = pk.groupBy("__key").agg(F.count(F.lit(1)).alias("__need"))
    hits = (pk.join(index, "bucket")
            .groupBy("__key", *part_cols)
            .agg(F.count(F.lit(1)).alias("__nb")))
    return (hits.join(F.broadcast(need), "__key")
            .filter(F.col("__nb") == F.col("__need"))
            .select(F.col("__key").alias(key_col), *part_cols))


def zonemap_index(df: DataFrame, part_cols: list[str],
                  value_cols: list[str]) -> DataFrame:
    """Per-partition zone maps: (partition cols…, lo_<c>, hi_<c>,
    n_rows) — the min/max footer statistics every columnar format
    keeps, materialized AS A TABLE so scan planning is a relational
    operation (the Iceberg/Delta manifest-stats idea; complements the
    bloom index, which handles the point lookups zone maps cannot).

    ONE hash aggregate with map-side combine collapses 100 TB to one
    row per partition; NULLs are ignored by min/max, so an all-NULL
    partition yields NULL bounds (prunable by every range — correct,
    NULL never matches a range predicate)."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in value_cols:
        aggs += [F.min(c).alias(f"lo_{c}"), F.max(c).alias(f"hi_{c}")]
    return df.groupBy(*part_cols).agg(*aggs)


def zonemap_prune(index: DataFrame, value_col: str,
                  lo, hi) -> DataFrame:
    """Partitions a range predicate ``value_col BETWEEN lo AND hi``
    must read: those whose [lo_c, hi_c] zone intersects the query
    range — interval overlap on the index table (index-sized work,
    never data-sized; the planning step that turns a full scan into a
    handful of partition reads when the data is range-clustered, e.g.
    by zorder_write).

    NO FALSE NEGATIVES: a partition holding a matching row has
    lo_c <= hi and hi_c >= lo by definition of min/max; false
    positives only waste a partition read."""
    return index.filter((F.col(f"lo_{value_col}") <= F.lit(hi))
                        & (F.col(f"hi_{value_col}") >= F.lit(lo)))
