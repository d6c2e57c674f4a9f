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
