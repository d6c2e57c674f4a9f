"""Incremental aggregate maintenance via mergeable partial states.

The 100 TB move the reference's hourly batch layout begs for: never
re-aggregate history. Keep a per-key STATE table of algebraic
aggregate components — n, sum (exact decimal), min, max — and fold
each new batch in with one co-keyed merge:

    state(t)  = agg_state(batch_0)
    state(t+1) = merge_states(state(t), agg_state(batch_{t+1}))
    report    = finalize(state)   # avg = sum/n etc., derived at read

Every component is commutative + associative (sum as DECIMAL(18,2) is
also accumulation-order-exact), so merge order, batch boundaries and
partitioning never change the result — ``finalize(merge(a,b))`` is
bit-identical to a full recompute, which is exactly what the probe's
oracle asserts. Cost per batch: one shuffle of the batch's partial
states (rows = keys touched), never a history scan. Pair with a MERGE
upsert sink (etl/merge.py) for the persisted form.
"""

from __future__ import annotations

import functools

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def agg_state(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """Collapse a batch to per-key mergeable state (one shuffle)."""
    v = F.col(value_col)
    return df.groupBy(*keys).agg(
        F.count(v).alias("s_n"),
        F.sum(v.cast("decimal(18,2)")).alias("s_sum"),
        F.min(v).alias("s_min"),
        F.max(v).alias("s_max"),
    )


def merge_states(*states: DataFrame) -> DataFrame:
    """Merge state tables: union + one co-keyed re-aggregation."""
    if not states:
        raise ValueError("need at least one state table")
    unioned = functools.reduce(lambda a, b: a.unionByName(b), states)
    keys = [c for c in unioned.columns
            if c not in ("s_n", "s_sum", "s_min", "s_max")]
    return unioned.groupBy(*keys).agg(
        F.sum("s_n").alias("s_n"),
        F.sum("s_sum").alias("s_sum"),
        F.min("s_min").alias("s_min"),
        F.max("s_max").alias("s_max"),
    )


def finalize(state: DataFrame) -> DataFrame:
    """Derive the reportable aggregates from state columns."""
    keys = [c for c in state.columns
            if c not in ("s_n", "s_sum", "s_min", "s_max")]
    return state.select(
        *keys,
        F.col("s_n").alias("n"),
        F.col("s_sum").cast("double").alias("sum_value"),
        F.round(F.col("s_sum").cast("double") / F.col("s_n"), 2)
         .alias("avg_value"),
        F.col("s_min").alias("min_value"),
        F.col("s_max").alias("max_value"),
    )


def snapshot_diff(old: DataFrame, new: DataFrame, keys: list[str],
                  compare_cols: list[str] | None = None) -> DataFrame:
    """Row-level change data capture between two snapshots of a keyed
    table: one row per changed key with ``change`` in
    ('insert', 'delete', 'update').

    The complement of the MERGE sink (etl/merge.py): MERGE applies a
    change set; this RECOVERS the change set when the upstream only
    hands you full snapshots (the reference's full-prefix re-pulls are
    exactly this shape). ONE full-outer join on the key; change
    classification is a conjunction of null-safe column equalities
    (`eqNullSafe` — exact, engine-portable, no value stringification or
    hashing to disagree on). Unchanged keys drop out, so the output is
    the minimal delta; feed it back to merge_upsert to prove
    round-trip (pytest does).

    ``compare_cols`` defaults to every non-key column present in BOTH
    snapshots (schema evolution: a column only one side has can't vote).
    """
    compare = compare_cols or [
        c for c in old.columns
        if c not in keys and c in set(new.columns)]
    o = old.select(
        *[F.col(k).alias(f"__ko_{k}") for k in keys],
        *[F.col(c).alias(f"__o_{c}") for c in compare])
    n = new.select(
        *[F.col(k).alias(f"__kn_{k}") for k in keys],
        *[F.col(c).alias(f"__n_{c}") for c in compare])
    cond = functools.reduce(
        lambda a, b: a & b,
        [F.col(f"__ko_{k}").eqNullSafe(F.col(f"__kn_{k}")) for k in keys])
    same = functools.reduce(
        lambda a, b: a & b,
        [F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")) for c in compare],
        F.lit(True))
    in_old = F.col(f"__ko_{keys[0]}").isNotNull()
    in_new = F.col(f"__kn_{keys[0]}").isNotNull()
    change = (F.when(~in_old, F.lit("insert"))
              .when(~in_new, F.lit("delete"))
              .when(~same, F.lit("update")))
    return (o.join(n, cond, "full_outer")
            .withColumn("change", change)
            .filter(F.col("change").isNotNull())
            .select(*[F.coalesce(F.col(f"__kn_{k}"), F.col(f"__ko_{k}"))
                      .alias(k) for k in keys],
                    "change"))
