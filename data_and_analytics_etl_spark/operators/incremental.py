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
from pyspark.sql import DataFrame, Window


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


def apply_changelog(base: DataFrame, changes: DataFrame, keys: list[str],
                    seq_col: str, op_col: str,
                    delete_op: str = "D") -> DataFrame:
    """Apply an ordered CDC changelog onto a base snapshot: for every
    key, the surviving row is the HIGHEST-sequence change (upsert wins
    with its payload, a delete removes the key); keys untouched by the
    changelog keep their base row.

    The missing third of the incremental story: agg_state/merge_states
    maintain aggregates, snapshot_diff recovers a delta, and this
    APPLIES a delta stream — the Debezium/binlog-consumer shape (the
    reference's per-record push path replays exactly such a stream,
    CommCareAPIHandler.py:214-260, one op per changed record).

    Contract: ``changes`` carries the key columns, ``seq_col`` (a total
    order per key — log offset, LSN, commit timestamp), ``op_col``
    ('U' upsert / ``delete_op``), and the full payload for upserts.
    Base rows participate as sequence -inf upserts, so a base row never
    outranks any change. Ties on (key, seq) resolve to the upsert:
    the sort key is the BOOLEAN ``op == delete_op`` ascending (false
    first), never the op literals themselves — 'U' happens to sort
    after 'D' lexicographically, but a caller-supplied
    ``delete_op='delete'`` paired with op 'U' would invert a
    string-ordered tie rule, so the rule must not depend on spelling.

    Plan: union + ONE window (partitionBy key, orderBy seq desc,
    row_number = 1) + a delete filter — one shuffle on the key, no
    joins, no driver state. At 100 TB the window partitions by the
    key, so skew only matters if one key receives a pathological share
    of the changelog; sequence ordering within a key is preserved
    regardless of input partitioning.
    """
    payload = [c for c in base.columns if c not in keys]
    tagged_base = base.select(
        *keys, *payload,
        F.lit(None).cast("long").alias("__seq"),
        F.lit("U").alias("__op"))
    tagged_changes = changes.select(
        *keys, *payload,
        F.col(seq_col).cast("long").alias("__seq"),
        F.col(op_col).alias("__op"))
    unioned = tagged_base.unionByName(tagged_changes)
    w = (Window.partitionBy(*keys)
         .orderBy(F.col("__seq").desc_nulls_last(),
                  (F.col("__op") == delete_op).asc()))
    return (unioned
            .withColumn("__rn", F.row_number().over(w))
            .filter((F.col("__rn") == 1) & (F.col("__op") != delete_op))
            .select(*keys, *payload))


def join_delta(a_old: DataFrame, a_delta: DataFrame,
               b_old: DataFrame, b_delta: DataFrame,
               on: list[str]) -> DataFrame:
    """Incremental inner-join maintenance: the DELTA of A ⋈ B when both
    sides receive inserts, without re-joining the old sides.

        Δ(A ⋈ B) = ΔA ⋈ B ∪ A ⋈ ΔB ∪ ΔA ⋈ ΔB
                 = ΔA ⋈ B_old ∪ (A_old ∪ ΔA) ⋈ ΔB

    (folding the ΔA⋈ΔB cross term into the second join keeps it two
    joins instead of three). Appending the returned frame to the
    previously materialized A_old ⋈ B_old is bag-equal to recomputing
    (A_old ∪ ΔA) ⋈ (B_old ∪ ΔB) from scratch — the oracle probe
    asserts exactly that. Insert-only deltas (the hourly-batch case);
    deletes/updates route through apply_changelog first.

    Scale shape: both joins shuffle only a DELTA on one side; when the
    delta is batch-sized (hours, not history) Catalyst/AQE broadcasts
    it and the old-side scan never shuffles at all — the whole point
    of maintaining instead of recomputing at 100 TB.
    """
    a_new = a_old.unionByName(a_delta)
    return (a_delta.join(b_old, on, "inner")
            .unionByName(a_new.join(b_delta, on, "inner")))
