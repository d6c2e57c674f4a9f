"""Driver-verification backlog ledger (r7 verdict task 1).

55 oracle-backed probes had never appeared in ANY driver CORRECTNESS
artifact as of round 7 — green in every local sweep, but the driver
artifact is the hard signal. These tests make the drain enforceable:

1. the r7 backlog is pinned as a literal (computed once from
   union(CORRECTNESS_r01..r07) vs oracle_sql(), re-derived below);
2. every backlog member must be either pinned in this round's window
   (ROUND_TIERS) or on the bounded DEFERRED_BACKLOG list;
3. the deferral is one round only: at VERIFY_ROUND >= 9 the deferred
   probes MUST be pinned — the backlog shrinks monotonically to zero
   and can never silently re-grow for pre-r8 probes.

New probes registered in later rounds form their own backlog; the
existing no-round-closes-unswept test plus the next round's tier-30
pins cover them (the r6/r7 pattern).
"""

from __future__ import annotations

import glob
import json
import os

from data_and_analytics_etl_spark.queries import oracle_sql
from data_and_analytics_etl_spark.queries.registry import (
    DEFERRED_BACKLOG, ROUND_TIERS, VERIFY_ROUND)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: union(CORRECTNESS_r01..r07) vs oracle_sql() as of the r8 session
#: start — the r7 verdict's 55. Frozen here so the accounting can't
#: drift with later artifacts.
R7_BACKLOG = frozenset({
    "agg_boolean_family", "agg_mode_per_group",
    "analytics_capstone_funnel_retention", "corpus_curriculum_order",
    "corpus_nutrition_label", "corpus_shard_assign",
    "dedup_survivorship", "etl_compact_partitions",
    "etl_merge_schema_evolution", "etl_partition_checksums",
    "etl_schema_drift", "etl_version_travel", "etl_write_audit_publish",
    "eval_accuracy_overall", "eval_binary_auc", "eval_calibration_lift",
    "eval_classification_report", "eval_cohen_kappa",
    "eval_cost_sensitive", "eval_map_at_k", "eval_matryoshka_truncation",
    "eval_ranking_ndcg", "feature_impute_median", "feature_quantile_rank",
    "feature_scale_minmax", "graph_hierarchy_rollup", "graph_sssp_hops",
    "graph_triangle_count", "incremental_quantile_merge",
    "interval_coverage", "join_asof_tolerance", "layout_bloom_prune",
    "layout_zonemap_prune", "neardup_containment", "privacy_dp_counts",
    "privacy_l_diversity", "profile_interarrival_burstiness",
    "sample_quota_allocation", "scan_parquet_merge_schema",
    "sketch_join_cardinality", "stream_cdc_apply_sink",
    "stream_novelty_filter", "stream_static_join",
    "stream_stream_left_outer", "stream_versioned_sink",
    "stream_windowed_distinct_users", "survival_kaplan_meier",
    "text_bm25_scores", "text_inverted_index",
    "timeseries_anomaly_rolling_z", "timeseries_anomaly_seasonal_z",
    "timeseries_decompose_seasonal", "timeseries_pct_change",
    "udf_nfc_normalize", "window_ratio_to_report",
})


def _driver_verified() -> set[str]:
    seen: set[str] = set()
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        with open(f) as fh:
            seen |= set(json.load(fh))
    return seen


def test_r7_backlog_literal_matches_artifacts():
    """The frozen 55 really are the never-driver-verified set as of
    r01..r07 (guards against a typo'd literal making the ledger lie).
    Later artifacts can only REMOVE members (that's the drain), so the
    assertion is one-sided where r08+ artifacts exist."""
    seen_r07 = set()
    for r in range(1, 8):
        path = os.path.join(REPO, f"CORRECTNESS_r{r:02d}.json")
        with open(path) as fh:
            seen_r07 |= set(json.load(fh))
    backlog = set(oracle_sql()) - seen_r07
    # probes registered in r8+ are NOT part of the frozen r7 ledger
    assert R7_BACKLOG <= backlog
    # and nothing in the ledger was actually verified before r8
    assert not (R7_BACKLOG & seen_r07)


def test_backlog_is_fully_accounted_for():
    """Every r7-backlog probe is driver-verified already, pinned
    in-window this round, or on the bounded deferral list — no member
    may sit in the rotation pool where the drain would stall. (From r9
    on, a driver CORRECTNESS row is the terminal account: 45 of the 55
    drained in r8, the deferred 10 are pinned this round.)"""
    pinned = {n for n in R7_BACKLOG if n in ROUND_TIERS}
    unaccounted = (R7_BACKLOG - pinned - DEFERRED_BACKLOG
                   - _driver_verified())
    assert not unaccounted, (
        f"r7-backlog probes neither driver-verified, pinned, nor "
        f"deferred: {sorted(unaccounted)}")
    assert DEFERRED_BACKLOG <= R7_BACKLOG
    assert len(DEFERRED_BACKLOG) <= 10, (
        "deferral list may only shrink — the backlog drains, it "
        "doesn't roll")


def test_deferral_expires_at_round_nine():
    """At r9+ every still-unverified r7-backlog probe must be PINNED
    (tier < 100); the deferred set may no longer excuse absence. This
    is the monotone-shrink enforcement: the set
    (R7_BACKLOG - driver_verified) loses members every round and the
    tiers must chase it to empty."""
    still_unverified = R7_BACKLOG - _driver_verified()
    if VERIFY_ROUND <= 8:
        # r8: pins + deferrals already asserted above
        assert still_unverified <= set(ROUND_TIERS) | DEFERRED_BACKLOG
        return
    not_pinned = sorted(still_unverified - set(ROUND_TIERS))
    assert not not_pinned, (
        f"round {VERIFY_ROUND}: r7-backlog probes still never "
        f"driver-verified and not pinned in ROUND_TIERS: {not_pinned}")


def test_backlog_shrinks_monotonically():
    """Once CORRECTNESS_r08 exists, the unverified remainder must be
    at most the deferred 10; each later round's artifact may only
    shrink it further (enforced transitively by the r9 pin test)."""
    r08 = os.path.join(REPO, "CORRECTNESS_r08.json")
    if not os.path.exists(r08):
        return  # pre-artifact: the pin tests above are the gate
    still = R7_BACKLOG - _driver_verified()
    # a member may outlive the deferral list ONLY while pinned in the
    # current round's window (its CORRECTNESS row lands when the driver
    # runs; until then the pin IS the drain commitment)
    unpinned = still - set(ROUND_TIERS)
    assert len(unpinned) <= len(DEFERRED_BACKLOG), (
        f"backlog grew or failed to drain: {sorted(unpinned)}")
