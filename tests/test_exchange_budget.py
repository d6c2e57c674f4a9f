"""Shuffle budgets for the bench-critical probes, pinned as CI.

SCALE.md's per-operator claims ("one shuffle on the key", "3 broadcast
dims + 2 fact-fact shuffles") are prose; this suite pins the number of
Exchange nodes each bench-mapped plan is ALLOWED to contain, so a
regression that silently adds a shuffle (a lost broadcast hint, a
repartition sneaking in, AQE disabled on a path) fails the suite
instead of showing up as a 2× driver bench number two rounds later.

ReusedExchange is excluded: exchange reuse means the data crosses the
wire once, which is the thing the budget measures. Budgets are the
CURRENT measured counts — the contract is "never more"; if a rewrite
legitimately needs another shuffle, change the budget in the same
commit and say why. The transitive closure is iterative (its exchange
count scales with rounds x per-round joins), so it gets a loose bound
tied to its round count instead of an exact pin.
"""

from __future__ import annotations

import pytest

from data_and_analytics_etl_spark.queries import REGISTRY

#: probe -> max Exchange nodes (ReusedExchange excluded), measured at
#: sf0.01 with shuffle.partitions=32 (r7 third session).
EXCHANGE_BUDGETS = {
    "q1_pricing_summary": 3,
    "q3_shipping_priority": 3,
    "q5_star_join": 7,
    "topk_per_group": 2,
    "window_running_agg": 2,
    # 3 → 4 in the r13 optimization round: cosine_topk gained the
    # ensure_fanout_parallelism round-robin exchange on the corpus
    # side — a one-partition corpus scan serialized the whole
    # |corpus|×|probes| scoring pass on one core (25.8 s of the
    # mutual-5NN substrate's 30.6 s wall at sf0.1; 2.5 s after).
    # The guard is a no-op once the corpus is multi-partition, but
    # the budget pins the worst case.
    "cosine_topk": 4,
    "dedup_exact": 2,
    "dedup_minhash_lsh": 9,
    "sessionization": 2,
    "q10_returned_revenue": 4,
    "q7_nation_volume": 8,
    "corpus_span_duplication": 4,
    "drift_ks_exact": 10,
    "corpus_curation_pipeline": 19,
    "corpus_segment_dedup": 3,
    # r9 cohort (measured at registration; bench-mapped: spearman b20,
    # heavy hitters b21)
    "agg_theil_index": 5,
    "stats_anova_oneway": 5,
    # 19 -> 22 in r14: the shared y-side rank table (t1) is now
    # explicitly persisted (A/B: persist min 1.647 s vs AQE-reuse
    # 2.407 s at sf0.1, 8.18 vs 8.36 at sf1, jobs 17 -> 15 — see
    # OPTIMIZATION_r14.md). The static count RISES because the cache
    # boundary stops the planner's static ReuseExchange from
    # collapsing the subtree copies it used to; at runtime the cached
    # t1 executes ONCE and both consumers read InMemoryTableScan, so
    # actual wire crossings went DOWN. test_plan_contracts pins the
    # cache + reuse shape.
    "stats_spearman_corr": 22,
    "geo_dbscan_core_points": 4,
    "sketch_freq_heavy_hitters": 6,
    "eval_pr_auc": 5,
    "timeseries_sax_symbols": 3,
    # r9 second/third cohorts (measured at registration)
    "stats_levene_bf": 9,
    "timeseries_bollinger": 3,
    "join_asof_nearest": 2,
    "sample_systematic": 9,
    "stats_logrank_split": 7,
    "eval_mcnemar_paired": 1,
    "timeseries_cross_correlation": 5,
    "analytics_cohort_ltv": 9,
    "feature_chi2_ranking": 3,
    # r12 cohort (measured at registration, sf0.001, partitions=32)
    "agg_percentile_cont_disc": 2,
    "timeseries_theil_sen": 8,
    # fixed 2-round Lloyd + final assign + search: the per-round
    # centroid persist truncates the corpus-rescan lineage, so the
    # count is stable round-to-round (38 = assign windows + cell/pos
    # aggs + search window at iters=2)
    "ann_ivf_grid": 38,
    # r13 cohort (measured at registration, sf0.001, partitions=32):
    # the PQ trainer is the same fixed-round Lloyd shape at (sub,
    # code) grain (measured 41); IVFPQ composes BOTH trainers plus
    # routing (measured 77)
    "ann_pq_grid": 45,
    "ann_ivfpq_grid": 85,
    "agg_string_agg_ordered": 2,
}

#: iterative plans: rounds x per-round joins; bound loosely so a round
#: -count change doesn't false-alarm but a per-round blowup still does
LOOSE_BUDGETS = {
    "graph_transitive_closure": 120,
    # 3 synchronous LPA rounds x (join + two aggs + isolated-node
    # left join) over an accumulating lazy plan
    "graph_label_propagation_sync": 30,
    # r12: the same doubling loop + a seed groupBy-min that the
    # logical tree copies per round (measured 166/173 at sf0.001;
    # per-round persist means each copy executes once)
    "graph_weighted_shortest_paths": 175,
    "graph_effective_diameter": 185,
    # r13: 6 register-max rounds, lineage truncated every 3rd round —
    # the two lazy-persist rounds between truncation points each leave
    # their (bounded) doubled subtree in the final union's plan
    # (measured 299 at sf0.001)
    "graph_hyperball_nf": 320,
}


def _count_exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(1 for line in plan.splitlines()
               if "Exchange" in line and "ReusedExchange" not in line)


@pytest.mark.parametrize("name", sorted(EXCHANGE_BUDGETS))
def test_exchange_budget(spark, sf_dir, name):
    df = REGISTRY[name].fn(spark, sf_dir)
    got = _count_exchanges(df)
    budget = EXCHANGE_BUDGETS[name]
    assert got <= budget, (
        f"{name}: {got} Exchange nodes > budget {budget} — a shuffle "
        "was added to a bench-critical plan; remove it or justify the "
        "new budget in this file")


@pytest.mark.parametrize("name", sorted(LOOSE_BUDGETS))
def test_exchange_budget_iterative(spark, sf_dir, name):
    df = REGISTRY[name].fn(spark, sf_dir)
    got = _count_exchanges(df)
    assert got <= LOOSE_BUDGETS[name]
