"""Registry invariants: the driver-contract regressions caught in r2.

The external driver verifies only a bounded prefix (~50) of the
`queries()` export; these tests pin that every probe needing fresh
driver verification stays inside it, and that the export stays
well-formed (a new probe with a careless priority once silently pushed
a must-reverify probe out of the window).
"""

from __future__ import annotations

from data_and_analytics_etl_spark.queries import REGISTRY, oracle_sql, queries

DRIVER_WINDOW = 50

#: Probes that MUST hold a fresh driver-verified row this round:
#: r1 hash-fail repairs + every family added in r2.
MUST_BE_IN_WINDOW = {
    "filter_predicates", "math_funcs", "agg_minmax_by",       # r1 repairs
    "q1_pricing_summary", "q3_shipping_priority", "q5_star_join",
    "q6_forecast_revenue",                                     # bench
    "window_ranking", "window_range_frame", "sessionization",  # windows
    "dedup_exact", "neardup_ngram_jaccard", "cosine_topk",
    "text_stats", "text_quality_filter",                       # LLM tier
    "etl_partitioned_roundtrip", "etl_incremental_overlap_dedup",
    "scan_json", "scan_csv", "rest_datasource_scan",           # ETL/IO
    "stream_tumbling_agg", "stream_session_window",            # streaming
    "udf_scalar", "udf_grouped_agg", "udf_table_function",     # UDFs
}


def test_window_holds_every_must_verify_probe():
    window = list(queries())[:DRIVER_WINDOW]
    missing = MUST_BE_IN_WINDOW - set(window)
    assert not missing, (
        f"probes pushed out of the driver's {DRIVER_WINDOW}-probe "
        f"verification window: {sorted(missing)} — rebalance priorities "
        "in their @query decorators")


def test_export_is_priority_sorted_and_complete():
    names = list(queries())
    assert len(names) == len(REGISTRY)
    prios = [REGISTRY[n].priority for n in names]
    assert prios == sorted(prios), "export must be priority-ordered"


def test_every_oracle_belongs_to_a_query():
    qs, os_ = queries(), oracle_sql()
    assert set(os_) <= set(qs)
    # deterministic probes dominate: rows-only stays the exception
    assert len(os_) / len(qs) >= 0.85, (
        f"only {len(os_)}/{len(qs)} probes are oracle-checked")


def test_rows_only_probes_document_why():
    for name, spec in REGISTRY.items():
        if spec.oracle is None:
            assert spec.doc, f"{name}: rows-only probe without rationale"
