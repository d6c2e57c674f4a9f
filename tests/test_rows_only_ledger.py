"""Rows-only ledger: terminal accounting for oracle-less probes
(r10 verdict task 5).

24 probes carry no DuckDB oracle by design. COVERAGE.md justifies each
in prose, but prose doesn't gate registration — this module does.
Every ``oracle=None`` probe must hold a ledger row naming:

1. its ORACLE-IMPOSSIBILITY CLASS (the bounded enum below — a new
   class needs a new entry here, which is the review hook), and
2. its PYTEST EVIDENCE: an existing test file plus a symbol that file
   must actually contain (so the pointer can't rot silently).

Registering a new oracle-less probe without a ledger row turns the
suite red; removing a probe leaves a stale row that also turns it red.
The classes:

- approx-contract     SURVEY marks the family ±; accuracy-vs-exact
                      pytest is the contract.
- engine-sketch       binary sketch registers / engine-defined
                      estimator internals; identity/accuracy pytests.
- float-index         engine-internal float index training (k-means
                      centroids, random hyperplanes); recall pytests.
- engine-twin         a hash-checked md5/integer TWIN probe carries
                      the oracle for the shared pipeline code; the
                      production path differs only in hash/float
                      primitive.
- non-sql-loop        data-dependent iteration (argmax loops,
                      recursion to a data-dependent depth) not
                      expressible as one SQL query; reference-equality
                      pytests are stronger than a hash.
- binary-payload      consumes binary decode (WAV/BMP/DCT/zlib)
                      DuckDB SQL cannot perform; pinned-stat pytests.
- engine-only-surface Spark functions DuckDB lacks by definition;
                      the rows-only driver check plus the oracle
                      sweep's execution is the evidence.
"""

from __future__ import annotations

import os

from data_and_analytics_etl_spark.queries import REGISTRY

TESTS_DIR = os.path.dirname(os.path.abspath(__file__))

CLASSES = frozenset({
    "approx-contract", "engine-sketch", "float-index", "engine-twin",
    "non-sql-loop", "binary-payload", "engine-only-surface",
})

#: probe -> (class, evidence file, symbol the file must contain).
ROWS_ONLY_LEDGER: dict[str, tuple[str, str, str]] = {
    "agg_approx_count_distinct":
        ("approx-contract", "test_operators.py", "approx_count_distinct"),
    "agg_approx_percentile":
        ("approx-contract", "test_operators.py", "approx_percentile"),
    "agg_hll_sketch_merge":
        ("engine-sketch", "test_operators.py", "hll_sketch"),
    "sketch_hll_incremental_distinct":
        ("engine-sketch", "test_analytics.py", "hll_build"),
    "ann_lsh": ("float-index", "test_llmdata.py", "brp"),
    # r12: upgraded float-index -> engine-twin. ann_ivf_grid (round12.py)
    # is the hash-checked integer-grid k-means twin carrying the oracle
    # for the shared IVF pipeline shape (train -> cell index -> n_probe
    # pruned search -> exact re-rank); ann_ivf keeps the production
    # pyspark.ml float KMeans trainer, which remains oracle-impossible
    # (engine-internal float iterations), exactly the pagerank/
    # pagerank_iter relationship.
    "ann_ivf": ("engine-twin", "test_llmdata.py", "ivf_ann"),
    # r13: upgraded float-index -> engine-twin (r12 verdict task 2 —
    # the ann_ivf_grid move applied to PQ). ann_pq_grid / ann_ivfpq_grid
    # (round13.py) are the hash-checked integer-grid twins carrying the
    # oracle for the shared PQ/IVFPQ pipeline shapes (per-subspace
    # codebook training -> ADC scan -> exact re-rank; + coarse cell
    # routing for IVFPQ); ann_pq / ann_ivfpq keep the production
    # pyspark.ml float KMeans trainers, which remain oracle-impossible
    # (engine-internal float iterations). The k-means float-index class
    # is now EMPTY — every remaining float-index row is the random-
    # hyperplane family, whose deterministic sibling (ann_signcell /
    # semantic_dedup) is a different quantizer, not a twin of the same
    # trainer, so those stay honestly float-index.
    "ann_pq": ("engine-twin", "test_llmdata.py", "pq_ann"),
    "ann_ivfpq": ("engine-twin", "test_llmdata.py", "ivfpq"),
    "sample_diverse_selection":
        ("float-index", "test_llmdata.py", "select_diverse"),
    "neardup_embedding_lsh":
        ("float-index", "test_llmdata.py", "cosine_neardup_lsh"),
    "dedup_minhash_lsh": ("engine-twin", "test_llmdata.py", "minhash"),
    "dedup_simhash": ("engine-twin", "test_llmdata.py", "simhash"),
    "sketch_cms_topk": ("engine-twin", "test_analytics.py", "cms_"),
    "sample_weighted_reservoir":
        ("engine-twin", "test_analytics.py", "weighted_reservoir"),
    "graph_pagerank": ("engine-twin", "test_properties.py", "pagerank"),
    "bpe_learn_merges": ("non-sql-loop", "test_llmdata.py", "learn_bpe"),
    "bpe_token_stats": ("non-sql-loop", "test_llmdata.py", "apply_bpe"),
    "privacy_mondrian_anonymize":
        ("non-sql-loop", "test_operators.py", "mondrian"),
    "multimodal_features":
        ("binary-payload", "test_llmdata.py", "extract_features"),
    "multimodal_cdc_chunks":
        ("binary-payload", "test_llmdata.py", "content_defined_chunks"),
    "multimodal_phash_neardup":
        ("binary-payload", "test_llmdata.py", "perceptual_hash"),
    "multimodal_audio_neardup":
        ("binary-payload", "test_llmdata.py", "audio_fingerprints"),
    "udf_compression_ratio":
        ("binary-payload", "test_gaps.py", "compression_ratio"),
    "string_funcs_spark_only":
        ("engine-only-surface", "test_queries.py",
         "test_query_matches_oracle"),
}


def _rows_only() -> set[str]:
    return {n for n, s in REGISTRY.items() if s.oracle is None}


def test_every_rows_only_probe_has_a_ledger_row():
    missing = sorted(_rows_only() - set(ROWS_ONLY_LEDGER))
    assert not missing, (
        f"oracle=None probes without a rows-only ledger row: {missing} "
        "— add (class, evidence file, symbol) to ROWS_ONLY_LEDGER or "
        "give the probe an oracle (preferred: the md5/integer-twin "
        "upgrade path, see sketch_cms_topk_md5)")


def test_no_stale_ledger_rows():
    stale = sorted(set(ROWS_ONLY_LEDGER) - _rows_only())
    assert not stale, (
        f"ledger rows for probes that are no longer oracle-less (or no "
        f"longer registered): {stale} — delete the row; the ledger "
        "shrinks when oracles land")


def test_ledger_classes_are_bounded():
    bad = {n: c for n, (c, _, _) in ROWS_ONLY_LEDGER.items()
           if c not in CLASSES}
    assert not bad, f"unknown oracle-impossibility class: {bad}"


def test_ledger_evidence_exists_and_mentions_the_operator():
    broken = []
    for name, (_, fname, symbol) in ROWS_ONLY_LEDGER.items():
        path = os.path.join(TESTS_DIR, fname)
        if not os.path.exists(path):
            broken.append(f"{name}: {fname} missing")
            continue
        with open(path, encoding="utf-8") as f:
            if symbol not in f.read():
                broken.append(f"{name}: {fname} no longer mentions "
                              f"{symbol!r}")
    assert not broken, (
        "rows-only evidence pointers rotted: " + "; ".join(broken))


def test_ledger_size_only_shrinks():
    """The r10 close recorded 24 rows-only probes. New oracle-less
    registrations must clear a higher bar than a ledger row: they need
    an explicit bump of this ceiling in the same change (the review
    hook the r10 verdict asked for), while oracle upgrades shrink it
    for free."""
    assert len(_rows_only()) <= 24
