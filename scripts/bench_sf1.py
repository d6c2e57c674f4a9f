"""Wall-clock scaling bench: the heavy bench families at sf0.1 vs the
synthetic sf1 decade (r9 verdict task 4).

The growth-curve harness (scripts/growth_curve.py) proves OUTPUT
linearity across 0.1 -> 1; this script records the WALL-CLOCK side:
each family runs warm (1 untimed + best-of-2 timed) at both scales on
the same session, and the sf1/sf0.1 ratio is judged against ~12x
(10x data + scheduling overhead at fixed parallelism). Prints one
JSON line; paste the table into SCALE.md's round notes.

Run on a QUIET host (this is a timing artifact — the bench.py loadavg
rule applies): `python scripts/bench_sf1.py`.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: bench name -> registry probe (the 6 heaviest plan families per the
#: r9 verdict: LSH banding, CC fixpoint, span fan-out, the composed
#: curation plan, pointer-doubling closure, double rank-table build)
FAMILIES = {
    "b8_minhash_neardup": "dedup_minhash_lsh",
    "b12_dedup_clusters": "dedup_clusters",
    "b13_span_duplication": "corpus_span_duplication",
    "b15_curation_pipeline": "corpus_curation_pipeline",
    "b16_transitive_closure": "graph_transitive_closure",
    "b20_spearman": "stats_spearman_corr",
}

#: the r10-cohort heavy families (SF1_FAMILIES=r10): span-removal
#: reassembly (doc fan-out), positional-rank quantile normalization
#: (row-linear), Mann-Kendall (CALENDAR-bounded pairs — the ratio
#: should be ~1x, the grain-bounded design made visible), integer
#: HITS (edge-linear iterations), Friedman (cell-bounded ranks over a
#: row-linear aggregate), JS divergence (vocabulary-linear).
R10_FAMILIES = {
    "r10_span_removal": "corpus_span_removal",
    "r10_quantile_normalize": "feature_quantile_normalize",
    "r10_mann_kendall": "timeseries_mann_kendall",
    "r10_hits_integer": "graph_hits_iter",
    "r10_friedman": "stats_friedman",
    "r10_js_divergence": "text_js_divergence",
}

#: the r11-cohort heavy families (SF1_FAMILIES=r11): the degree-ordered
#: wedge join (O(m^1.5) candidates — the only super-linear-candidate
#: shape in the cohort, twice), the vocabulary explode feeding exact
#: spectrum moments, the cell-contingency broadcast self-join, and the
#: per-series frame-sharing running windows.
R11_FAMILIES = {
    "r11_local_clustering": "graph_local_clustering",
    "r11_adamic_adar": "graph_adamic_adar",
    "r11_yule_k": "text_yule_k",
    "r11_zipf_slope": "text_zipf_slope",
    "r11_jonckheere": "stats_jonckheere_terpstra",
    "r11_max_drawdown": "timeseries_max_drawdown",
}

#: the r12-cohort families (SF1_FAMILIES=r12): the weighted min-plus
#: closure (pair fan-out — the one output-superlinear-capable shape),
#: its distance-histogram rollup, the integer-grid k-means (3 corpus
#: scans + bounded centroid aggs), the ordered-set percentile sorts,
#: and the calendar-bounded pairwise-slope median (~flat by design).
R12_FAMILIES = {
    "r12_weighted_sp": "graph_weighted_shortest_paths",
    "r12_effective_diameter": "graph_effective_diameter",
    "r12_ivf_grid": "ann_ivf_grid",
    "r12_percentile": "agg_percentile_cont_disc",
    "r12_theil_sen": "timeseries_theil_sen",
}

#: the r13-cohort families (SF1_FAMILIES=r13): the per-subspace grid
#: codebook trainer + ADC scan (corpus-linear integer work), its
#: IVF-routed composition (candidate mass bounded by n_probe/n_cells),
#: the sort-based ordered string aggregation (group-linear), and the
#: HyperBall register propagation (nodes×16 state regardless of
#: reachability density — the sketch whose POINT is a flat ratio).
#: stream_stream_full_outer is excluded: its replay stages sentinel
#: files per run (a fixture, not a plan shape).
R13_FAMILIES = {
    "r13_pq_grid": "ann_pq_grid",
    "r13_ivfpq_grid": "ann_ivfpq_grid",
    "r13_string_agg": "agg_string_agg_ordered",
    "r13_hyperball": "graph_hyperball_nf",
}

#: the round-13 OPTIMIZATION round's changed operators
#: (SF1_FAMILIES=r13opt): the three paths whose internals changed —
#: the vectorized 2-pass Misra-Gries heavy hitters, the observe-folded
#: dedup-clusters fixpoint, and the observe-folded k-core peel — so
#: the at-scale decade confirms the changes did not bend the scaling
#: curve (all three should stay ~linear-in-data or flatter).
R13OPT_FAMILIES = {
    "b12_dedup_clusters": "dedup_clusters",
    "b21_heavy_hitters": "sketch_freq_heavy_hitters",
    "r13opt_k_core": "graph_k_core",
}

EAGER_EXTRA: set = set()
if os.environ.get("SF1_FAMILIES") == "r10":
    FAMILIES = R10_FAMILIES
elif os.environ.get("SF1_FAMILIES") == "r11":
    FAMILIES = R11_FAMILIES
elif os.environ.get("SF1_FAMILIES") == "r12":
    FAMILIES = R12_FAMILIES
elif os.environ.get("SF1_FAMILIES") == "r13":
    FAMILIES = R13_FAMILIES
elif os.environ.get("SF1_FAMILIES") == "r13opt":
    FAMILIES = R13OPT_FAMILIES
elif os.environ.get("SF1_FAMILIES") == "all21":
    # r10 verdict task 4: the FULL 21-query bench at sf1 — b1-b10 had
    # never been timed past sf0.1. Reuses bench.py's exact probe map so
    # the timed plans are byte-identical to the driver bench's.
    from bench import BENCH_QUERIES, EAGER_QUERIES
    FAMILIES = dict(BENCH_QUERIES)
    EAGER_EXTRA = set(EAGER_QUERIES)

EAGER = {"b12_dedup_clusters", "r10_hits_integer",
         "r13_hyperball", "r13opt_k_core"} | EAGER_EXTRA


def run_once(spark, probe, name: str, sf_dir: str) -> float:
    spark.catalog.clearCache()
    if name in EAGER:
        t0 = time.perf_counter()
        probe(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0
    df = probe(spark, sf_dir)
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    from data_and_analytics_etl_spark.queries.registry import REGISTRY
    from data_and_analytics_etl_spark.session import get_spark
    import data_and_analytics_etl_spark.queries  # noqa: F401 — registers

    sf01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf1 = os.path.join(REPO, "spark-warehouse", "sf1-synthetic")
    if not os.path.isdir(sf1):
        raise SystemExit("sf1-synthetic missing — run "
                         "scripts/make_sf1_synthetic.py first")
    # sf1 shuffles move ~10x the bytes: a 1g default driver heap OOMs
    # (the sf1-synthetic lesson); widen driver memory explicitly.
    spark = get_spark("daa-etl-spark-bench-sf1",
                      extra_conf={"spark.driver.memory": "24g"})
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    load_start = [round(x, 2) for x in os.getloadavg()]
    out: dict[str, dict] = {}
    for name, probe_name in FAMILIES.items():
        probe = REGISTRY[probe_name].fn
        row: dict[str, object] = {}
        for tag, d in (("sf0.1", sf01), ("sf1", sf1)):
            try:
                run_once(spark, probe, name, d)  # warm-up
                t = min(run_once(spark, probe, name, d)
                        for _ in range(2))
                row[tag] = round(t, 3)
            except Exception as exc:  # noqa: BLE001 — harness boundary
                row[tag] = {"err": f"{type(exc).__name__}: "
                                   f"{str(exc).splitlines()[0][:200]}"}
        if isinstance(row.get("sf0.1"), float) and isinstance(
                row.get("sf1"), float) and row["sf0.1"] > 0:
            row["ratio"] = round(row["sf1"] / row["sf0.1"], 2)
        out[name] = row
    print(json.dumps({
        "metric": "bench_sf1_scaling",
        "families": out,
        "loadavg_start": load_start,
        "loadavg_end": [round(x, 2) for x in os.getloadavg()],
    }))


if __name__ == "__main__":
    main()
