"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (sf0.1).

Prints exactly ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each bench query executes through a `noop` sink so the full plan runs
(scan -> shuffle -> agg/join/window) without driver-side collection cost
polluting the measurement. Queries are the B1-B7 set from BASELINE.md,
resolved from the probe registry so the benched plan is byte-identical to
the correctness-verified one.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_and_analytics_etl_spark.queries import REGISTRY  # noqa: E402
from data_and_analytics_etl_spark.session import get_spark  # noqa: E402

#: BASELINE.md B-id -> registry probe name.
BENCH_QUERIES: dict[str, str] = {
    "b1_pricing_summary": "q1_pricing_summary",
    "b2_shipping_priority": "q3_shipping_priority",
    "b3_star_join": "q5_star_join",
    "b4_topk_per_group": "topk_per_group",
    "b5_running_sum": "window_running_agg",
    "b6_cosine_topk": "cosine_topk",
    "b7_exact_dedup": "dedup_exact",
    "b8_minhash_neardup": "dedup_minhash_lsh",
    "b9_sessionization": "sessionization",
    "b10_returned_revenue": "q10_returned_revenue",
    # r4 additions: the two most scale-sensitive plan families not yet
    # timed round-over-round — a six-table join tree (broadcast dims +
    # two fact-fact shuffles) and an iterative algorithm (connected
    # components, per-round localCheckpoint + convergence check)
    "b11_nation_volume": "q7_nation_volume",
    "b12_dedup_clusters": "dedup_clusters",
    # r5 additions: the two newest scale-sensitive plan families —
    # explode-heavy text profiling (distinct (doc,span) pairs -> span
    # window -> doc rollup, the widest fan-out in the engine) and the
    # bucketed-prefix-sum exact ECDF (grid-parallel cumulative)
    "b13_span_duplication": "corpus_span_duplication",
    "b14_drift_ks": "drift_ks_exact",
    # r6 addition: the curation capstone — quality filter -> exact dedup
    # -> n-gram decontamination -> holdout split -> token-budget packing
    # composed as ONE lazy plan; the composed-pipeline shape gets a
    # round-over-round number, not just its oracle row
    "b15_curation_pipeline": "corpus_curation_pipeline",
    # r6 addition (2nd session): the recursive-CTE-parity closure — the
    # min-plus pointer-doubling self-join shape (log-rounds joins with
    # per-round lazy persist), the one bench entry exercising repeated
    # self-joins over a growing frame.
    "b16_transitive_closure": "graph_transitive_closure",
    # r7 addition: global segment-level dedup with in-order document
    # reassembly — the explode -> segment-keyed window -> doc-keyed
    # ordered-reassembly shape (CCNet line dedup), the one bench entry
    # whose dominant cost is a collect_list regroup after a fan-out.
    "b17_segment_dedup": "corpus_segment_dedup",
    # r8 additions: two plan families not yet timed round-over-round —
    # LM scoring (token explode -> two vocabulary-bounded broadcast
    # enrichment joins -> per-doc rollup, the KenLM quality-filter
    # shape every curation pipeline runs over the full corpus) and the
    # banded spatial self-join (cell bucket + 3x3 neighbor probe +
    # exact verify — the geometry member of the candidate-join family).
    "b18_bigram_lm": "text_bigram_lm_score",
    "b19_geo_proximity": "geo_grid_proximity",
    # r9 additions: the two plan families still untimed round-over-
    # round — double rank-table construction (two bucketed midrank
    # builds + two joins back + exact-decimal moments: the heaviest
    # multi-join shuffle chain per input row in the engine) and the
    # Arrow-batched Python sketch path (per-partition Misra-Gries +
    # exact verify — the one mapInPandas in the bench, so a Python-
    # worker regression shows up as a number, not a surprise).
    "b20_spearman": "stats_spearman_corr",
    "b21_heavy_hitters": "sketch_freq_heavy_hitters",
}

#: Queries whose probe fn executes work eagerly during construction
#: (iterative label propagation); timed with construction included.
EAGER_QUERIES = {"b12_dedup_clusters"}

#: Per-query all-time records at sf0.1 (BASELINE.md, round-11 records
#: run) — the noise floor for the mid-run outlier re-run below. These
#: are NOT acceptance thresholds (BASELINE.md owns those); they only
#: decide when a timed minimum is so far above any prior observation
#: (>3x) that the only plausible cause is a co-tenant burst inside the
#: timing window, which a re-run can bound. Update when BASELINE.md
#: records a new minimum.
RECORDS_SF01: dict[str, float] = {
    "b1_pricing_summary": 0.451,
    "b3_star_join": 0.441, "b4_topk_per_group": 0.217,
    "b5_running_sum": 0.153,
    "b7_exact_dedup": 0.158,
    # r14 optimization close: steal-clean records (max steal_by_query
    # 0.05% on the b2/b6 run; b20 is the round's persist win) —
    # BASELINE.md "Round-14 optimization close"
    "b2_shipping_priority": 0.368, "b6_cosine_topk": 0.233,
    "b20_spearman": 1.282,
    "b9_sessionization": 0.515, "b10_returned_revenue": 0.251,
    "b11_nation_volume": 0.374,
    "b15_curation_pipeline": 1.183,
    # r13 optimization close: steal-clean record runs on the slower-
    # dispatch host (max steal_by_query 0.08%; full-21 record 11.419 s)
    # — BASELINE.md "Round-13 optimization close"
    "b12_dedup_clusters": 0.687,
    "b19_geo_proximity": 0.362,
    "b21_heavy_hitters": 0.444,
    # r14 optimization close: NEW all-time full-21 record 11.175 s
    # (max steal_by_query 0.06%, dispatch 0.0654) — BASELINE.md
    # "Round-14 optimization close"
    "b8_minhash_neardup": 0.524, "b13_span_duplication": 0.406,
    "b14_drift_ks": 0.270, "b16_transitive_closure": 1.179,
    "b17_segment_dedup": 0.334, "b18_bigram_lm": 0.733,
}

def _cpu_jiffies() -> tuple[int, int]:
    """(steal, total) cumulative jiffies from /proc/stat line 1."""
    v = list(map(int, open("/proc/stat").readline().split()[1:]))
    return (v[7] if len(v) > 7 else 0), sum(v)


def steal_pct_during(fn) -> float:
    """Run ``fn`` and return hypervisor steal as % of TOTAL jiffies.

    Steal only manifests under load (idle hosts show ~0% even when the
    co-tenant would throttle us), so the canary measures it WHILE a
    real parallel workload runs. r12 discovery: the loadavg quiet gate
    passed at 1-min load < 1 while 5-12% of total jiffies (about half
    of our non-idle cycles) were being stolen mid-query — a uniformly
    ~1.5-2x elevated bench with no plan regression. Steal/busy is the
    mechanical signature loadavg cannot see.
    """
    s0, t0 = _cpu_jiffies()
    fn()
    s1, t1 = _cpu_jiffies()
    total = t1 - t0
    return 100.0 * (s1 - s0) / total if total > 0 else 0.0


#: Mid-run outlier policy (r11 verdict task 3): the quiet gate bounds
#: START load only — r11's 28.3 s outlier run was ONE b21 mapInPandas
#: worker stalled 15.17 s by a co-tenant burst mid-bench. If the
#: best-of-3 minimum still exceeds OUTLIER_FACTOR x the query's
#: all-time record, re-run (up to OUTLIER_MAX_RERUNS singles) and keep
#: the overall minimum; the emitted `reruns` field records how many
#: extra runs each affected query needed, so a row that STAYS >3x its
#: record after re-runs is a real regression, not noise.
OUTLIER_FACTOR = 3.0
OUTLIER_MAX_RERUNS = 3

#: Steal-triggered re-run policy (r12 verdict task 1a): the 3x-record
#: trigger above is tuned for the 28 s worker-stall class and fired
#: ZERO times through r12's 9% steal burst — the 1.5-1.7x steal-smear
#: class sails under it. So the primary trigger is now the steal
#: provenance itself: each timed attempt measures its OWN steal
#: window, and while the attempt holding the reported minimum saw
#: steal above BENCH_RERUN_STEAL_PCT (default 2.0 — same bar as the
#: start-of-run canary), the query re-runs single attempts (after a
#: short back-off so an ongoing burst doesn't eat the budget) until a
#: clean attempt lands or the SHARED budget below is spent. The
#: budget is global across the bench (steal bursts hit runs, not
#: queries) and bounds added wall time by construction.
STEAL_RERUN_BACKOFF_SEC = 10.0


def _cpu_fingerprint() -> tuple[str, float]:
    """(cpu model string, seconds for a pinned 10M-iteration Python
    loop) — hardware provenance for the artifact (r12 verdict task 3:
    'this host is per-core slower' lived only in BASELINE.md prose;
    these fields make it mechanical, like steal). The loop is the same
    single-core microbenchmark the r12 judge used to adjudicate the
    residual gap (~1.0 s on a typical modern core, ~1.8 s on the r12
    throttled host class).
    """
    model = ""
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.lower().startswith("model name"):
                    model = line.split(":", 1)[1].strip()
                    break
    except OSError:
        pass
    acc = 0
    t0 = time.perf_counter()
    for i in range(10_000_000):
        acc += i * i
    sec = time.perf_counter() - t0
    assert acc  # keep the loop un-optimizable / lint-quiet
    return model, round(sec, 3)


def run_once(spark, name: str, sf_dir: str) -> float:
    # Operators that persist internally (minhash_lsh_pairs) would feed
    # later iterations from the cache; clear it so every timed run pays
    # the full pipeline including materialization.
    spark.catalog.clearCache()
    if name in EAGER_QUERIES:
        # Iterative operators run their join rounds eagerly while
        # building the result frame — the timer must include
        # construction or the loop cost vanishes from the number.
        t0 = time.perf_counter()
        df = REGISTRY[BENCH_QUERIES[name]].fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0
    # Lazy plans: time execution only (construction is file listing +
    # analysis, ~0.4 s of per-query driver overhead that amortizes to
    # zero at cluster scale and isn't in the recorded baselines).
    df = REGISTRY[BENCH_QUERIES[name]].fn(spark, sf_dir)
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or 0.1)
    # Ambient-load provenance (r9 verdict task 2): BENCH_r09's unchanged
    # queries drifted +13-55% under concurrent sweeps while same-round
    # quiet-host runs sat at r8 parity. Recording 1/5/15-min loadavg at
    # start AND end makes that adjudication mechanical instead of
    # forensic: a contended record shows loadavg >> bench's own ~32
    # worker threads.
    # Quiet-host gate (r10 verdict task 7): the loadavg field exists so
    # the bench can be SCHEDULED at load < 1, not merely annotated.
    # Poll up to BENCH_QUIET_WAIT_SEC (default 1800 s, 0 disables) for
    # the 1-min loadavg to drop below BENCH_QUIET_LOAD (default 1.0);
    # if the host never quiets, proceed anyway — loadavg_start then
    # documents the contention instead of silently absorbing it.
    # Default raised 180 -> 1800 per the r11 verdict (task 1): this
    # host's co-tenant bursts run multi-minute, and two rounds of
    # BENCH_rN started at loadavg >4 after the 180 s ceiling expired
    # while same-session quiet runs set all-time records.
    quiet_load = float(os.environ.get("BENCH_QUIET_LOAD", "1.0"))
    quiet_wait = float(os.environ.get("BENCH_QUIET_WAIT_SEC", "1800"))
    waited = 0.0
    while os.getloadavg()[0] >= quiet_load and waited < quiet_wait:
        time.sleep(5.0)
        waited += 5.0
    load_start = [round(x, 2) for x in os.getloadavg()]
    # hardware provenance BEFORE the JVM exists (single-core reading,
    # no executor threads competing with the pinned loop)
    cpu_model, cpu_bench_sec = _cpu_fingerprint()
    spark = get_spark("daa-etl-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warm-up outside the measurement window — doubling as
    # the STEAL CANARY (r12): loadavg misses hypervisor throttling
    # entirely (it gated green at load < 1 while ~half our non-idle
    # cycles were stolen), so re-run the warm-up until steal during a
    # real parallel query drops below BENCH_MAX_STEAL_PCT (% of total
    # jiffies; default 2.0 — the quiet-host reading is ~0.3, the
    # throttled reading 5-12) or the shared wait budget runs out.
    def warm():
        spark.range(10_000_000).selectExpr(
            "sum(id * id)", "avg(id)").collect()

    max_steal = float(os.environ.get("BENCH_MAX_STEAL_PCT", "2.0"))
    steal = steal_pct_during(warm)
    while steal > max_steal and waited < quiet_wait:
        time.sleep(30.0)
        waited += 30.0
        steal = steal_pct_during(warm)

    # Dispatch-latency fingerprint (r13): the third provenance axis.
    # r13's steal-clean runs showed sub-second rows uniformly 1.2-1.6x
    # elevated while LONG rows sat at their records on a FAST core
    # (cpu_benchmark ~0.6 s) — per-stage scheduling overhead, which
    # neither steal nor the single-core loop can see. Median of 5
    # trivial-job round-trips (post-warm-up, so no JIT in the number):
    # a row whose total time is a few multiples of this is
    # dispatch-bound, and its elevation vs a faster-dispatch host's
    # record is adjudicable from the artifact alone.
    def _dispatch_once() -> float:
        # the exact op every bench row pays: a noop-sink write of a
        # trivial plan — so the field subtracts cleanly from a row
        t0 = time.perf_counter()
        spark.range(1).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0
    _dispatch_once()  # one untimed warm-up of the noop path
    _d = sorted(_dispatch_once() for _ in range(5))
    job_dispatch_sec = round(_d[2], 4)

    times: dict[str, object] = {}
    reruns: dict[str, int] = {}
    # per-query steal provenance (semantics CHANGED r13, task 1a): the
    # steal % of the ATTEMPT whose time is reported — each timed run
    # measures its own jiffies window, the minimum-time attempt wins,
    # and its steal is the row's provenance. (r12 reported the whole
    # multi-attempt window including warm-ups, which smeared a clean
    # winning attempt with its contended neighbors.) A row that is
    # slow AND shows high steal is host noise; slow at ~0 steal is a
    # plan regression — adjudicable from the artifact.
    steal_by_query: dict[str, float] = {}
    max_steal_q = float(os.environ.get("BENCH_RERUN_STEAL_PCT", "2.0"))
    # shared steal-re-run budget: total extra attempts across the run
    steal_budget = int(os.environ.get("BENCH_STEAL_RERUN_BUDGET", "20"))
    # Outlier re-runs compare against sf0.1 records only — at any
    # other scale the records table doesn't apply.
    use_records = abs(sf - 0.1) < 1e-9

    def attempt(name: str) -> tuple[float, float]:
        """One timed run + the steal %% across ITS OWN window."""
        s0, t0 = _cpu_jiffies()
        t = run_once(spark, name, sf_dir)
        s1, t1 = _cpu_jiffies()
        st = 100.0 * (s1 - s0) / (t1 - t0) if t1 > t0 else 0.0
        return t, st

    for name in BENCH_QUERIES:
        # Failure isolation: one broken query must never lose the whole
        # bench record (round 4 lost b1-b12 to a single b9 crash). A
        # failed query records {"err": <final exception line>} and the
        # JSON line still prints.
        try:
            # two untimed warm-ups (plan + codegen + C2 JIT — measured to
            # need >2 executions to reach steady state on multi-stage
            # plans), then best-of-3 timed: single-shot runs on a shared
            # host swing +-20%; the minimum is the stable steady-state
            # estimator (the cluster-relevant one — JIT amortizes to
            # zero at 100 TB).
            for _ in range(2):
                run_once(spark, name, sf_dir)
            best_t, best_st = min((attempt(name) for _ in range(3)),
                                  key=lambda p: p[0])
            # Mid-run burst bound, two triggers (r11 task 3 + r12 task
            # 1a): (a) minimum > 3x the all-time record — the worker-
            # stall class; (b) the winning attempt's own window saw
            # steal above the bar — the 1.5-1.7x steal-smear class the
            # 3x trigger provably misses (it fired zero times through
            # r12's 9% burst). Both keep the overall minimum; (b)
            # backs off briefly first and draws from the shared
            # budget, so an ongoing burst can't stretch the run
            # unboundedly.
            record = RECORDS_SF01.get(name) if use_records else None
            if record is not None and best_t > OUTLIER_FACTOR * record:
                for _ in range(OUTLIER_MAX_RERUNS):
                    reruns[name] = reruns.get(name, 0) + 1
                    best_t, best_st = min((best_t, best_st),
                                          attempt(name),
                                          key=lambda p: p[0])
                    if best_t <= OUTLIER_FACTOR * record:
                        break
            while best_st > max_steal_q and steal_budget > 0:
                steal_budget -= 1
                reruns[name] = reruns.get(name, 0) + 1
                time.sleep(STEAL_RERUN_BACKOFF_SEC)
                t2, st2 = attempt(name)
                # a cleaner attempt replaces the provenance even when
                # slightly slower ONLY via the min-time rule: steal
                # inflates time, so a clean window normally wins on
                # time too; keep strictly-min-time semantics for the
                # estimator and report ITS steal.
                if t2 < best_t:
                    best_t, best_st = t2, st2
                elif st2 <= max_steal_q:
                    # clean but not faster: the minimum stands and is
                    # now UPPER-BOUNDED by a clean observation — stop
                    # burning budget; report the clean attempt's steal
                    # with the (smaller) contended time, which can
                    # only overstate our cost.
                    best_st = st2
            times[name] = round(best_t, 3)
            steal_by_query[name] = round(best_st, 2)
        except Exception as exc:  # noqa: BLE001 — harness boundary
            first = str(exc).strip().splitlines()
            times[name] = {"err": f"{type(exc).__name__}: "
                                  f"{first[0] if first else ''}"[:300]}

    ok = {k: v for k, v in times.items() if isinstance(v, (int, float))}
    total = round(sum(ok.values()), 3)
    print(json.dumps({
        "metric": "bench_total_sec",
        "value": total,
        "unit": "sec",
        "queries": times,
        "n_errors": len(times) - len(ok),
        "sf": sf,
        "loadavg_start": load_start,
        "loadavg_end": [round(x, 2) for x in os.getloadavg()],
        "quiet_wait_sec": round(waited, 1),
        "steal_pct_start": round(steal, 2),
        "steal_pct_end": round(steal_pct_during(warm), 2),
        "steal_by_query": steal_by_query,
        "steal_rerun_threshold_pct": max_steal_q,
        "reruns": reruns,
        "cpu_model": cpu_model,
        "cpu_benchmark_sec": cpu_bench_sec,
        "job_dispatch_sec": job_dispatch_sec,
    }))


if __name__ == "__main__":
    main()
