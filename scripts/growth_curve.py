"""Growth-curve validation for the fan-out-shaped probes (r7 verdict
task 2): run each at sf0.001 / sf0.01 / sf0.1, record wall time and
OUTPUT ROW growth, and flag any shape whose candidate/output volume
grows super-linearly in the input — the 100x-scale killer a fixed-SF
hash check cannot see (LSH band collisions, closure fan-out,
item-neighbor pair counts).

Usage: python scripts/growth_curve.py [probe ...]
Prints a markdown table (paste into SCALE.md) plus a per-shape
linearity verdict: output-rows growth ratio vs input-rows growth ratio
between consecutive SFs.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
       "/root/testdata/sf0.1"]

#: the synthetic sf1 decade (r8 verdict task 3): ten key-remapped
#: isomorphic copies of sf0.1 (scripts/make_sf1_synthetic.py) — joins
#: the curve automatically once generated. The linearity verdict is
#: computed on the LAST consecutive pair, so with sf1 present the
#: judged decade is 0.1 -> 1.
_SF1 = os.path.join(REPO, "spark-warehouse", "sf1-synthetic")
if os.path.isdir(_SF1):
    SFS.append(_SF1)

#: the sf10 decade (r12 verdict task 5) holds ONLY the customer table
#: (scripts/make_sf10_customer.py — the digit-hierarchy probes read
#: nothing else), so it joins the curve only when explicitly asked
#: for via GROWTH_SF10=1; running document/event shapes against it
#: would fail on missing tables.
_SF10 = os.path.join(REPO, "spark-warehouse", "sf10-synthetic")
if os.environ.get("GROWTH_SF10") == "1" and os.path.isdir(_SF10):
    SFS.append(_SF10)

#: shape -> (probe, driver table whose row count anchors "input size")
SHAPES = {
    "dedup_minhash_lsh_md5": "documents",
    "dedup_clusters": "documents",
    "corpus_span_duplication": "documents",
    "corpus_curation_pipeline": "documents",
    "graph_transitive_closure": "events",
    "corpus_segment_dedup": "documents",
    "analytics_item_neighbors": "lineitem",
    "neardup_setsim_prefix": "documents",
    "corpus_decontaminate": "documents",
    "neardup_semantic_dedup": "embeddings",
    # r12 fan-out shape: the weighted closure's output is O(reachable
    # pairs), the same contract as graph_transitive_closure above.
    "graph_weighted_shortest_paths": "customer",
    # r13 (r12 verdict task 5): the exact-diameter rollup rides the
    # same closure — output is 1 row, so its curve row is a TIME
    # curve; pair fan-out shows up as wall time, not output rows.
    "graph_effective_diameter": "customer",
}


def main() -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as e

    names = sys.argv[1:] or list(SHAPES)
    spark = (SparkSession.builder.master("local[16]")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.driver.memory", "24g")
             .config("spark.driver.maxResultSize", "4g")
             .getOrCreate())
    qs = e.queries()
    inputs = {sf: {} for sf in SFS}
    def sf_tag(sf):
        return sf.rsplit("sf", 1)[1].split("-")[0]
    rows_hdr = " | ".join(f"rows sf{sf_tag(sf)}" for sf in SFS)
    time_hdr = " | ".join(f"sec sf{sf_tag(sf)}" for sf in SFS)
    decade = f"{sf_tag(SFS[-2])}->{sf_tag(SFS[-1])}"
    print(f"| shape | {rows_hdr} | {time_hdr} | rows-growth vs "
          f"input-growth ({decade}) | verdict |")
    print("|---" * (2 * len(SFS) + 3) + "|")
    failures = []
    for name in names:
        anchor = SHAPES[name]
        rows, secs = [], []
        # the sf10 dir holds ONLY the customer table (its generator's
        # design): skip any (shape, sf) whose anchor parquet is absent
        # instead of crashing the whole run on PATH_NOT_FOUND — the
        # shape's curve then spans the scales that exist for it
        shape_sfs = [sf for sf in SFS
                     if os.path.exists(f"{sf}/{anchor}.parquet")]
        for sf in shape_sfs:
            if anchor not in inputs[sf]:
                inputs[sf][anchor] = (
                    spark.read.parquet(f"{sf}/{anchor}.parquet").count())
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            n = qs[name](spark, sf).count()
            secs.append(time.perf_counter() - t0)
            rows.append(n)
        # the verdict's judged decade is THIS shape's last consecutive
        # pair (skipped SFs don't shift it onto a mismatched pair)
        in01 = inputs[shape_sfs[-2]][anchor]
        in1 = inputs[shape_sfs[-1]][anchor]
        in_growth = in1 / max(in01, 1)
        out_growth = rows[-1] / max(rows[-2], 1)
        # super-linear = output grows more than ~1.5x faster than input
        # (ratio slack absorbs small-count noise); zero/tiny outputs at
        # sf0.01 are judged on absolute size instead
        superlinear = (rows[-2] >= 20 and out_growth > 1.5 * in_growth)
        verdict = "SUPER-LINEAR" if superlinear else "ok"
        if superlinear:
            failures.append(name)
        by_sf = dict(zip(shape_sfs, zip(rows, secs)))
        r = " | ".join(str(by_sf[sf][0]) if sf in by_sf else "-"
                       for sf in SFS)
        s = " | ".join(f"{by_sf[sf][1]:.2f}" if sf in by_sf else "-"
                       for sf in SFS)
        print(f"| {name} | {r} | {s} | {out_growth:.1f}x vs "
              f"{in_growth:.1f}x | {verdict} |")
    # The closure watch item needs a dedicated sf1 check: the probe's
    # digit-hierarchy (u -> u//10) is NOT isomorphic under the
    # synthetic key offsets (copy-k parents u//10 + k*1e6 are not
    # customers, so copy-k chains stop at one hop — structurally
    # trivial). Build an explicitly ISOMORPHIC 10x hierarchy (per-copy
    # local digit chains) and demand exactly-linear pair growth.
    if not sys.argv[1:] and len(SFS) == 4:
        import pyspark.sql.functions as F
        from data_and_analytics_etl_spark.operators.graph import \
            transitive_closure

        def pairs(sf, local_key):
            c = (spark.read.parquet(f"{sf}/customer.parquet")
                 .filter(F.col("c_custkey") % 10_000_000 > 0))
            copy = (F.col("c_custkey") / 10_000_000).cast("long")
            u = F.col("c_custkey") % 10_000_000
            dst = ((u / 10).cast("long")
                   + copy * 10_000_000) if local_key else \
                (F.col("c_custkey") / 10).cast("long")
            e = c.select(F.col("c_custkey").alias("src"),
                         dst.alias("dst"))
            return transitive_closure(e, max_depth=16).count()

        p01 = pairs(SFS[2], local_key=False)
        p1 = pairs(SFS[3], local_key=True)
        iso = p1 / max(p01, 1)
        verdict = "ok" if iso <= 15.0 else "SUPER-LINEAR"
        print(f"\nclosure isomorphic-10x check: {p01} -> {p1} pairs "
              f"({iso:.1f}x on 10.0x input) {verdict}")
        if verdict != "ok":
            failures.append("graph_transitive_closure(iso-sf1)")
    # Weighted-closure ISOMORPHIC two-decade check (r12 verdict task
    # 5, honest form): the raw synthetic rows above measure a
    # NON-isomorphic topology (copy-k chains truncate at 1-2 hops —
    # the documented key-offset artifact), so the operator's posture
    # claim rests on THIS check instead: per-copy LOCAL digit chains
    # + local weights make every copy a true replica of sf0.1's
    # hierarchy, and pair growth must be exactly linear at BOTH
    # decades (0.1 -> 1 -> 10). Runs when the sf10 customer dir is
    # present (GROWTH_SF10=1 + scripts/make_sf10_customer.py).
    if _SF10 in SFS and _SF1 in SFS:
        import pyspark.sql.functions as F
        from data_and_analytics_etl_spark.operators.graph import \
            weighted_shortest_paths

        def wpairs(sf, local_key):
            c = (spark.read.parquet(f"{sf}/customer.parquet")
                 .filter(F.col("c_custkey") % 10_000_000 > 0))
            copy = (F.col("c_custkey") / 10_000_000).cast("long")
            u = F.col("c_custkey") % 10_000_000
            dst = ((u / 10).cast("long")
                   + copy * 10_000_000) if local_key else \
                (F.col("c_custkey") / 10).cast("long")
            e = c.select(F.col("c_custkey").alias("src"),
                         dst.alias("dst"),
                         (u % 5 + 1).cast("long").alias("w"))
            return weighted_shortest_paths(e, max_depth=16).count()

        w01 = wpairs("/root/testdata/sf0.1", local_key=False)
        w1 = wpairs(_SF1, local_key=True)
        w10 = wpairs(_SF10, local_key=True)
        d1, d2 = w1 / max(w01, 1), w10 / max(w1, 1)
        verdict = "ok" if max(d1, d2) <= 15.0 else "SUPER-LINEAR"
        print(f"\nweighted-closure isomorphic two-decade check: "
              f"{w01} -> {w1} -> {w10} pairs "
              f"({d1:.1f}x, {d2:.1f}x per 10.0x decade) {verdict}")
        if verdict != "ok":
            failures.append("graph_weighted_shortest_paths(iso)")
    if failures:
        print(f"\nSUPER-LINEAR shapes: {failures}")
        return 1
    print("\nall shapes within the linearity envelope")
    return 0


if __name__ == "__main__":
    sys.exit(main())
