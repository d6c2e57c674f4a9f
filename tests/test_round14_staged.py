"""Round-14 staged probes: oracle equivalence + structural contracts.

These probes are staged, not registered (queries/round14.py module
doc) — this suite gives them the SAME DuckDB-oracle comparison the
registered probes get from tests/test_queries.py, plus hand-graph
contract tests for the new operators, so r14 registration is a
mechanical re-tier of already-verified code.
"""

from __future__ import annotations

import pytest

from data_and_analytics_etl_spark.queries.round14 import STAGED

from .oracle import compare


def test_staged_probes_are_not_registered():
    # staging must not touch the frozen r13 window composition
    from data_and_analytics_etl_spark.queries import REGISTRY
    overlap = set(STAGED) & set(REGISTRY)
    assert not overlap, f"staged probes leaked into REGISTRY: {overlap}"


@pytest.mark.parametrize("name", sorted(STAGED))
def test_staged_query_matches_oracle(spark, sf_dir, name):
    compare(spark, STAGED[name], sf_dir)


# --------------------------------------------------------------------------
# strongly_connected_components: hand-graph contracts
# --------------------------------------------------------------------------

def test_scc_hand_graphs(spark):
    """Every structural contract in ONE Spark action: the SCC plan's
    fixed analyzer/stage overhead (~tens of seconds, see the operator
    docstring) dwarfs data cost on hand graphs, so the six scenarios
    share one edge list over disjoint id ranges — disjoint components
    cannot interact, each range asserts independently."""
    from data_and_analytics_etl_spark.operators.graph import (
        strongly_connected_components)
    edges = []
    # [1-3] 1 <-> 2 plus tail 3 -> 1
    edges += [(1, 2), (2, 1), (3, 1)]
    # [11-13] DAG: all singletons
    edges += [(11, 12), (12, 13), (11, 13)]
    # [21-25] figure-eight: two triangles sharing node 21
    edges += [(21, 22), (22, 23), (23, 21), (21, 24), (24, 25),
              (25, 21)]
    # [31-41] cycle {31,32} -> cycle {40,41} via one-way 32 -> 40
    edges += [(31, 32), (32, 31), (40, 41), (41, 40), (32, 40)]
    # [100+] 33-cycle: L > 2*max_depth, all singletons (3rd regime)
    edges += [(100 + i, 100 + (i + 1) % 33) for i in range(33)]
    # [200+] 20-cycle: max_depth < L <= 2*max_depth (2nd regime)
    edges += [(200 + i, 200 + (i + 1) % 20) for i in range(20)]

    df = spark.createDataFrame(edges, "src long, dst long")
    rows = strongly_connected_components(df, max_depth=16).collect()
    comp = {r.node: r.scc_id for r in rows}
    size = {r.node: r.scc_size for r in rows}

    # two-cycle + tail
    assert comp[1] == comp[2] == 1 and size[1] == size[2] == 2
    assert comp[3] == 3 and size[3] == 1
    # DAG
    assert {n: comp[n] for n in (11, 12, 13)} == {11: 11, 12: 12,
                                                  13: 13}
    # figure-eight merges through the shared node
    assert len({comp[n] for n in (21, 22, 23, 24, 25)}) == 1
    assert size[21] == 5
    # one-way bridge does not merge
    assert comp[31] == comp[32] == 31 and comp[40] == comp[41] == 40
    assert size[31] == 2 and size[40] == 2
    # 33-cycle: one directed distance always exceeds the horizon
    assert all(comp[100 + i] == 100 + i for i in range(33))
    assert all(size[100 + i] == 1 for i in range(33))
    # 20-cycle: mutual iff BOTH directed distances fit the horizon —
    # (v-u) mod L in [L-h, h]; label = min over the mutual set
    n, h = 20, 16
    expected = {
        u: min([u] + [v for v in range(n)
                      if n - h <= (v - u) % n <= h])
        for u in range(n)
    }
    assert {u: comp[200 + u] - 200 for u in range(n)} == expected


def test_scc_probe_graph_horizon_is_exactly_sixteen():
    """The oracle's unbounded recursive fixpoint equals the Spark
    side's 16-hop bounded closure ONLY because the probe graph's
    max shortest-path distance is <= 16 — pin that by brute force
    on the sf0.001-sized key range so a probe-graph edit that
    breaks the bound fails here, not in the driver."""
    from collections import deque
    keys = set(range(150))
    adj = {u: [] for u in keys}
    for u in keys:
        t = (u - u % 8) + ((u % 8 + 1) % 8)
        if t in keys:
            adj[u].append(t)
        if u % 8 == 3 and (u // 8) % 3 != 2 and u + 8 in keys:
            adj[u].append(u + 8)
    maxd = 0
    for s in keys:
        dist = {s: 0}
        dq = deque([s])
        while dq:
            u = dq.popleft()
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    dq.append(v)
        selfd = [dist[u] + 1 for u in keys if s in adj[u] and u in dist]
        maxd = max([maxd, max(dist.values())] + selfd)
    assert maxd == 16


# --------------------------------------------------------------------------
# KMV sketch: merge law + estimator accuracy
# --------------------------------------------------------------------------

def test_kmv_merge_law_is_exact(spark, sf_dir):
    """Sketch-of-union == merge-of-sketches, EXACTLY (the property
    that makes KMV mergeable at 100 TB: per-partition sketches union
    without touching raw data). Compare the k hash values
    themselves, not estimates."""
    import pyspark.sql.functions as F
    from data_and_analytics_etl_spark.catalog import load_table
    from data_and_analytics_etl_spark.operators.sketch import (
        kmv_build, kmv_merge)
    o = load_table(spark, sf_dir, "orders")
    base = (o.select(F.col("o_orderpriority").alias("g"),
                     F.col("o_custkey").alias("v")).distinct())
    # per-priority sketches, then coarsen: urgent-ish (1,2) vs rest
    coarse = F.when(F.col("g").isin("1-URGENT", "2-HIGH"),
                    F.lit("hi")).otherwise(F.lit("lo"))
    direct = kmv_build(base.withColumn("g", coarse), ["g"], "v", k=32)
    fine = kmv_build(base, ["g"], "v", k=32)
    merged = kmv_merge(fine.withColumn("g", coarse), ["g"], k=32)
    d = {(r.g, r.rn): r.hv for r in direct.collect()}
    m = {(r.g, r.rn): r.hv for r in merged.collect()}
    assert d == m and len(d) == 64  # 2 groups x k=32, bit-identical


def test_kmv_estimates_track_exact_counts(spark, sf_dir):
    """KMV error bound: with k=64 the relative standard error is
    ~1/sqrt(k-2) ≈ 12.7%; assert every pair's union estimate lands
    within 4 sigma (~51%) of truth and the observed MEAN relative
    error across the 10 pairs stays under 2 sigma — loose enough to
    be stable, tight enough that a broken estimator (off by 2x)
    fails."""
    from data_and_analytics_etl_spark.queries.round14 import STAGED
    rows = STAGED["sketch_kmv_set_ops"].fn(spark, sf_dir).collect()
    assert len(rows) == 10  # 5 priorities -> C(5,2) pairs
    rels = []
    for r in rows:
        rel = abs(r.union_est - r.exact_union) / r.exact_union
        assert rel < 0.51, (r.ga, r.gb, r.union_est, r.exact_union)
        rels.append(rel)
        # inclusion-exclusion consistency of the estimator family:
        # union ≈ inter + a_not_b + b_not_a contributions by
        # construction (counts partition the union sketch)
        assert r.inter_est <= r.union_est + 1e-9
    assert sum(rels) / len(rels) < 0.26, rels


def test_dsir_weights_separate_target_from_raw(spark, sf_dir):
    """DSIR's point: under the target-domain model, target documents
    must score higher on average than raw-pool documents — here the
    en/non-en split, where unigram+bigram distributions genuinely
    differ. Pin the separation (mean target weight > mean raw
    weight) and the smoothing sanity (every doc got a finite
    weight)."""
    from data_and_analytics_etl_spark.queries.round14 import STAGED
    rows = STAGED["corpus_dsir_weights"].fn(spark, sf_dir).collect()
    tgt = [r.weight for r in rows if r.is_target]
    raw = [r.weight for r in rows if not r.is_target]
    assert tgt and raw
    assert all(isinstance(r.weight, float) for r in rows)
    mean_t = sum(tgt) / len(tgt)
    mean_r = sum(raw) / len(raw)
    assert mean_t > mean_r, (mean_t, mean_r)
    # per-token normalization should separate too (long docs do not
    # drive the split): compare average per-gram log ratios
    tpg = [r.weight / r.n_grams for r in rows if r.is_target]
    rpg = [r.weight / r.n_grams for r in rows if not r.is_target]
    assert sum(tpg) / len(tpg) > sum(rpg) / len(rpg)


def test_dtw_band_matches_python_reference(spark):
    """dtw_band_distance vs a straightforward Python DP on hand
    series — exact integer equality, plus the identity and symmetry
    laws. One Spark action for all cases (the SCC hand-graph
    rule)."""
    import random

    import pyspark.sql.functions as F
    from data_and_analytics_etl_spark.operators.timeseries import (
        dtw_band_distance)

    inf = 1 << 50

    def pydtw(a, b, band=2):
        n = len(a)
        D = [[inf] * n for _ in range(n)]
        for i in range(n):
            for j in range(n):
                if abs(i - j) > band:
                    continue
                c = abs(a[i] - b[j])
                if i == 0 and j == 0:
                    D[i][j] = c
                else:
                    D[i][j] = c + min(
                        D[i - 1][j] if i > 0 else inf,
                        D[i][j - 1] if j > 0 else inf,
                        D[i - 1][j - 1] if i > 0 and j > 0 else inf)
        return D[n - 1][n - 1]

    random.seed(7)
    cases = [(t, [random.randint(0, 500) for _ in range(24)],
              [random.randint(0, 500) for _ in range(24)])
             for t in range(6)]
    cases.append((6, [5] * 24, [5] * 24))                 # identity
    cases.append((7, list(range(24)), list(range(1, 25))))  # shift-1
    df = spark.createDataFrame(cases, "t int, a array<long>, "
                                      "b array<long>")
    d = dtw_band_distance(F.col("a"), F.col("b"), 24)
    rows = df.select("t", d.alias("fwd"),
                     dtw_band_distance(F.col("b"), F.col("a"), 24)
                     .alias("bwd")).collect()
    got = {r.t: (r.fwd, r.bwd) for r in rows}
    for t, a, b in cases:
        exp = pydtw(a, b)
        assert got[t][0] == exp, (t, got[t][0], exp)
        assert got[t][1] == got[t][0]  # symmetry (band symmetric)
    assert got[6][0] == 0             # identical series cost nothing
    assert got[7][0] == 2             # one warp step at each end


def test_gini_split_matches_bruteforce(spark):
    """best_gini_splits vs an O(candidates x rows) Python reference
    on a hand dataset with a known clean split — exact equality of
    threshold, partition counts, and the weighted-Gini value."""
    import pyspark.sql.functions as F  # noqa: F401
    from data_and_analytics_etl_spark.operators.features import (
        best_gini_splits)
    # feature 'f': y=1 iff v >= 5, except two noise rows
    rows = [("f", v, 1 if v >= 5 else 0) for v in range(10)
            for _ in range(5)]
    rows += [("f", 1, 1), ("f", 8, 0)]
    df = spark.createDataFrame(rows, "feature string, v long, y long")
    got = best_gini_splits(df).collect()
    assert len(got) == 1
    r = got[0]

    def weighted_gini(t):
        left = [y for (_, v, y) in rows if v <= t]
        right = [y for (_, v, y) in rows if v > t]
        if not left or not right:
            return None
        out = 0.0
        for part in (left, right):
            n, p = len(part), sum(part)
            out += n * (1 - (p / n) ** 2 - ((n - p) / n) ** 2)
        return out
    cands = {t: weighted_gini(t) for t in range(9)}
    best_t = min(cands, key=lambda t: (cands[t], t))
    assert r.threshold == best_t == 4
    assert r.n_left == sum(1 for (_, v, _) in rows if v <= 4)
    assert r.pos_left == sum(y for (_, v, y) in rows if v <= 4) == 1
    # gini column is weighted impurity / n
    n = len(rows)
    assert abs(r.gini - cands[best_t] / n) < 1e-12
