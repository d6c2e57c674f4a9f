"""Property tests for approximate aggregates (SURVEY §2.2 ≈ rows).

The HLL++ and quantile sketches are engine-specific, so their probes are
rows-only for the driver; these tests supply the missing correctness
signal by bounding sketch error against the exact computation.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from data_and_analytics_etl_spark.catalog import load_table


def test_approx_count_distinct_within_5pct(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    row = o.agg(
        F.countDistinct("o_custkey").alias("exact"),
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx"),
    ).first()
    assert abs(row.approx - row.exact) / row.exact <= 0.05, row


def test_approx_percentile_within_tolerance(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    row = li.agg(
        F.percentile("l_extendedprice", 0.5).alias("exact_p50"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx_p50"),
        F.min("l_extendedprice").alias("lo"),
        F.max("l_extendedprice").alias("hi"),
    ).first()
    # accuracy 10000 -> rank error <= n/10000; bound value error by 1% of range
    assert abs(row.approx_p50 - row.exact_p50) <= 0.01 * (row.hi - row.lo), row


def test_approx_percentile_brackets_exact(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    rows = (li.groupBy("l_returnflag")
            .agg(F.expr("percentile(l_quantity, 0.9)").alias("exact"),
                 F.expr("approx_percentile(l_quantity, 0.9, 10000)")
                  .alias("approx"),
                 F.min("l_quantity").alias("lo"),
                 F.max("l_quantity").alias("hi"))
            .collect())
    for r in rows:
        assert abs(r.approx - r.exact) <= 0.02 * (r.hi - r.lo) + 1e-9, r


def test_hll_sketch_merge_matches_exact_within_5pct(spark, sf_dir):
    """Sketches built per nation then unioned to region must estimate the
    region-level distinct count (mergeability is the point: no re-scan)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    per_nation = (c.groupBy("c_nationkey")
                  .agg(F.hll_sketch_agg("c_custkey").alias("sk")))
    merged = {r.n_regionkey: r.approx for r in
              (per_nation.join(n, per_nation.c_nationkey == n.n_nationkey)
               .groupBy("n_regionkey")
               .agg(F.hll_sketch_estimate(F.hll_union_agg("sk"))
                    .alias("approx"))).collect()}
    exact = {r.n_regionkey: r.exact for r in
             (c.join(n, c.c_nationkey == n.n_nationkey)
              .groupBy("n_regionkey")
              .agg(F.countDistinct("c_custkey").alias("exact"))).collect()}
    assert merged.keys() == exact.keys()
    for k in exact:
        assert abs(merged[k] - exact[k]) / exact[k] <= 0.05, (k, merged[k],
                                                              exact[k])


def test_scd2_intervals_null_attr_runs(spark):
    # value->NULL is a change (not silently dropped), NULL->NULL is one
    # run (not split per row), NULL->value is a change.
    import datetime as dt
    from data_and_analytics_etl_spark.operators.scd import scd2_intervals
    t = [dt.datetime(2024, 1, 1, h) for h in range(6)]
    rows = [(1, t[0], "A"), (1, t[1], "A"), (1, t[2], None),
            (1, t[3], None), (1, t[4], "B"), (1, t[5], None)]
    df = spark.createDataFrame(rows, "k int, ts timestamp, attr string")
    out = scd2_intervals(df, key="k", ts_col="ts", attr="attr")
    got = [(r.attr, r.valid_from, r.valid_to)
           for r in out.orderBy("valid_from").collect()]
    assert got == [("A", t[0], t[2]), (None, t[2], t[4]),
                   ("B", t[4], t[5]), (None, t[5], None)]


def test_point_in_time_join_same_ts_changes_deterministic(spark):
    # Two changes of one key at the SAME timestamp: the superseded value
    # gets a zero-width interval [t, t), which range containment excludes
    # — the lookup at t must deterministically return the surviving
    # (last-by-tie-break) value, never flip between the two dim rows.
    import datetime as dt
    from data_and_analytics_etl_spark.operators.scd import (
        point_in_time_join, scd2_intervals)
    t = [dt.datetime(2024, 1, 1, h) for h in range(4)]
    rows = [(1, t[0], "A", 0), (1, t[1], "B", 0), (1, t[1], "C", 1),
            (1, t[2], "D", 0)]
    df = spark.createDataFrame(rows, "k int, ts timestamp, attr string, "
                                     "seq int")
    dim = scd2_intervals(df, key="k", ts_col="ts", attr="attr",
                         tie_break=("seq",))
    facts = spark.createDataFrame(
        [(1, t[0]), (1, t[1]), (1, t[2]), (1, t[3])],
        "k int, ts timestamp")
    for _ in range(3):  # nondeterminism would flip across executions
        got = {r.ts: r.attr
               for r in point_in_time_join(facts, dim, key="k",
                                           fact_ts="ts",
                                           attr="attr").collect()}
        assert got == {t[0]: "A", t[1]: "C", t[2]: "D", t[3]: "D"}


def test_scd2_intervals_all_null_key(spark):
    import datetime as dt
    from data_and_analytics_etl_spark.operators.scd import scd2_intervals
    t = [dt.datetime(2024, 1, 1, h) for h in range(3)]
    df = spark.createDataFrame([(1, ts, None) for ts in t],
                               "k int, ts timestamp, attr string")
    out = scd2_intervals(df, key="k", ts_col="ts", attr="attr")
    got = [(r.attr, r.valid_from, r.valid_to) for r in out.collect()]
    assert got == [(None, t[0], None)]


class TestRound5Ops:
    """Property tests for the r5 operators (vocab / PMI / winsorize /
    holdout split) beyond their DuckDB oracle rows."""

    def test_holdout_split_is_group_consistent(self, spark, sf_dir):
        from data_and_analytics_etl_spark.operators.sampling import \
            holdout_split
        o = load_table(spark, sf_dir, "orders")
        s = holdout_split(o, "o_custkey", 0.2)
        # leakage guard: no customer appears on both sides
        both = (s.groupBy("o_custkey")
                .agg(F.countDistinct("split").alias("k"))
                .filter(F.col("k") > 1))
        assert both.count() == 0
        # partition: every row labeled, nothing dropped
        assert s.count() == o.count()

    def test_holdout_split_stable_under_union_increment(self, spark, sf_dir):
        """Incremental-load stability: adding more data never flips an
        existing row's side (assignment is a pure key function)."""
        from data_and_analytics_etl_spark.operators.sampling import \
            holdout_split
        o = load_table(spark, sf_dir, "orders")
        half = o.filter(F.col("o_orderkey") % 2 == 0)
        full_map = {r["o_orderkey"]: r["split"]
                    for r in holdout_split(o, "o_custkey", 0.2)
                    .select("o_orderkey", "split").collect()}
        for r in (holdout_split(half, "o_custkey", 0.2)
                  .select("o_orderkey", "split").collect()):
            assert full_map[r["o_orderkey"]] == r["split"]

    def test_winsorize_bounds_invariant_under_repartition(self, spark,
                                                          sf_dir):
        from data_and_analytics_etl_spark.operators.binning import \
            winsorize_bounds
        li = load_table(spark, sf_dir, "lineitem")
        a = winsorize_bounds(li, "l_returnflag", "l_extendedprice")
        b = winsorize_bounds(li.repartition(17, "l_orderkey"),
                             "l_returnflag", "l_extendedprice")
        assert sorted(map(tuple, a.collect())) == \
            sorted(map(tuple, b.collect()))

    def test_winsorize_bounds_are_order_statistics(self, spark, sf_dir):
        """lo/hi must be members of the group's value multiset, and the
        clamp counts must respect alpha."""
        from data_and_analytics_etl_spark.operators.binning import \
            winsorize_bounds
        li = load_table(spark, sf_dir, "lineitem")
        rows = winsorize_bounds(li, "l_returnflag", "l_extendedprice",
                                alpha=0.05).collect()
        vals = {g: {r["l_extendedprice"] for r in grp}
                for g, grp in __import__("itertools").groupby(
                    sorted(li.select("l_returnflag", "l_extendedprice")
                           .collect(), key=lambda r: r[0]),
                    key=lambda r: r[0])}
        for r in rows:
            assert r["lo"] in vals[r["l_returnflag"]]
            assert r["hi"] in vals[r["l_returnflag"]]
            assert r["lo"] <= r["hi"]
            # at most alpha of the rows sit strictly outside each bound
            assert r["n_below"] <= 0.05 * r["n"]
            assert r["n_above"] <= 0.05 * r["n"] + 1

    def test_build_vocab_ids_are_dense_and_ordered(self, spark, sf_dir):
        from data_and_analytics_etl_spark.operators.text import build_vocab
        d = load_table(spark, sf_dir, "documents")
        v = build_vocab(d, min_count=3).orderBy("token_id").collect()
        assert [r["token_id"] for r in v] == list(range(1, len(v) + 1))
        counts = [r["n_token"] for r in v]
        assert counts == sorted(counts, reverse=True)
        assert all(r["n_token"] >= 3 for r in v)

    def test_bigram_pmi_known_corpus(self, spark):
        """Hand-checkable corpus: 'a b' occurs twice of 4 bigrams;
        unigrams a:3 b:3 of 8 -> PMI = ln((2/4)/((3/8)^2)) = ln(32/9)."""
        import math
        from data_and_analytics_etl_spark.operators.text import bigram_pmi
        df = spark.createDataFrame(
            [("a b c b",), ("b a a b",)], ["text"])
        got = {(r["w1"], r["w2"]): (r["c_xy"], r["pmi"])
               for r in bigram_pmi(df, min_count=2).collect()}
        # bigrams: (a,b) (b,c) (c,b) | (b,a) (a,a) (a,b) -> c_xy(a,b)=2, n_big=6
        # unigrams: a x4, b x4, c x1? -> recount: 'a b c b' = a,b,c,b; 'b a a b' = b,a,a,b
        # a:3? a appears 1 + 2 = 3... b: 2 + 2 = 4, c: 1; n_uni = 8
        exp = math.log((2 / 6) / ((3 / 8) * (4 / 8)))
        assert got[("a", "b")][0] == 2
        assert abs(got[("a", "b")][1] - round(exp, 4)) < 1e-9


class TestKfoldAssign:
    def test_kfold_partitions_rows_group_consistently(self, spark, sf_dir):
        from data_and_analytics_etl_spark.operators.sampling import \
            kfold_assign
        o = load_table(spark, sf_dir, "orders")
        s = kfold_assign(o, "o_custkey", k=5)
        assert s.count() == o.count()
        assert (s.groupBy("o_custkey")
                .agg(F.countDistinct("fold").alias("k"))
                .filter(F.col("k") > 1).count()) == 0
        folds = {r["fold"] for r in s.select("fold").distinct().collect()}
        assert folds <= set(range(5))

    def test_kfold_folds_are_roughly_balanced(self, spark, sf_dir):
        from data_and_analytics_etl_spark.operators.sampling import \
            kfold_assign
        o = load_table(spark, sf_dir, "orders")
        counts = {r["fold"]: r["n"] for r in
                  kfold_assign(o, "o_custkey", k=4).groupBy("fold")
                  .agg(F.count(F.lit(1)).alias("n")).collect()}
        n = sum(counts.values())
        for c in counts.values():
            assert abs(c - n / 4) < 0.15 * n

    def test_kfold_equals_holdout_at_matching_threshold(self, spark,
                                                        sf_dir):
        """fold 0 of k=5 == holdout at frac 51/256 (same bucket range)."""
        from data_and_analytics_etl_spark.operators.sampling import (
            holdout_split, kfold_assign)
        o = load_table(spark, sf_dir, "orders")
        f0 = {r["o_orderkey"] for r in
              kfold_assign(o, "o_custkey", 5).filter("fold = 0")
              .select("o_orderkey").collect()}
        h = {r["o_orderkey"] for r in
             holdout_split(o, "o_custkey", 51 / 256)
             .filter("split = 'holdout'").select("o_orderkey").collect()}
        assert f0 == h

    def test_kfold_rejects_bad_k(self, spark, sf_dir):
        import pytest as _pytest
        from data_and_analytics_etl_spark.operators.sampling import \
            kfold_assign
        o = load_table(spark, sf_dir, "orders")
        with _pytest.raises(ValueError):
            kfold_assign(o, "o_custkey", k=1)


class TestDriftKs:
    def test_ks_zero_on_identical_snapshots(self, spark, sf_dir):
        from data_and_analytics_etl_spark.operators.profile import drift_ks
        ev = load_table(spark, sf_dir, "events").filter(
            F.col("value").isNotNull())
        r = drift_ks(ev, ev, "value", lo=0.0, hi=500.0, nbins=32).collect()
        assert len(r) == 1 and r[0]["ks"] == 0.0

    def test_ks_invariant_to_grid_choice(self, spark, sf_dir):
        """The grid only parallelizes the cumulative — the statistic must
        be EXACT for any (lo, hi, nbins), including grids that clamp."""
        from data_and_analytics_etl_spark.operators.profile import drift_ks
        ev = load_table(spark, sf_dir, "events").filter(
            F.col("value").isNotNull())
        a = ev.filter(F.col("user_id") % 2 == 0)
        b = ev.filter(F.col("user_id") % 2 == 1)
        results = {
            grid: drift_ks(a, b, "value", lo=lo, hi=hi,
                           nbins=nb).collect()[0]
            for grid, (lo, hi, nb) in {
                "wide": (0.0, 500.0, 64),
                "narrow_clamping": (100.0, 200.0, 8),
                "single_bucket": (0.0, 500.0, 1),
            }.items()}
        ks = {g: (r["ks"], r["at_value"]) for g, r in results.items()}
        assert len(set(ks.values())) == 1, ks

    def test_ks_detects_injected_shift(self, spark, sf_dir):
        from data_and_analytics_etl_spark.operators.profile import drift_ks
        ev = load_table(spark, sf_dir, "events").filter(
            F.col("value").isNotNull())
        shifted = ev.withColumn("value", F.col("value") + 100.0)
        r = drift_ks(ev, shifted, "value", 0.0, 600.0, 32).collect()[0]
        assert r["ks"] > 0.2

    def test_split_variant_equals_two_frame_form(self, spark, sf_dir):
        """drift_ks_split (single-scan predicate tagging — the r8 b14
        plan fix) must produce the identical 1-row result as drift_ks
        over the two filtered frames, for cuts that land mid-data and
        at the edges."""
        from data_and_analytics_etl_spark.operators.profile import (
            drift_ks, drift_ks_split)
        ev = load_table(spark, sf_dir, "events").filter(
            F.col("value").isNotNull())
        for cond in (F.col("ts") < "2024-01-16",
                     F.col("user_id") % 3 == 0):
            two = drift_ks(ev.filter(cond), ev.filter(~cond), "value",
                           0.0, 500.0, 16).collect()
            one = drift_ks_split(ev, cond, "value",
                                 0.0, 500.0, 16).collect()
            assert [tuple(r) for r in one] == [tuple(r) for r in two]


class TestTemperatureMixture:
    def test_flattens_toward_sqrt_proportions(self, spark, sf_dir):
        from data_and_analytics_etl_spark.operators.sampling import \
            temperature_mixture_sample
        import math
        d = load_table(spark, sf_dir, "documents")
        nat = {r["source"]: r["n"] for r in
               d.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
               .collect()}
        kept = {r["source"]: r["n"] for r in
                temperature_mixture_sample(d, "doc_id", "source",
                                           target_rows=500, alpha=0.5)
                .groupBy("source").agg(F.count(F.lit(1)).alias("n"))
                .collect()}
        # kept share should track sqrt(n) share, not natural share:
        # the keep RATE for small strata >= rate for large strata
        rates = sorted((nat[s], kept.get(s, 0) / nat[s]) for s in nat)
        assert rates[0][1] >= rates[-1][1] - 1 / 256
        # 1/256 quantization: total lands near the target
        assert 0.5 * 500 <= sum(kept.values()) <= 1.5 * 500

    def test_alpha_restriction_is_explicit(self, spark, sf_dir):
        import pytest as _pytest
        from data_and_analytics_etl_spark.operators.sampling import \
            temperature_mixture_sample
        d = load_table(spark, sf_dir, "documents")
        with _pytest.raises(NotImplementedError):
            temperature_mixture_sample(d, "doc_id", "source",
                                       target_rows=100, alpha=0.7)

    def test_membership_is_subset_stable(self, spark, sf_dir):
        """A stratum's kept set at a smaller target is a subset of its
        kept set at a larger target (thresholds are nested prefixes)."""
        from data_and_analytics_etl_spark.operators.sampling import \
            temperature_mixture_sample
        d = load_table(spark, sf_dir, "documents")
        small = {r["doc_id"] for r in
                 temperature_mixture_sample(d, "doc_id", "source", 300)
                 .select("doc_id").collect()}
        big = {r["doc_id"] for r in
               temperature_mixture_sample(d, "doc_id", "source", 900)
               .select("doc_id").collect()}
        assert small <= big


class TestQualityChecks:
    def test_quarantine_split_partitions_rows(self, spark, sf_dir):
        from data_and_analytics_etl_spark.operators.profile import \
            quarantine_violations
        o = load_table(spark, sf_dir, "orders")
        checks = {"price_cap": F.col("o_totalprice") < 300000,
                  "status_O": F.col("o_orderstatus") == "O"}
        good, bad = quarantine_violations(o, checks)
        assert good.count() + bad.count() == o.count()
        # every quarantined row names at least one real failed check
        sample = bad.limit(50).collect()
        assert sample and all(len(r["__violations"]) >= 1 for r in sample)
        for r in sample:
            if "price_cap" in r["__violations"]:
                assert r["o_totalprice"] >= 300000

    def test_null_predicate_counts_as_violation(self, spark):
        from data_and_analytics_etl_spark.operators.profile import \
            check_constraints
        df = spark.createDataFrame(
            [(1, 10.0), (2, None), (3, -5.0)], "id long, v double")
        out = {r["check"]: r["n_violations"] for r in
               check_constraints(df, {"v_pos": F.col("v") > 0}).collect()}
        assert out["v_pos"] == 2  # NULL and -5 both violate

    def test_referential_orphans_detected(self, spark):
        from data_and_analytics_etl_spark.operators.profile import \
            check_referential_integrity
        fact = spark.createDataFrame(
            [(1, 10), (2, 10), (3, 99), (4, 98)], "id long, fk long")
        dim = spark.createDataFrame([(10,)], "k long")
        r = check_referential_integrity(fact, "fk", dim, "k").collect()[0]
        assert (r["n_fact_rows"], r["n_orphan_rows"],
                r["n_orphan_keys"]) == (4, 2, 2)
        assert r["orphan_rate"] == 0.5


class TestRound6Ops:
    """Property tests for the r6 operators beyond their oracle rows."""

    def test_time_weighted_avg_constant_signal(self, spark):
        # a constant signal's TWA is the constant, regardless of how
        # irregular the sampling is
        import datetime as dt
        from data_and_analytics_etl_spark.operators.timeseries import \
            time_weighted_avg
        t0 = dt.datetime(2024, 1, 1)
        rows = [(1, t0 + dt.timedelta(seconds=s), 42.0, i)
                for i, s in enumerate([0, 1, 10, 3600, 3601])]
        df = spark.createDataFrame(
            rows, "user_id long, ts timestamp, value double, event_id long")
        out = time_weighted_avg(df, "user_id", "ts", "value",
                                tie_break="event_id").collect()
        assert len(out) == 1
        assert out[0].twa == 42.0
        assert out[0].observed_us == 3601 * 1_000_000

    def test_time_weighted_avg_weights_by_duration(self, spark):
        # value 10 held 9s, value 20 held 1s -> twa = (10*9+20*1)/10 = 11
        import datetime as dt
        from data_and_analytics_etl_spark.operators.timeseries import \
            time_weighted_avg
        t0 = dt.datetime(2024, 1, 1)
        rows = [(1, t0, 10.0, 0),
                (1, t0 + dt.timedelta(seconds=9), 20.0, 1),
                (1, t0 + dt.timedelta(seconds=10), 99.0, 2)]  # no successor
        df = spark.createDataFrame(
            rows, "user_id long, ts timestamp, value double, event_id long")
        out = time_weighted_avg(df, "user_id", "ts", "value",
                                tie_break="event_id").collect()
        assert out[0].twa == 11.0

    def test_time_weighted_avg_single_observation_drops(self, spark):
        import datetime as dt
        from data_and_analytics_etl_spark.operators.timeseries import \
            time_weighted_avg
        df = spark.createDataFrame(
            [(1, dt.datetime(2024, 1, 1), 5.0, 0)],
            "user_id long, ts timestamp, value double, event_id long")
        assert time_weighted_avg(df, "user_id", "ts", "value").count() == 0

    def test_cap_per_group_bounds_and_stability(self, spark, sf_dir):
        import pyspark.sql.functions as F
        from data_and_analytics_etl_spark.catalog import load_table
        from data_and_analytics_etl_spark.operators.sampling import \
            cap_per_group
        d = load_table(spark, sf_dir, "documents")
        kept1 = cap_per_group(d, "source", "doc_id", 5)
        sizes = {r.source: r.n for r in
                 kept1.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
                 .collect()}
        assert sizes and all(n <= 5 for n in sizes.values())
        # stability: same subset across a different partitioning
        kept2 = cap_per_group(d.repartition(7), "source", "doc_id", 5)
        ids1 = sorted(r.doc_id for r in kept1.select("doc_id").collect())
        ids2 = sorted(r.doc_id for r in kept2.select("doc_id").collect())
        assert ids1 == ids2


class TestRound7ThirdWave:
    """Property tests for the skyline / segment-dedup / curriculum ops."""

    def test_skyline_matches_bruteforce(self, spark):
        # deterministic scatter; brute-force dominance is the spec
        import pyspark.sql.functions as F
        pts = [((i * 37) % 101, (i * 53) % 97) for i in range(200)]
        df = spark.createDataFrame(pts, "x int, y int")
        from data_and_analytics_etl_spark.operators.skyline import skyline_2d
        got = sorted((r.x, r.y) for r in
                     skyline_2d(df, "x", "y", maximize_y=False).collect())
        dpts = set(pts)
        want = sorted(
            p for p in dpts
            if not any(q[0] <= p[0] and q[1] <= p[1] and q != p
                       for q in dpts))
        assert got == want

    def test_skyline_maximize_y_and_duplicates(self, spark):
        # duplicates collapse; (1,9) and (3,9) -> only (1,9) survives
        # when maximizing y (same y, higher price dominated)
        df = spark.createDataFrame(
            [(1.0, 9), (1.0, 9), (3.0, 9), (2.0, 12), (5.0, 1)],
            "price double, sz int")
        from data_and_analytics_etl_spark.operators.skyline import skyline_2d
        got = sorted((r.price, r.sz) for r in
                     skyline_2d(df, "price", "sz", maximize_y=True)
                     .collect())
        assert got == [(1.0, 9), (2.0, 12)]

    def test_skyline_single_value_bin_degenerate(self, spark):
        # all x equal: the xhi==xlo branch must not divide by zero and
        # only the best-y row survives
        df = spark.createDataFrame(
            [(7, 3), (7, 1), (7, 5)], "x int, y int")
        from data_and_analytics_etl_spark.operators.skyline import skyline_2d
        got = [(r.x, r.y) for r in skyline_2d(df, "x", "y").collect()]
        assert got == [(7, 1)]

    def test_segment_dedup_keeps_first_occurrence(self, spark):
        # doc 1 and doc 2 share a 3-word block; doc 2 loses it
        from data_and_analytics_etl_spark.operators.corpus import \
            segment_dedup
        df = spark.createDataFrame(
            [(1, "a b c x y z"), (2, "a b c q r s")],
            "doc_id long, text string")
        out = {r.doc_id: r for r in
               segment_dedup(df, n_words=3).collect()}
        assert out[1].n_segments == 2 and out[1].n_kept == 2
        assert out[1].text_kept == "a b c x y z"
        assert out[2].n_segments == 2 and out[2].n_kept == 1
        assert out[2].text_kept == "q r s"

    def test_segment_dedup_reassembly_preserves_order(self, spark):
        from data_and_analytics_etl_spark.operators.corpus import \
            segment_dedup
        text = " ".join(f"w{i}" for i in range(50))
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        row = segment_dedup(df, n_words=20).collect()[0]
        assert row.n_segments == 3  # 20 + 20 + 10
        assert row.text_kept == text

    def test_segment_dedup_within_doc_repeat(self, spark):
        # the same block twice INSIDE one doc: second copy removed
        from data_and_analytics_etl_spark.operators.corpus import \
            segment_dedup
        df = spark.createDataFrame(
            [(1, "p q r p q r")], "doc_id long, text string")
        row = segment_dedup(df, n_words=3).collect()[0]
        assert (row.n_segments, row.n_kept, row.text_kept) == \
            (2, 1, "p q r")

    def test_curriculum_positions_unique_and_interleaved(self, spark):
        from data_and_analytics_etl_spark.operators.corpus import \
            curriculum_order
        rows = [(i, (i * 13) % 997) for i in range(300)]
        df = spark.createDataFrame(rows, "doc_id long, n_chars long")
        out = curriculum_order(df, "n_chars", n_stages=10).collect()
        pos = [r.curriculum_pos for r in out]
        assert len(set(pos)) == len(pos)  # injective
        # the first n_stages-by-position prefix covers every non-empty
        # stage before any stage repeats
        by_pos = sorted(out, key=lambda r: r.curriculum_pos)
        seen, first_cycle = set(), []
        for r in by_pos:
            if r.stage in seen:
                break
            seen.add(r.stage)
            first_cycle.append(r.stage)
        assert len(first_cycle) == len({r.stage for r in out})

    def test_curriculum_constant_difficulty(self, spark):
        from data_and_analytics_etl_spark.operators.corpus import \
            curriculum_order
        df = spark.createDataFrame(
            [(i, 100) for i in range(5)], "doc_id long, n_chars long")
        out = curriculum_order(df, "n_chars", n_stages=10).collect()
        assert {r.stage for r in out} == {1}
        assert sorted(r.curriculum_pos for r in out) == \
            [1, 11, 21, 31, 41]


class TestShardByWeight:
    def test_matches_global_cumsum_definition(self, spark):
        from data_and_analytics_etl_spark.operators.corpus import \
            shard_by_weight
        rows = [(i, 10 + (i * 7) % 90) for i in range(500)]
        df = spark.createDataFrame(rows, "doc_id long, w long")
        got = {r.doc_id: r.shard for r in
               shard_by_weight(df, "w", target_weight=1000,
                               n_buckets=16).collect()}
        order = sorted(rows, key=lambda t: (t[0] % 16, t[0]))
        cum = 0
        for doc_id, w in order:
            assert got[doc_id] == cum // 1000
            cum += w

    def test_shard_weight_bounded_by_largest_doc(self, spark):
        from data_and_analytics_etl_spark.operators.corpus import \
            shard_by_weight
        rows = [(i, 10 + (i * 37) % 190) for i in range(800)]
        df = spark.createDataFrame(rows, "doc_id long, w long")
        out = shard_by_weight(df, "w", target_weight=2000).groupBy(
            "shard").sum("w").collect()
        max_doc = max(w for _, w in rows)
        full = [r for r in out if r.shard < max(x.shard for x in out)]
        for r in full:  # every non-final shard within one doc of target
            assert 2000 - max_doc <= r["sum(w)"] < 2000 + max_doc

    def test_stable_across_partitioning(self, spark):
        from data_and_analytics_etl_spark.operators.corpus import \
            shard_by_weight
        rows = [(i, 50) for i in range(200)]
        df = spark.createDataFrame(rows, "doc_id long, w long")
        a = {(r.doc_id, r.shard) for r in
             shard_by_weight(df, "w", 500).collect()}
        b = {(r.doc_id, r.shard) for r in
             shard_by_weight(df.repartition(13), "w", 500).collect()}
        assert a == b


class TestBm25:
    def test_rare_term_outscores_common(self, spark):
        from data_and_analytics_etl_spark.operators.text import bm25_scores
        rows = [(1, "rare common common"), (2, "common common common"),
                (3, "common filler words"), (4, "filler words only")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r.doc_id: r.bm25 for r in
               bm25_scores(df, ["rare", "common"]).collect()}
        assert 4 not in out           # no query term -> no row
        assert out[1] > out[2]        # rare-term doc wins
        assert out[2] > out[3]        # tf saturation still orders

    def test_doclen_normalization(self, spark):
        # same tf, longer doc -> lower score (b > 0)
        from data_and_analytics_etl_spark.operators.text import bm25_scores
        rows = [(1, "hit aa"), (2, "hit " + "pad " * 40)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r.doc_id: r.bm25 for r in
               bm25_scores(df, ["hit"]).collect()}
        assert out[1] > out[2]

    def test_empty_query_raises(self, spark):
        import pytest
        from data_and_analytics_etl_spark.operators.text import bm25_scores
        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(ValueError):
            bm25_scores(df, [])


class TestInvertedIndex:
    def test_blocks_bounded_and_ordered(self, spark):
        from data_and_analytics_etl_spark.operators.text import \
            inverted_index
        rows = [(i, "hot " * 10) for i in range(30)]  # 300 'hot' postings
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = sorted(inverted_index(df, block_size=128).collect(),
                     key=lambda r: r.block)
        assert [r.block for r in out] == [0, 1, 2]
        assert [r.n_postings for r in out] == [128, 128, 44]
        # postings within and across blocks are (doc, pos)-ordered
        flat = " ".join(r.postings for r in out).split(" ")
        pairs = [tuple(map(int, p.split(":"))) for p in flat]
        assert pairs == sorted(pairs)
        assert len(pairs) == 300

    def test_positions_skip_filtered_empties(self, spark):
        from data_and_analytics_etl_spark.operators.text import \
            inverted_index
        df = spark.createDataFrame([(1, "  a   b  ")],
                                   "doc_id long, text string")
        out = {r.token: r.postings for r in
               inverted_index(df).collect()}
        assert out == {"a": "1:0", "b": "1:1"}


class TestDpNoisyCounts:
    def test_noise_bounded_and_deterministic(self, spark):
        import math
        from data_and_analytics_etl_spark.operators.profile import \
            dp_noisy_counts
        rows = [(i, f"g{i % 5}") for i in range(1000)]
        df = spark.createDataFrame(rows, "id long, g string")
        out1 = {r.g: r.noisy_micro for r in
                dp_noisy_counts(df, "g", epsilon=1.0).collect()}
        out2 = {r.g: r.noisy_micro for r in
                dp_noisy_counts(df.repartition(7), "g",
                                epsilon=1.0).collect()}
        assert out1 == out2  # seed-deterministic across partitionings
        # u in (0,1) with 24-bit grid -> |noise| <= b * ln(2^25)
        bound = math.log(2 ** 25) * 1_000_000
        for g, nm in out1.items():
            assert abs(nm - 200 * 1_000_000) <= bound
        # exact count must not be recoverable: some group has nonzero
        # noise (all-zero would mean the mechanism is the identity)
        assert any(nm != 200 * 1_000_000 for nm in out1.values())

    def test_epsilon_scales_noise(self, spark):
        from data_and_analytics_etl_spark.operators.profile import \
            dp_noisy_counts
        df = spark.createDataFrame([(i, "a") for i in range(100)],
                                   "id long, g string")
        n1 = dp_noisy_counts(df, "g", epsilon=1.0).collect()[0]
        n01 = dp_noisy_counts(df, "g", epsilon=0.1).collect()[0]
        d1 = abs(n1.noisy_micro - 100_000_000)
        d01 = abs(n01.noisy_micro - 100_000_000)
        # same u, b scales 10x (up to the 1e-6 grid)
        assert abs(d01 - 10 * d1) <= 10


class TestMondrianAnonymize:
    def test_k_guarantee_and_partition(self, spark):
        from data_and_analytics_etl_spark.operators.profile import \
            mondrian_anonymize
        rows = [(i, float((i * 37) % 997), (i * 13) % 7)
                for i in range(400)]
        df = spark.createDataFrame(rows, "id long, x double, y int")
        anon = mondrian_anonymize(df, ["x", "y"], k=20)
        import pyspark.sql.functions as F
        sizes = [r["cnt"] for r in
                 anon.groupBy("__class")
                 .agg(F.count("*").alias("cnt")).collect()]
        assert min(sizes) >= 20       # the k-guarantee
        assert sum(sizes) == 400      # a partition: no row lost/duped
        assert len(sizes) > 1         # it actually split

    def test_passes_k_anonymity_audit(self, spark):
        # the transform must satisfy the repo's own audit operator
        from data_and_analytics_etl_spark.operators.profile import \
            k_anonymity, mondrian_anonymize
        rows = [(i, float(i % 50), i % 3) for i in range(300)]
        df = spark.createDataFrame(rows, "id long, x double, y int")
        anon = mondrian_anonymize(df, ["x", "y"], k=15)
        audit = k_anonymity(anon, ["__class"], k=15).collect()
        assert audit and all(not r.violates_k for r in audit)

    def test_deterministic_across_partitioning(self, spark):
        from data_and_analytics_etl_spark.operators.profile import \
            mondrian_anonymize
        rows = [(i, float((i * 7) % 101), (i * 3) % 11)
                for i in range(200)]
        df = spark.createDataFrame(rows, "id long, x double, y int")
        a = {(r.id, r["__class"]) for r in
             mondrian_anonymize(df, ["x", "y"], k=10).collect()}
        b = {(r.id, r["__class"]) for r in
             mondrian_anonymize(df.repartition(9), ["x", "y"],
                                k=10).collect()}
        assert a == b

    def test_small_input_single_class(self, spark):
        from data_and_analytics_etl_spark.operators.profile import \
            mondrian_anonymize
        df = spark.createDataFrame([(i, float(i)) for i in range(5)],
                                   "id long, x double")
        anon = mondrian_anonymize(df, ["x"], k=4).collect()
        assert {r["__class"] for r in anon} == {0}  # 5 < 2k: no split

    def test_bad_params_raise(self, spark):
        import pytest
        from data_and_analytics_etl_spark.operators.profile import \
            mondrian_anonymize
        df = spark.createDataFrame([(1, 1.0)], "id long, x double")
        with pytest.raises(ValueError):
            mondrian_anonymize(df, [], k=5)
        with pytest.raises(ValueError):
            mondrian_anonymize(df, ["x"], k=1)


class TestZonemapPrune:
    def test_no_false_negatives(self, spark):
        from data_and_analytics_etl_spark.operators.layout import (
            zonemap_index, zonemap_prune)
        rows = [(i % 4, float((i * 17) % 100)) for i in range(200)]
        df = spark.createDataFrame(rows, "p int, v double")
        idx = zonemap_index(df, ["p"], ["v"])
        kept = {r.p for r in zonemap_prune(idx, "v", 40.0, 60.0)
                .collect()}
        must = {r.p for r in
                df.filter((df.v >= 40.0) & (df.v <= 60.0))
                .select("p").distinct().collect()}
        assert must <= kept  # every partition with a match survives

    def test_disjoint_range_prunes_everything(self, spark):
        from data_and_analytics_etl_spark.operators.layout import (
            zonemap_index, zonemap_prune)
        df = spark.createDataFrame([(0, 1.0), (1, 2.0)],
                                   "p int, v double")
        idx = zonemap_index(df, ["p"], ["v"])
        assert zonemap_prune(idx, "v", 10.0, 20.0).count() == 0


class TestSegmentDedupEdge:
    def test_empty_and_whitespace_docs_emit_no_segments(self, spark):
        from data_and_analytics_etl_spark.operators.corpus import \
            segment_dedup
        df = spark.createDataFrame(
            [(1, ""), (2, "   "), (3, "a b")],
            "doc_id long, text string")
        out = {r.doc_id: r for r in segment_dedup(df, n_words=3).collect()}
        assert set(out) == {3}  # empty docs vanish (oracle parity)
        assert out[3].text_kept == "a b"


class TestHoltWinters:
    @staticmethod
    def _replay(vals, m, a=0.5, b=0.25, g=0.5):
        # pure-Python replay of the documented IEEE chain
        l = 0.0
        for v in vals[:m]:
            l = l + v
        l = l / float(m)
        s = [v - l for v in vals[:m]]
        bt = 0.0
        for j, v in enumerate(vals[m:]):
            p = j % m
            sm = s[p]
            lt = a * (v - sm) + (1.0 - a) * (l + bt)
            bt = b * (lt - l) + (1.0 - b) * bt
            s[p] = g * (v - lt) + (1.0 - g) * sm
            l = lt
        nxt = s[len(vals[m:]) % m]
        return l, bt, s, l + bt + nxt

    def test_bit_identical_to_python_replay(self, spark):
        from data_and_analytics_etl_spark.operators.timeseries import \
            holt_winters_seasonal
        vals = [10.0 + (i % 4) * 3.0 + i * 0.5 + ((i * 7) % 5) * 0.25
                for i in range(23)]
        rows = [(1, i, v) for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "k long, t long, v double")
        r = holt_winters_seasonal(df, "k", "t", "v", period=4).collect()[0]
        l, b, s, f1 = self._replay(vals, 4)
        assert r.level == l and r.trend == b  # bit-identical, no approx
        assert list(r.seasonal) == s
        assert r.forecast_1 == f1

    def test_seasonal_signal_recovered(self, spark):
        # pure seasonal square wave, no trend: forecast continues it
        from data_and_analytics_etl_spark.operators.timeseries import \
            holt_winters_seasonal
        vals = [100.0 if i % 2 == 0 else 0.0 for i in range(40)]
        df = spark.createDataFrame([(1, i, v) for i, v in enumerate(vals)],
                                   "k long, t long, v double")
        r = holt_winters_seasonal(df, "k", "t", "v", period=2).collect()[0]
        assert abs(r.trend) < 1.0
        assert r.forecast_1 > 60.0  # t=40 is even -> high phase

    def test_short_series_null_state(self, spark):
        from data_and_analytics_etl_spark.operators.timeseries import \
            holt_winters_seasonal
        df = spark.createDataFrame([(1, i, float(i)) for i in range(4)],
                                   "k long, t long, v double")
        r = holt_winters_seasonal(df, "k", "t", "v", period=4).collect()[0]
        assert r.n_obs == 4
        assert r.level is None and r.forecast_1 is None

    def test_deterministic_across_partitioning(self, spark):
        from data_and_analytics_etl_spark.operators.timeseries import \
            holt_winters_seasonal
        rows = [(k, i, float((k * 31 + i * 7) % 50))
                for k in range(3) for i in range(30)]
        df = spark.createDataFrame(rows, "k long, t long, v double")
        a = sorted(map(tuple, holt_winters_seasonal(
            df, "k", "t", "v", period=6).drop("seasonal").collect()))
        b = sorted(map(tuple, holt_winters_seasonal(
            df.repartition(11), "k", "t", "v",
            period=6).drop("seasonal").collect()))
        assert a == b


class TestAveragePrecision:
    def test_hand_computed_ap(self, spark):
        # ranking by score desc: items rel pattern 1,0,1,0 ->
        # AP@4 = (1/2) * (1/1 + 2/3)
        from data_and_analytics_etl_spark.operators.evaluation import \
            average_precision_at_k
        import pyspark.sql.functions as F
        rows = [("q", 4.0, 1, 1), ("q", 3.0, 0, 2),
                ("q", 2.0, 1, 3), ("q", 1.0, 0, 4)]
        df = spark.createDataFrame(rows, "q string, s double, rel int, "
                                         "t int")
        r = average_precision_at_k(df, F.col("q"), F.col("s"),
                                   F.col("rel") == 1, F.col("t"),
                                   k=4).collect()[0]
        assert r.ap_at_k == (1.0 + 2.0 / 3.0) / 2.0
        assert r.n_rel == 2

    def test_no_relevant_is_null_perfect_is_one(self, spark):
        from data_and_analytics_etl_spark.operators.evaluation import \
            average_precision_at_k
        import pyspark.sql.functions as F
        rows = [("none", 2.0, 0, 1), ("none", 1.0, 0, 2),
                ("perfect", 2.0, 1, 1), ("perfect", 1.0, 1, 2)]
        df = spark.createDataFrame(rows, "q string, s double, rel int, "
                                         "t int")
        got = {r.q: r.ap_at_k for r in average_precision_at_k(
            df, F.col("q"), F.col("s"), F.col("rel") == 1,
            F.col("t"), k=10).collect()}
        assert got["none"] is None
        assert got["perfect"] == 1.0

    def test_null_score_counts_toward_r_but_never_ranks(self, spark):
        """A relevant item we FAILED to score must still count toward
        R (denominator) while never occupying a ranked position —
        dropping it would inflate AP@k for partially-scored inputs
        (r7 advice). Here: scored rel at position 1, unscored rel ->
        R=2, AP@4 = (1/2)·(1/1) = 0.5, n_items = 3."""
        import pyspark.sql.functions as F

        from data_and_analytics_etl_spark.operators.evaluation import \
            average_precision_at_k
        rows = [("q", 4.0, 1, 1), ("q", 3.0, 0, 2), ("q", None, 1, 3)]
        df = spark.createDataFrame(rows, "q string, s double, rel int, "
                                         "t int")
        r = average_precision_at_k(df, F.col("q"), F.col("s"),
                                   F.col("rel") == 1, F.col("t"),
                                   k=4).collect()[0]
        assert r.n_items == 3 and r.n_rel == 2
        assert r.ap_at_k == 0.5


class TestQuotaAllocate:
    def test_sums_to_total_and_within_one_of_share(self, spark):
        from data_and_analytics_etl_spark.operators.sampling import \
            quota_allocate
        rows = [(i, f"s{(i * 7) % 5}") for i in range(997)]
        df = spark.createDataFrame(rows, "id long, s string")
        out = quota_allocate(df, "s", total=100).collect()
        assert sum(r.quota for r in out) == 100
        for r in out:
            share = 100 * r.n_rows / 997
            assert abs(r.quota - share) < 1.0

    def test_total_zero_and_exact_division(self, spark):
        from data_and_analytics_etl_spark.operators.sampling import \
            quota_allocate
        df = spark.createDataFrame(
            [(i, f"s{i % 4}") for i in range(80)], "id long, s string")
        z = quota_allocate(df, "s", total=0).collect()
        assert all(r.quota == 0 for r in z)
        e = quota_allocate(df, "s", total=40).collect()
        assert all(r.quota == 10 for r in e)  # exact shares, no remainder


class TestInterarrivalStats:
    def test_regular_timer_vs_bursty(self, spark):
        import datetime as dt
        from data_and_analytics_etl_spark.operators.timeseries import \
            interarrival_stats
        t0 = dt.datetime(2024, 1, 1)
        rows = ([(1, t0 + dt.timedelta(seconds=10 * i), i)
                 for i in range(20)]       # perfect timer
                + [(2, t0 + dt.timedelta(seconds=s), 100 + i)
                   for i, s in enumerate(
                       [0, 1, 2, 3, 1000, 1001, 1002, 2500])])  # bursty
        df = spark.createDataFrame(rows,
                                   "user_id long, ts timestamp, "
                                   "event_id long")
        out = {r.user_id: r for r in
               interarrival_stats(df, "user_id", "ts",
                                  "event_id").collect()}
        assert out[1].burstiness == -1.0   # sigma 0 -> (0-mu)/(0+mu)
        assert out[2].burstiness > 0.2     # bursty side of Poisson
        assert out[1].mean_gap_us == 10_000_000.0

    def test_single_event_key_absent(self, spark):
        import datetime as dt
        from data_and_analytics_etl_spark.operators.timeseries import \
            interarrival_stats
        df = spark.createDataFrame(
            [(1, dt.datetime(2024, 1, 1), 0)],
            "user_id long, ts timestamp, event_id long")
        assert interarrival_stats(df, "user_id", "ts",
                                  "event_id").count() == 0


class TestSsspHops:
    def test_hand_graph_distances(self, spark):
        from data_and_analytics_etl_spark.operators.graph import sssp_hops
        edges = spark.createDataFrame(
            [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4), (9, 10)],
            "src long, dst long")
        got = {r.node: r.depth for r in
               sssp_hops(edges, 0, max_depth=6).collect()}
        # 9/10 unreachable from 0; 3 via the SHORTER of two paths
        assert got == {0: 0, 1: 1, 2: 1, 3: 2, 4: 3}

    def test_cycle_capped_by_horizon(self, spark):
        from data_and_analytics_etl_spark.operators.graph import sssp_hops
        edges = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
        got = {r.node: r.depth for r in
               sssp_hops(edges, 0, max_depth=4).collect()}
        assert got == {0: 0, 1: 1}  # revisits never improve depth


class TestCostSensitiveReport:
    def test_exact_costs(self, spark):
        import pyspark.sql.functions as F
        from data_and_analytics_etl_spark.operators.evaluation import \
            cost_sensitive_report
        rows = [("a", "a")] * 3 + [("a", "b")] * 2 + [("b", "b")]
        df = spark.createDataFrame(rows, "t string, p string")
        out = {r.truth: r for r in cost_sensitive_report(
            df, F.col("t"), F.col("p"),
            {("a", "b"): 5, ("b", "a"): 1}).collect()}
        assert out["a"].n == 5 and out["a"].n_correct == 3
        assert out["a"].total_cost == 10  # 2 mistakes x cost 5
        assert out["a"].mean_cost == 2.0
        assert out["b"].total_cost == 0


class TestThirdSessionEdges:
    def test_skyline_nulls_and_single_point(self, spark):
        from data_and_analytics_etl_spark.operators.skyline import skyline_2d
        df = spark.createDataFrame(
            [(None, 1), (2, None), (5, 5)], "x int, y int")
        got = [(r.x, r.y) for r in skyline_2d(df, "x", "y").collect()]
        assert got == [(5, 5)]  # NULLs incomparable -> excluded

    def test_quota_more_strata_than_total(self, spark):
        # 10 strata, 3 slots: only the largest-remainder strata get one
        from data_and_analytics_etl_spark.operators.sampling import \
            quota_allocate
        df = spark.createDataFrame(
            [(i, f"s{i}") for i in range(10)], "id long, s string")
        out = quota_allocate(df, "s", total=3).collect()
        assert sum(r.quota for r in out) == 3
        assert all(r.quota in (0, 1) for r in out)
        # equal remainders -> ties break by stratum value ascending
        winners = sorted(r.stratum for r in out if r.quota == 1)
        assert winners == ["s0", "s1", "s2"]

    def test_shard_empty_input(self, spark):
        from data_and_analytics_etl_spark.operators.corpus import \
            shard_by_weight
        df = spark.createDataFrame([], "doc_id long, w long")
        assert shard_by_weight(df, "w", 100).count() == 0

    def test_bm25_single_doc_corpus(self, spark):
        # N=1, df=1: idf = ln(1.5/1.5 + 1) = ln 2 > 0 — never negative
        from data_and_analytics_etl_spark.operators.text import bm25_scores
        df = spark.createDataFrame([(1, "only doc here")],
                                   "doc_id long, text string")
        r = bm25_scores(df, ["only"]).collect()[0]
        assert r.bm25 > 0

    def test_curriculum_two_stage_alternates(self, spark):
        from data_and_analytics_etl_spark.operators.corpus import \
            curriculum_order
        rows = [(i, 10 if i % 2 == 0 else 1000) for i in range(20)]
        df = spark.createDataFrame(rows, "doc_id long, n_chars long")
        out = sorted(curriculum_order(df, "n_chars", n_stages=2)
                     .collect(), key=lambda r: r.curriculum_pos)
        stages = [r.stage for r in out]
        assert stages == [1, 2] * 10  # perfect easy/hard interleave


class TestMannWhitney:
    def test_hand_computed_with_ties(self, spark):
        """a = [1, 2, 2], b = [2, 3]: midranks 1, 3, 3, 3, 5 ->
        R_a = 7, U_a = 7 - 6 = 1 (an integer here), U_b = 5."""
        from data_and_analytics_etl_spark.operators.profile import \
            mann_whitney_u
        rows = [(1.0, 1), (2.0, 1), (2.0, 1), (2.0, 0), (3.0, 0)]
        df = spark.createDataFrame(rows, "v double, a int")
        r = mann_whitney_u(df, F.col("a") == 1, "v",
                           lo=0.0, hi=4.0, nbins=4).collect()[0]
        assert (r["n_a"], r["n_b"]) == (3, 2)
        assert r["u_a"] == 1.0 and r["u_b"] == 5.0

    def test_u_sum_identity_and_half_integer(self, spark):
        """U_a + U_b == n_a * n_b always; a tie group straddling the
        samples legitimately yields half-integer U."""
        from data_and_analytics_etl_spark.operators.profile import \
            mann_whitney_u
        rows = [(1.0, 1), (2.0, 1), (2.0, 0)]
        df = spark.createDataFrame(rows, "v double, a int")
        r = mann_whitney_u(df, F.col("a") == 1, "v",
                           lo=0.0, hi=4.0, nbins=2).collect()[0]
        assert r["u_a"] + r["u_b"] == r["n_a"] * r["n_b"]
        assert r["u_a"] == 0.5

    def test_symmetric_split_z_is_zero_ish(self, spark, sf_dir):
        """Splitting one sample by a hash unrelated to value must give
        |z| far from significance."""
        from data_and_analytics_etl_spark.operators.profile import \
            mann_whitney_u
        ev = load_table(spark, sf_dir, "events").filter(
            F.col("value").isNotNull())
        r = mann_whitney_u(ev, F.col("event_id") % 2 == 0, "value",
                           lo=0.0, hi=500.0, nbins=32).collect()[0]
        assert abs(r["z"]) < 3.0

    def test_shifted_sample_detected(self, spark, sf_dir):
        from data_and_analytics_etl_spark.operators.profile import \
            mann_whitney_u
        ev = load_table(spark, sf_dir, "events").filter(
            F.col("value").isNotNull()).select("event_id", "value")
        shifted = ev.withColumn("value", F.col("value") + 50.0) \
                    .withColumn("__s", F.lit(0))
        base = ev.withColumn("__s", F.lit(1))
        r = mann_whitney_u(base.unionByName(shifted),
                           F.col("__s") == 1, "value",
                           lo=0.0, hi=600.0, nbins=32).collect()[0]
        assert r["z"] < -5.0  # base ranks far below shifted


class TestNelsonAalen:
    def test_hand_computed_and_km_inequality(self, spark):
        """durations (1,e) (2,e) (2,c) (3,e): H(1)=1/4, H(2)=1/4+1/3,
        H(3)=...+1/1; and S_KM(t) <= exp(-H(t)) (1-x <= e^-x)."""
        import math

        from data_and_analytics_etl_spark.operators.evaluation import (
            kaplan_meier, nelson_aalen)
        rows = [(1, 1), (2, 1), (2, 0), (3, 1)]
        df = spark.createDataFrame(rows, "t int, e int")
        na = {r["t"]: r for r in
              nelson_aalen(df, F.col("t"), F.col("e")).collect()}
        assert na[1]["n_risk"] == 4 and na[1]["cum_hazard"] == 0.25
        assert abs(na[2]["cum_hazard"] - (0.25 + 1 / 3)) < 1e-15
        assert abs(na[3]["cum_hazard"] - (0.25 + 1 / 3 + 1.0)) < 1e-15
        km = {r["t"]: r["survival"] for r in
              kaplan_meier(df, F.col("t"), F.col("e")).collect()}
        for t, row in na.items():
            assert km[t] <= math.exp(-row["cum_hazard"]) + 1e-12


class TestOhlcBars:
    def test_open_close_follow_order_key(self, spark):
        from data_and_analytics_etl_spark.operators.timeseries import \
            ohlc_bars
        rows = [(1, 10, 5.0, 2.0), (1, 30, 1.0, 1.0), (1, 20, 9.0, 3.0),
                (2, 5, 4.0, 1.0)]
        df = spark.createDataFrame(rows, "b long, k long, p double, "
                                         "v double")
        out = {r["bucket"]: r for r in ohlc_bars(
            df, F.col("b"), F.col("p"), F.col("v"),
            F.col("k")).collect()}
        r = out[1]
        assert (r["open"], r["close"]) == (5.0, 1.0)  # by k, not row order
        assert (r["high"], r["low"]) == (9.0, 1.0)
        assert r["volume"] == 6 and r["n_trades"] == 3
        # vwap = (500*2 + 900*3 + 100*1)/6/100, emitted rounded to 6dp
        assert r["vwap"] == round((1000 + 2700 + 100) / 6 / 100, 6)
        assert out[2]["open"] == out[2]["close"] == 4.0


class TestWoeIv:
    def test_sign_and_smoothing(self, spark):
        from data_and_analytics_etl_spark.operators.features import \
            woe_iv
        rows = ([("a", 1)] * 8 + [("a", 0)] * 2
                + [("b", 1)] * 2 + [("b", 0)] * 8
                + [("c", 1)] * 5 + [("c", 0)] * 5)
        df = spark.createDataFrame(rows, "cat string, y int")
        out = {r["category"]: r for r in woe_iv(
            df, F.col("cat"), F.col("y") == 1).collect()}
        assert out["a"]["woe_q6"] > 0      # positive-heavy
        assert out["b"]["woe_q6"] < 0      # negative-heavy
        assert abs(out["c"]["woe_q6"]) < 1000  # balanced ~ 0
        # IV contributions are non-negative by construction
        assert all(r["iv_contrib"] >= 0 for r in out.values())

    def test_empty_cell_stays_finite(self, spark):
        from data_and_analytics_etl_spark.operators.features import \
            woe_iv
        rows = [("a", 1)] * 5 + [("b", 0)] * 5
        df = spark.createDataFrame(rows, "cat string, y int")
        out = woe_iv(df, F.col("cat"), F.col("y") == 1).collect()
        assert all(r["woe_q6"] is not None for r in out)


class TestGridProximity:
    def test_equals_brute_force_including_boundary(self, spark):
        """Grid decomposition == O(n^2) cross join, with points at
        EXACTLY radius distance included (integer compare, no float
        boundary)."""
        import itertools
        import random

        from data_and_analytics_etl_spark.operators.geo import \
            grid_proximity_join
        rng = random.Random(11)
        pts = [(i, round(rng.uniform(0, 100), 3),
                round(rng.uniform(0, 100), 3)) for i in range(120)]
        pts.append((900, 10.0, 10.0))
        pts.append((901, 13.0, 14.0))  # exactly 5.0 away
        df = spark.createDataFrame(pts, "id long, x double, y double")
        got = {(r["id_a"], r["id_b"]): r["dist_sq_q12"]
               for r in grid_proximity_join(
                   df, "id", F.col("x"), F.col("y"), 5.0).collect()}
        want = {}
        for (i, xi, yi), (j, xj, yj) in itertools.combinations(pts, 2):
            a, b = (i, j) if i < j else (j, i)
            dx = round(xi * 1e6) - round(xj * 1e6)
            dy = round(yi * 1e6) - round(yj * 1e6)
            d2 = dx * dx + dy * dy
            if d2 <= 5_000_000 ** 2:
                want[(a, b)] = d2
        assert got == want
        assert (900, 901) in got  # the exact-boundary pair


class TestIntervalConcurrency:
    def test_half_open_semantics_and_peak(self, spark):
        """[0,10), [5,15), [10,20): at t=10 the first has RELEASED
        before the third claims -> peak is 2, never 3."""
        import datetime as dt

        from data_and_analytics_etl_spark.operators.timeseries import \
            interval_concurrency
        base = dt.datetime(2024, 1, 1)
        mk = lambda s, e: (base + dt.timedelta(minutes=s),  # noqa: E731
                           base + dt.timedelta(minutes=e))
        rows = [mk(0, 10), mk(5, 15), mk(10, 20)]
        df = spark.createDataFrame(rows, "s timestamp, e timestamp")
        lo = int(base.replace(tzinfo=dt.timezone.utc).timestamp() * 1e6)
        out = {r["us"]: r["concurrency"] for r in interval_concurrency(
            df, F.col("s"), F.col("e"), lo, lo + 3_600_000_000,
            nbins=8).collect()}
        assert max(out.values()) == 2
        # after the last end, concurrency returns to zero
        assert out[max(out)] == 0

    def test_matches_global_window_on_events(self, spark, sf_dir):
        from data_and_analytics_etl_spark.operators.timeseries import \
            interval_concurrency
        ev = load_table(spark, sf_dir, "events")
        iv = ev.select(F.col("ts").alias("s"),
                       (F.col("ts") + F.make_interval(secs=F.lit(120)))
                       .alias("e"))
        lo, hi = 1704067200 * 10**6, 1706745600 * 10**6
        got = interval_concurrency(iv, F.col("s"), F.col("e"),
                                   lo, hi, nbins=16)
        # reference: plain global cumulative over netted deltas
        us = F.unix_micros(F.col("s").cast("timestamp"))
        ue = F.unix_micros(F.col("e").cast("timestamp"))
        d = (iv.select(us.alias("us"), F.lit(1).alias("d"))
             .unionByName(iv.select(ue.alias("us"),
                                    F.lit(-1).alias("d")))
             .groupBy("us").agg(F.sum("d").alias("net")))
        from pyspark.sql import Window as W
        ref = d.withColumn(
            "concurrency",
            F.sum("net").over(W.orderBy("us").rowsBetween(
                W.unboundedPreceding, 0)).cast("long")).drop("net")
        assert (sorted(map(tuple, got.collect()))
                == sorted(map(tuple, ref.collect())))


class TestPowerMde:
    def test_mde_shrinks_with_sample_size(self, spark):
        from data_and_analytics_etl_spark.operators.profile import \
            ab_power_mde
        rows = []
        for g, n in (("small", 20), ("large", 2000)):
            for i in range(n):
                rows.append((g, i % 2 == 0, float(10 + i % 7)))
        df = spark.createDataFrame(rows, "g string, a boolean, v double")
        out = {r["grp"]: r["mde_abs"] for r in ab_power_mde(
            df, F.col("a"), "g", "v").collect()}
        assert out["large"] < out["small"] / 5

    def test_hand_formula(self, spark):
        import math

        from data_and_analytics_etl_spark.operators.profile import (
            Z_80, Z_975, ab_power_mde)
        rows = [("g", True, 1.0), ("g", True, 3.0),
                ("g", False, 2.0), ("g", False, 6.0)]
        df = spark.createDataFrame(rows, "g string, a boolean, v double")
        r = ab_power_mde(df, F.col("a"), "g", "v").collect()[0]
        # var_a = var([1,3]) = 2, var_b = var([2,6]) = 8
        assert (r["var_a"], r["var_b"]) == (2.0, 8.0)
        want = (Z_975 + Z_80) * math.sqrt(2 / 2 + 8 / 2)
        assert r["mde_abs"] == round(want, 6)


class TestUpliftTwoModel:
    def test_hand_counts(self, spark):
        from data_and_analytics_etl_spark.operators.features import \
            uplift_two_model
        rows = ([("s", 1, 1)] * 6 + [("s", 1, 0)] * 4    # treated: 60%
                + [("s", 0, 1)] * 2 + [("s", 0, 0)] * 8)  # control: 20%
        df = spark.createDataFrame(rows, "seg string, t int, y int")
        r = uplift_two_model(df, F.col("seg"), F.col("t") == 1,
                             F.col("y") == 1).collect()[0]
        assert (r["n_t"], r["k_t"], r["n_c"], r["k_c"]) == (10, 6, 10, 2)
        assert r["uplift"] == 0.4 and r["z"] > 1.5


class TestBhFdr:
    def test_step_up_rejects_through_later_qualifier(self, spark):
        """BH is STEP-UP: if rank 3 qualifies, ranks 1-2 are rejected
        even when rank 2 itself fails p <= alpha*i/m."""
        from data_and_analytics_etl_spark.operators.profile import bh_fdr
        # m = 4, alpha = 0.5: thresholds 0.125, 0.25, 0.375, 0.5
        rows = [("a", 100_000),   # 0.100 <= 0.125  qualifies
                ("b", 300_000),   # 0.300 >  0.250  fails
                ("c", 370_000),   # 0.370 <= 0.375  qualifies -> k = 3
                ("d", 900_000)]   # 0.900 >  0.500  fails
        df = spark.createDataFrame(rows, "k string, p long")
        out = {r["key"]: r["rejected"] for r in bh_fdr(
            df, "k", "p", alpha_num=1, alpha_den=2).collect()}
        assert out == {"a": True, "b": True, "c": True, "d": False}

    def test_nothing_qualifies_nothing_rejected(self, spark):
        from data_and_analytics_etl_spark.operators.profile import bh_fdr
        df = spark.createDataFrame([("a", 999_999), ("b", 999_998)],
                                   "k string, p long")
        out = bh_fdr(df, "k", "p", alpha_num=1, alpha_den=100).collect()
        assert all(not r["rejected"] for r in out)

    def test_exact_boundary_qualifies(self, spark):
        """p == alpha*i/m exactly must qualify (integer compare, no
        float boundary): m=2, alpha=1/2 -> threshold_1 = 0.25."""
        from data_and_analytics_etl_spark.operators.profile import bh_fdr
        df = spark.createDataFrame([("a", 250_000), ("b", 999_999)],
                                   "k string, p long")
        out = {r["key"]: r["rejected"] for r in bh_fdr(
            df, "k", "p", alpha_num=1, alpha_den=2).collect()}
        assert out["a"] is True and out["b"] is False


class TestBrierDecomposition:
    def test_identity_brier_equals_rel_minus_res_plus_unc(self, spark):
        """Murphy identity on a hand corpus: sum(rel) - sum(res) + unc
        must equal the bin-approximated Brier score computed directly
        (forecasts constant per bin, so the identity is exact here)."""
        from data_and_analytics_etl_spark.operators.evaluation import \
            brier_decomposition
        rows = [(1, 0.95), (1, 0.95), (0, 0.95),
                (0, 0.05), (0, 0.05), (1, 0.05),
                (1, 0.55), (0, 0.55)]
        df = spark.createDataFrame(rows, "y int, s double")
        out = brier_decomposition(df, F.col("y") == 1, F.col("s"),
                                  n_buckets=10).collect()
        rel = sum(r["rel_contrib"] for r in out)
        res = sum(r["res_contrib"] for r in out)
        unc = out[0]["uncertainty"]
        brier = sum(r["n"] * ((r["mean_score"] - r["obs_rate"]) ** 2
                    + r["obs_rate"] * (1 - r["obs_rate"]))
                    for r in out) / sum(r["n"] for r in out)
        assert abs((rel - res + unc) - brier) < 1e-6

    def test_perfectly_calibrated_has_zero_reliability(self, spark):
        from data_and_analytics_etl_spark.operators.evaluation import \
            brier_decomposition
        # bin [0.3, 0.4): forecasts 0.35, observed rate 0.35 (7/20)
        rows = [(1, 0.35)] * 7 + [(0, 0.35)] * 13
        df = spark.createDataFrame(rows, "y int, s double")
        out = brier_decomposition(df, F.col("y") == 1, F.col("s"),
                                  n_buckets=10).collect()
        assert len(out) == 1
        assert abs(out[0]["rel_contrib"]) < 1e-9


class TestTimeToConvert:
    def test_strict_funnel_and_exact_percentiles(self, spark):
        import datetime as dt

        from data_and_analytics_etl_spark.operators.funnel import \
            time_to_convert
        t0 = dt.datetime(2024, 1, 1)
        m = lambda mins: t0 + dt.timedelta(minutes=mins)  # noqa: E731
        rows = [
            (1, m(0), "signup"), (1, m(10), "purchase"),   # 10 min
            (2, m(0), "signup"), (2, m(30), "purchase"),   # 30 min
            (3, m(0), "signup"), (3, m(20), "purchase"),   # 20 min
            (4, m(5), "purchase"), (4, m(9), "signup"),    # reversed: out
            (5, m(0), "signup"),                           # no purchase
            (6, m(1), "purchase"),                         # no signup
        ]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp, "
                                         "event_type string")
        r = time_to_convert(df, "user_id", "ts", "event_type",
                            "signup", "purchase").collect()[0]
        assert r["n_converted"] == 3
        # durations sorted: 10, 20, 30 min -> p50 = rank ceil(1.5)=2
        assert r["p50_us"] == 20 * 60 * 1_000_000
        assert r["p90_us"] == 30 * 60 * 1_000_000


class TestKeywordsTopk:
    def test_rare_term_outranks_common_term(self, spark):
        from data_and_analytics_etl_spark.operators.text import \
            keywords_topk
        docs = [(1, "zebra common common common"),
                (2, "common common apple apple apple"),
                (3, "common filler filler")]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        out = keywords_topk(df, k=2).collect()
        top = {r["doc_id"]: [x["term"] for x in
                             sorted(out, key=lambda y: y["rank"])
                             if x["doc_id"] == r["doc_id"]]
               for r in out}
        # 'common' appears in every doc -> idf = ln(1) = 0 -> score 0;
        # the doc-unique terms win rank 1
        assert top[1][0] == "zebra"
        assert top[2][0] == "apple"
        assert top[3][0] == "filler"

    def test_ranks_bounded_and_deterministic_ties(self, spark):
        from data_and_analytics_etl_spark.operators.text import \
            keywords_topk
        df = spark.createDataFrame(
            [(1, "b a c"), (2, "x y z")], "doc_id long, text string")
        out = keywords_topk(df, k=2).collect()
        by_doc = {}
        for r in out:
            by_doc.setdefault(r["doc_id"], []).append((r["rank"],
                                                       r["term"]))
        # equal scores -> alphabetical term order decides ranks
        assert sorted(by_doc[1]) == [(1, "a"), (2, "b")]
        assert sorted(by_doc[2]) == [(1, "x"), (2, "y")]
