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


def test_scd2_intervals_all_null_key(spark):
    import datetime as dt
    from data_and_analytics_etl_spark.operators.scd import scd2_intervals
    t = [dt.datetime(2024, 1, 1, h) for h in range(3)]
    df = spark.createDataFrame([(1, ts, None) for ts in t],
                               "k int, ts timestamp, attr string")
    out = scd2_intervals(df, key="k", ts_col="ts", attr="attr")
    got = [(r.attr, r.valid_from, r.valid_to) for r in out.collect()]
    assert got == [(None, t[0], None)]
