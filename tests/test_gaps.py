"""Determinism tests for engine-defined operators (sampling)."""

from __future__ import annotations

from data_and_analytics_etl_spark.catalog import load_table


def test_seeded_sample_is_deterministic(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    a = sorted(r.o_orderkey for r in
               o.sample(fraction=0.1, seed=42).select("o_orderkey").collect())
    b = sorted(r.o_orderkey for r in
               o.sample(fraction=0.1, seed=42).select("o_orderkey").collect())
    c = sorted(r.o_orderkey for r in
               o.sample(fraction=0.1, seed=7).select("o_orderkey").collect())
    assert a == b            # same seed -> identical sample
    assert a != c            # different seed -> different sample
    n = o.count()
    assert 0.05 * n < len(a) < 0.15 * n  # fraction respected (Bernoulli)


def test_tablesample_sql_form(spark, sf_dir):
    from data_and_analytics_etl_spark.catalog import register_all
    register_all(spark, sf_dir)
    df = spark.sql(
        "SELECT o_orderkey FROM orders TABLESAMPLE (10 PERCENT) REPEATABLE (42)")
    a = sorted(r.o_orderkey for r in df.collect())
    df2 = spark.sql(
        "SELECT o_orderkey FROM orders TABLESAMPLE (10 PERCENT) REPEATABLE (42)")
    assert a == sorted(r.o_orderkey for r in df2.collect())
