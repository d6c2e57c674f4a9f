"""Determinism tests for engine-defined operators (sampling)."""

from __future__ import annotations

import pyspark.sql.functions as F

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


def test_hash_sample_frac_one_keeps_every_row(spark, sf_dir):
    from data_and_analytics_etl_spark.operators.sampling import hash_sample
    o = load_table(spark, sf_dir, "orders")
    n = o.count()
    assert hash_sample(o, "o_orderkey", 1.0).count() == n
    # anything that rounds to 256/256 also keeps all rows
    assert hash_sample(o, "o_orderkey", 255.6 / 256).count() == n
    # and 255/256 keeps strictly less (the 'ff' bucket drops)
    assert hash_sample(o, "o_orderkey", 255 / 256).count() < n


def test_hash_stratified_frac_one_stratum(spark, sf_dir):
    from data_and_analytics_etl_spark.operators.sampling import (
        hash_stratified_sample)
    o = load_table(spark, sf_dir, "orders")
    full = o.filter("o_orderstatus = 'F'").count()
    got = hash_stratified_sample(
        o, "o_orderkey", "o_orderstatus",
        {"F": 1.0}, default_frac=0.0)
    assert got.filter("o_orderstatus = 'F'").count() == full
    assert got.filter("o_orderstatus <> 'F'").count() == 0


class TestCompressionRatio:
    def test_exact_vs_direct_zlib(self, spark, sf_dir):
        import zlib

        from data_and_analytics_etl_spark.functions.udfs import \
            compression_ratio
        d = load_table(spark, sf_dir, "documents")
        got = {r["doc_id"]: r["ratio"] for r in
               d.select("doc_id",
                        compression_ratio(F.col("text")).alias("ratio"))
               .collect()}
        for r in d.select("doc_id", "text").collect():
            raw = r["text"].encode("utf-8")
            want = len(zlib.compress(raw, 6)) / len(raw)
            assert got[r["doc_id"]] == want, r["doc_id"]

    def test_repetitive_compresses_below_noise(self, spark):
        from data_and_analytics_etl_spark.functions.udfs import \
            compression_ratio
        rep = "the cat sat on the mat " * 50
        import hashlib
        noise = "".join(hashlib.md5(str(i).encode()).hexdigest()
                        for i in range(80))
        df = spark.createDataFrame([(1, rep), (2, noise)],
                                   "id: long, text: string")
        vals = {r["id"]: r["r"] for r in
                df.select("id", compression_ratio(F.col("text"))
                          .alias("r")).collect()}
        assert vals[1] < 0.2 < vals[2]
