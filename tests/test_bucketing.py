"""Bucketed co-located join: the shuffle moves to write time.

Proves the §4.3 bucketing claim mechanically: two tables bucketed on the
join key produce a join plan with zero Exchange operators, and the join
result is identical to the plain (shuffling) join.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from data_and_analytics_etl_spark.catalog import load_table
from data_and_analytics_etl_spark.operators.bucketing import (
    bucketed_join_is_shuffle_free, write_bucketed)


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    # warehouse.dir is a static conf — tables land in the session's
    # default warehouse; DROP TABLE below removes managed-table files.
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority")
    write_bucketed(li, "b_lineitem", "l_orderkey", buckets=8)
    write_bucketed(o, "b_orders", "l_orderkey", buckets=8)
    yield "b_lineitem", "b_orders"
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    assert bucketed_join_is_shuffle_free(spark, left, right, "l_orderkey")


def test_bucketed_join_result_matches_plain_join(spark, sf_dir,
                                                 bucketed_tables):
    left, right = bucketed_tables
    bucketed = (spark.table(left).join(spark.table(right), "l_orderkey")
                .groupBy("o_orderpriority")
                .agg(F.count(F.lit(1)).alias("n"),
                     F.sum("l_quantity").alias("q")))
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    plain = (li.join(o, li.l_orderkey == o.o_orderkey)
             .groupBy("o_orderpriority")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum("l_quantity").alias("q")))
    assert sorted(map(tuple, bucketed.collect())) == \
        sorted(map(tuple, plain.collect()))
