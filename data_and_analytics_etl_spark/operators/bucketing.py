"""Bucketed tables: pre-shuffled storage for repeated co-located joins.

SURVEY §4.3's "bucketing for repeated join keys": when two fact tables
join on the same key every day, hash-bucketing both ON WRITE moves the
shuffle from query time to ingest time — the join then reads
co-partitioned buckets and the plan contains NO Exchange on either side
(verified by tests/test_bucketing.py). At 100 TB this converts the
biggest recurring shuffle in a pipeline into a one-time layout choice.

Bucketed writes require a table catalog (`saveAsTable`); plain
path-based parquet cannot carry bucket metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str, buckets: int = 8,
                   sort: bool = True) -> None:
    """Persist ``df`` hash-bucketed (and bucket-sorted) by ``key``.

    Sorting within buckets additionally lets sort-merge joins skip their
    sort phase entirely.
    """
    w = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_join_is_shuffle_free(spark: SparkSession, left: str,
                                  right: str, key: str) -> bool:
    """True iff joining two bucketed tables on their bucket key plans
    without a shuffle Exchange (the co-location proof used by the tests).

    Broadcast is disabled for the probe plan: a broadcast join would
    trivially avoid the shuffle by copying the small side — the point of
    bucketing is shuffle-free SORT-MERGE between two LARGE sides, which
    broadcast can't do.
    """
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table(left).join(spark.table(right), key)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        return ("Exchange hashpartitioning" not in plan
                and "BroadcastExchange" not in plan)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
