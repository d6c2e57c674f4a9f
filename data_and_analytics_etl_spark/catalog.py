"""Table catalog over the parquet corpus.

The reference's "catalog" is a config dict of entity types iterated by the
pull driver (CommCareAPIHandler.py:264-267, lambda_function.py:72-75); here
a dataset is a named parquet table registered as a temp view so both the
DataFrame DSL and ``spark.sql`` can address it. Column pruning + predicate
pushdown then reach the scan for free (Catalyst ``ColumnPruning`` /
``PushDownPredicates`` → parquet ``PushedFilters``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .session import apply_runtime_conf

TABLES: tuple[str, ...] = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        df = _normalize_event_timestamps(df)
    return df


def _normalize_event_timestamps(df: DataFrame) -> DataFrame:
    """`events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects (PARQUET_TYPE_ILLEGAL). The engine profile sets
    ``spark.sql.legacy.parquet.nanosAsLong`` so the column arrives as
    int64 nanos; convert to a microsecond timestamp (integer floor-div,
    matching DuckDB's ns→µs truncation) here so every consumer — batch
    probes and the streaming file source alike — sees TimestampType.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    if isinstance(df.schema["ts"].dataType, LongType):
        # Integer DIV, not float division: ns-epoch (~1.7e18) exceeds
        # double's 53-bit mantissa and float division drifts by ~100 ns.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def register_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every corpus table, register temp views, return the frames.

    Idempotent; also (re)applies the runtime conf profile so driver-owned
    sessions get UTC + AQE + Arrow (session.RUNTIME_CONF).
    """
    apply_runtime_conf(spark)
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
