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


#: path -> inferred StructType, so schema inference (a footer-reading
#: Spark JOB) runs at most once per table per process. Every later
#: load_table builds the scan with an explicit schema, which keeps plan
#: construction action-free (tests/test_construction_purity.py) and
#: shaves a driver round-trip off every query build. Inference still
#: happens from the real files on first touch, so testdata re-encoding
#: between rounds (the ts ns→µs drift) is picked up, not masked.
_SCHEMA_CACHE: dict[str, "object"] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    path = table_path(sf_dir, name)
    schema = _SCHEMA_CACHE.get(path)
    if schema is None:
        schema = spark.read.parquet(path).schema
        _SCHEMA_CACHE[path] = schema
    df = spark.read.schema(schema).parquet(path)
    if name == "events":
        df = normalize_event_timestamps(df)
    return df


def normalize_event_timestamps(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to TimestampType no matter how the parquet
    encodes it — the driver has shipped three encodings across rounds:

    - ``timestamp[ns]``: Spark's vectorized reader rejects NANOS unless
      ``spark.sql.legacy.parquet.nanosAsLong`` is set (the engine profile
      sets it), so the column arrives as int64 nanos → integer floor-div
      to µs (matches DuckDB's ns→µs truncation). Integer DIV, not float:
      ns-epoch (~1.7e18) exceeds double's 53-bit mantissa.
    - ``timestamp[us]`` without timezone: Spark reads TIMESTAMP_NTZ →
      cast to TIMESTAMP. Under the pinned UTC session zone (session.
      RUNTIME_CONF) the NTZ wall-clock is reinterpreted as the same UTC
      instant, so the cast is value-preserving and matches DuckDB, which
      treats the tz-less column as UTC.
    - ``timestamp[us, tz=UTC]``: already TimestampType; pass through.

    Every consumer — batch probes and the streaming file source alike —
    must route through here so stream/batch schemas stay identical.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    dt = df.schema["ts"].dataType
    if isinstance(dt, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    elif isinstance(dt, TimestampNTZType):
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


#: Backwards-compat private alias (pre-r5 name).
_normalize_event_timestamps = normalize_event_timestamps


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
