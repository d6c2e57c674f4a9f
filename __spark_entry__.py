"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`data_and_analytics_etl_spark.queries` — the registry
is the single source of truth for the declared surface (SURVEY §2.2):
each probe carries its Spark callable and, when deterministic and
SQL-expressible, its DuckDB oracle SQL.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_and_analytics_etl_spark import queries as _q  # noqa: E402
from data_and_analytics_etl_spark.session import apply_runtime_conf  # noqa: E402

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    apply_runtime_conf(spark)
    return _q.REGISTRY["q1_pricing_summary"].fn(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every deterministic probe in queries()."""
    return _q.oracle_sql()
