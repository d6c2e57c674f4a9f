"""Declared query surface. Importing this package registers every probe."""

from .registry import REGISTRY, QuerySpec, oracle_sql, queries, query  # noqa: F401

from . import (aggregates, analytics, etl_probes, gaps,  # noqa: F401,E402
               llmdata, relational, round10, round11, round12,
               round13, scalar_funcs, scale_probes, stats_probes,
               streaming_probes, tpch, udf_probes, windows)

__all__ = ["REGISTRY", "QuerySpec", "queries", "oracle_sql", "query"]
