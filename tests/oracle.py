"""Local DuckDB-oracle comparison harness (mirrors the driver's t2 check).

Runs a registry probe on Spark and its oracle SQL on DuckDB over the same
parquet tables, canonicalizes both result sets (column-name sort,
order-insensitive rows, typed cell normalization), and asserts exact
equality. Exactness here is deliberate: if cells match exactly across
engines locally, the driver's value-hash comparison matches too.
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal

import duckdb
import pandas as pd

from data_and_analytics_etl_spark.catalog import TABLES, table_path


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con


def canon_cell(v):
    """Normalize one cell to a hashable, engine-neutral value."""
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<NaN>"
        if v == 0.0:
            return 0.0  # collapse -0.0 / +0.0
        return float(v)
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, (bool, int, str, bytes)):
        return v
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return v.isoformat(timespec="microseconds")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(canon_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, canon_cell(x)) for k, x in v.items()))
    # numpy scalars and anything array-like
    try:
        import numpy as np
        if isinstance(v, np.ndarray):
            return tuple(canon_cell(x) for x in v.tolist())
        if isinstance(v, np.generic):
            return canon_cell(v.item())
    except ImportError:
        pass
    if pd.isna(v):
        return "<NULL>"
    return str(v)


def canon_frame(df: pd.DataFrame) -> list[tuple]:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = []
    for tup in df.itertuples(index=False, name=None):
        rows.append(tuple(canon_cell(v) for v in tup))
    rows.sort(key=repr)
    return rows


def compare(spark, spec, sf_dir: str) -> None:
    """Assert that a QuerySpec's Spark result matches its DuckDB oracle."""
    spark_pd = spec.fn(spark, sf_dir).toPandas()
    if spec.oracle is None:
        assert len(spark_pd) >= 0  # rows-only: must run and be well-formed
        return
    con = duckdb_connection(sf_dir)
    oracle_pd = con.execute(spec.oracle).fetchdf()
    assert sorted(map(str.lower, spark_pd.columns)) == \
        sorted(map(str.lower, oracle_pd.columns)), (
        f"{spec.name}: column mismatch "
        f"spark={sorted(spark_pd.columns)} oracle={sorted(oracle_pd.columns)}")
    assert len(spark_pd) == len(oracle_pd), (
        f"{spec.name}: row count spark={len(spark_pd)} oracle={len(oracle_pd)}")
    spark_pd.columns = [c.lower() for c in spark_pd.columns]
    oracle_pd.columns = [c.lower() for c in oracle_pd.columns]
    s_rows, o_rows = canon_frame(spark_pd), canon_frame(oracle_pd)
    # Multiset compare (not positional zip): equal-but-type-skewed cells
    # (int 1 vs float 1.0) sort into different positions under repr, which
    # would misalign a pairwise zip and report spurious mismatches.
    from collections import Counter
    s_ctr, o_ctr = Counter(s_rows), Counter(o_rows)
    if s_ctr != o_ctr:
        only_s = list((s_ctr - o_ctr).elements())
        only_o = list((o_ctr - s_ctr).elements())
        raise AssertionError(
            f"{spec.name}: {len(only_s)} spark-only / {len(only_o)} "
            f"oracle-only rows; first spark-only={only_s[:1]} "
            f"oracle-only={only_o[:1]}")
