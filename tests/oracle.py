"""Local DuckDB-oracle comparison harness (mirrors the driver's t2 check).

Runs a registry probe on Spark and its oracle SQL on DuckDB over the same
parquet tables, canonicalizes both result sets (column-name sort,
order-insensitive rows, TYPE-STRICT cell rendering), and asserts exact
equality.

Type strictness is deliberate and driver-aligned: in round 5 the local
harness coerced Decimal -> float and relied on Python cross-type equality
(150 == 150.0 == Decimal(150)), which passed a probe locally while the
driver hashed DuckDB's HUGEINT differently from Spark's LONG and went red
(categorical_entropy_profile). Both sides are therefore fetched WITHOUT
lossy frame conversion (Spark collect() rows / DuckDB Arrow to_pylist —
pandas would NaN-mangle nullable int columns on both sides) and every
numeric cell carries its type tag, so an uncast HUGEINT fails locally too.
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal

import duckdb

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
    """Normalize one cell to a hashable, TYPE-STRICT value.

    int / float / Decimal deliberately do NOT compare equal across types:
    the driver's value hash distinguishes them (HUGEINT lesson, r5), so a
    type-skewed-but-equal cell must fail here, not in the driver window.
    """
    if v is None:
        return "<NULL>"
    if isinstance(v, bool):  # before int: bool is an int subclass
        return f"bool:{v}"
    if isinstance(v, int):
        return f"int:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "float:nan"
        # NO -0.0 collapse: the driver is signed-zero-strict (a round()
        # of a tiny negative double cost a red probe once) — probes fold
        # `+ 0.0` on both sides instead.
        return f"float:{v!r}"
    if isinstance(v, Decimal):
        return f"dec:{v}"
    if isinstance(v, str):
        return v
    if isinstance(v, (bytes, bytearray)):
        return f"bytes:{bytes(v)!r}"
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return "ts:" + v.isoformat(timespec="microseconds")
    if isinstance(v, _dt.date):
        return "date:" + v.isoformat()
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
    return str(v)


def canon_rows(rows: list[tuple], cols: list[str]) -> list[tuple]:
    """Sort columns by lowercased name, canonicalize cells, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i].lower())
    out = [tuple(canon_cell(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return out


def fetch_oracle(con: duckdb.DuckDBPyConnection,
                 sql: str) -> tuple[list[tuple], list[str]]:
    """Fetch oracle rows via Arrow (NOT fetchall / fetchdf).

    fetchall() converts HUGEINT to Python int (masks the type skew the
    driver sees); fetchdf() NaN-mangles nullable integer columns. Arrow
    keeps HUGEINT as decimal128 -> Decimal and nullable ints as int/None,
    matching the driver's observed green/red pattern exactly.
    """
    tab = con.execute(sql).arrow()
    cols = tab.column_names
    rows = [tuple(d[c] for c in cols) for d in tab.to_pylist()]
    return rows, cols


def compare(spark, spec, sf_dir: str) -> None:
    """Assert that a QuerySpec's Spark result matches its DuckDB oracle."""
    sdf = spec.fn(spark, sf_dir)
    s_rows_raw = [tuple(r) for r in sdf.collect()]
    s_cols = list(sdf.columns)
    if spec.oracle is None:
        assert len(s_rows_raw) >= 0  # rows-only: must run and be well-formed
        return
    con = duckdb_connection(sf_dir)
    o_rows_raw, o_cols = fetch_oracle(con, spec.oracle)
    assert sorted(map(str.lower, s_cols)) == \
        sorted(map(str.lower, o_cols)), (
        f"{spec.name}: column mismatch "
        f"spark={sorted(s_cols)} oracle={sorted(o_cols)}")
    assert len(s_rows_raw) == len(o_rows_raw), (
        f"{spec.name}: row count spark={len(s_rows_raw)} "
        f"oracle={len(o_rows_raw)}")
    s_rows = canon_rows(s_rows_raw, s_cols)
    o_rows = canon_rows(o_rows_raw, o_cols)
    # Multiset compare (not positional zip): a genuinely-mismatched cell
    # shifts row sort positions, and a pairwise zip would then report a
    # cascade of spurious diffs instead of the one real one.
    from collections import Counter
    s_ctr, o_ctr = Counter(s_rows), Counter(o_rows)
    if s_ctr != o_ctr:
        only_s = list((s_ctr - o_ctr).elements())
        only_o = list((o_ctr - s_ctr).elements())
        raise AssertionError(
            f"{spec.name}: {len(only_s)} spark-only / {len(only_o)} "
            f"oracle-only rows; first spark-only={only_s[:1]} "
            f"oracle-only={only_o[:1]}")
