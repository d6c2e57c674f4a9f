"""Declared UDF implementations, one per surface tier.

Each has an exactly-equivalent SQL formulation (used by the probe
oracles) so correctness is hash-checkable; string/integer outputs are
preferred over floats wherever possible to keep cross-engine comparison
exact.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf, udf
from pyspark.sql.types import DoubleType, StringType


@udf(returnType=StringType())
def price_band(total):
    """Scalar Python UDF tier (row-at-a-time; slowest — declared surface
    only, use the CASE expression form in real pipelines). Returns
    None/'low'/'mid'/'high'; untyped signature because `str | None`
    union hints defeat the eval-type inference and emit warnings."""
    if total is None:
        return None
    if total < 50_000:
        return "low"
    if total < 150_000:
        return "mid"
    return "high"


@pandas_udf(StringType())
def vectorized_label(brand: pd.Series, name: pd.Series) -> pd.Series:
    """Vectorized scalar tier: Arrow batches in, pandas ops, Arrow out.
    String-exact so the oracle comparison is bitwise."""
    return brand.str.upper() + ":" + name.str.len().astype(str)


# returnType as a DataType object, not a DDL string: string forms are
# parsed through the active SparkContext at decoration time, which would
# make importing this module require a live session. The (Series, Series)
# -> scalar hint signature is what marks this as a grouped-agg UDAF.
@pandas_udf(DoubleType())
def grouped_weighted_avg(price: pd.Series, qty: pd.Series) -> float:
    """Grouped-agg UDAF tier: one (price, qty) pandas batch per group,
    scalar out. Equivalent SQL: sum(price*qty)/sum(qty)."""
    denom = qty.sum()
    return float((price * qty).sum() / denom) if denom else float("nan")


def register_sql_udfs(spark) -> None:
    """SQL-registration tier: spark.udf.register makes the Python fns
    addressable from spark.sql() strings (idempotent)."""
    spark.udf.register("price_band_sql", price_band)
    spark.udf.register(
        "discount_class",
        lambda d: None if d is None else
        ("steep" if d >= 0.07 else ("moderate" if d >= 0.03 else "slim")),
        StringType())


def tokenize_udtf():
    """Table-function tier (Spark 4 @udtf): one input row -> N output
    rows. Defined lazily so importing this module never requires the
    udtf machinery."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="token string, pos int")
    class Tokenize:
        def eval(self, text: str):
            if text:
                for i, tok in enumerate(text.split(" ")):
                    yield tok, i

    return Tokenize


__all__ = ["price_band", "vectorized_label", "grouped_weighted_avg",
           "register_sql_udfs", "tokenize_udtf"]


@pandas_udf(StringType())
def nfc_normalize(s: pd.Series) -> pd.Series:
    """Unicode NFC normalization (vectorized pandas_udf).

    Spark SQL has no normalization builtin; decomposed sequences
    (e + U+0301) and their composed forms (é) must compare, hash and
    dedup identically or a multilingual corpus silently splits.
    Oracle-checkable cross-engine: Python unicodedata and DuckDB's
    utf8proc agree on NFC for the Unicode compositions that occur in
    practice (probe `udf_nfc_normalize` proves byte equality via md5).
    """
    import unicodedata
    return s.map(lambda x: None if x is None
                 else unicodedata.normalize("NFC", x))


@pandas_udf(DoubleType())
def compression_ratio(s: pd.Series) -> pd.Series:
    """zlib compression ratio (compressed/raw bytes) — the classic
    corpus-quality signal: highly repetitive or templated text
    compresses far below natural prose, near-random noise approaches
    (or exceeds) 1.0. Deterministic for a fixed zlib level (6), so
    threshold gates are reproducible across runs; rows-only evidence
    (no SQL engine ships zlib) with exact-equality pytest vs direct
    zlib on every document.
    """
    import zlib
    def ratio(x):
        if x is None:
            return None
        raw = x.encode("utf-8")
        if not raw:
            return None
        return len(zlib.compress(raw, 6)) / len(raw)
    return s.map(ratio)
