"""User-defined function surface (SURVEY §2.2 "UDF / UDAF / UDTF").

The UDF tier exists for surface completeness and extension points — the
engine's own operators never use row-at-a-time Python in a hot path
(SURVEY §7.4). Ordering of preference at scale: built-in expression >
pandas_udf (Arrow-vectorized) > scalar @udf (per-row pickling, 10-100x
slower) — every probe here states which tier it exercises.
"""

from .udfs import (grouped_weighted_avg, price_band,  # noqa: F401
                   register_sql_udfs, vectorized_label)
