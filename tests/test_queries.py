"""Oracle equivalence for every registered probe query (the t2 mirror)."""

from __future__ import annotations

import pytest

from data_and_analytics_etl_spark.queries import REGISTRY

from .oracle import compare


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, sf_dir, name):
    compare(spark, REGISTRY[name], sf_dir)
