from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_and_analytics_etl_spark.session import get_spark  # noqa: E402

#: sf0.001 keeps the suite fast for iteration; set TEST_SF_DIR=/root/testdata/sf0.01
#: for the driver-equivalent correctness pass.
SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("daa-etl-spark-tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
