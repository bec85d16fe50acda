"""Shared Spark fixture: one local session for the whole test run."""

from __future__ import annotations

import pytest

from big_data_in_agriculture_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
