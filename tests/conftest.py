"""Shared Spark session for the unit-test suite.

One session per pytest run (JVM startup dominates otherwise); local[4] with
4 shuffle partitions — small enough to be fast, parallel enough to catch
partitioning bugs (a test passing only on local[1] is a broken operator).
"""

from __future__ import annotations

import datetime as dt

import pytest

from vector_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("vector-spark-tests", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def ts(minute: int, second: int = 0, hour: int = 0, day: int = 1) -> dt.datetime:
    """Deterministic UTC-naive timestamp helper for fixtures."""
    return dt.datetime(2024, 1, day, hour, minute, second)


def rows(df, *cols):
    """Collect to a sorted list of tuples for exact-output assertions."""
    data = df.select(*cols).collect() if cols else df.collect()
    return sorted((tuple(r) for r in data), key=lambda t: tuple(map(str, t)))
