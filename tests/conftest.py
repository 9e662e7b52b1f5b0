"""Shared SparkSession for the test suite.

One session per pytest run (Spark startup dominates otherwise);
local[4] with 4 shuffle partitions keeps per-test latency low while
still exercising multi-partition shuffles.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    from palegislature_spark.session import get_spark

    spark = get_spark(
        "tests",
        **{"spark.sql.shuffle.partitions": "4"},
    )
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


def rows(df, *cols):
    """Collect to a sorted list of tuples for order-insensitive compare."""
    if cols:
        df = df.select(*cols)
    return sorted(tuple(r) for r in df.collect())
