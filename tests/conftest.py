"""Shared fixtures: one SparkSession per test session, DuckDB oracle helper."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import os

SF_SMALL = "/root/testdata/sf0.001"
# the driver checks at sf0.01; override to sweep other scales, e.g.
#   SPARK_GRAFT_ORACLE_SF=/root/testdata/sf0.001 python -m pytest tests/test_oracle.py
# (an sf sweep caught a real duplicate-key semantics bug in round 1)
SF_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from tidb_large_table_compare_spark.session import get_spark

    spark = get_spark("tests")
    yield spark
