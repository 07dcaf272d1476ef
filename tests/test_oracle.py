"""Differential test: every queries() entry vs its DuckDB oracle at sf0.01.

This replicates the driver's t2 correctness gate locally (BASELINE.md:
"every queries() entry hash-matches its DuckDB oracle_sql()").
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_ORACLE
from tests.oracle_harness import compare_query

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def test_registry_consistency():
    # every oracle key must have a query; queries without oracle are the
    # documented weaker rows-only path.
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, name):
    ok, msg = compare_query(spark, QUERIES[name], ORACLES[name], SF_ORACLE)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_query_runs(spark, name):
    df = QUERIES[name](spark, SF_ORACLE)
    assert df.count() >= 0
