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


def test_weighted_source_mix_digitless_tag_agrees(spark, tmp_path):
    """A source tag with no digits must behave identically on both engines
    (source number 0 → keep everything), not crash-vs-silently-drop: the
    Spark side TRY_CASTs the empty regexp match and COALESCEs to 0, and the
    oracle SQL is pinned the same way."""
    import os

    from tidb_large_table_compare_spark.sources.tables import TABLES

    sf = tmp_path / "sf_digitless"
    sf.mkdir()
    for t in TABLES:
        if t != "documents":
            os.symlink(f"/root/testdata/sf0.001/{t}.parquet", sf / f"{t}.parquet")
    import pyarrow as pa
    import pyarrow.parquet as pq

    # doc_id 18 hashes to keep-bucket 9 (< the 100‰ floor), so the
    # overflow-tag row is guaranteed to SURVIVE the sampling filter and
    # its clamp assertion below actually executes
    pq.write_table(  # single file, readable by both engines
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 18, 5], pa.int64()),
                "source": [
                    "src0",
                    "wiki",  # digitless tag
                    "src9",
                    "src50000000",  # would overflow 45*int32
                    "src99999999999999999999",  # exceeds bigint: counts as 0
                ],
                "text": [
                    "alpha beta gamma",
                    "delta epsilon",
                    "zeta eta theta",
                    "iota kappa",
                    "lambda mu nu",
                ],
            }
        ),
        str(sf / "documents.parquet"),
    )

    ok, msg = compare_query(
        spark,
        QUERIES["weighted_source_mix"],
        ORACLES["weighted_source_mix"],
        str(sf),
    )
    assert ok, msg
    out = {
        r.source: r.keep_permille
        for r in QUERIES["weighted_source_mix"](spark, str(sf)).collect()
    }
    assert out.get("wiki") == 1000  # untagged source counts as 0: keep all
    # huge tags clamp at the rate floor (src>=20 all keep 10%) instead of
    # overflowing the 45*src_num multiply (the row's doc_id is pinned to a
    # surviving keep-bucket, so this assertion is guaranteed to execute);
    # beyond-bigint digits TRY_CAST to NULL → the same source-0 default as
    # digitless tags
    assert out["src50000000"] == 100
    assert out.get("src99999999999999999999", 1000) == 1000
