"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implemented operators come from SURVEY.md §2 (reference:
Buddy-Yuan/tidb-large-table-compare) plus the BASELINE.json extensions.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from tidb_large_table_compare_spark.operators.compare import (  # noqa: E402
    CompareOptions,
    compare_tables,
)
from tidb_large_table_compare_spark.perturb import perturbed_orders  # noqa: E402
from tidb_large_table_compare_spark.sources.tables import load_table  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: compare `orders` against a deterministically drifted copy at
    sf0.001 and return the one-row summary (table, structure_ok, upcount,
    downcount, equivalent) — the reference's core question
    (step3_run_syncdiff.sh:191-204) answered natively in Spark."""
    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    cmp = compare_tables(
        spark,
        orders,
        perturbed_orders(orders),
        pk=["o_orderkey"],
        options=CompareOptions(chunk_size=100),
        table_name="main.orders",
    )
    return cmp.summary()


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from tidb_large_table_compare_spark.registry import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents, keyed like ``queries()``."""
    from tidb_large_table_compare_spark.registry import ORACLES

    return dict(ORACLES)
