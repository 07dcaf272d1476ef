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
from tidb_large_table_compare_spark.perturb import (  # noqa: E402
    PERTURBED_ORDERS_SQL,
    perturbed_orders,
)
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


# ---------------------------------------------------------------------------
# queries() / oracle_sql() registry — built incrementally, one module per area.
# ---------------------------------------------------------------------------


def _cmp_summary_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cmp = compare_tables(
        spark, orders, perturbed_orders(orders), pk=["o_orderkey"],
        table_name="main.orders",
    )
    return cmp.summary()


_CMP_SUMMARY_ORDERS_SQL = f"""
WITH slave AS ({PERTURBED_ORDERS_SQL}),
j AS (
  SELECT m.o_orderkey AS l_pk, s.o_orderkey AS r_pk,
         (m.o_orderkey IS NOT NULL AND s.o_orderkey IS NOT NULL AND (
            m.o_custkey       IS DISTINCT FROM s.o_custkey OR
            m.o_orderstatus   IS DISTINCT FROM s.o_orderstatus OR
            m.o_totalprice    IS DISTINCT FROM s.o_totalprice OR
            m.o_orderdate     IS DISTINCT FROM s.o_orderdate OR
            m.o_orderpriority IS DISTINCT FROM s.o_orderpriority)) AS modified
  FROM orders m FULL OUTER JOIN slave s ON m.o_orderkey = s.o_orderkey
)
SELECT 'main.orders' AS "table",
       TRUE AS structure_ok,
       (SUM(CASE WHEN r_pk IS NULL OR modified THEN 1 ELSE 0 END)) AS upcount,
       (SUM(CASE WHEN l_pk IS NULL OR modified THEN 1 ELSE 0 END)) AS downcount,
       (SUM(CASE WHEN l_pk IS NULL OR r_pk IS NULL OR modified THEN 1 ELSE 0 END) = 0)
         AS equivalent
FROM j
"""


def _cmp_diff_rows_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cmp = compare_tables(
        spark, orders, perturbed_orders(orders), pk=["o_orderkey"],
        table_name="main.orders",
    )
    return cmp.diff_rows()


_CMP_DIFF_ROWS_ORDERS_SQL = f"""
WITH slave AS ({PERTURBED_ORDERS_SQL})
SELECT COALESCE(m.o_orderkey, s.o_orderkey) AS o_orderkey,
       CASE WHEN s.o_orderkey IS NULL THEN 'missing_in_right'
            WHEN m.o_orderkey IS NULL THEN 'extra_in_right'
            ELSE 'modified' END AS diff_type
FROM orders m FULL OUTER JOIN slave s ON m.o_orderkey = s.o_orderkey
WHERE s.o_orderkey IS NULL OR m.o_orderkey IS NULL OR
      m.o_custkey       IS DISTINCT FROM s.o_custkey OR
      m.o_orderstatus   IS DISTINCT FROM s.o_orderstatus OR
      m.o_totalprice    IS DISTINCT FROM s.o_totalprice OR
      m.o_orderdate     IS DISTINCT FROM s.o_orderdate OR
      m.o_orderpriority IS DISTINCT FROM s.o_orderpriority
"""


def _cmp_summary_self(spark: SparkSession, sf_dir: str) -> DataFrame:
    """compare(T, T) must be equivalent — the step3:204 marker condition."""
    orders = load_table(spark, sf_dir, "orders")
    cmp = compare_tables(spark, orders, orders, pk=["o_orderkey"],
                         table_name="main.orders")
    return cmp.summary()


_CMP_SUMMARY_SELF_SQL = """
SELECT 'main.orders' AS "table", TRUE AS structure_ok,
       0::BIGINT AS upcount, 0::BIGINT AS downcount, TRUE AS equivalent
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {
        "cmp_summary_orders": _cmp_summary_orders,
        "cmp_diff_rows_orders": _cmp_diff_rows_orders,
        "cmp_summary_self": _cmp_summary_self,
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents, keyed like ``queries()``."""
    return {
        "cmp_summary_orders": _CMP_SUMMARY_ORDERS_SQL,
        "cmp_diff_rows_orders": _CMP_DIFF_ROWS_ORDERS_SQL,
        "cmp_summary_self": _CMP_SUMMARY_SELF_SQL,
    }
