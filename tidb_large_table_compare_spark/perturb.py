"""Deterministic "slave-side" perturbations of the test tables.

The reference compares a master table against a drifted slave replica; our
test data has no replica, so compare queries construct the slave side inline
with a *deterministic, SQL-expressible* perturbation (FIXTURES.md §8). The
same definition exists twice — as a DataFrame transform (engine input) and as
a SQL CTE body (DuckDB oracle input) — and they must stay in lockstep.

Perturbation of ``orders`` (pk = o_orderkey):
- DELETE  rows with o_orderkey % 97  = 3   → missing on slave (UPCOUNT)
- MODIFY  o_totalprice + 1.0 where o_orderkey % 89 = 5 (surviving rows only)
  → modified (UPCOUNT and DOWNCOUNT, REPLACE semantics — B9)
- INSERT  copies with o_orderkey + 10000000 where o_orderkey % 400 = 7
  → extra on slave (DOWNCOUNT)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DELETE_MOD, DELETE_REM = 97, 3
MODIFY_MOD, MODIFY_REM = 89, 5
INSERT_MOD, INSERT_REM = 400, 7
INSERT_SHIFT = 10_000_000


def perturbed_orders(orders: DataFrame) -> DataFrame:
    """The drifted slave copy of ``orders`` (see module docstring)."""
    kept = orders.filter(F.col("o_orderkey") % DELETE_MOD != DELETE_REM)
    modified = kept.withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % MODIFY_MOD == MODIFY_REM,
            F.col("o_totalprice") + 1.0,
        ).otherwise(F.col("o_totalprice")),
    )
    extra = orders.filter(F.col("o_orderkey") % INSERT_MOD == INSERT_REM).withColumn(
        "o_orderkey", F.col("o_orderkey") + INSERT_SHIFT
    )
    return modified.unionByName(extra.select(modified.columns))


# DuckDB/ANSI CTE body equivalent to perturbed_orders() — keep in lockstep.
PERTURBED_ORDERS_SQL = f"""
    SELECT o_orderkey, o_custkey, o_orderstatus,
           CASE WHEN o_orderkey % {MODIFY_MOD} = {MODIFY_REM}
                THEN o_totalprice + 1.0 ELSE o_totalprice END AS o_totalprice,
           o_orderdate, o_orderpriority
    FROM orders
    WHERE o_orderkey % {DELETE_MOD} <> {DELETE_REM}
    UNION ALL
    SELECT o_orderkey + {INSERT_SHIFT}, o_custkey, o_orderstatus, o_totalprice,
           o_orderdate, o_orderpriority
    FROM orders
    WHERE o_orderkey % {INSERT_MOD} = {INSERT_REM}
"""
