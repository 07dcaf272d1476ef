"""Physical-plan assertions — the scale properties the engine depends on.

These lock in what `.explain("formatted")` reviews found: predicate pushdown
and column pruning reaching the parquet scans, dimension joins broadcasting,
and the compare drill-down no longer recomputing the digest subtree.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tidb_large_table_compare_spark.operators.compare import compare_tables
from tidb_large_table_compare_spark.perturb import perturbed_orders
from tidb_large_table_compare_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_pushdown_and_pruning(spark):
    plan = _plan(QUERIES["q1_pricing_summary"](spark, SF_SMALL))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: the scan must not read the join keys q1 never touches
    scan = [l for l in plan.splitlines() if "FileScan parquet" in l][0]
    assert "l_orderkey" not in scan and "l_partkey" not in scan
    assert "l_quantity" in scan


def test_q5_broadcasts_dimensions(spark):
    plan = _plan(QUERIES["q5_revenue_by_nation"](spark, SF_SMALL))
    # nation/region/supplier are tiny: Catalyst must broadcast, not sort-merge
    assert plan.count("BroadcastHashJoin") >= 3


def test_compare_drilldown_scans_bounded(spark):
    """After bad-bucket materialization the diff plan contains exactly the
    two drill-down scans — the digest subtree must not be re-inlined."""
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    cmp = compare_tables(
        spark, orders, perturbed_orders(orders), pk=["o_orderkey"], table_name="t"
    )
    plan = _plan(cmp.diff_rows())
    # left side scans once; the perturbed right side is built from two reads
    # of the same file (filter + union) → at most 3 file scans, never the
    # 8-10 of the pre-materialization plan
    assert plan.count("FileScan parquet") <= 3


def test_compare_narrow_shuffle_columns(spark):
    """The PK join must shuffle only (pk, hash) — no payload columns."""
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    cmp = compare_tables(
        spark, orders, perturbed_orders(orders), pk=["o_orderkey"], table_name="t"
    )
    plan = _plan(cmp.diff_rows())
    for line in plan.splitlines():
        if "Exchange hashpartitioning(o_orderkey" in line:
            # shuffle output schema is the narrow (pk, hash) projection
            assert "o_totalprice" not in line and "o_orderpriority" not in line


def test_ann_broadcasts_queries(spark):
    plan = _plan(QUERIES["ann_cosine_topk"](spark, SF_SMALL))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_digest_map_side_combine(spark):
    """The digest aggregation must partially aggregate before the shuffle —
    bytes shuffled ∝ n_buckets, not rows (the core 100 TB property, B6)."""
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    cmp = compare_tables(
        spark, orders, perturbed_orders(orders), pk=["o_orderkey"], table_name="t"
    )
    plan = _plan(cmp.bucket_digests("left"))
    pre_shuffle = plan.split("Exchange hashpartitioning(__bucket")[-1]
    assert "partial_count" in pre_shuffle and "partial_bit_xor" in pre_shuffle
