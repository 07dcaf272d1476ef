"""Bucketed tables co-locate joins: same-bucket joins need no exchange.

This is the 100 TB repeated-join strategy the docs claim (pre-bucket both
sides of a recurring comparison key); the plan assertion proves Spark elides
the shuffle entirely.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    # NB: spark.sql.warehouse.dir is a static conf; tables land in the
    # default ./spark-warehouse (gitignored) and are dropped afterwards.
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    customer = spark.read.parquet(f"{SF_SMALL}/customer.parquet")
    try:
        (
            orders.write.mode("overwrite")
            .bucketBy(8, "o_custkey")
            .sortBy("o_custkey")
            .saveAsTable("orders_b")
        )
        (
            customer.write.mode("overwrite")
            .bucketBy(8, "c_custkey")
            .sortBy("c_custkey")
            .saveAsTable("customer_b")
        )
        # disable broadcast so the join would otherwise need a full shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("orders_b").join(
            spark.table("customer_b"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, plan[:2000]
        assert joined.count() == orders.join(
            customer, orders.o_custkey == customer.c_custkey
        ).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS customer_b")
