"""Snapshot-consistent reads (B2): pinned versions are immune to later writes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tidb_large_table_compare_spark.operators.compare import compare_tables
from tidb_large_table_compare_spark.sources.snapshots import (
    read_snapshot,
    snapshot_versions,
    write_snapshot,
)
from tests.conftest import SF_SMALL


def test_snapshot_versioning_and_pinning(spark, tmp_path):
    base = str(tmp_path / "orders_snap")
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")

    v1 = write_snapshot(orders, base)
    pinned = read_snapshot(spark, base, v1)

    # later write must not affect the pinned read (B2)
    v2 = write_snapshot(orders.filter(F.col("o_orderkey") % 2 == 0), base)
    assert snapshot_versions(base) == [v1, v2]
    assert pinned.count() == orders.count()
    assert read_snapshot(spark, base).count() < orders.count()  # latest = v2

    # comparing two pinned versions gives a stable, reproducible diff
    cmp = compare_tables(
        spark,
        read_snapshot(spark, base, v1),
        read_snapshot(spark, base, v2),
        ["o_orderkey"],
        table_name="snap",
    )
    row = cmp.summary().collect()[0]
    assert row.upcount == orders.filter(F.col("o_orderkey") % 2 == 1).count()
    assert row.downcount == 0


def test_snapshot_write_once(spark, tmp_path):
    base = str(tmp_path / "s")
    df = spark.range(10)
    write_snapshot(df, base)
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, base, version=99)
