"""Incremental compare via persisted bucket digests (operators/incremental).

The scale claim under test: after snapshotting a verified state, change
detection is ONE linear scan of the current table (no cross-side work), and
the row-level re-compare touches only drifted buckets while producing the
exact same diff a full compare would.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tidb_large_table_compare_spark.operators.compare import (
    CompareOptions,
    compare_tables,
)
from tidb_large_table_compare_spark.operators.incremental import (
    changed_buckets,
    incremental_compare,
    read_digests,
    write_digests,
)
from tidb_large_table_compare_spark.perturb import perturbed_orders
from tests.conftest import SF_SMALL

OPTS = CompareOptions(n_buckets=64)


def _orders(spark):
    return spark.read.parquet(f"{SF_SMALL}/orders.parquet")


def test_unchanged_table_has_no_drifted_buckets(spark, tmp_path):
    orders = _orders(spark)
    path = str(tmp_path / "digests")
    n = write_digests(spark, orders, ["o_orderkey"], path, OPTS)
    assert n == 64
    stored, pinned = read_digests(spark, path)
    assert pinned == 64 and stored.count() <= 64
    assert changed_buckets(spark, path, orders, ["o_orderkey"], OPTS).count() == 0


def test_changed_buckets_detects_all_perturbation_classes(spark, tmp_path):
    orders = _orders(spark)
    path = str(tmp_path / "digests")
    write_digests(spark, orders, ["o_orderkey"], path, OPTS)
    drifted = changed_buckets(
        spark, path, perturbed_orders(orders), ["o_orderkey"], OPTS
    )
    ids = {r["__bucket"] for r in drifted.collect()}
    assert ids, "perturbation must drift at least one bucket"
    # every perturbed row's bucket is flagged (deletes, modifies, inserts)
    from tidb_large_table_compare_spark.functions.hashing import bucket_id

    full_diff = compare_tables(
        spark, orders, perturbed_orders(orders), ["o_orderkey"], OPTS, "t"
    ).diff_rows()
    diff_buckets = {
        r["__b"]
        for r in full_diff.select(
            bucket_id(["o_orderkey"], 64).alias("__b")
        ).collect()
    }
    assert diff_buckets <= ids


def test_incremental_compare_equals_full_compare(spark, tmp_path):
    orders = _orders(spark)
    path = str(tmp_path / "digests")
    write_digests(spark, orders, ["o_orderkey"], path, OPTS)
    inc = incremental_compare(
        spark, orders, perturbed_orders(orders), ["o_orderkey"], path, OPTS, "t"
    )
    full = compare_tables(
        spark, orders, perturbed_orders(orders), ["o_orderkey"], OPTS, "t"
    )
    inc_rows = {
        (r["o_orderkey"], r["diff_type"]) for r in inc.diff_rows().collect()
    }
    full_rows = {
        (r["o_orderkey"], r["diff_type"]) for r in full.diff_rows().collect()
    }
    assert inc_rows == full_rows and inc_rows


def test_incremental_compare_no_drift_short_circuits(spark, tmp_path):
    orders = _orders(spark)
    path = str(tmp_path / "digests")
    write_digests(spark, orders, ["o_orderkey"], path, OPTS)
    inc = incremental_compare(
        spark, orders, orders, ["o_orderkey"], path, OPTS, "t"
    )
    row = inc.summary().collect()[0]
    assert row.equivalent and row.upcount == 0 and row.downcount == 0


def test_incremental_respects_range_predicate(spark, tmp_path):
    orders = _orders(spark)
    opts = CompareOptions(n_buckets=64, range_sql="o_orderkey % 2 = 0")
    path = str(tmp_path / "digests")
    write_digests(spark, orders.filter("o_orderkey % 2 = 0"),
                  ["o_orderkey"], path, opts)
    inc = incremental_compare(
        spark, orders, perturbed_orders(orders), ["o_orderkey"], path, opts, "t"
    )
    odd = inc.diff_rows().filter(F.col("o_orderkey") % 2 == 1).count()
    assert odd == 0  # scoped rows stay within the configured range
