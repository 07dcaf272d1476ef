"""Sink parity (SURVEY.md §2.C sinks): TSV work lists, text reports, parquet
summaries — write then read back through Spark."""

from __future__ import annotations

from pyspark.sql import functions as F

from tidb_large_table_compare_spark.operators.compare import compare_tables
from tidb_large_table_compare_spark.plans.report import render_report
from tests.conftest import SF_SMALL


def test_tsv_worklist_roundtrip(spark, tmp_path):
    """The reference's query_results.txt is a 2-column TSV (A26,
    step1_query_tables.sh:146)."""
    wl = spark.createDataFrame(
        [("my_database", "users"), ("app", "orders")],
        "table_schema string, table_name string",
    )
    out = str(tmp_path / "worklist")
    wl.write.option("sep", "\t").csv(out)
    back = spark.read.option("sep", "\t").schema(wl.schema).csv(out)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, wl.collect()))
    raw = "".join(p.read_text() for p in (tmp_path / "worklist").glob("part-*"))
    assert "my_database\tusers" in raw


def test_report_text_sink(spark, tmp_path):
    summaries = spark.createDataFrame(
        [("20240101_000000", "`db`.`t`", True, 1, 2)],
        "run_ts string, table string, structure_ok boolean, upcount bigint, downcount bigint",
    )
    out = str(tmp_path / "report")
    render_report(summaries).coalesce(1).write.text(out)
    text = "".join(p.read_text() for p in (tmp_path / "report").glob("part-*"))
    assert "| `db`.`t`" in text and text.startswith("+")


def test_summary_parquet_sink_roundtrip(spark, tmp_path):
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    cmp = compare_tables(
        spark, orders, orders.filter(F.col("o_orderkey") != 1), ["o_orderkey"],
        table_name="main.orders",
    )
    out = str(tmp_path / "summaries")
    cmp.summary().write.parquet(out)
    back = spark.read.parquet(out)
    row = back.collect()[0]
    assert row.upcount == 1 and row.downcount == 0 and not row.equivalent
