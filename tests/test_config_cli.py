"""Config parsing (A7/A8), job planning (A9/A10), and the CLI workflow."""

from __future__ import annotations

import base64

from pyspark.sql import functions as F

from tidb_large_table_compare_spark.config import (
    CompareJobSpec,
    decode_password,
    load_config,
    plan_jobs_from_config,
)
from tests.conftest import SF_SMALL

TOML = """
master_host = "10.0.0.1"
master_port = 4000
master_user = "root"
master_password = "{b64_pwd}"
slave_host = "10.0.0.2"
slave_port = 4000
slave_user = "reader"
slave_password = "plaintext-pass"
check_sql = "SELECT TABLE_SCHEMA, TABLE_NAME FROM information_schema.tables WHERE TABLE_ROWS > 1000000000"
thread_count = 8
chunk_size = 5000
output_dir = "/tmp/out"
range = "id > 0"
"""


def test_decode_password_fallback():
    # base64 decodes; plaintext (invalid b64 / non-utf8) passes through (A7)
    assert decode_password(base64.b64encode(b"s3cret!").decode()) == "s3cret!"
    assert decode_password("not base64 at all") == "not base64 at all"
    assert decode_password("") == ""
    # valid base64 of non-UTF8 bytes must also fall through, like the shell's
    # decode-then-use-anyway would corrupt; we keep the original string
    assert decode_password("/////w==") == "/////w=="


def test_load_config(tmp_path):
    pwd = base64.b64encode(b"hunter2").decode()
    f = tmp_path / "config.toml"
    f.write_text(TOML.format(b64_pwd=pwd))
    cfg = load_config(f)
    assert cfg.master.host == "10.0.0.1" and cfg.master.password == "hunter2"
    assert cfg.slave.password == "plaintext-pass"
    assert cfg.chunk_size == 5000 and cfg.thread_count == 8
    assert cfg.range_sql == "id > 0"


def test_plan_jobs_from_config(tmp_path):
    pwd = base64.b64encode(b"x").decode()
    f = tmp_path / "config.toml"
    f.write_text(TOML.format(b64_pwd=pwd))
    cfg = load_config(f)
    jobs = plan_jobs_from_config(cfg, [("my_database", "users"), ("app", "t1")])
    assert [j.config_name for j in jobs] == ["my_database_users.toml", "app_t1.toml"]
    assert jobs[0].qualified_name == "my_database.users"
    assert all(j.chunk_size == 5000 and j.range_sql == "id > 0" for j in jobs)


def test_cli_end_to_end(spark, tmp_path, capsys):
    """Full run_all-style workflow: perturbed slave dir → report + fix SQL +
    exit code 0 (jobs succeeded; diffs are results, not failures)."""
    from tidb_large_table_compare_spark.cli import main

    slave_dir = tmp_path / "slave"
    slave_dir.mkdir()
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    orders.filter(F.col("o_orderkey") % 50 != 7).write.parquet(
        str(slave_dir / "orders.parquet")
    )
    nation = spark.read.parquet(f"{SF_SMALL}/nation.parquet")
    nation.write.parquet(str(slave_dir / "nation.parquet"))

    report_file = tmp_path / "report.txt"
    code = main(
        [
            "--left-dir", SF_SMALL,
            "--right-dir", str(slave_dir),
            "--tables", "orders,nation",
            "--pk", "orders=o_orderkey",
            "--pk", "nation=n_nationkey",
            "--report-out", str(report_file),
            "--fix-sql-out", str(tmp_path / "fix"),
        ]
    )
    assert code == 0
    report = report_file.read_text()
    assert "main.orders" in report and "main.nation" in report
    assert "structure_ok=2" in report
    # 1500 orders, every 50th key removed → 30 missing
    assert "upcount=30" in report
    fix_files = list((tmp_path / "fix").rglob("part-*"))
    assert fix_files, "fix-SQL output missing"
    fix_text = "".join(f.read_text() for f in fix_files)
    assert fix_text.count("REPLACE INTO main.orders") == 30


def test_cli_discovery_threshold_filters_tables(spark, tmp_path, capsys):
    """--row-threshold routes through the A2 discovery predicate: tiny tables
    drop out of the work list entirely."""
    from tidb_large_table_compare_spark.cli import main

    code = main(
        [
            "--left-dir", SF_SMALL,
            "--right-dir", SF_SMALL,
            # orders (1500 rows) passes a 1000-row threshold; nation (25) and
            # region (CLUSTERED pk type) do not
            "--tables", "orders,nation,region",
            "--pk", "orders=o_orderkey",
            "--row-threshold", "1000",
        ]
    )
    assert code == 0
    out = capsys.readouterr().out
    assert "main.orders" in out
    assert "main.nation" not in out and "main.region" not in out
