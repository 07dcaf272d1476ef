"""Command-line entry point — the reference's `run_all.sh` workflow, natively.

Discover → plan → compare → report in one driver program (SURVEY.md §3
lifecycle mapping): catalog from parquet footers, threshold/PK-type
discovery, per-table comparison jobs, fix-SQL export, rendered final report,
and the reference's exit-code contract (nonzero if any table failed,
``step3_run_syncdiff.sh:247-249``).

Usage:
  python -m tidb_large_table_compare_spark.cli \
      --left-dir /data/master --right-dir /data/slave \
      --tables orders,nation --pk orders=o_orderkey --pk nation=n_nationkey \
      [--row-threshold 0] [--chunk-size 5000] [--range "1 = 1"] \
      [--fix-sql-out DIR] [--report-out FILE]
"""

from __future__ import annotations

import argparse
import sys

from tidb_large_table_compare_spark.operators.compare import (
    CompareOptions,
    compare_tables,
)
from tidb_large_table_compare_spark.operators.fixsql import fix_sql
from tidb_large_table_compare_spark.plans.discover import discover
from tidb_large_table_compare_spark.plans.pipeline import CompareJob, run_jobs
from tidb_large_table_compare_spark.plans.report import render_report, report_totals
from tidb_large_table_compare_spark.session import get_spark
from tidb_large_table_compare_spark.sources.catalog import parquet_catalog


def _parse_args(argv: list[str] | None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--left-dir", required=True, help="master-side parquet dir")
    p.add_argument("--right-dir", required=True, help="slave-side parquet dir")
    p.add_argument("--tables", required=True, help="comma-separated table names")
    p.add_argument(
        "--pk",
        action="append",
        default=[],
        metavar="TABLE=COL[,COL...]",
        help="primary key per table (omit for multiset compare)",
    )
    p.add_argument("--schema", default="main")
    p.add_argument("--row-threshold", type=int, default=0,
                   help="discovery threshold (reference default 1e9; 0 = compare all)")
    p.add_argument("--chunk-size", type=int, default=5000)
    p.add_argument("--range", dest="range_sql", default=None)
    p.add_argument("--check-struct-only", action="store_true",
                   help="stop after the structure compare (template check-struct-only)")
    p.add_argument("--multiset", action="store_true",
                   help="force the keyless multiset diff for all tables")
    p.add_argument("--parallelism", type=int, default=4)
    p.add_argument("--fix-sql-out", default=None, help="dir for fix-SQL text output")
    p.add_argument("--report-out", default=None, help="file for the rendered report")
    return p.parse_args(argv)


def main(argv: list[str] | None = None) -> int:
    args = _parse_args(argv)
    tables = [t.strip() for t in args.tables.split(",") if t.strip()]
    pk_map: dict[str, list[str]] = {}
    for spec in args.pk:
        table, _, cols = spec.partition("=")
        pk_map[table] = [c.strip() for c in cols.split(",") if c.strip()]

    spark = get_spark("table-compare-cli")

    # discover: catalog from the master side, reference predicate shape (A1-A6)
    catalog = parquet_catalog(spark, args.left_dir, tables, schema_name=args.schema)
    if args.row_threshold > 0:
        worklist = [
            r.table_name
            for r in discover(catalog, row_threshold=args.row_threshold).collect()
        ]
    else:
        worklist = tables
    if not worklist:
        print("no tables matched the discovery predicate (normal; nothing to do)")
        return 0

    opts = dict(
        chunk_size=args.chunk_size,
        check_struct_only=args.check_struct_only,
        force_multiset=args.multiset,
    )
    if args.range_sql:
        opts["range_sql"] = args.range_sql
    jobs = [
        CompareJob(
            table=f"{args.schema}.{t}",
            left=spark.read.parquet(f"{args.left_dir}/{t}.parquet"),
            right=spark.read.parquet(f"{args.right_dir}/{t}.parquet"),
            pk=pk_map.get(t),
            options=CompareOptions(**opts),
        )
        for t in worklist
    ]
    run = run_jobs(spark, jobs, parallelism=args.parallelism)

    # report (A16-A25)
    lines = [r.line for r in render_report(run.summaries).collect()]
    totals = report_totals(run.summaries).collect()[0]
    report = "\n".join(lines) + (
        f"\ntables={totals.tables_checked} structure_ok={totals.structure_ok_cnt} "
        f"structure_diff={totals.structure_diff_cnt} "
        f"upcount={totals.total_upcount} downcount={totals.total_downcount} "
        f"volume={totals.volume_label}"
    )
    print(report)
    if args.report_out:
        with open(args.report_out, "w") as fh:
            fh.write(report + "\n")

    # fix-SQL export (B10) for tables with diffs and a PK
    if args.fix_sql_out:
        for job in jobs:
            if not job.pk:
                continue
            cmp = compare_tables(
                spark, job.left, job.right, job.pk, job.options, job.table
            )
            out = f"{args.fix_sql_out}/{job.table.replace('.', '_')}_fix"
            fix_sql(cmp).coalesce(1).write.mode("overwrite").text(out)

    if run.fail_count:
        print(f"FAILED tables: {', '.join(run.failed_tables)}", file=sys.stderr)
    return run.exit_code


if __name__ == "__main__":
    sys.exit(main())
