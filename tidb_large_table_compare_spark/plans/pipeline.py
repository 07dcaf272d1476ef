"""End-to-end orchestration: discover → plan → execute → report.

Collapses the reference's three file-mediated stages (SURVEY.md §3) into one
driver program:

- plan: one :class:`CompareJob` per discovered table — the in-memory analog
  of the generated per-table TOML (``step2_generate_configs.sh:96-133``);
  no file intermediary, no template substitution.
- execute: per-table comparisons, optionally overlapped with a thread pool
  (the reference runs tables strictly serially, ``step3:106-123``; Spark's
  scheduler interleaves jobs submitted from threads, so table-level
  concurrency is free).
- tally: success/failure counts, failed-table list, nonzero-exit semantics
  (A13, ``step3:100-122, 247-249``).
- report: union of per-table summaries → :mod:`.report` totals/rendering.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from concurrent.futures import ThreadPoolExecutor, as_completed
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from tidb_large_table_compare_spark.operators.compare import (
    CompareOptions,
    compare_tables,
)

__all__ = ["CompareJob", "CompareRun", "format_progress", "run_jobs"]


@dataclass
class CompareJob:
    """Per-table comparison spec (the generated-TOML analog, SURVEY.md §1.1)."""

    table: str  # '{schema}.{table}' display name
    left: DataFrame
    right: DataFrame
    pk: list[str] | None
    options: CompareOptions = field(default_factory=CompareOptions)


@dataclass
class CompareRun:
    """Outcome of a batch of comparison jobs (A13 semantics)."""

    run_ts: str
    summaries: DataFrame  # (run_ts, table, structure_ok, upcount, downcount)
    ok_count: int
    fail_count: int
    failed_tables: list[str]

    @property
    def exit_code(self) -> int:
        """Nonzero if any table failed (``step3_run_syncdiff.sh:247-249``)."""
        return 1 if self.fail_count else 0


def format_progress(
    done: int, total: int, table: str, secs: float | None = None, width: int = 50
) -> str:
    """The reference's progress line (``step3_run_syncdiff.sh:43-57``):
    a fixed-width bar, percentage, (done/total) counter, and the table name —
    plus the per-table wall-clock the reference logs separately
    (``step3:125-134``)."""
    pct = done * 100 // max(total, 1)
    filled = pct * width // 100
    bar = "=" * filled + "-" * (width - filled)
    line = f"[{bar}] {pct:3d}% ({done:2d}/{total:2d}) {table}"
    if secs is not None:
        line += f" ({secs:.3f}s)"
    return line


def run_jobs(
    spark: SparkSession,
    jobs: list[CompareJob],
    parallelism: int = 4,
    run_ts: str | None = None,
    progress: Callable[[str], None] | None = None,
) -> CompareRun:
    """Execute comparison jobs and aggregate their summaries.

    Each job's summary is computed eagerly (it is a one-row result; the heavy
    lifting stays distributed) so per-table failures are isolated exactly the
    way the reference isolates per-config tool failures (``step3:111-122``).

    ``progress`` receives one reference-style line per *completed* table
    (N of M, per-table wall-clock) as jobs finish.
    """
    run_ts = run_ts or time.strftime("%Y%m%d_%H%M%S")
    total = len(jobs)
    done = 0

    def one(job: CompareJob):
        t0 = time.monotonic()
        cmp = compare_tables(
            spark, job.left, job.right, job.pk, job.options, job.table
        )
        row = cmp.summary().collect()[0]
        # per-table wall-clock, the reference's duration accounting
        # (step3_run_syncdiff.sh:125-134)
        return job.table, row, round(time.monotonic() - t0, 3)

    def emit(table: str, secs: float | None) -> None:
        nonlocal done
        done += 1
        if progress is not None:
            progress(format_progress(done, total, table, secs))

    results: list[tuple[str, object]] = []
    failed: list[str] = []
    if parallelism > 1 and len(jobs) > 1:
        with ThreadPoolExecutor(max_workers=parallelism) as pool:
            futures = {pool.submit(one, j): j.table for j in jobs}
            for fut in as_completed(futures):
                table = futures[fut]
                try:
                    res = fut.result()
                    results.append(res)
                    emit(table, res[2])
                except Exception:
                    failed.append(table)
                    emit(table, None)
    else:
        for j in jobs:
            try:
                res = one(j)
                results.append(res)
                emit(j.table, res[2])
            except Exception:
                failed.append(j.table)
                emit(j.table, None)

    rows = [
        (run_ts, table, row.structure_ok, row.upcount, row.downcount, secs)
        for table, row, secs in results
    ]
    summaries = spark.createDataFrame(
        rows,
        "run_ts string, table string, structure_ok boolean, "
        "upcount bigint, downcount bigint, duration_s double",
    )
    return CompareRun(
        run_ts=run_ts,
        summaries=summaries,
        ok_count=len(results),
        fail_count=len(failed),
        failed_tables=sorted(failed),
    )
