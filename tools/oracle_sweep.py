#!/usr/bin/env python3
"""Resumable full-registry oracle differential at an arbitrary SF.

Usage: python3 tools/oracle_sweep.py SF_DIR OUT_JSONL [NAME ...]

Runs every oracle-backed ``queries()`` entry (or just the NAMEs given)
against its DuckDB ``oracle_sql()`` twin over SF_DIR, appending one JSON
line per entry to OUT_JSONL: name, ok, message, and the split Spark /
DuckDB wall-clock so the per-engine bottleneck is visible. Entries already
present in OUT_JSONL are skipped, so the sweep is resumable and can be run
in fresh-JVM chunks (a 131-entry pass at sf10 holds hours of DuckDB work;
one process per tranche keeps localCheckpoint block accumulation bounded —
see ADVICE r10 on executor-storage growth in long sessions).

Methodology matches tests/test_oracle.py (the driver's t2 gate replica):
same harness normalization, same tables, same bit-exact value compare.
"""

from __future__ import annotations

import json
import sys
import time
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entrymod  # noqa: E402
from tests.oracle_harness import normalize, run_oracle  # noqa: E402
from tidb_large_table_compare_spark.session import get_spark  # noqa: E402


def sweep_entry(spark, name: str, sf_dir: str) -> dict:
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    rec: dict = {"name": name, "sf_dir": sf_dir}
    t0 = time.monotonic()
    try:
        sdf = queries[name](spark, sf_dir)
        s_cols = list(sdf.columns)
        s_rows = [tuple(r) for r in sdf.collect()]
        rec["spark_s"] = round(time.monotonic() - t0, 3)
        t1 = time.monotonic()
        o_cols, o_rows = run_oracle(oracles[name], sf_dir)
        rec["duck_s"] = round(time.monotonic() - t1, 3)
        if sorted(s_cols) != sorted(map(str, o_cols)) and sorted(s_cols) != sorted(
            str(c).lower() for c in o_cols
        ):
            rec["ok"] = False
            rec["msg"] = f"column mismatch: spark={sorted(s_cols)} duck={sorted(o_cols)}"
        elif len(s_rows) != len(o_rows):
            rec["ok"] = False
            rec["msg"] = f"row count mismatch: spark={len(s_rows)} duck={len(o_rows)}"
        else:
            sn = normalize(s_cols, s_rows)
            on = normalize([str(c) for c in o_cols], o_rows)
            if sn != on:
                diffs = [(a, b) for a, b in zip(sn, on) if a != b][:3]
                rec["ok"] = False
                rec["msg"] = f"value mismatch ({sum(a != b for a, b in zip(sn, on))} rows), first: {diffs}"
            else:
                rec["ok"] = True
                rec["msg"] = f"exact ({len(s_rows)} rows)"
    except Exception as exc:  # keep sweeping; the record carries the evidence
        rec["ok"] = False
        rec["msg"] = f"EXC {type(exc).__name__}: {exc}"
        rec["trace"] = traceback.format_exc()[-2000:]
    rec["total_s"] = round(time.monotonic() - t0, 3)
    return rec


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--retry-failed"]
    retry_failed = "--retry-failed" in sys.argv[1:]
    sf_dir, out_path = argv[0], Path(argv[1])
    wanted = argv[2:] or sorted(entrymod.oracle_sql())
    # Resume skips only ok==true records (failed/EXC entries re-run unless
    # they already succeeded later); --retry-failed additionally re-runs
    # entries whose LATEST record failed even if an older one passed.
    # A corrupt/partially-written trailing line is ignored, not fatal.
    done: set[str] = set()
    if out_path.exists():
        for line in out_path.read_text().splitlines():
            if not line.strip():
                continue
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if rec.get("ok") is True and not retry_failed:
                done.add(rec["name"])
            elif retry_failed:
                if rec.get("ok") is True:
                    done.add(rec["name"])
                else:
                    done.discard(rec["name"])
    todo = [n for n in wanted if n not in done]
    if not todo:
        print("nothing to do")
        return 0
    spark = get_spark()
    for i, name in enumerate(todo):
        rec = sweep_entry(spark, name, sf_dir)
        with out_path.open("a") as f:
            f.write(json.dumps(rec) + "\n")
        status = "OK " if rec["ok"] else "FAIL"
        print(
            f"[{i + 1}/{len(todo)}] {status} {name} spark={rec.get('spark_s', '?')}s "
            f"duck={rec.get('duck_s', '?')}s",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
