#!/usr/bin/env python3
"""Event-log profiler for headline entries (guide §1/§7 without the UI).

Runs each named entry warm under ``setJobDescription``, with the Spark
event log enabled, then parses the log into per-entry job walls, stage
task counts, and the DRIVER GAP (entry span − Σ job wall) — the planning /
py4j / AQE-scheduling time between jobs that the UI's timeline would show
as "nothing running".

Usage:
    python3 tools/profile_entries.py [entry ...]       # default: bench HEADLINE
    python3 tools/profile_entries.py curation_pipeline cmp_summary_orders

Composite bench entries (curation_pipeline, cdc_digest_apply) are resolved
through bench.py's EXTRA_BENCHES factories; everything else through the
registry. Output: one JSON line per entry on stdout.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

EVDIR = tempfile.mkdtemp(prefix="spark_evlog_")
os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

def get_spark_with_eventlog():
    from tidb_large_table_compare_spark import session as sess

    return sess.get_spark("profile", extra_conf={
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": EVDIR,
        "spark.eventLog.compress": "false",
    })


def _event_lines(path: str):
    """Yield event-log lines; handles both the single-file layout and the
    Spark 4 rolling directory (eventlog_v2_*/events_N_*)."""
    p = Path(path)
    files = (
        sorted(p.glob("events_*")) if p.is_dir() else [p]
    )
    for fp in files:
        with open(fp) as f:
            yield from f


def parse_eventlog(path: str) -> dict:
    """{job_id: (desc, t_start_ms, t_end_ms, n_tasks)} plus SQL spans."""
    jobs = {}
    for line in _event_lines(path):
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        et = ev.get("Event")
        if et == "SparkListenerJobStart":
            jid = ev["Job ID"]
            desc = ev.get("Properties", {}).get("spark.job.description", "")
            ntasks = sum(
                s.get("Number of Tasks", 0) for s in ev.get("Stage Infos", [])
            )
            names = [
                s.get("Stage Name", "")[:60] for s in ev.get("Stage Infos", [])
            ]
            jobs[jid] = {
                "desc": desc,
                "t0": ev["Submission Time"],
                "t1": None,
                "n_tasks": ntasks,
                "stages": names,
            }
        elif et == "SparkListenerJobEnd":
            jid = ev["Job ID"]
            if jid in jobs:
                jobs[jid]["t1"] = ev["Completion Time"]
    return jobs


def main() -> None:
    sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]
    spark = get_spark_with_eventlog()
    sc = spark.sparkContext

    from bench import EXTRA_BENCHES, HEADLINE
    from tidb_large_table_compare_spark.registry import QUERIES

    names = sys.argv[1:] or HEADLINE + list(EXTRA_BENCHES)
    workdir = tempfile.mkdtemp(prefix="profile_extra_")

    thunks = {}
    for n in names:
        if n in EXTRA_BENCHES:
            thunks[n] = EXTRA_BENCHES[n](spark, sf_dir, workdir)
        else:
            thunks[n] = lambda n=n: QUERIES[n](spark, sf_dir).count()

    spans = {}
    for n, thunk in thunks.items():
        thunk()  # warm: codegen + caches, like the bench
        sc.setJobDescription(f"profile:{n}")
        t0 = time.monotonic()
        thunk()
        spans[n] = round(time.monotonic() - t0, 3)
        sc.setJobDescription(None)

    app_id = sc.applicationId
    spark.stop()
    time.sleep(1.0)

    logs = [p for p in Path(EVDIR).iterdir() if app_id in p.name]
    jobs = parse_eventlog(str(logs[0]))

    for n in names:
        tagged = [
            j for j in jobs.values()
            if j["desc"] == f"profile:{n}" and j["t1"] is not None
        ]
        sum_job_ms = sum(j["t1"] - j["t0"] for j in tagged)
        span_ms = int(spans[n] * 1000)
        print(json.dumps({
            "entry": n,
            "span_ms": span_ms,
            "n_jobs": len(tagged),
            "sum_job_ms": sum_job_ms,
            "driver_gap_ms": span_ms - sum_job_ms,
            "jobs": [
                {
                    "wall_ms": j["t1"] - j["t0"],
                    "n_tasks": j["n_tasks"],
                    "stages": j["stages"],
                }
                for j in sorted(tagged, key=lambda j: j["t0"])
            ],
        }))


if __name__ == "__main__":
    main()
