"""CLI for lake maintenance: small-file compaction over parquet datasets.

The operational counterpart of `cli.py` (compare) and `curate_cli.py`
(curation): inventory a directory tree, plan compaction bins per
directory (`operators/compaction.py` — pure metadata algebra, oracle-
checked as `compaction_plan_bins` / `compaction_replan_converges`), and
optionally execute the plan into a mirror tree of merged files.

Usage:
  # plan only: print per-directory bin summary, write the plan as parquet
  python -m tidb_large_table_compare_spark.maintenance_cli \
      --dir /data/lake --target-bytes 134217728 [--plan-out /data/plan]

  # plan + execute: merged files land under --execute-out, one per bin,
  # mirroring each source directory relative to the inventory root;
  # sources are only read
  ... maintenance_cli --dir /data/lake --target-bytes 134217728 \
      --execute-out /data/lake_compacted

  # plan + execute + swap: the destructive final step — merged files
  # replace the small originals in place via the crash-healing side-dir +
  # two-renames protocol (`operators/compaction.py::swap_compacted`); an
  # interrupted swap heals on the next run
  ... maintenance_cli --dir /data/lake --target-bytes 134217728 \
      --execute-out /data/lake_compacted --swap

Exit codes: 0 success; 1 run lock held; 2 argument errors; 3 partial
compaction failure — the partial manifest (succeeded bins) and the full
failure list are printed so a scheduler can resume (outputs are
idempotent overwrites; re-run to finish). A run lock keyed on the target
directory refuses concurrent maintenance of the same tree.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import tempfile

from tidb_large_table_compare_spark.runlock import LockHeld, RunLock
from tidb_large_table_compare_spark.session import get_spark


def _parse_args(argv: list[str] | None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dir", required=True,
                   help="root directory to inventory (recursive)")
    p.add_argument("--target-bytes", type=int, default=128 << 20,
                   help="compaction bin target (default 128 MiB — one "
                        "healthy parquet file per bin)")
    p.add_argument("--no-recursive", action="store_true",
                   help="inventory only the top-level directory")
    p.add_argument("--distributed-inventory", action="store_true",
                   help="list via Spark's own file index (executors, no "
                        "driver row marshaling) instead of the driver "
                        "walk; the walk auto-delegates above 1M files "
                        "anyway — this flag skips straight there (always "
                        "recursive)")
    p.add_argument("--plan-out", default=None,
                   help="write the full plan (path, bytes, dir, action, "
                        "bin) as parquet here")
    p.add_argument("--execute-out", default=None,
                   help="execute the plan: one merged file per bin under "
                        "this directory (sources are only read)")
    p.add_argument("--swap", action="store_true",
                   help="after executing, swap the merged files in over "
                        "the small originals (destructive; crash-healing "
                        "rename protocol; requires --execute-out)")
    p.add_argument("--heal-only", action="store_true",
                   help="only reclaim interrupted swaps under --dir (run "
                        "after a crashed maintenance job), then exit — no "
                        "inventory, plan, or execute")
    p.add_argument("--lock-file", default=None,
                   help="run-lock path (default: keyed on --dir under the "
                        "system temp dir)")
    return p.parse_args(argv)


def main(argv: list[str] | None = None) -> int:
    args = _parse_args(argv)
    if args.target_bytes <= 0:
        print("error: --target-bytes must be positive", file=sys.stderr)
        return 2
    if args.swap and not args.execute_out:
        print("error: --swap requires --execute-out", file=sys.stderr)
        return 2
    if args.heal_only and (args.swap or args.execute_out or args.plan_out):
        print("error: --heal-only takes no plan/execute/swap flags",
              file=sys.stderr)
        return 2
    if args.distributed_inventory and args.no_recursive:
        print("error: --distributed-inventory is always recursive",
              file=sys.stderr)
        return 2

    # normalize before keying the lock: /data/lake, /data/lake/ and a
    # relative spelling of the same tree must contend on ONE lock
    lock_key = os.path.abspath(args.dir).rstrip("/") or "/"
    # refuse output dirs INSIDE the maintained tree: merged mirror files
    # written under --dir would be inventoried as independent source data
    # on the next run and re-binned, compounding the duplication
    root = lock_key
    for flag, val in (("--plan-out", args.plan_out),
                      ("--execute-out", args.execute_out)):
        if val:
            target = os.path.abspath(val).rstrip("/")
            if target == root or target.startswith(root + "/"):
                print(f"error: {flag} must not be inside --dir "
                      f"({val} is under {args.dir})", file=sys.stderr)
                return 2
    lock_path = args.lock_file or (
        tempfile.gettempdir()
        + "/spark_maintenance_"
        + hashlib.md5(lock_key.encode()).hexdigest()[:12]
        + ".lock"
    )
    try:
        with RunLock(lock_path):
            return _run(args)
    except LockHeld as exc:
        print(f"error: {exc}", file=sys.stderr)
        return 1


def _run(args) -> int:
    from pyspark.sql import functions as F

    from tidb_large_table_compare_spark.operators.compaction import (
        CompactionError,
        compaction_plan,
        execute_compaction,
        file_inventory,
        heal_tree,
        swap_compacted,
    )

    spark = get_spark("maintenance")
    # reclaim any interrupted swap BEFORE inventorying (we hold the run
    # lock): an X.old left by a crash holds retired duplicates that a
    # naive listing would resurrect as an independent table
    try:
        healed = heal_tree(spark, args.dir)
    except CompactionError as exc:
        # same contract as the execute/swap branches: the heals that DID
        # complete go to stdout, the full failure list to stderr, and the
        # exit code stays distinct from 1 (= run lock held)
        for h in exc.manifest["healed"]:
            print(f"healed interrupted swap: {h}")
        print(f"error: {exc}", file=sys.stderr)
        for f in exc.failures:
            print(f"failed: {f}", file=sys.stderr)
        return 3
    for h in healed:
        print(f"healed interrupted swap: {h}")
    if args.heal_only:
        print(f"heal-only: {len(healed)} interrupted swap(s) reclaimed")
        return 0
    inv = file_inventory(
        spark, args.dir, recursive=not args.no_recursive,
        distributed=True if args.distributed_inventory else None,
    )
    plan = compaction_plan(inv, args.target_bytes).persist()
    try:
        summary = (
            plan.groupBy("dir", "action")
            .agg(
                F.count(F.lit(1)).alias("n_files"),
                F.sum("bytes").alias("bytes"),
                F.count_distinct("bin").alias("n_bins"),
            )
            .orderBy("dir", "action")
            .collect()
        )
        if not summary:
            print(f"plan: no parquet files under {args.dir}")
            if args.plan_out:
                # a requested plan dataset must exist even when empty —
                # a scheduler reading it back should see zero rows, not a
                # missing path after a "successful" run
                plan.write.mode("overwrite").parquet(args.plan_out)
                print(f"plan written to {args.plan_out}")
            return 0
        for r in summary:
            bins = f" bins={r.n_bins}" if r.action == "compact" else ""
            print(
                f"plan {r.dir} {r.action} files={r.n_files} "
                f"bytes={r.bytes if r.bytes is not None else 0}{bins}"
            )
        if args.plan_out:
            plan.write.mode("overwrite").parquet(args.plan_out)
            print(f"plan written to {args.plan_out}")
        if args.execute_out:
            try:
                manifest = execute_compaction(spark, plan, args.execute_out)
            except CompactionError as exc:
                # the documented exit-code contract: the partial manifest
                # (succeeded bins) and the FULL failure list go to the
                # streams so a scheduler can resume programmatically
                print("execute " + json.dumps(exc.manifest))
                print(f"error: {exc}", file=sys.stderr)
                for f in exc.failures:
                    print(f"failed: {f}", file=sys.stderr)
                return 3
            print("execute " + json.dumps(manifest))
            if args.swap:
                try:
                    swapped = swap_compacted(spark, plan, args.execute_out)
                except CompactionError as exc:
                    # same contract as the execute branch: partial manifest
                    # to stdout, the FULL failure list to stderr (the
                    # message alone previews only the first 5)
                    print("swap " + json.dumps(exc.manifest))
                    print(f"error: {exc}", file=sys.stderr)
                    for f in exc.failures:
                        print(f"failed: {f}", file=sys.stderr)
                    return 3
                print("swap " + json.dumps(swapped))
    finally:
        plan.unpersist()
    return 0


if __name__ == "__main__":
    sys.exit(main())
