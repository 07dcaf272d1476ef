#!/usr/bin/env python3
"""Spark-side-only scale one-shots: wall + row count + hypervisor steal.

Usage: python3 tools/scale_oneshot.py SF_DIR ENTRY [ENTRY ...]

An entry may also be written ``DIR::ENTRY`` to run it against a
different SF directory in the SAME session — cross-SF slope ratios are
only trustworthy same-session on this host (steal waves make
cross-session absolutes incomparable; see PERFORMANCE.md).

``--release`` between entries unpersists the registry's tracked caches
and nudges the JVM GC so ContextCleaner can reap dead shuffle files.
Long one-session ladders otherwise accumulate every entry's shuffle
spill in the block manager dir — the r12 sf100 ladder piled up 32 GB
and killed its last two entries with "No space left on device". The
flag is opt-in because releasing state also changes what later entries
get for free (warm caches), i.e. the measured walls.

The scale-rehearsal methodology used since round 10 (PERFORMANCE.md):
run a registry entry's Spark plan at a replicated SF (``tools/
replicate_sf.py``) and record only ``count()`` wall time, result
cardinality, and the /proc/stat steal percentage sampled across the run
— no oracle, no result collection. Oracle-backed correctness proofs
stay at the driver SFs and the sweep replicas (``tools/oracle_sweep.py``);
this tool answers the other question: does the PLAN survive a decade of
scale-up without a knee (quadratic candidate blowup, state blowup,
driver collect ∝ rows, straggler skew)?

Walls from this tool are NOT comparable to sweep ``spark_s`` values (the
sweep collects full results for the cross-engine differential); compare
one-shot walls only against one-shot walls from the same host era, and
read the printed steal% before believing any ratio (see
memory/host-steal-noise: this host sees 6–26% steal waves).

Entries run sequentially in ONE Spark session, so the first entry pays
session/JIT warmup for the rest — order cheap canaries first when that
matters, or repeat an entry to get a warm number.
"""

import sys
import time

sys.path.insert(0, ".")

from tidb_large_table_compare_spark.session import get_spark


def cpu_stat():
    with open("/proc/stat") as f:
        v = [int(x) for x in f.readline().split()[1:]]
    return v[7], sum(v)


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__, file=sys.stderr)
        return 2
    args = sys.argv[1:]
    release = "--release" in args
    args = [a for a in args if a != "--release"]
    sf_dir, names = args[0], args[1:]
    spark = get_spark("scale-oneshot")
    from tidb_large_table_compare_spark import registry
    from tidb_large_table_compare_spark.registry import QUERIES

    jobs = [
        tuple(n.split("::", 1)) if "::" in n else (sf_dir, n) for n in names
    ]
    unknown = [n for _, n in jobs if n not in QUERIES]
    if unknown:
        print(f"unknown entries: {unknown}", file=sys.stderr)
        return 2
    failures = 0
    for job_dir, name in jobs:
        s0 = cpu_stat()
        t0 = time.monotonic()
        try:
            n = QUERIES[name](spark, job_dir).count()
            wall = time.monotonic() - t0
            s1 = cpu_stat()
            steal = 100.0 * (s1[0] - s0[0]) / max(1, (s1[1] - s0[1]))
            print(
                f"OK {name} [{job_dir}]: {wall:.1f}s rows={n} "
                f"steal={steal:.1f}%",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001 — report and continue the ladder
            failures += 1
            print(
                f"FAIL {name} [{job_dir}]: {time.monotonic() - t0:.1f}s "
                f"{type(e).__name__}: {str(e)[:200]}",
                flush=True,
            )
        if release:
            for key in list(registry._TRACKED_CACHES):
                registry._TRACKED_CACHES.pop(key).unpersist()
            # ContextCleaner reaps shuffle files only after their
            # ShuffleDependency is GC'd on the JVM side
            spark.sparkContext._jvm.System.gc()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
