#!/usr/bin/env python3
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The reference publishes no benchmark numbers (BASELINE.md) — its envelope is
"compare 1e9-row tables in 5000-row chunks, 8 threads, tables serially". The
headline metric here is total wall-clock for the engine's representative
query set at the given scale factor, dominated by the digest-compare path
(the reference's core operation).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from tidb_large_table_compare_spark.session import get_spark  # noqa: E402

# Representative slice of the registry: the compare path (the engine's reason
# to exist), heavy analytics, and one of each extension family.
HEADLINE = [
    "cmp_summary_orders",
    "cmp_diff_rows_orders",
    "cmp_fix_sql_orders",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_revenue_by_nation",
    "sessionize_events",
    "hourly_event_counts",
    "dedup_exact_docs",
    "neardup_minhash_lsh",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "kmeans_cluster_sizes",
    "range_join_errors_busy_hours",
    "doc_fingerprints",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("bench")

    from tidb_large_table_compare_spark.registry import QUERIES

    # warm the JVM/codegen once with a trivial action so the first measured
    # query doesn't pay session startup costs
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.monotonic()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.monotonic() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
