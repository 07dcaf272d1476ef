"""CLI for the corpus-curation pipeline (`plans/curate.py`).

The LLM-pipeline counterpart of `cli.py`'s compare workflow: one command
runs exact dedup → near-dup cluster resolution → quality filter → hash
split → packing, writes the curated corpus partitioned by split, and prints
the attrition manifest.

Usage:
  python -m tidb_large_table_compare_spark.curate_cli \
      --input /data/documents.parquet --out /data/curated \
      [--shingle-n 5] [--jaccard 0.8] [--val-permille 100] \
      [--chunk-cap 2048] [--lock-file PATH]

Incremental admission (`operators/dedup_index.py`) — the daily operation
once a corpus stands; neither mode re-reads corpus text:
  # build the persisted near-dup index once over the standing corpus
  ... curate_cli --mode build-index --input corpus.parquet \
      --index /data/ndidx --out /data/ndidx
  # admit an arriving batch: near-dup pairs vs the index → parquet + manifest
  ... curate_cli --mode admit --input batch.parquet \
      --index /data/ndidx --out /data/admission_pairs
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import tempfile
from pathlib import Path

from tidb_large_table_compare_spark.plans.curate import curate_corpus
from tidb_large_table_compare_spark.runlock import LockHeld, RunLock
from tidb_large_table_compare_spark.session import get_spark


def _parse_args(argv: list[str] | None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", default=None,
                   help="parquet path with (doc_id, text, ...) rows "
                        "(required for every mode except compact-index)")
    p.add_argument("--out", default=None,
                   help="output directory (not needed for compact-index)")
    p.add_argument("--shingle-n", type=int, default=5)
    p.add_argument("--jaccard", type=float, default=0.8)
    p.add_argument("--benchmark", default=None,
                   help="parquet path of benchmark docs (text column); "
                        "enables the decontamination stage")
    p.add_argument("--val-permille", type=int, default=100)
    p.add_argument("--chunk-cap", type=int, default=2048)
    p.add_argument("--pack-shards", type=int, default=1,
                   help="packing windows per split (>1 = sharded scale path)")
    p.add_argument("--mode",
                   choices=["curate", "build-index", "admit", "append-index",
                            "compact-index"],
                   default="curate",
                   help="curate (default) = full pipeline; build-index = "
                        "persist the near-dup admission index for --input; "
                        "admit = probe --index with the --input batch; "
                        "append-index = fold the admitted --input batch "
                        "into --index so future admits see it; "
                        "compact-index = rewrite --index from its own "
                        "tables (dedup re-appends, re-apply the bucket "
                        "cap, merge append files — never reads corpus text)")
    p.add_argument("--index", default=None,
                   help="admission index path (the *-index and admit modes)")
    p.add_argument("--max-bucket-size", type=int, default=10_000,
                   help="hot-bucket cap (build-index/compact-index)")
    p.add_argument("--lock-file", default=None)
    args = p.parse_args(argv)
    if args.mode in ("build-index", "admit", "append-index", "compact-index") \
            and not args.index:
        p.error(f"--mode {args.mode} requires --index")
    if args.mode != "compact-index":
        if not args.input:
            p.error(f"--mode {args.mode} requires --input")
    # --out is consumed only by the modes that WRITE a result dataset
    # (curate's corpus, admit's pair table) — build-index/append-index
    # write solely to --index, and requiring a meaningless directory
    # taught users it mattered
    if args.mode in ("curate", "admit") and not args.out:
        p.error(f"--mode {args.mode} requires --out")
    return args


def _default_lock_path(out_dir: str) -> str:
    # normalize like maintenance_cli: different spellings of the same
    # index path (trailing slash, relative form) must map to ONE lock, or
    # a probe and a compaction of the same index run concurrently
    key = os.path.abspath(out_dir).rstrip("/") or "/"
    digest = hashlib.sha256(key.encode()).hexdigest()[:16]
    return str(Path(tempfile.gettempdir()) / f"curate_{digest}.lock")


def main(argv: list[str] | None = None) -> int:
    args = _parse_args(argv)
    # every mode that touches an admission index (including admit, which
    # READS it) locks on the INDEX path, so a probe can never overlap a
    # compaction's rename window; plain curation locks on its output
    lock = RunLock(args.lock_file or _default_lock_path(args.index or args.out))
    try:
        lock.acquire()
    except LockHeld as held:
        print(f"ERROR: {held}", file=sys.stderr)
        return 1
    lock.install_signal_cleanup()
    try:
        spark = get_spark("curate")
        if args.mode == "compact-index":
            from tidb_large_table_compare_spark.operators.dedup_index import (
                compact_neardup_index,
            )

            stats = compact_neardup_index(
                spark, args.index, max_bucket_size=args.max_bucket_size
            )
            print(json.dumps({"mode": "compact-index", "index": args.index,
                              **stats}, indent=2))
            return 0
        docs = spark.read.parquet(args.input)
        if args.mode == "build-index":
            from tidb_large_table_compare_spark.operators.dedup_index import (
                build_neardup_index,
            )

            build_neardup_index(docs, args.index, shingle_n=args.shingle_n,
                                max_bucket_size=args.max_bucket_size)
            n = spark.read.parquet(f"{args.index}/docs").count()
            print(json.dumps({"mode": "build-index", "index": args.index,
                              "n_indexed": n}, indent=2))
            return 0
        if args.mode == "append-index":
            from tidb_large_table_compare_spark.operators.dedup_index import (
                append_to_neardup_index,
            )

            append_to_neardup_index(docs, args.index, shingle_n=args.shingle_n)
            n = spark.read.parquet(f"{args.index}/docs").count()
            print(json.dumps({"mode": "append-index", "index": args.index,
                              "n_appended": docs.count(), "n_indexed": n},
                             indent=2))
            return 0
        if args.mode == "admit":
            from tidb_large_table_compare_spark.operators.dedup_index import (
                query_neardup_index,
            )

            pairs = query_neardup_index(
                spark, args.index, docs,
                shingle_n=args.shingle_n, threshold=args.jaccard,
            )
            pairs.write.mode("overwrite").parquet(args.out)
            written = spark.read.parquet(args.out)
            n_pairs = written.count()
            n_dup_new = written.select("id_b").distinct().count()
            n_batch = docs.count()
            print(json.dumps({
                "mode": "admit", "index": args.index, "pairs": args.out,
                "n_batch": n_batch, "n_neardup_pairs": n_pairs,
                "n_batch_docs_with_neardup": n_dup_new,
                "n_clean_admissions": n_batch - n_dup_new,
            }, indent=2))
            return 0
        manifest = curate_corpus(
            spark,
            docs,
            args.out,
            shingle_n=args.shingle_n,
            jaccard_threshold=args.jaccard,
            benchmark=(
                spark.read.parquet(args.benchmark) if args.benchmark else None
            ),
            val_permille=args.val_permille,
            chunk_cap=args.chunk_cap,
            pack_shards=args.pack_shards,
        )
        print(json.dumps(manifest, indent=2))
        return 0
    finally:
        lock.release()


if __name__ == "__main__":
    sys.exit(main())
