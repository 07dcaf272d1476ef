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
"""

from __future__ import annotations

import argparse
import hashlib
import json
import sys
import tempfile
from pathlib import Path

from tidb_large_table_compare_spark.plans.curate import curate_corpus
from tidb_large_table_compare_spark.runlock import LockHeld, RunLock
from tidb_large_table_compare_spark.session import get_spark


def _parse_args(argv: list[str] | None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True,
                   help="parquet path with (doc_id, text, ...) rows")
    p.add_argument("--out", required=True, help="output directory")
    p.add_argument("--shingle-n", type=int, default=5)
    p.add_argument("--jaccard", type=float, default=0.8)
    p.add_argument("--benchmark", default=None,
                   help="parquet path of benchmark docs (text column); "
                        "enables the decontamination stage")
    p.add_argument("--val-permille", type=int, default=100)
    p.add_argument("--chunk-cap", type=int, default=2048)
    p.add_argument("--pack-shards", type=int, default=1,
                   help="packing windows per split (>1 = sharded scale path)")
    p.add_argument("--lock-file", default=None)
    return p.parse_args(argv)


def _default_lock_path(out_dir: str) -> str:
    digest = hashlib.sha256(out_dir.encode()).hexdigest()[:16]
    return str(Path(tempfile.gettempdir()) / f"curate_{digest}.lock")


def main(argv: list[str] | None = None) -> int:
    args = _parse_args(argv)
    lock = RunLock(args.lock_file or _default_lock_path(args.out))
    try:
        lock.acquire()
    except LockHeld as held:
        print(f"ERROR: {held}", file=sys.stderr)
        return 1
    lock.install_signal_cleanup()
    try:
        spark = get_spark("curate")
        docs = spark.read.parquet(args.input)
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
