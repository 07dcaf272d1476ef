"""Continuous verification: stream a change feed into the digest snapshot.

The batch path (`operators/incremental.py::apply_changes_to_digests`) folds
one CDC batch into a stored digest artifact; this wires it to Structured
Streaming's ``foreachBatch`` so the artifact tracks a live change feed —
the reference's nightly full rescan (``run_all.sh``) becomes a standing
query whose per-batch cost is O(changes), independent of table size.

Epoch handling makes this exactly-once-by-construction: each batch writes a
NEW artifact directory keyed by epoch (parquet cannot be rewritten while
readable) and a tiny ``LATEST`` pointer file is updated last, atomically
(temp file + rename). A retried epoch whose crash preceded the pointer
update rewrites its own directory and re-points — same end state; a retry
AFTER the pointer update (crash between the pointer rename and the stream's
checkpoint commit) is detected — LATEST already names this epoch's
directory — and skipped, because re-folding would both double-apply the
batch and read/overwrite the same parquet path.

``root`` must be a driver-local path: the pointer file is maintained with
local filesystem primitives (the artifacts themselves go through Spark).
A URI-schemed root (hdfs://, s3a://) is refused up front rather than
silently mangled by pathlib — route the pointer through the Hadoop
FileSystem API (as ``streaming/events.py::_is_directory`` does) if a
remote root is ever needed.

Feed convention: one column ``__op`` ('I' or 'D') plus the table's columns;
an upstream update arrives as its delete-old + insert-new pair, which is
exactly how binlog/CDC streams encode updates.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tidb_large_table_compare_spark.operators.compare import CompareOptions
from tidb_large_table_compare_spark.operators.incremental import (
    apply_changes_to_digests,
)

__all__ = ["start_digest_maintenance", "latest_digest_path"]

OP_COL = "__op"


def latest_digest_path(root: str) -> str:
    """The artifact directory the ``LATEST`` pointer currently names."""
    return (Path(root) / "LATEST").read_text().strip()


def start_digest_maintenance(
    spark: SparkSession,
    changes: DataFrame,
    root: str,
    pk: list[str],
    checkpoint: str,
    options: CompareOptions = CompareOptions(),
    available_now: bool = True,
):
    """Start the maintenance query over a streaming ``changes`` DataFrame.

    ``root`` must contain an initial artifact at ``root/epoch_init`` with
    ``LATEST`` pointing at it (write one with ``write_digests`` + a pointer
    file), and must be driver-local (see the module docstring). Returns
    the StreamingQuery.
    """
    if "://" in root:
        raise NotImplementedError(
            f"digest-maintenance root must be driver-local (got {root}): "
            f"the LATEST pointer uses local filesystem primitives — see "
            f"the module docstring for the Hadoop-FS seam"
        )

    def fold(batch: DataFrame, epoch_id: int) -> None:
        current = latest_digest_path(root)
        out = str(Path(root) / f"epoch_{epoch_id}")
        if current == out:
            # retried epoch that already committed its fold and pointer
            # (crash landed between the pointer rename and the stream's
            # checkpoint commit): folding again would double-apply the
            # batch AND read epoch_N while overwriting epoch_N
            return
        inserts = batch.filter(F.col(OP_COL) == "I").drop(OP_COL)
        deletes = batch.filter(F.col(OP_COL) == "D").drop(OP_COL)
        apply_changes_to_digests(
            spark,
            current,
            out,
            pk,
            inserts=inserts,
            deletes=deletes,
            options=options,
        )
        # atomic re-point: write_text alone truncates then writes, so a
        # concurrent reader (changed_buckets against the live artifact —
        # the advertised continuous-verification usage) could observe an
        # empty pointer, and a mid-write crash would corrupt the chain
        tmp = Path(root) / "LATEST.tmp"
        tmp.write_text(out)
        tmp.replace(Path(root) / "LATEST")

    writer = changes.writeStream.foreachBatch(fold).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
