"""Continuous verification: stream a change feed into the digest snapshot.

The batch path (`operators/incremental.py::apply_changes_to_digests`) folds
one CDC batch into a stored digest artifact; this wires it to Structured
Streaming's ``foreachBatch`` so the artifact tracks a live change feed —
the reference's nightly full rescan (``run_all.sh``) becomes a standing
query whose per-batch cost is O(changes), independent of table size.

Epoch handling makes this exactly-once-by-construction: each batch writes a
NEW artifact directory keyed by epoch (parquet cannot be rewritten while
readable) and a tiny ``LATEST`` pointer file is updated last. A retried
epoch rewrites its own directory and re-points — same end state.

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
    file). Returns the StreamingQuery.
    """

    def fold(batch: DataFrame, epoch_id: int) -> None:
        current = latest_digest_path(root)
        out = str(Path(root) / f"epoch_{epoch_id}")
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
        (Path(root) / "LATEST").write_text(out)

    writer = changes.writeStream.foreachBatch(fold).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
