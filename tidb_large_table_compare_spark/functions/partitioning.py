"""Input-parallelism guard for map-heavy (especially Arrow/Python) stages.

The small-file problem, localized: a parquet file with one row group plans
as ONE scan partition no matter how many cores exist, so every map-side
stage downstream — including Arrow-batched ``mapInPandas``, the engine's
only Python execution path — runs serially until the first shuffle. The
testdata files are exactly this shape (single row group per table).

``ensure_min_partitions`` spreads such inputs with one explicit
round-robin repartition, and is a NO-OP whenever the input already has at
least ``min_partitions`` partitions — at 100 TB real tables split into
thousands of scan tasks, the guard never fires, and no redistribution of
a large input is ever introduced. This is deliberately an operator-level
knob, not a session default: only stages whose per-row cost dwarfs one
small shuffle (sketching, GEMM argmax) opt in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_partitions(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ``df`` up to ``min_partitions`` (default: the session's
    ``defaultParallelism``) iff it currently has fewer partitions."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
