"""Interval (range) join — composed from equi-join primitives.

Spark has no native range join (SURVEY.md §2.C "theta/range/as-of"); a naive
``point BETWEEN start AND end`` theta join degenerates to a broadcast
nested-loop. The scalable composition:

1. pick a bucket width (parameterized in seconds); every interval explodes
   into the buckets it covers — for intervals comparable to the bucket
   width the explode factor is ~2;
2. points map to their single bucket;
3. equi-join on (keys..., bucket) — shuffle ∝ rows, co-partitioned — then
   the exact BETWEEN predicate removes same-bucket non-overlaps.

At 100 TB this turns an O(points × intervals) nested loop into a
co-partitioned hash join whose candidate space is confined to same-bucket
rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_join"]


def _bucket_of(col_name: str, width_s: int) -> Column:
    """Epoch-aligned bucket ordinal (exact integer division)."""
    return F.expr(f"unix_timestamp(CAST({col_name} AS TIMESTAMP)) DIV {width_s}")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    by: list[str],
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Inner-join each point to every interval containing it (inclusive
    bounds), co-grouped by ``by`` keys."""
    p = points.withColumn("__bucket", _bucket_of(point_ts, bucket_seconds))
    i = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                _bucket_of(start_ts, bucket_seconds),
                _bucket_of(end_ts, bucket_seconds),
            )
        ),
    )
    joined = p.join(i, [*by, "__bucket"])
    return joined.filter(
        (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) <= F.col(end_ts))
    ).drop("__bucket")
