"""Skew mitigation — salting helpers for hot keys (SURVEY.md §4, §7).

At 100 TB a single hot PK range (monotonic inserts, default-valued keys)
concentrates one bucket/partition. Two standard remedies, both shipped:

- AQE skew-join splitting is enabled globally in :mod:`..session`
  (``spark.sql.adaptive.skewJoin.enabled``) — handles skewed *joins* at
  runtime with no code changes;
- explicit salting for skewed *aggregations*: spread each hot key over
  ``n_salts`` sub-keys, partially aggregate, then merge. Two short shuffles
  of pre-aggregated rows instead of one shuffle with a straggler partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["with_salt", "salted_count_by_key"]


def with_salt(df: DataFrame, n_salts: int = 16, col_name: str = "__salt") -> DataFrame:
    """Attach a deterministic per-row salt in [0, n_salts).

    The salt hashes the row content TOGETHER WITH the partition id and the
    row's position in its partition: content alone would assign *identical*
    rows (the classic hot-key shape — many duplicate keys) the same salt and
    spread nothing. Position+partition come from
    ``monotonically_increasing_id``, which is stable under task retry for a
    deterministic source (a re-run task re-reads the same split in the same
    order), so recomputed shuffle map outputs stay consistent.

    PRECONDITION (API contract, not just an aside): ``df`` must be a
    deterministic scan — a file source, not the output of a shuffle. On a
    post-shuffle frame a task retry can observe rows in a different order,
    the ids (and therefore salts) change, and partial aggregates from the
    two attempts mix — salted counts come out wrong exactly when a cluster
    is under enough pressure to retry. Salt AT THE SOURCE (before joins or
    aggregations); there is no Spark-side way to enforce this here.
    """
    return df.withColumn(
        col_name,
        F.pmod(
            F.xxhash64(*[F.col(c) for c in df.columns],
                       F.monotonically_increasing_id()),
            F.lit(n_salts),
        ),
    )


def salted_count_by_key(
    df: DataFrame, key_cols: list[str], n_salts: int = 16
) -> DataFrame:
    """Skew-resistant ``groupBy(key).count()``.

    Phase 1 groups on (key, salt) — a hot key spreads over ``n_salts``
    reducers; phase 2 merges the tiny partials. Identical results to a plain
    count, bounded partition sizes under arbitrary key skew.
    """
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*key_cols, "__salt").agg(
        F.count(F.lit(1)).alias("__partial")
    )
    return partial.groupBy(*key_cols).agg(
        F.sum("__partial").cast("bigint").alias("n")
    )
