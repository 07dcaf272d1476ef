"""As-of (temporal) join — composed from built-in DataFrame ops.

Spark has no native as-of join (SURVEY.md §2.C "theta/range/as-of"); the
idiomatic composition is the union-and-carry-forward pattern:

1. tag right rows 0 and left rows 1 and union them over the shared key/time
   columns (right first at equal timestamps → backward-inclusive semantics,
   matching DuckDB's ``ASOF JOIN ... ON l.ts >= r.ts``);
2. one window per key ordered by (time, tag) carries the latest right-side
   payload forward with ``last(..., ignorenulls=True)``;
3. keep only left rows.

Cost: a single shuffle on the key (same as any join) plus a per-key sort —
no range explosion, no per-row Python. At 100 TB this is the
merge-friendly formulation: Spark sorts within partitions and the window is
a streaming pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql import window as W

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    right_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the latest right row with ``right.on <=
    left.on`` within the same ``by`` group (backward, inclusive).

    ``right_cols`` are the right-side payload columns to carry; they appear
    suffixed on the output. Left rows with no earlier right row get NULLs.
    """
    # Carry ONE struct of all right payload columns rather than each column
    # separately: the struct is non-null whenever a right row exists, so
    # last(ignorenulls=True) always lands on the *matched* row — a genuinely
    # NULL payload field of that row stays NULL (DuckDB ASOF JOIN semantics)
    # instead of being silently backfilled from an older right row.
    payload_type = T.StructType([T.StructField(c, right.schema[c].dataType)
                                 for c in right_cols])
    l_tag = left.select(
        *by,
        F.col(on).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(payload_type).alias("__rpay"),
        *[F.col(c) for c in left.columns if c not in by and c != on],
    )
    r_tag = right.select(
        *by,
        F.col(on).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.struct(*[F.col(c).alias(c) for c in right_cols]).alias("__rpay"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in by and c != on
        ],
    )
    unioned = l_tag.unionByName(r_tag)
    w = (
        W.Window.partitionBy(*by)
        .orderBy(F.col("__t"), F.col("__is_left"))
        .rowsBetween(W.Window.unboundedPreceding, W.Window.currentRow)
    )
    carried = unioned.select(
        "*", F.last("__rpay", ignorenulls=True).over(w).alias("__carry")
    )
    out_cols = (
        [F.col(c) for c in by]
        + [F.col("__t").alias(on)]
        + [F.col(c) for c in left.columns if c not in by and c != on]
        + [F.col("__carry").getField(c).alias(f"{c}{suffix}") for c in right_cols]
    )
    return carried.filter(F.col("__is_left") == 1).select(*out_cols)
