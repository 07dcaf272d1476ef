"""Cross-table referential-integrity audit.

The reference compares each table against its replica in isolation
(``run_all.sh`` loops ``step3_run_syncdiff.sh`` per table) — but drift is
rarely confined to one table: a replica that lost parent rows now has
orphaned children, which no per-table diff reports. This operator closes
that gap: given FK relationships, it counts orphaned child rows per
relationship, with SQL FK semantics (a NULL foreign key violates nothing —
it is tallied separately, not as an orphan).

Scale design: one pass per relationship — the child is LEFT-joined against
the parent's distinct key projection (column-pruned to the key at the scan)
and a single aggregate produces all three counts, so there is no second
child scan for the orphan count and no driver-side set. Small parents
broadcast (AQE decides from runtime sizes); big ones shuffle keys only,
never payload columns. The per-relationship one-row results union into one
report frame — N relationships are N independent jobs fused into a single
action.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["fk_orphans", "integrity_audit"]


def fk_orphans(
    child: DataFrame,
    fk_cols: list[str],
    parent: DataFrame,
    pk_cols: list[str],
    relationship: str,
) -> DataFrame:
    """One-row audit of ``child.fk_cols → parent.pk_cols``.

    Returns ``(relationship string, child_rows, null_fk_rows, orphan_rows
    bigint)``: total child rows, rows whose FK has any NULL component
    (not violations, per SQL FK semantics), and non-NULL-FK rows with no
    matching parent key.
    """
    if len(fk_cols) != len(pk_cols):
        raise ValueError("fk_cols and pk_cols must have equal arity")
    any_null = reduce(
        lambda a, b: a | b, [F.col(c).isNull() for c in fk_cols]
    )
    keys = child.select(
        *[F.col(fk).alias(pk) for fk, pk in zip(fk_cols, pk_cols)],
        any_null.alias("__fk_null"),
    )
    parent_keys = (
        parent.select(*pk_cols).distinct().withColumn("__hit", F.lit(1))
    )
    joined = keys.join(parent_keys, pk_cols, "left")
    return joined.agg(
        F.lit(relationship).alias("relationship"),
        F.count(F.lit(1)).cast("bigint").alias("child_rows"),
        F.coalesce(F.sum(F.when(F.col("__fk_null"), 1)), F.lit(0))
        .cast("bigint")
        .alias("null_fk_rows"),
        F.coalesce(
            F.sum(
                F.when(~F.col("__fk_null") & F.col("__hit").isNull(), 1)
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("orphan_rows"),
    )


def integrity_audit(
    checks: list[tuple[DataFrame, list[str], DataFrame, list[str], str]],
) -> DataFrame:
    """Union of :func:`fk_orphans` over ``(child, fk, parent, pk, name)``
    relationship specs — the whole-schema consistency report."""
    if not checks:
        raise ValueError("integrity_audit needs at least one relationship")
    frames = [fk_orphans(*spec) for spec in checks]
    return reduce(lambda a, b: a.unionByName(b), frames)
