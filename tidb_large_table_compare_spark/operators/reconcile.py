"""Apply a computed row diff to repair the drifted side — the closed loop.

The reference stops at exporting ``fix.sql`` for a human to run against the
slave (sync-diff-inspector's ``export-fix-sql``, reference
``syncdiff_config2/my_database_users.toml:12``); here the repair itself is a
native DataFrame transform, so compare → repair → re-verify runs as one
pipeline (`operators/fixsql.py` still renders the SQL for the human path).

Scale: the diff of mostly-agreeing tables is tiny, so both the delete
(left-anti) and the re-insert (left-semi) joins broadcast the diff keys —
bytes moved ∝ diff size, never table size, matching the drill-down's cost
model (`operators/compare.py`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["apply_fixes"]


def apply_fixes(
    left: DataFrame, right: DataFrame, pk: list[str], diff: DataFrame
) -> DataFrame:
    """Return ``right`` repaired to match ``left`` under ``diff``.

    ``diff`` is :meth:`TableCompare.diff_rows` output — ``(pk..., diff_type)``
    with REPLACE semantics: ``modified`` rows are deleted from the right and
    re-inserted from the left; ``extra_in_right`` deleted; ``missing_in_right``
    inserted.
    """
    to_delete = diff.filter(F.col("diff_type") != "missing_in_right").select(*pk)
    to_insert = diff.filter(F.col("diff_type") != "extra_in_right").select(*pk)
    kept = right.join(F.broadcast(to_delete), pk, "left_anti")
    replacement = left.join(F.broadcast(to_insert), pk, "left_semi")
    return kept.select(left.columns).unionByName(replacement.select(left.columns))
