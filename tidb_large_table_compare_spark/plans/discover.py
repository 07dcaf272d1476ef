"""Discovery stage — operators A2/A3/A5/A6/A11 (SURVEY.md §2.A).

Reference behavior: run ``check_sql`` (``config.toml:16``) against the
catalog, keep tables with ``TABLE_ROWS > 1e9 AND TIDB_PK_TYPE =
'NONCLUSTERED'``, project to ``(schema, table)``
(``step1_query_tables.sh:134-149``), exit early when empty
(``run_syncdiff_config.sh:161-164``), and anti-join away stale configs from
previous runs (``run_syncdiff_config.sh:180-203``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROW_THRESHOLD = 1_000_000_000  # config.toml:16
PK_TYPE = "NONCLUSTERED"


def discover(
    catalog: DataFrame,
    row_threshold: int = ROW_THRESHOLD,
    pk_type: str | None = PK_TYPE,
) -> DataFrame:
    """A2 conjunctive filter + A3 projection over the catalog.

    ``pk_type=None`` drops that conjunct — for catalogs with no real PK
    metadata (parquet), where gating on the TiDB-shaped stand-in would
    silently exclude tables the user explicitly listed.
    """
    pred = F.col("table_rows") > row_threshold
    if pk_type is not None:
        pred = pred & (F.col("pk_type") == pk_type)
    return catalog.filter(pred).select("table_schema", "table_name")


def stale_entries(previous: DataFrame, current: DataFrame) -> DataFrame:
    """A11: work-list entries from a previous run that are no longer
    discovered — the reference deletes their generated configs."""
    return previous.join(
        current, ["table_schema", "table_name"], "left_anti"
    )
