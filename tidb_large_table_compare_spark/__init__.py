"""tidb_large_table_compare_spark — a PySpark-native large-table comparison
and data-pipeline engine.

Re-implements, Spark-first, the capabilities of the reference toolkit
``Buddy-Yuan/tidb-large-table-compare`` (a bash orchestrator around PingCAP's
sync-diff-inspector; see SURVEY.md): catalog discovery, per-table comparison
planning, chunked digest-based table comparison with row-level drill-down,
fix-SQL export, and cross-table report aggregation — plus the LLM-data-pipeline
extensions (dedup, similarity search, text analysis, multimodal columns,
streaming) mandated by BASELINE.json.

Design tenets (SURVEY.md §7):
- DataFrame/SQL only on the hot path; no RDDs; no row-at-a-time Python UDFs.
- Two-phase compare: bucket digests first (shuffle ∝ n_buckets), row-level
  drill-down only on mismatched buckets (shuffle ∝ diff size, not table size).
- Everything declarative so Catalyst gets pushdown/pruning/AQE for free.
"""

from tidb_large_table_compare_spark.operators.compare import (  # noqa: F401
    CompareOptions,
    TableCompare,
    compare_tables,
)
from tidb_large_table_compare_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"
