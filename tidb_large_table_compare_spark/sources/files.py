"""CSV / JSON-lines sources with explicit schemas and corrupt-row quarantine.

The reference ingests exactly one source (live MySQL-protocol tables,
``step1_query_tables.sh:115-117``); a training-data pipeline additionally
ingests flat-file drops. Two rules keep these scans 100 TB-safe:

- **Explicit schema, never inference.** ``inferSchema``/sampled JSON schema
  inference is a full extra pass over the data before the real scan even
  starts; at scale that doubles ingest cost. Callers pass the DDL string.
- **Quarantine, don't crash (or silently drop).** ``PERMISSIVE`` mode routes
  unparseable lines into ``_corrupt_record`` so one bad row in a terabyte
  drop neither kills the job (``FAILFAST``) nor vanishes (``DROPMALFORMED``);
  :func:`quarantine` splits the stream so the bad rows land in a reviewable
  sink. Both paths stay single-scan, filter-pushdown-friendly column reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["read_csv", "read_json", "read_orc", "read_avro", "quarantine", "CORRUPT_COL"]

CORRUPT_COL = "_corrupt_record"


def _with_corrupt_col(schema: str) -> str:
    """The corrupt-record column must be part of the declared schema for
    PERMISSIVE capture to retain the raw line."""
    return f"{schema}, {CORRUPT_COL} string"


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str,
    *,
    header: bool = True,
    delimiter: str = ",",
    timestamp_format: str | None = None,
) -> DataFrame:
    """CSV scan with explicit schema and corrupt-line capture."""
    reader = (
        spark.read.format("csv")
        .schema(_with_corrupt_col(schema))
        .option("header", header)
        .option("delimiter", delimiter)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    if timestamp_format:
        reader = reader.option("timestampFormat", timestamp_format)
    return reader.load(path)


def read_json(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """JSON-lines scan with explicit schema and corrupt-line capture."""
    return (
        spark.read.format("json")
        .schema(_with_corrupt_col(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .load(path)
    )


def quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a PERMISSIVE scan into (clean_rows, corrupt_rows).

    Clean rows drop the capture column; corrupt rows keep the full row (the
    raw line in ``_corrupt_record`` plus whatever fields did parse) for the
    review sink — Spark refuses scans whose referenced columns are *only*
    the internal corrupt-record column ([UNSUPPORTED_FEATURE.
    QUERY_ONLY_CORRUPT_RECORD_COLUMN]), and the context fields are useful
    there anyway. Both halves are filters over the same single scan — no
    extra pass.
    """
    corrupt = df.filter(F.col(CORRUPT_COL).isNotNull())
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    return clean, corrupt


def read_orc(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    """ORC source — the columnar alternative to parquet, Spark-native (no
    extra jars). Like parquet, ORC is self-describing (footer metadata), so
    no inference pass is needed and ``schema`` is optional — pass it only to
    pin a contract. Predicate pushdown and column pruning reach the ORC
    reader exactly as for parquet (asserted in
    tests/test_file_sources.py::test_orc_scan_pushes_down_filters), so the
    whole compare engine runs unchanged over ORC-backed tables."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def read_avro(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    """Avro source — requires the external ``spark-avro`` module on the
    classpath (bundled in most distributions, absent in this sandbox).
    Raises a clear error naming the missing module instead of Spark's
    generic lookup failure; works unchanged where the jar is present."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    try:
        return reader.format("avro").load(path)
    except Exception as exc:
        # match the SPECIFIC missing-data-source failure, not any message
        # containing 'avro' — a path error under /data/avro/... would
        # otherwise be misdiagnosed as the missing module
        msg = str(exc)
        if "DATA_SOURCE_NOT_FOUND" in msg or "Failed to find data source" in msg:
            raise RuntimeError(
                "Avro support needs the spark-avro module on the classpath "
                "(e.g. --packages org.apache.spark:spark-avro_2.13:<version>); "
                "it is not bundled in this environment"
            ) from exc
        raise
