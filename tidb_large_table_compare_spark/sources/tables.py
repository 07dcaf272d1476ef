"""Parquet table loading for the TESTDATA.md star schema.

The reference reads live TiDB tables at a pinned snapshot
(``my_database_users.toml:20`` ``snapshot = "auto"``); our snapshot analog is
an immutable parquet directory per scale factor (SURVEY.md §2.B B2).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = "/root/testdata/sf0.1"


def sf_dir_from_env() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # defensive: the driver may hand us a session without UTC pinned; every
    # timestamp comparison/truncation below assumes UTC ↔ DuckDB-naive parity
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark's reader rejects
        # ([PARQUET_TYPE_ILLEGAL]); read it as raw nanos and convert to
        # microsecond-precision TIMESTAMP_NTZ with exact integer division
        # (a double division would lose precision above 2^53 nanoseconds).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts DIV 1000")).cast("timestamp_ntz")
        )
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view (mirrors the DuckDB oracle's
    pre-registered views so ``spark.sql`` text matches oracle text)."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
