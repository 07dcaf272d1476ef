"""JDBC source — the live-database scan path (operator A1's MySQL-protocol
analog, ``step1_query_tables.sh:115-117``).

The engine's primary sources are immutable parquet snapshots (B2), but the
reference reads live TiDB over the MySQL protocol; this module is that path
for deployments with a JDBC driver jar on the classpath. Partitioned reads
map the reference's ``check-thread-count`` to ``numPartitions`` bounded
ranges over the PK — Spark's equivalent of its chunked parallel scan.

The MySQL driver is not shipped here, but the path itself is NOT gated: any
JDBC driver on Spark's classpath works via the ``url``/``driver`` overrides
(the integration tests exercise a real ``spark.read.jdbc`` roundtrip through
the embedded Derby driver Spark ships for its Hive metastore).

CAVEAT — environment-bounded testing: the reference's actual wire target is
the MySQL protocol against a live TiDB (including ``TIDB_PK_TYPE`` in
``information_schema.tables``), which cannot be reached from this sandbox.
What IS tested end-to-end is the generic JDBC contract (URL construction,
driver override, predicate/column pushdown into the remote query, PK-range
``numPartitions`` parallel reads) via embedded Derby; MySQL-dialect
specifics — type mapping of TiDB decimals/datetimes, ``useSSL``/auth
options, the TIDB_PK_TYPE column itself — are declared but unverified
against a live server. A deployment should smoke them with
``cli.py --check-connection`` before relying on catalog discovery, and can
run the env-gated integration test
(``tests/test_jdbc.py::test_mysql_wire_against_live_tidb``, enabled by
``TIDB_TEST_URL``) to check the dialect assumptions — information_schema
catalog columns, DECIMAL/DATETIME/SIGNED type mapping, PK-range
partitioned reads — against the real wire.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from tidb_large_table_compare_spark.config import EndpointConfig

MYSQL_DRIVER = "com.mysql.cj.jdbc.Driver"


def jdbc_url(ep: EndpointConfig, database: str) -> str:
    """MySQL-protocol JDBC URL for a TiDB endpoint."""
    return f"jdbc:mysql://{ep.host}:{ep.port}/{database}"


def read_jdbc_table(
    spark: SparkSession,
    ep: EndpointConfig | None,
    database: str,
    table: str,
    pk_col: str | None = None,
    num_partitions: int = 8,  # reference check-thread-count (config.toml:20)
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    *,
    url: str | None = None,
    driver: str = MYSQL_DRIVER,
) -> DataFrame:
    """Build a (lazy) JDBC scan; partitioned over ``pk_col`` when bounds are
    known so executors read disjoint PK ranges in parallel — the reference's
    chunk-parallel scan, expressed as Spark partitioning.

    ``ep`` supplies the TiDB endpoint (url derived, credentials attached);
    pass ``url``/``driver`` instead for any other JDBC database.
    """
    if ep is None and url is None:
        raise ValueError("either an EndpointConfig or an explicit url is required")
    reader = (
        spark.read.format("jdbc")
        .option("url", url or jdbc_url(ep, database))
        .option("dbtable", f"{database}.{table}" if database else table)
        .option("driver", driver)
    )
    if ep is not None:
        reader = reader.option("user", ep.user).option("password", ep.password)
    if pk_col and lower_bound is not None and upper_bound is not None:
        reader = (
            reader.option("partitionColumn", pk_col)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    return reader.load()
