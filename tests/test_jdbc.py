"""Live-JDBC integration tests (operator A1's database scan path,
reference ``step1_query_tables.sh:115-117``).

The environment ships no MySQL driver, but Spark bundles Derby (its Hive
metastore database) — a pure-Java embedded JDBC engine. These tests run a
REAL ``spark.read`` → JDBC → DataFrame roundtrip through
:func:`read_jdbc_table`: write a table over JDBC, read it back partitioned
over the PK, and run the compare engine on two live JDBC scans.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tidb_large_table_compare_spark.sources.jdbc import jdbc_url, read_jdbc_table

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    db_dir = tmp_path_factory.mktemp("derby") / "db"
    # keep derby.log out of the repo cwd
    spark._jvm.java.lang.System.setProperty(
        "derby.stream.error.file", str(db_dir) + ".log"
    )
    return f"jdbc:derby:{db_dir};create=true"


def _write_jdbc(df, url: str, table: str) -> None:
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", DERBY_DRIVER)
        .mode("overwrite")
        .save()
    )


def test_jdbc_roundtrip_partitioned(spark, derby_url):
    src = spark.range(1, 101).select(
        F.col("id").alias("pk"),
        (F.col("id") * 2).alias("val"),
        F.concat(F.lit("name_"), F.col("id")).alias("name"),
    )
    _write_jdbc(src, derby_url, "T_ROUNDTRIP")

    out = read_jdbc_table(
        spark,
        ep=None,
        database="",
        table="T_ROUNDTRIP",
        pk_col="pk",
        num_partitions=4,
        lower_bound=1,
        upper_bound=101,
        url=derby_url,
        driver=DERBY_DRIVER,
    )
    # partitioned scan: disjoint PK ranges across 4 tasks
    assert out.rdd.getNumPartitions() == 4
    got = sorted((r.pk, r.val, r.name) for r in out.collect())
    want = sorted((r.pk, r.val, r.name) for r in src.collect())
    assert got == want


def test_jdbc_unpartitioned_read(spark, derby_url):
    src = spark.range(5).select(F.col("id").alias("pk"))
    _write_jdbc(src, derby_url, "T_PLAIN")
    out = read_jdbc_table(
        spark, ep=None, database="", table="T_PLAIN",
        url=derby_url, driver=DERBY_DRIVER,
    )
    assert sorted(r.pk for r in out.collect()) == [0, 1, 2, 3, 4]


def test_compare_engine_over_live_jdbc(spark, derby_url):
    """The reference's actual workload: compare two live databases. Left and
    right are independent JDBC scans; the digest compare runs unchanged."""
    from tidb_large_table_compare_spark.operators.compare import compare_tables

    left = spark.range(1, 51).select(
        F.col("id").alias("pk"), (F.col("id") % 7).alias("v")
    )
    right = left.withColumn(
        "v", F.when(F.col("pk") % 10 == 0, F.col("v") + 100).otherwise(F.col("v"))
    ).filter(F.col("pk") != 17)
    _write_jdbc(left, derby_url, "CMP_L")
    _write_jdbc(right, derby_url, "CMP_R")

    l_db = read_jdbc_table(spark, None, "", "CMP_L", url=derby_url, driver=DERBY_DRIVER)
    r_db = read_jdbc_table(spark, None, "", "CMP_R", url=derby_url, driver=DERBY_DRIVER)
    row = compare_tables(spark, l_db, r_db, ["PK"], table_name="db.cmp").summary().collect()[0]
    # 5 modified (pk 10..50 step 10) + 1 missing (pk=17)
    assert (row.upcount, row.downcount) == (6, 5)
    assert not row.equivalent


def test_jdbc_requires_endpoint_or_url(spark):
    with pytest.raises(ValueError):
        read_jdbc_table(spark, None, "db", "t")


def test_jdbc_url_shape():
    from tidb_large_table_compare_spark.config import EndpointConfig

    ep = EndpointConfig(host="10.0.0.1", port=4000, user="root", password="x")
    assert jdbc_url(ep, "mydb") == "jdbc:mysql://10.0.0.1:4000/mydb"


# ---------------------------------------------------------------------------
# MySQL-wire integration (the reference's actual transport) — env-gated.
# ---------------------------------------------------------------------------

MYSQL_WIRE_SKIP_REASON = (
    "set TIDB_TEST_URL (e.g. jdbc:mysql://host:4000/test) to run the "
    "MySQL-wire JDBC path against a live TiDB/MySQL; optional "
    "TIDB_TEST_USER / TIDB_TEST_PASSWORD default to root / empty. A MySQL "
    "Connector/J jar must be on Spark's driver classpath."
)


@pytest.mark.skipif(
    not __import__("os").environ.get("TIDB_TEST_URL"),
    reason=MYSQL_WIRE_SKIP_REASON,
)
def test_mysql_wire_against_live_tidb(spark):
    """The reference's actual transport (step1_query_tables.sh:115-117): a
    MySQL-protocol read against live TiDB. Exercises exactly the dialect
    assumptions the Derby tests cannot — information_schema catalog columns,
    MySQL type mapping (DECIMAL/DATETIME/SIGNED), and a PK-range partitioned
    read through the MySQL dialect's generated SQL."""
    import os

    from tidb_large_table_compare_spark.sources.jdbc import MYSQL_DRIVER

    url = os.environ["TIDB_TEST_URL"]
    user = os.environ.get("TIDB_TEST_USER", "root")
    password = os.environ.get("TIDB_TEST_PASSWORD", "")
    try:
        spark._jvm.java.lang.Class.forName(MYSQL_DRIVER)
    except Exception:
        pytest.skip(f"{MYSQL_DRIVER} not on the driver classpath")

    def read(dbtable, **opts):
        reader = (
            spark.read.format("jdbc")
            .option("url", url)
            .option("dbtable", dbtable)
            .option("driver", MYSQL_DRIVER)
            .option("user", user)
            .option("password", password)
        )
        for k, v in opts.items():
            reader = reader.option(k, v)
        return reader.load()

    # 1. catalog discovery columns the reference reads (TABLE_ROWS; TiDB
    # additionally exposes TIDB_PK_TYPE — tolerate plain MySQL lacking it)
    catalog = read(
        "(SELECT table_name, table_rows FROM information_schema.tables "
        "WHERE table_schema = DATABASE()) t"
    )
    assert {"table_name", "table_rows"} <= {c.lower() for c in catalog.columns}
    catalog.collect()  # the scan itself must execute over the wire

    # 2. dialect type mapping: DECIMAL keeps precision/scale, DATETIME maps
    # to timestamp, SIGNED to a long — the assumptions sources/jdbc.py
    # declares but the embedded-Derby tests cannot check
    typed = read(
        "(SELECT CAST(1.50 AS DECIMAL(10,2)) AS d, "
        "CAST('2024-01-02 03:04:05' AS DATETIME) AS ts, "
        "CAST(42 AS SIGNED) AS i) t"
    )
    dtypes = dict(typed.dtypes)
    assert dtypes["d"] == "decimal(10,2)"
    assert dtypes["ts"].startswith("timestamp")
    assert dtypes["i"] == "bigint"
    row = typed.collect()[0]
    assert float(row.d) == 1.5 and int(row.i) == 42

    # 3. PK-range partitioned read through the MySQL dialect's WHERE-clause
    # generation (the reference's chunk-parallel scan shape)
    ranged = read(
        "(SELECT 1 AS pk UNION ALL SELECT 2 UNION ALL SELECT 3 "
        "UNION ALL SELECT 4) t",
        partitionColumn="pk",
        numPartitions="2",
        lowerBound="1",
        upperBound="5",
    )
    assert ranged.rdd.getNumPartitions() == 2
    assert sorted(r.pk for r in ranged.collect()) == [1, 2, 3, 4]
