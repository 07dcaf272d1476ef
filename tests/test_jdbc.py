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
