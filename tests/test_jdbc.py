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


def test_jdbc_type_torture_hash_parity(spark, derby_url):
    """The compare path's actual exposure to a database source: every
    exotic-typed column must come back from a live JDBC scan with values
    whose canonical row hashes equal a natively-constructed twin's —
    DECIMAL at Derby's max precision (31), sub-second TIMESTAMP, padded
    CHAR, trailing-space VARCHAR, BLOB-mapped binary, REAL/DOUBLE,
    SMALLINT, BOOLEAN, DATE, and a NULL in every nullable column. A type
    whose JDBC mapping loses precision, trims padding, or shifts a
    timestamp flips `equivalent` to False here. TiDB-specific residue the
    embedded engine cannot model (unsigned BIGINT, zero-dates) stays
    documented in README's environment-gate table."""
    import datetime as dt
    from decimal import Decimal

    from pyspark.sql import types as T

    from tidb_large_table_compare_spark.operators.compare import compare_tables

    # The table is created and populated SERVER-SIDE (raw JDBC DDL +
    # literal inserts), exactly like a production database the engine only
    # reads — this also sidesteps a Spark-writer quirk where setNull on a
    # pinned CHAR column sends the Derby dialect's CLOB type code.
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(derby_url)
    st = conn.createStatement()
    try:
        try:
            st.executeUpdate("DROP TABLE T_TYPES")
        except Exception:
            pass
        st.executeUpdate(
            "CREATE TABLE T_TYPES (pk BIGINT NOT NULL PRIMARY KEY, "
            "d31 DECIMAL(31,8), d5 DECIMAL(5,2), ts TIMESTAMP, "
            "ch CHAR(10), vc VARCHAR(50), vb VARCHAR(20) FOR BIT DATA, "
            "r REAL, db DOUBLE, si SMALLINT, b BOOLEAN, dt DATE)"
        )
        st.executeUpdate(
            "INSERT INTO T_TYPES VALUES ("
            "1, 12345678901234567890123.45678901, -999.99, "  # 31 digits
            "TIMESTAMP('2024-01-02 03:04:05.123456'), "
            "'abc', 'trailing  ', X'0001FE62696E617279', "
            "1.5, 2.2250738585072014E-308, -32768, TRUE, "
            "DATE('1999-12-31'))"
        )
        st.executeUpdate(
            "INSERT INTO T_TYPES VALUES ("
            "2, -0.00000001, 0.01, TIMESTAMP('1970-01-01 00:00:00.001'), "
            "'無駄無駄', '', X'', "
            # max finite double: Derby, like MySQL/TiDB, rejects Infinity
            "-0.0, 1.7976931348623157E308, 0, FALSE, DATE('2038-01-19'))"
        )
        st.executeUpdate(
            "INSERT INTO T_TYPES VALUES (3, NULL, NULL, NULL, NULL, NULL, "
            "NULL, NULL, NULL, NULL, NULL, NULL)"
        )
    finally:
        st.close()
        conn.close()

    out = read_jdbc_table(
        spark, ep=None, database="", table="T_TYPES",
        url=derby_url, driver=DERBY_DRIVER,
    )
    rows = [
        (
            1,
            Decimal("12345678901234567890123.45678901"),
            Decimal("-999.99"),
            dt.datetime(2024, 1, 2, 3, 4, 5, 123456),
            "abc       ",  # CHAR(10): the server pads, the read keeps it
            "trailing  ",
            b"\x00\x01\xfebinary",
            1.5,
            2.2250738585072014e-308,  # smallest normal double
            -32768,
            True,
            dt.date(1999, 12, 31),
        ),
        (
            2,
            Decimal("-0.00000001"),
            Decimal("0.01"),
            dt.datetime(1970, 1, 1, 0, 0, 0, 1000),
            "無駄無駄      ",  # multibyte CHAR padding (4 chars + 6 pad)
            "",
            b"",
            -0.0,
            1.7976931348623157e308,
            0,
            False,
            dt.date(2038, 1, 19),
        ),
        (3, None, None, None, None, None, None, None, None, None, None, None),
    ]
    src = spark.createDataFrame(
        rows,
        T.StructType(
            [
                T.StructField("pk", T.LongType(), False),
                T.StructField("d31", T.DecimalType(31, 8), True),
                T.StructField("d5", T.DecimalType(5, 2), True),
                T.StructField("ts", T.TimestampType(), True),
                T.StructField("ch", T.StringType(), True),
                T.StructField("vc", T.StringType(), True),
                T.StructField("vb", T.BinaryType(), True),
                T.StructField("r", T.FloatType(), True),
                T.StructField("db", T.DoubleType(), True),
                T.StructField("si", T.ShortType(), True),
                T.StructField("b", T.BooleanType(), True),
                T.StructField("dt", T.DateType(), True),
            ]
        ),
    )
    # the declared server-side types survive the read
    dtypes = {k.lower(): v for k, v in out.dtypes}
    assert dtypes["d31"] == "decimal(31,8)"
    assert dtypes["d5"] == "decimal(5,2)"
    assert dtypes["ts"].startswith("timestamp")
    assert dtypes["vb"] == "binary"
    # canonical-hash parity: the JDBC scan and the native twin must be
    # EQUIVALENT under the digest compare (same row_hash per PK). The twin
    # is cast to the read-back schema first — JDBC legitimately WIDENS
    # storage classes (Derby SMALLINT comes back as int); what must never
    # change are the values, which the hash compare checks exactly
    out_types = {k.lower(): v for k, v in out.dtypes}
    twin = src.select(
        *[F.col(c).cast(out_types[c.lower()]).alias(c.upper()) for c in src.columns]
    )
    row = compare_tables(
        spark, out, twin, ["PK"], table_name="derby.types"
    ).summary().collect()[0]
    assert row.structure_ok, "JDBC read changed the schema shape"
    assert row.equivalent, (
        "JDBC type mapping broke canonical-hash parity: "
        + str(sorted(map(str, out.collect())))
    )


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
