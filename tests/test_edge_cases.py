"""Compare-engine edge cases: empty inputs, one-sided data, composite-key
fix SQL, common-column comparison under schema drift."""

from __future__ import annotations

from pyspark.sql import functions as F

from tidb_large_table_compare_spark.operators.compare import (
    CompareOptions,
    compare_tables,
)
from tidb_large_table_compare_spark.operators.fixsql import fix_sql
from tests.conftest import SF_SMALL


def test_empty_vs_empty_is_equivalent(spark):
    empty = spark.createDataFrame([], "pk bigint, v string")
    row = compare_tables(spark, empty, empty, ["pk"], table_name="e").summary().collect()[0]
    assert row.equivalent and row.upcount == 0 and row.downcount == 0


def test_empty_left_vs_full_right(spark):
    empty = spark.createDataFrame([], "pk bigint, v string")
    full = spark.createDataFrame([(1, "a"), (2, "b")], "pk bigint, v string")
    row = compare_tables(spark, empty, full, ["pk"], table_name="e").summary().collect()[0]
    assert row.upcount == 0 and row.downcount == 2 and not row.equivalent
    row2 = compare_tables(spark, full, empty, ["pk"], table_name="e").summary().collect()[0]
    assert row2.upcount == 2 and row2.downcount == 0


def test_single_row_modified(spark):
    a = spark.createDataFrame([(1, "a")], "pk bigint, v string")
    b = spark.createDataFrame([(1, "B")], "pk bigint, v string")
    row = compare_tables(spark, a, b, ["pk"], table_name="s").summary().collect()[0]
    assert (row.upcount, row.downcount) == (1, 1)


def test_common_column_compare_under_drift(spark):
    """Data diff runs over the shared columns; structure diff carries the
    rest — an extra slave column alone must not flag every row modified."""
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    widened = orders.withColumn("o_new", F.lit("x"))
    cmp = compare_tables(spark, orders, widened, ["o_orderkey"], table_name="w")
    row = cmp.summary().collect()[0]
    assert not row.structure_ok  # extra column reported by B1
    assert row.upcount == 0 and row.downcount == 0  # shared columns identical


def test_fix_sql_composite_key_delete(spark):
    a = spark.createDataFrame([(1, 1, "x")], "k1 bigint, k2 int, v string")
    b = spark.createDataFrame(
        [(1, 1, "x"), (2, 5, "extra")], "k1 bigint, k2 int, v string"
    )
    cmp = compare_tables(spark, a, b, ["k1", "k2"], table_name="db.t")
    stmts = [r.fix_sql for r in fix_sql(cmp).collect()]
    assert stmts == ["DELETE FROM db.t WHERE k1 = 2 AND k2 = 5;"]


def test_compare_string_binary_edge_values(spark):
    """Quote-bearing strings and binary payloads survive literal rendering."""
    a = spark.createDataFrame(
        [(1, "it's 'quoted'", bytearray(b"\x00\xff"))],
        "pk bigint, s string, b binary",
    )
    empty = a.filter(F.lit(False))
    cmp = compare_tables(spark, a, empty, ["pk"], table_name="q")
    stmt = fix_sql(cmp).collect()[0].fix_sql
    assert "it''s ''quoted''" in stmt and "X'00FF'" in stmt

def test_null_pk_rows_have_defined_semantics(spark):
    """TiDB PKs are NOT NULL, but the engine's behavior on null keys must be
    defined, not accidental. Identical null-key rows cancel in the algebraic
    digest (no join is involved, so SQL null-equality rules never apply) and
    the tables compare equivalent; a MODIFIED null-key row cannot pair with
    itself in the drill-down's full-outer join, so it surfaces as
    missing_in_right + extra_in_right — upcount 1 / downcount 1, i.e. a
    delete+insert repair, which is exactly what an update means in the
    reference's UPCOUNT/DOWNCOUNT vocabulary."""
    from tidb_large_table_compare_spark.operators.compare import compare_tables

    left = spark.createDataFrame([(1, "a"), (None, "x")], "pk bigint, v string")
    same = spark.createDataFrame([(1, "a"), (None, "x")], "pk bigint, v string")
    cmp_same = compare_tables(spark, left, same, ["pk"])
    s = cmp_same.summary().collect()[0]
    assert (s.equivalent, s.upcount, s.downcount) == (True, 0, 0)
    assert cmp_same.diff_rows().isEmpty()

    changed = spark.createDataFrame([(1, "a"), (None, "y")], "pk bigint, v string")
    cmp_diff = compare_tables(spark, left, changed, ["pk"])
    s = cmp_diff.summary().collect()[0]
    assert (s.equivalent, s.upcount, s.downcount) == (False, 1, 1)
    assert sorted((str(r.pk), r.diff_type) for r in cmp_diff.diff_rows().collect()) == [
        ("None", "extra_in_right"),
        ("None", "missing_in_right"),
    ]


def test_in_list_matches_isin_semantics(spark):
    """hashing.in_list must be result-identical to Column.isin for the
    integer fast path (one SQL string, no per-element py4j literals), for
    the non-integer fallback, and for the empty list (match-nothing)."""
    from tidb_large_table_compare_spark.functions.hashing import in_list

    df = spark.range(0, 100).withColumnRenamed("id", "k")
    ids = [3, 17, 99, 42]
    fast = sorted(r.k for r in df.filter(in_list("k", ids)).collect())
    slow = sorted(r.k for r in df.filter(F.col("k").isin(ids)).collect())
    assert fast == slow == [3, 17, 42, 99]
    assert df.filter(in_list("k", [])).count() == 0

    # numpy ints are NOT Python ints → the isin fallback, same result
    # (collect()ed bucket/doc ids are always Python ints, so the fast path
    # covers every engine call site)
    import numpy as np

    got = sorted(r.k for r in df.filter(in_list("k", [np.int64(5), 7])).collect())
    assert got == [5, 7]

    # identifier-charset strings (uuid-style keys) take the one-string
    # fast path; anything that could interact with quoting falls back
    sdf = df.select(F.concat(F.lit("v"), F.col("k")).alias("s"))
    got = sorted(r.s for r in sdf.filter(in_list("s", ["v1", "v2"])).collect())
    assert got == ["v1", "v2"]
    qdf = spark.createDataFrame(
        [("a'b",), ("plain-key",), ("x\\y",), ("",)], "s string"
    )
    got = sorted(
        r.s for r in qdf.filter(
            in_list("s", ["a'b", "plain-key", "x\\y", ""])
        ).collect()
    )
    assert got == ["", "a'b", "plain-key", "x\\y"]  # isin fallback, exact

    class EvilStr(str):
        def __str__(self):
            return "') OR ('1'='1"

        def __format__(self, spec):
            return "') OR ('1'='1"

    got = sorted(
        r.s for r in qdf.filter(in_list("s", [EvilStr("plain-key")])).collect()
    )
    assert got == ["plain-key"]  # str.__str__ pins the real data

    # an int SUBCLASS passes the isinstance gate but may override __str__
    # (IntEnum on old Pythons renders 'E.A'; a hostile one renders an
    # arbitrary predicate) — the fast path must render int(i), digits only
    class Evil(int):
        def __str__(self):
            return "1) OR (1=1"

    got = sorted(r.k for r in df.filter(in_list("k", [Evil(5), 7])).collect())
    assert got == [5, 7]

    # Decimal ids take the fast path too (decimal PKs are the TiDB
    # unsigned-BIGINT JDBC mapping): fixed-point rendering, charset-
    # checked; scaled values match; NaN/Inf (non-numeric rendering) and
    # hostile __format__ output fall back / fail loud, never inject
    from decimal import Decimal

    ddf = df.select(F.col("k").cast("decimal(20,0)").alias("k"))
    got = sorted(
        int(r.k) for r in ddf.filter(
            in_list("k", [Decimal(3), Decimal("17")])
        ).collect()
    )
    assert got == [3, 17]
    sdf2 = df.select((F.col("k").cast("decimal(10,2)") / 4).alias("k"))
    got = sorted(
        str(r.k) for r in sdf2.filter(
            in_list("k", [Decimal("0.75"), Decimal("2.50")])
        ).collect()
    )
    assert got == ["0.750000", "2.500000"] or got == ["0.75", "2.50"], got
    # huge exponent renders fixed-point (plain str gives 1E+21)
    big = Decimal("1E+21")
    assert ddf.filter(in_list("k", [big])).count() == 0  # no match, no error
    # a hostile Decimal subclass overriding __format__ cannot inject: the
    # charset gate rejects its rendering and the whole list falls back
    class EvilDec(Decimal):
        def __format__(self, spec):
            return "1) OR (1=1"

    got = sorted(
        int(r.k) for r in ddf.filter(
            in_list("k", [EvilDec(5), Decimal(7)])
        ).collect()
    )
    assert got == [5, 7]

    # DATE ids render as literals (tz-free on both sides); DATETIMES of
    # any kind must NOT render — collect() converts timestamps through
    # the driver OS tz while a TIMESTAMP literal parses in the session
    # tz, so a rendered literal silently selects wrong rows on any
    # non-UTC host (round-9 review finding). The isin fallback applies
    # the same OS-local conversion as collect() and stays correct.
    import datetime

    from tidb_large_table_compare_spark.functions.hashing import render_sql_id

    assert render_sql_id(datetime.datetime(2024, 1, 2, 3, 4, 5)) is None
    assert (
        render_sql_id(
            datetime.datetime(2024, 1, 2, tzinfo=datetime.timezone.utc)
        )
        is None
    )
    tdf = df.select(
        F.expr("timestamp'2024-01-02 03:04:05.123456' + make_interval(0,0,0,0,0,0,k)").alias("t"),
        F.col("k"),
    )
    want = [
        datetime.datetime(2024, 1, 2, 3, 4, 10, 123456),
        datetime.datetime(2024, 1, 2, 3, 4, 12, 123456),
    ]
    got = sorted(r.k for r in tdf.filter(in_list("t", want)).collect())
    assert got == [5, 7]  # via the isin fallback
    dadf = df.select(F.expr("date_add(date'2024-01-01', cast(k as int))").alias("d"), F.col("k"))
    dwant = [datetime.date(2024, 1, 6), datetime.date(2024, 1, 8)]
    got = sorted(r.k for r in dadf.filter(in_list("d", dwant)).collect())
    assert got == [5, 7]

    # binary ids render as X'..' hex literals; collect() yields bytearray,
    # which must round-trip through the same path
    bdf = df.select(F.expr("cast(concat('k', k) as binary)").alias("b"), F.col("k"))
    bwant = [r.b for r in bdf.filter("k in (5, 7)").select("b").collect()]
    assert all(isinstance(b, (bytes, bytearray)) for b in bwant)
    got = sorted(r.k for r in bdf.filter(in_list("b", bwant)).collect())
    assert got == [5, 7]


def test_bucket_id_widens_all_integral_pk_widths(spark):
    """bucket_id must assign the same bucket for the same VALUE at every
    integral width (tinyint/smallint/int/bigint) — xxhash64 hashes the
    binary width, so unwidened buckets diverge across benign widenings."""
    from tidb_large_table_compare_spark.functions.hashing import bucket_id

    rows = [(i,) for i in range(-20, 108)]
    frames = {
        t: spark.createDataFrame(rows, f"pk {t}")
        for t in ("tinyint", "smallint", "int", "bigint")
    }
    buckets = {
        t: {r.pk: r.b for r in
            df.select("pk", bucket_id(["pk"], 64, df).alias("b")).collect()}
        for t, df in frames.items()
    }
    for t in ("tinyint", "smallint", "int"):
        assert buckets[t] == buckets["bigint"], t


def test_bucket_id_widens_decimal_pk_precisions(spark):
    """Decimal twin of the integral pin, plus the CROSS-FAMILY chain:
    xxhash64's physical form flips from unscaled-long to unscaled-bytes
    at precision 19, so an unwidened DECIMAL(18,0)/DECIMAL(20,0) pair
    (the TiDB unsigned-BIGINT mapping) bucketed equal values
    differently — and bigint vs DECIMAL(p,0) likewise. Every scale-0
    numeric must land in the same bucket for the same value."""
    from decimal import Decimal

    from tidb_large_table_compare_spark.functions.hashing import bucket_id

    dec_rows = [(Decimal(i),) for i in range(0, 128)]
    frames = {
        p: spark.createDataFrame(dec_rows, f"pk decimal({p},0)")
        for p in (10, 18, 20, 38)
    }
    frames["bigint"] = spark.createDataFrame(
        [(i,) for i in range(0, 128)], "pk bigint"
    )
    buckets = {
        p: {int(r.pk): r.b for r in
            df.select("pk", bucket_id(["pk"], 64, df).alias("b")).collect()}
        for p, df in frames.items()
    }
    for p in (10, 18, 20, "bigint"):
        assert buckets[p] == buckets[38], p
