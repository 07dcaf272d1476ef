"""Golden comparison fixtures from FIXTURES.md §1-§5.

Deterministic (pk-derived, no RNG) so expected diff counts are exact:
cmp_slave drops 50 rows, adds 30, modifies 20 → upcount 70, downcount 50.
"""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_ROWS = 10_000
K_MISSING = 50  # pk % 200 == 7
K_EXTRA = 30  # fresh pks N+1..N+30
K_MODIFIED = 20  # pk % 500 == 11

CMP_SCHEMA = (
    "pk bigint, int_col int, big_col bigint, dbl_col double, dec_col decimal(12,2), "
    "str_col string, bool_col boolean, date_col date, ts_col timestamp"
)

_EPOCH_DATE = dt.date(1995, 1, 1)
_EPOCH_TS = dt.datetime(1995, 1, 1, 0, 0, 0)


def _row(pk: int) -> tuple:
    int_col = None if pk % 100 == 13 else (pk * 37) % 1000
    big_col = pk * 123_456_789
    dbl_col = -0.0 if pk % 777 == 0 else pk * 0.125 - 625.0
    dec_col = Decimal(pk) / Decimal(100)
    if pk % 100 == 37:
        str_col = None
    elif pk % 100 == 57:
        str_col = ""  # empty string ≠ NULL (FIXTURES.md §1)
    elif pk % 3 == 0:
        str_col = f"行{pk}号"  # CJK, as in the reference's zh report output
    else:
        str_col = f"s{pk}"
    return (
        pk,
        int_col,
        big_col,
        dbl_col,
        dec_col,
        str_col,
        pk % 2 == 0,
        _EPOCH_DATE + dt.timedelta(days=pk % 3650),
        _EPOCH_TS + dt.timedelta(minutes=pk),
    )


def _modify(row: tuple) -> tuple:
    """Perturb exactly one column, spread across types by pk % 5."""
    pk = row[0]
    r = list(row)
    which = pk % 5
    if which == 0:
        r[1] = (r[1] or 0) + 1  # int_col (also exercises NULL→value flip)
    elif which == 1:
        r[3] = r[3] + 0.5  # dbl_col
    elif which == 2:
        r[4] = r[4] + Decimal("1.00")  # dec_col
    elif which == 3:
        r[5] = None if r[5] == "" else ("" if r[5] is None else r[5] + "_x")  # str flips
    else:
        r[8] = r[8] + dt.timedelta(hours=1)  # ts_col
    return tuple(r)


def cmp_master(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([_row(pk) for pk in range(1, N_ROWS + 1)], CMP_SCHEMA)


def cmp_slave(spark: SparkSession) -> DataFrame:
    rows = []
    for pk in range(1, N_ROWS + 1):
        if pk % 200 == 7:  # k_missing = 50
            continue
        row = _row(pk)
        if pk % 500 == 11:  # k_modified = 20
            row = _modify(row)
        rows.append(row)
    for pk in range(N_ROWS + 1, N_ROWS + K_EXTRA + 1):  # k_extra = 30
        rows.append(_row(pk))
    # shuffled row order: digests must be order-independent (bit_xor commutes)
    df = spark.createDataFrame(rows, CMP_SCHEMA)
    return df.orderBy(F.xxhash64("pk", F.lit(41)))


def cmp_slave_schema_drift(spark: SparkSession) -> DataFrame:
    """FIXTURES.md §3: retype int_col, drop bool_col, append new_col, swap order."""
    df = cmp_master(spark).limit(100)
    return df.select(
        "pk",
        F.col("int_col").cast("bigint").alias("int_col"),
        "big_col",
        "str_col",  # swapped with dbl_col
        "dbl_col",
        "dec_col",
        "date_col",
        "ts_col",
        F.lit("x").alias("new_col"),
    )


def cmp_dupkeys_pair(spark: SparkSession) -> tuple[DataFrame, DataFrame, int, int]:
    """FIXTURES.md §4: ~5% duplicated pks; returns (master, slave, up, down).

    Slave drops 10 specific duplicate copies and adds 5 fresh rows →
    multiset diff must report exactly (10, 5).
    """
    base = [(pk, f"p{pk}", pk * 0.5) for pk in range(1, 2001)]
    dups = [(pk, f"p{pk}", pk * 0.5) for pk in range(1, 2001) if pk % 20 == 0]  # 100 dups
    master = base + dups
    slave = base + [d for d in dups if d[0] % 200 != 0]  # drop 10 duplicate copies
    slave += [(9000 + i, f"x{i}", float(i)) for i in range(5)]  # 5 extras
    schema = "pk bigint, payload string, val double"
    return (
        spark.createDataFrame(master, schema),
        spark.createDataFrame(slave, schema),
        10,
        5,
    )
