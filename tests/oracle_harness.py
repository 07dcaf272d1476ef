"""Local replica of the driver's oracle-differential check.

Runs a ``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB
over the same parquet tables, then compares row count + column names +
order-insensitive values. Catching a mismatch here is much cheaper than
waiting for the driver's CORRECTNESS_r{N}.json.

Normalization: columns sorted by name (as the driver documents), rows sorted
by their full stringified form; floats rounded to 9 significant-ish decimals
and timestamps/dates ISO-formatted so cosmetic type differences between the
two engines don't read as value differences.
"""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal

import duckdb

from tidb_large_table_compare_spark.sources.tables import TABLES


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def _norm_val(v):
    if v is None:
        return "<NULL>"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return "0"
        # full round-trip precision: engines must be BIT-identical, not close
        return f"{v:.17g}"
    if isinstance(v, Decimal):
        return f"{float(v):.17g}"
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_val(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def normalize(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_val(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def compare_query(spark, query_fn, sql: str, sf_dir: str) -> tuple[bool, str]:
    sdf = query_fn(spark, sf_dir)
    # The driver's canonicalizer sorts through pandas, which cannot hash
    # list/dict cells — an oracle-backed entry returning a raw array/map
    # column can never go green (r1-r3 `unhashable type: 'list'`). Catch it
    # here instead of in CORRECTNESS_r{N}.json.
    from pyspark.sql.types import ArrayType, MapType

    bad = [
        f.name for f in sdf.schema.fields if isinstance(f.dataType, (ArrayType, MapType))
    ]
    if bad:
        return False, (
            f"driver-unverifiable output columns {bad}: serialize arrays/maps "
            "to scalars (array_join/concat_ws) or explode to element rows"
        )
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]
    o_cols, o_rows = run_oracle(sql, sf_dir)
    if sorted(s_cols) != sorted(c.lower() for c in map(str, o_cols)) and sorted(
        s_cols
    ) != sorted(map(str, o_cols)):
        return False, f"column mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    if len(s_rows) != len(o_rows):
        return False, f"row count mismatch: spark={len(s_rows)} oracle={len(o_rows)}"
    sn = normalize(s_cols, s_rows)
    on = normalize([str(c) for c in o_cols], o_rows)
    if sn != on:
        diffs = [(a, b) for a, b in zip(sn, on) if a != b][:5]
        return False, f"value mismatch, first diffs: {diffs}"
    return True, f"ok ({len(s_rows)} rows)"
