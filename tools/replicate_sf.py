#!/usr/bin/env python3
"""Build a scaled synthetic SF directory by key-offset replication.

Usage: python3 tools/replicate_sf.py SRC_DIR DST_DIR FACTOR

Replicates each fact table FACTOR times with all key columns offset by
``replica * 1_000_000_000`` so keys stay globally unique and FK joins stay
aligned (customer replicas carry the same offset as the orders replicas that
reference them). Dimension tables (region, nation) are copied once — their
size is SF-independent, as in TPC-H.

Content perturbation keeps the workload honest at scale instead of
manufacturing a FACTOR-way duplicate cluster per row (methodology of the
round-5 rehearsals, PERFORMANCE.md):

- ``documents.text``: every word in replica i>0 gets an ``_ri`` suffix, so
  shingle spaces are DISJOINT across replicas — the near-dup pair space
  models a FACTOR-times-larger corpus (linear), not FACTOR-copy dup groups
  (quadratic).
- ``embeddings.embedding``: replica i>0 gets a cyclic component rotation
  by ``i % dims``, a full sign flip on alternating rotation windows, and
  a norm-proportional shift on a CLASS-VARYING component
  (``1 + (i // (2*dims)) % dims``, 1-indexed). Two defects led here:
  - The r10–r11 rule (shift component 0 by ``0.001*i`` only) made every
    replica a NEAR-DUPLICATE of its original (cosine ≥ 0.999, identical
    sign-LSH bands), so factor-F replication manufactured F-member dup
    cliques: measured in the r12 sf30 rehearsal as 52.5 → 116.7
    candidate pairs per vector (6.67× pairs for 3× vectors).
  - The first r12 rule (GROWING first-component shift
    ``0.5 * (1 + i // (2*dims))``) fixed replica-vs-original but
    converged same-rotation/same-sign replicas of the SAME original at
    adjacent shift levels toward each other as the shift grew: at
    factor 1000, pairs like (772, 900) hit cosine 0.9996 — ~971
    manufactured ≥0.99 pairs per original, 2.1M total, while at
    factor 300 the same rule leaked only ~414 pairs corpus-wide
    (emergent-at-scale, like the engine bugs this tool exists to find).
  The norm-proportional constant-magnitude shift (cos(e, e + |e|·δp)
  = sqrt((1+ê_p)/2) ≈ 0.71 for every norm) separates replica from
  original uniformly, and varying WHICH component is shifted makes the
  (rotation, sign, shift-position) class unique per replica below
  factor ``2*dims²`` (8192 at dims=64) — no two replicas share a class,
  so the same-class convergence cannot recur. Rotation decorrelates the
  rest (components of synthetic embeddings are uncorrelated across
  positions). A handful of accidental near-dups can survive (real
  corpora have those too); the systematic cliques are gone.
- ``events.ts`` is left on the original time axis: windowed aggregations
  then carry FACTOR× rows per window, the worst case for window state.

Everything runs inside DuckDB (one COPY per table); output parquet gets
DuckDB's default ~122k-row row groups, so Spark scans the result with real
multi-split parallelism (unlike the single-row-group driver testdata).
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

KEY_OFF = 1_000_000_000

# per-table: (key columns to offset, passthrough columns)
FACT_TABLES = {
    "customer": (["c_custkey"], ["c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]),
    "supplier": (["s_suppkey"], ["s_name", "s_nationkey", "s_acctbal"]),
    "part": (["p_partkey"], ["p_name", "p_brand", "p_type", "p_size", "p_retailprice"]),
    "orders": (
        ["o_orderkey", "o_custkey"],
        ["o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"],
    ),
    "lineitem": (
        ["l_orderkey", "l_partkey", "l_suppkey"],
        [
            "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
            "l_tax", "l_returnflag", "l_linestatus", "l_shipdate",
        ],
    ),
    "events": (["event_id", "user_id"], ["ts", "event_type", "value", "props"]),
}

DIM_TABLES = ["region", "nation"]


def replicate(src: str, dst: str, factor: int) -> None:
    Path(dst).mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    # COPY preserves insertion order by default, which forces DuckDB to
    # materialize the ENTIRE table-x-range(F) cross join before writing a
    # byte (measured: factor-1000 lineitem sat 65 min at 72 GB RSS with a
    # 0-byte output file). Replica order carries no meaning here, so let
    # COPY stream row groups as they are produced, and bound the buffer
    # pool well under the host's RAM so a mis-estimate spills instead of
    # OOM-killing the box.
    con.execute("SET preserve_insertion_order = false")
    con.execute("SET memory_limit = '32GB'")

    def copy(select: str, table: str) -> None:
        con.execute(
            f"COPY ({select}) TO '{dst}/{table}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{dst}/{table}.parquet')"
        ).fetchone()[0]
        print(f"{table}: {n} rows")

    for t in DIM_TABLES:
        copy(f"SELECT * FROM read_parquet('{src}/{t}.parquet')", t)

    for t, (keys, rest) in FACT_TABLES.items():
        cols = ", ".join(
            [f"{k} + r.i * {KEY_OFF} AS {k}" for k in keys] + rest
        )
        copy(
            f"SELECT {cols} FROM read_parquet('{src}/{t}.parquet'), "
            f"range({factor}) r(i)",
            t,
        )

    # documents: disjoint per-replica shingle space (see module docstring)
    copy(
        f"""
        SELECT doc_id + r.i * {KEY_OFF} AS doc_id,
               CASE WHEN r.i = 0 THEN text
                    ELSE regexp_replace(text, '(\\S+)', '\\1_r' || r.i, 'g')
               END AS text,
               lang, source,
               CAST(length(CASE WHEN r.i = 0 THEN text
                    ELSE regexp_replace(text, '(\\S+)', '\\1_r' || r.i, 'g')
               END) AS BIGINT) AS n_chars
        FROM read_parquet('{src}/documents.parquet'), range({factor}) r(i)
        """,
        "documents",
    )

    # embeddings: genuinely distinct-DIRECTION replicas (see module
    # docstring — both earlier shift rules manufactured near-dup cliques,
    # one replica-vs-original, one replica-vs-replica at factor ≳ 300).
    # Per replica i>0: cyclic rotation by i % dims, full sign flip on
    # alternating rotation windows, and a norm-proportional shift on the
    # class-varying component 1 + (i // (2*dims)) % dims — constant
    # relative magnitude (cos ≈ 0.71 vs the original at ANY norm), and
    # (rotation, sign, position) unique per replica below 2*dims².
    dims = con.execute(
        f"SELECT len(embedding) FROM read_parquet('{src}/embeddings.parquet') LIMIT 1"
    ).fetchone()[0]
    if factor > 2 * dims * dims:
        # past this, two replicas share a (rotation, sign, shift-position)
        # class and the same-class convergence the current rule prevents
        # would quietly return — refuse instead of emitting a corpus with
        # manufactured near-dup cliques
        raise SystemExit(
            f"factor {factor} > 2*dims^2 = {2 * dims * dims}: replica "
            "perturbation classes would repeat; extend the rule first"
        )
    copy(
        f"""
        WITH rot AS (
          SELECT vec_id + r.i * {KEY_OFF} AS vec_id, r.i AS i,
                 CASE WHEN r.i % {dims} = 0 THEN embedding
                      ELSE embedding[1 + (r.i % {dims}):]
                           || embedding[1:(r.i % {dims})]
                 END AS e,
                 label
          FROM read_parquet('{src}/embeddings.parquet'), range({factor}) r(i)
        ),
        sgn AS (
          SELECT vec_id, i,
                 CASE WHEN (i // {dims}) % 2 = 1
                      THEN list_transform(e, x -> CAST(-x AS FLOAT))
                      ELSE e
                 END AS e,
                 label
          FROM rot
        )
        SELECT vec_id,
               CASE WHEN i = 0 THEN e
                    ELSE list_transform(
                        e,
                        (x, p) -> CAST(CASE
                            WHEN p = 1 + (i // (2 * {dims})) % {dims}
                            THEN x + sqrt(list_dot_product(e, e))
                            ELSE x END AS FLOAT))
               END AS embedding,
               label
        FROM sgn
        """,
        "embeddings",
    )


if __name__ == "__main__":
    if len(sys.argv) != 4:
        print(f"usage: {sys.argv[0]} SRC_DIR DST_DIR FACTOR", file=sys.stderr)
        sys.exit(2)
    src, dst, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    if factor < 1:
        # factor 0 would silently write dims-only output: the fact tables
        # cross-join range(0) and come out EMPTY — a corrupt "scaled" set
        print(f"error: FACTOR must be >= 1, got {factor}", file=sys.stderr)
        sys.exit(2)
    replicate(src, dst, factor)
