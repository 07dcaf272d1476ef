"""tools/replicate_sf.py is committed benchmarking methodology — the scale
anchors in PERFORMANCE.md are only trustworthy if the replication preserves
the invariants it claims: global key uniqueness, FK alignment, and disjoint
per-replica shingle spaces (linear — not quadratic — near-dup growth)."""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "tools"))

from replicate_sf import KEY_OFF, replicate  # noqa: E402

SRC = "/root/testdata/sf0.001"


def test_replication_invariants(tmp_path):
    dst = str(tmp_path / "sf2x")
    replicate(SRC, dst, 2)
    con = duckdb.connect()

    # row counts: facts double, dims copy once
    for t, mult in [("orders", 2), ("lineitem", 2), ("documents", 2),
                    ("events", 2), ("nation", 1), ("region", 1)]:
        n_src = con.execute(
            f"SELECT count(*) FROM read_parquet('{SRC}/{t}.parquet')"
        ).fetchone()[0]
        n_dst = con.execute(
            f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')"
        ).fetchone()[0]
        assert n_dst == mult * n_src, t

    # keys stay globally unique
    for t, k in [("orders", "o_orderkey"), ("documents", "doc_id"),
                 ("embeddings", "vec_id"), ("events", "event_id")]:
        n, d = con.execute(
            f"SELECT count(*), count(DISTINCT {k}) "
            f"FROM read_parquet('{dst}/{t}.parquet')"
        ).fetchone()
        assert n == d, t

    # FK alignment: every replicated order's customer exists
    orphans = con.execute(
        f"""
        SELECT count(*) FROM read_parquet('{dst}/orders.parquet') o
        LEFT JOIN read_parquet('{dst}/customer.parquet') c
          ON o.o_custkey = c.c_custkey
        WHERE c.c_custkey IS NULL
        """
    ).fetchone()[0]
    assert orphans == 0

    # disjoint shingle spaces: replica-1 docs share no words with replica-0
    shared = con.execute(
        f"""
        WITH w AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS word
          FROM read_parquet('{dst}/documents.parquet')
        )
        SELECT count(*) FROM (
          SELECT word FROM w WHERE doc_id <  {KEY_OFF}
          INTERSECT
          SELECT word FROM w WHERE doc_id >= {KEY_OFF}
        )
        """
    ).fetchone()[0]
    assert shared == 0

    # embeddings: replicas are distinct vectors (component 0 shifted)
    same = con.execute(
        f"""
        SELECT count(*) FROM read_parquet('{dst}/embeddings.parquet') a
        JOIN read_parquet('{dst}/embeddings.parquet') b
          ON a.vec_id + {KEY_OFF} = b.vec_id
        WHERE a.embedding[1] = b.embedding[1]
        """
    ).fetchone()[0]
    assert same == 0

    # ...and NOT near-duplicates of each other (r12 fix: the old
    # 0.001-shift rule kept every replica at cosine >= 0.999 to its
    # original with identical sign-LSH bands, so factor-F replication
    # manufactured F-member dup cliques and embedding-dedup "slopes"
    # measured clique growth, not engine scaling). Pin the worst pair
    # across ALL replica pairs of every original below the 0.99 dedup
    # threshold the registry entries use.
    worst = con.execute(
        f"""
        SELECT max(list_cosine_similarity(a.embedding, b.embedding))
        FROM read_parquet('{dst}/embeddings.parquet') a
        JOIN read_parquet('{dst}/embeddings.parquet') b
          ON a.vec_id % {KEY_OFF} = b.vec_id % {KEY_OFF}
         AND a.vec_id < b.vec_id
        """
    ).fetchone()[0]
    assert worst < 0.99, worst


def test_replication_no_cliques_at_large_factor(tmp_path):
    """The factor-2 invariant test above could NOT catch the second r12
    perturbation defect: the growing first-component shift
    (0.5*(1 + i//(2*dims))) only converges same-rotation/same-sign
    replicas once shift levels exceed the embedding norms, i.e. at
    replica indices >= ~256 — measured at factor 1000 as cosine 0.9996
    between e.g. replicas (772, 900) of the same original, 2.1M
    manufactured >=0.99 pairs corpus-wide, while factor 300 leaked only
    ~414. Replicate the embeddings table alone at factor 1000 (the
    sf0.001 source keeps this a seconds-scale test) and pin BOTH clique
    modes dead: same-original replica-pair max cosine and a
    cross-original sample, all below the 0.95 band-collision margin."""
    import replicate_sf as rs

    dst = tmp_path / "emb1000"
    dst.mkdir()
    con = duckdb.connect()
    # drive only the embeddings COPY through the real module code: call
    # replicate() with the fact/dim tables monkeypatched away so the test
    # exercises the exact SQL the tool ships without replicating 6M
    # lineitem rows per run
    orig_facts, orig_dims = rs.FACT_TABLES, rs.DIM_TABLES
    rs.FACT_TABLES, rs.DIM_TABLES = {}, []
    try:
        rs.replicate(SRC, str(dst), 1000)
    finally:
        rs.FACT_TABLES, rs.DIM_TABLES = orig_facts, orig_dims

    # same-original: every replica pair of a fixed original (the defect
    # signature was 971 of these above 0.99 PER ORIGINAL at factor 1000)
    worst_same = con.execute(
        f"""
        WITH reps AS (
          SELECT vec_id, embedding AS e
          FROM read_parquet('{dst}/embeddings.parquet')
          WHERE vec_id % {KEY_OFF} = 3
        )
        SELECT max(list_cosine_similarity(a.e, b.e))
        FROM reps a JOIN reps b ON a.vec_id < b.vec_id
        """
    ).fetchone()[0]
    assert worst_same < 0.95, worst_same

    # cross-original sample: shared shift directions must not cluster
    # unrelated vectors either
    worst_cross = con.execute(
        f"""
        WITH s AS (
          SELECT vec_id, embedding AS e
          FROM read_parquet('{dst}/embeddings.parquet')
          WHERE vec_id % 401 = 9
        )
        SELECT max(list_cosine_similarity(a.e, b.e))
        FROM s a JOIN s b ON a.vec_id < b.vec_id
        WHERE a.vec_id % {KEY_OFF} != b.vec_id % {KEY_OFF}
        """
    ).fetchone()[0]
    assert worst_cross < 0.95, worst_cross
