"""Cross-engine unicode parity: the text operators must agree with DuckDB on
non-ASCII content (CJK, emoji, combining marks, RTL) — character-based
lengths, whitespace tokenization, n-gram counts, and the md5-prefix token
hash (which both engines compute over UTF-8 bytes)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

DOCS = [
    (1, "hello world plain ascii"),
    (2, "こんにちは 世界 これは テスト です"),
    (3, "emoji 🌍 and 🚀 tokens here"),
    (4, "café noël naïve résumé coöperate"),  # combining-capable accents
    (5, "مرحبا بالعالم هذا اختبار"),  # RTL
    (6, "mixed ascii と 日本語 and عربى text"),
]

MD5_60 = " + ".join(
    f"(instr('0123456789abcdef', substring(md5(tok), {j + 1}, 1)) - 1)"
    f" * {16 ** (14 - j)}"
    for j in range(15)
)


def test_unicode_text_metrics_match_duckdb(spark, tmp_path):
    path = str(tmp_path / "unidocs.parquet")
    spark.createDataFrame(DOCS, "doc_id long, text string").write.parquet(path)

    sdf = (
        spark.read.parquet(path)
        .select(
            "doc_id",
            F.length("text").alias("n_chars"),
            F.size(F.filter(F.split("text", " "), lambda t: t != "")).alias("n_toks"),
            F.greatest(
                F.size(F.filter(F.split("text", " "), lambda t: t != "")) - 2,
                F.lit(0),
            ).alias("n_3grams"),
        )
        .orderBy("doc_id")
    )
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb.connect()
    oracle_rows = con.execute(
        f"""
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS n_chars,
               CAST(len(list_filter(string_split(text, ' '), t -> t <> ''))
                    AS INTEGER) AS n_toks,
               CAST(greatest(len(list_filter(string_split(text, ' '),
                                             t -> t <> '')) - 2, 0)
                    AS INTEGER) AS n_3grams
        FROM read_parquet('{path}/*.parquet') ORDER BY doc_id
        """
    ).fetchall()
    assert spark_rows == [tuple(r) for r in oracle_rows]


def test_unicode_token_hash_matches_duckdb(spark, tmp_path):
    """The md5-prefix 60-bit token hash (simhash / split assignment) must be
    identical for unicode tokens: both engines hash the UTF-8 bytes."""
    path = str(tmp_path / "unidocs.parquet")
    spark.createDataFrame(DOCS, "doc_id long, text string").write.parquet(path)

    sdf = (
        spark.read.parquet(path)
        .select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .select(
            "doc_id",
            "tok",
            F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10)
            .cast("long")
            .alias("h"),
        )
    )
    spark_rows = sorted(tuple(r) for r in sdf.collect())

    con = duckdb.connect()
    oracle_rows = sorted(
        tuple(r)
        for r in con.execute(
            f"""
            WITH toks AS (
              SELECT doc_id, t.tok
              FROM read_parquet('{path}/*.parquet'),
                   LATERAL (SELECT unnest(string_split(text, ' ')) AS tok) t
            )
            SELECT doc_id, tok, CAST({MD5_60} AS BIGINT) AS h
            FROM toks WHERE tok <> ''
            """
        ).fetchall()
    )
    assert spark_rows == oracle_rows
