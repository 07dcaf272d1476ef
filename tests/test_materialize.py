"""functions/materialize.py — the conf-gated localCheckpoint/persist seam
(ADVICE r10: preemptible/dynamic-allocation clusters need recomputable
blocks), plus similarity.derive_max_cells (√N IVF cell sizing)."""

import pytest
from pyspark.sql import functions as F

from tidb_large_table_compare_spark.functions.materialize import (
    MODE_CONF,
    materialize,
)


def _sample(spark):
    return spark.range(100).select(
        "id", (F.col("id") % 7).alias("k"), F.xxhash64("id").alias("h")
    )


def test_default_mode_is_localcheckpoint(spark):
    spark.conf.unset(MODE_CONF)
    out = materialize(_sample(spark))
    # localCheckpoint truncates lineage: the plan bottoms out in a scan of
    # existing RDD blocks (LogicalRDD), not the range source
    assert "LogicalRDD" in out._jdf.queryExecution().optimizedPlan().toString()
    assert out.count() == 100


def test_persist_mode_keeps_lineage_and_unpersists(spark):
    spark.conf.set(MODE_CONF, "persist")
    try:
        df = _sample(spark)
        out = materialize(df)
        # lineage preserved (executor loss → recompute, the point of the
        # mode) and the handle is storage-backed + droppable
        assert "LogicalRDD" not in out._jdf.queryExecution().optimizedPlan().toString()
        assert out.storageLevel.useMemory or out.storageLevel.useDisk
        assert out.count() == 100
        out.unpersist(blocking=True)
        assert not (out.storageLevel.useMemory or out.storageLevel.useDisk)
    finally:
        spark.conf.unset(MODE_CONF)


def test_modes_yield_identical_rows(spark):
    df = _sample(spark)
    a = sorted(map(tuple, materialize(df, mode="localCheckpoint").collect()))
    b = sorted(map(tuple, materialize(df, mode="persist").collect()))
    assert a == b


def test_unknown_mode_raises(spark):
    with pytest.raises(ValueError, match=MODE_CONF):
        materialize(_sample(spark), mode="checkpoint")


def test_operator_parity_under_persist_mode(spark):
    """An ADVICE-named consumer (the banded LSH candidate join) returns
    identical pairs under both modes — the seam must be invisible to
    results."""
    from tidb_large_table_compare_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signature_from_sets,
        hashed_word_ngrams,
    )

    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog %d" % (i % 3),)
         for i in range(30)],
        "doc_id long, text string",
    )
    sets_ = docs.select(
        "doc_id", hashed_word_ngrams(F.col("text"), 3).alias("shingles")
    )
    sigs = minhash_signature_from_sets(sets_, "doc_id")

    def pairs():
        return sorted(
            (r.id_a, r.id_b)
            for r in lsh_candidate_pairs(sigs, "doc_id").collect()
        )

    base = pairs()
    assert base  # the %3 texts collide — non-trivial candidate set
    spark.conf.set(MODE_CONF, "persist")
    try:
        assert pairs() == base
    finally:
        spark.conf.unset(MODE_CONF)


def test_derive_max_cells_floor_and_sqrt(spark):
    from tidb_large_table_compare_spark.operators.similarity import (
        derive_max_cells,
    )

    # small corpus: the 1024 floor binds (driver-SF oracles byte-identical)
    assert derive_max_cells(spark.range(100)) == 1024
    # large corpus: √N from plan statistics — spark.range carries an exact
    # optimizer row count, so this must cost zero jobs and return isqrt
    assert derive_max_cells(spark.range(4_000_000)) == 2000
