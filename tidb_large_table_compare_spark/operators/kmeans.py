"""Deterministic k-means (Lloyd's iterations) over embedding vectors.

The iterative-ML companion to the IVF index in :mod:`.similarity`: instead
of ad-hoc centroids, run real assign/update rounds. Everything is engineered
for *exact cross-engine reproducibility* so even an iterative training loop
can be oracle-verified:

- vectors quantized to integers (×1e6) — squared distances are exact bigint
  arithmetic (max component ~1.1e6 → dist² ≤ 7.7e13 per pair, no overflow);
- updated centroids are the element-wise mean **re-quantized** to integers
  (``round(sum / count)``) so the next round's distances are exact again;
- ties break on the smallest cluster id; iteration count is fixed.

Scale shape: each round is one broadcast argmin over the corpus (map-side)
plus one (cluster, dim) aggregation — shuffle ∝ k × dims, never corpus².
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tidb_large_table_compare_spark.functions.materialize import materialize
from tidb_large_table_compare_spark.operators.similarity import quantize, topk_cells

__all__ = ["kmeans_assignments", "trained_centroids"]


def _assign(vectors: DataFrame, centroid_rows: list[tuple[int, list[int]]]) -> DataFrame:
    """(id, qv, cluster_id): nearest centroid by exact integer squared
    distance, min-id ties — the Arrow-batched numpy argmin (``vv + cc -
    2·dot`` equals ``sum((x-y)^2)`` exactly in int64, so results are
    identical to the SQL formulation)."""
    return topk_cells(
        vectors, "id", "qv", centroid_rows, k=1, metric="l2", out_col="cluster_id"
    )


def _update(assigned: DataFrame) -> DataFrame:
    """Re-quantized element-wise mean per cluster → (cluster_id, cv)."""
    dims = assigned.select(
        "cluster_id", F.posexplode("qv").alias("dim", "val")
    )
    sums = dims.groupBy("cluster_id", "dim").agg(
        F.sum("val").alias("s"), F.count(F.lit(1)).alias("c")
    )
    # exact integer round-half-away-from-zero: (2|s|+c) DIV (2c), signed.
    # The double formulation (round(s::double / c)) loses exactness once a
    # cluster's per-dimension sum exceeds 2^53 (~8e9 members at the ~1.1e6
    # quantized component bound — reachable at the 100 TB target), and the
    # module's contract is exact cross-engine reproducibility. 2*s stays
    # far inside bigint (overflow needs ~4e12 members per cluster); the
    # oracle (_KMEANS_UPDATE_SQL) computes the identical integer form.
    comp = sums.select(
        "cluster_id",
        "dim",
        F.expr(
            "CASE WHEN s >= 0 THEN (2*s + c) DIV (2*c) "
            "ELSE -((-2*s + c) DIV (2*c)) END"
        ).alias("m"),
    )
    return comp.groupBy("cluster_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "m"))), lambda e: e["m"]
        ).alias("cv")
    )


def _prep_vectors(corpus: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    from tidb_large_table_compare_spark.functions.partitioning import (
        ensure_min_partitions,
    )

    # spread single-row-group test inputs so each Lloyd's round's Arrow
    # argmin parallelizes (no-op on real multi-split corpora) — size-capped,
    # because argmin is cheap per row and each Lloyd's round re-pays the
    # per-task overhead: the flat 32-way spread of a 2,000-row sf0.1 input
    # cost 302 tasks across 23 stages per invocation, pure scheduling
    # overhead that doubles under host contention (the r6→r7 driver-host
    # bench investigation)
    return ensure_min_partitions(corpus, bytes_per_partition=128 << 10).select(
        F.col(id_col).alias("id"), quantize(F.col(vec_col)).alias("qv")
    )


def _train(
    vectors: DataFrame, centroid_mod: int, iterations: int, max_cells: int
) -> list[tuple[int, list[int]]]:
    """Seed + (iterations-1) assign/update rounds → final centroid rows.

    These are the centroids the ``iterations``-th assignment pass would use —
    centroids are driver-side state between rounds (O(k × dims), the same
    shape MLlib keeps on the driver); each round is one map-side numpy
    argmin over the corpus plus one (cluster, dim) aggregation.

    The seed is the ``max_cells`` SMALLEST ids with ``id % centroid_mod
    == 0`` — k is bounded by construction. An uncapped modulo seed makes
    k ∝ corpus (N/centroid_mod), so every Lloyd's round's N×k argmin
    turns quadratic and the between-round driver state unbounded — the
    round-10 sf10 rehearsal measured the IVF twin of this defect at 80k
    cells / 17–265 s per assignment. Lloyd's updates can only merge
    clusters, never split, so the bound holds across rounds.
    """
    centroid_rows = [
        (r["id"], r["qv"])
        for r in vectors.filter(F.col("id") % centroid_mod == 0)
        .orderBy("id")
        .limit(max_cells)
        .collect()
    ]
    for _ in range(iterations - 1):
        assigned = _assign(vectors, centroid_rows)
        centroid_rows = [
            (r["cluster_id"], r["cv"]) for r in _update(assigned).collect()
        ]
    return centroid_rows


def kmeans_assignments(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_mod: int = 25,
    iterations: int = 2,
    max_cells: int = 1024,
) -> DataFrame:
    """Run ``iterations`` Lloyd's rounds; returns (vec_id, cluster_id).

    Initial centroids are the ``max_cells`` smallest corpus ids with
    ``id % centroid_mod == 0`` (deterministic bounded seeding — see
    :func:`_train`); cluster ids are those seed vectors' ids.
    """
    vectors = _prep_vectors(corpus, id_col, vec_col).persist()
    try:
        centroid_rows = _train(vectors, centroid_mod, iterations, max_cells)
        # Final assignment runs against the STILL-CACHED vectors and the
        # (id, cluster_id) result — two longs per row — is pinned through
        # the materialize() seam (eager localCheckpoint by default), so the
        # cache can be released inside this call without the caller's later
        # action recomputing the scan + quantize prep. (The round-5 fix
        # released the cache but re-derived the prep from source for the
        # final pass, which moved a full Arrow-quantize pass into every
        # steady-state invocation: measured 1.4 s → 2.3 s on the sf0.1
        # bench. This keeps the release AND the single-scan profile.
        # Under the seam's opt-in persist mode the release below
        # re-registers the dependent cache entry unmaterialized
        # (SPARK-24596), costing one lineage recompute on first use —
        # the price of recoverability that mode exists to buy.)
        return materialize(
            _assign(vectors, centroid_rows)
            .select(F.col("id").alias(id_col), "cluster_id")
        )
    finally:
        vectors.unpersist()


def trained_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_mod: int = 25,
    iterations: int = 2,
    max_cells: int = 1024,
) -> list[tuple[int, list[int]]]:
    """Train and return the final (cluster_id, quantized-vector) centroids.

    The composition seam between the trainer and the ANN index: feed the
    result to :func:`..similarity.ivf_topk` / :func:`..similarity.build_ivf_index`
    as their coarse quantizer instead of the ``id % centroid_mod`` sampling
    stand-in. The list is O(k × dims) driver state — the same size the
    trainer already keeps between rounds, so handing it across operators
    adds no new scale constraint.
    """
    vectors = _prep_vectors(corpus, id_col, vec_col).persist()
    try:
        return _train(vectors, centroid_mod, iterations, max_cells)
    finally:
        vectors.unpersist()
