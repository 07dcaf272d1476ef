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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import window as W

from tidb_large_table_compare_spark.operators.similarity import quantize

__all__ = ["kmeans_assignments"]


def _dist2(a: Column, b: Column) -> Column:
    """Exact integer squared euclidean distance."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _assign(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """(id, qv, cluster_id): nearest centroid by exact distance, min-id ties."""
    scored = vectors.join(F.broadcast(centroids)).select(
        "id", "qv", "cluster_id", _dist2(F.col("qv"), F.col("cv")).alias("d2")
    )
    w = W.Window.partitionBy("id").orderBy(F.asc("d2"), F.asc("cluster_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("id", "qv", "cluster_id")
    )


def _update(assigned: DataFrame) -> DataFrame:
    """Re-quantized element-wise mean per cluster → (cluster_id, cv)."""
    dims = assigned.select(
        "cluster_id", F.posexplode("qv").alias("dim", "val")
    )
    sums = dims.groupBy("cluster_id", "dim").agg(
        F.sum("val").alias("s"), F.count(F.lit(1)).alias("c")
    )
    comp = sums.select(
        "cluster_id",
        "dim",
        F.round(F.col("s").cast("double") / F.col("c")).cast("long").alias("m"),
    )
    return comp.groupBy("cluster_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "m"))), lambda e: e["m"]
        ).alias("cv")
    )


def kmeans_assignments(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_mod: int = 25,
    iterations: int = 2,
) -> DataFrame:
    """Run ``iterations`` Lloyd's rounds; returns (vec_id, cluster_id).

    Initial centroids are the corpus vectors with ``id % centroid_mod == 0``
    (deterministic seeding); cluster ids are those seed vectors' ids.
    """
    vectors = corpus.select(
        F.col(id_col).alias("id"), quantize(F.col(vec_col)).alias("qv")
    ).persist()
    centroids = vectors.filter(F.col("id") % centroid_mod == 0).select(
        F.col("id").alias("cluster_id"), F.col("qv").alias("cv")
    )
    assigned = None
    for _ in range(iterations):
        assigned = _assign(vectors, centroids)
        centroids = _update(assigned)
    return assigned.select(F.col("id").alias(id_col), "cluster_id")
