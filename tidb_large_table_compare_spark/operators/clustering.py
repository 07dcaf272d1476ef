"""Duplicate-cluster resolution — connected components by label propagation.

Near-dup detection yields pairs; deduplication needs *clusters* (keep one
canonical doc per connected component). Components are computed by iterative
min-label propagation — the standard Spark formulation for iterative graph
algorithms without GraphX: alternate join-and-minimize until a fixpoint,
with the driver controlling convergence (legitimately iterative; each round
is one shuffle on node id).

At 100 TB scale the iteration count is O(diameter of the dup graph), which
for near-dup clusters is tiny (dup groups are cliques or short chains); each
round shuffles only (node, label) pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components"]


def connected_components(
    pairs: DataFrame, max_iterations: int = 20
) -> DataFrame:
    """(node, cluster_id) where cluster_id = min node id in the component.

    ``pairs`` must have columns (id_a, id_b). Isolated endpoints appear with
    themselves as cluster id; nodes absent from ``pairs`` are not emitted
    (callers union in singletons if they need total coverage).
    """
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
        )
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .persist()
    )
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        updated = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
            .persist()
        )
        changed = (
            updated.alias("u")
            .join(labels.alias("l"), "node")
            .filter(F.col("u.label") != F.col("l.label"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = updated
        if changed == 0:
            break
    return labels.select(F.col("node"), F.col("label").alias("cluster_id"))
