"""Iterative graph algorithms on DataFrames: connected components.

The dedup post-step: near-dup *pairs* (from MinHash-LSH or exact
Jaccard) form a graph whose connected components are the duplicate
*clusters*; one canonical document (min id) survives per cluster.

Implementation is iterative min-label propagation — the standard
DataFrame-native formulation (HashToMin flavor of Rastogi et al. 2013,
"Finding Connected Components in Map-Reduce"): each node repeatedly
adopts the smallest label among itself and its neighbors until a pass
changes nothing. Convergence in O(diameter) rounds; each round is one
join + one aggregate on (node, label) pairs — shuffle weight O(edges).

Scale notes: ``localCheckpoint`` cuts the lineage every round (an
iterative plan otherwise grows by one join per round and chokes the
optimizer); the convergence probe rides the same action via
``observe`` rather than a second count job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
) -> DataFrame:
    """(node, component) with component = min node id in the component.

    ``edges`` is undirected input (each pair listed once is enough).
    """
    # persist: the symmetrised edge list feeds every iteration (and is
    # built from the edges subtree twice) — without this the upstream
    # pair-generation pipeline re-runs once per round per side
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .persist()
    )

    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )

    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy("a")
            .agg(F.min("component").alias("neighbor_component"))
        )
        obs = Observation()
        updated = (
            labels.join(neighbor_min, labels.node == neighbor_min.a, "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("neighbor_component"), F.col("component")),
                ).alias("component"),
                (
                    F.coalesce(F.col("neighbor_component"), F.col("component"))
                    < F.col("component")
                ).cast("long").alias("_changed"),
            )
            .observe(obs, F.sum("_changed").alias("n_changed"))
            .drop("_changed")
        )
        labels = updated.localCheckpoint()  # materialises → observation valid
        if int(obs.get["n_changed"] or 0) == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} "
        "iterations (graph diameter exceeds the budget); raise "
        "max_iterations — silently returning partial labels would split "
        "true components"
    )


def dedup_clusters(
    pairs: DataFrame, id_a: str = "doc_a", id_b: str = "doc_b"
) -> DataFrame:
    """Cluster near-dup pairs and pick the canonical (min-id) member:
    (doc_id, cluster_id, is_canonical)."""
    cc = connected_components(pairs, src=id_a, dst=id_b)
    return cc.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        (F.col("node") == F.col("component")).cast("int").alias("is_canonical"),
    )
