"""Connected-components / dedup-cluster tests on known graphs."""

from __future__ import annotations

from pyspark.sql import Row

from data_seedling_spark.operators.graph import connected_components, dedup_clusters


def edges_df(spark, pairs):
    return spark.createDataFrame([Row(src=a, dst=b) for a, b in pairs])


def test_components_chain_and_islands(spark):
    # chain 1-2-3-4, pair 10-11, isolated-by-self-edge 20
    out = connected_components(
        edges_df(spark, [(1, 2), (2, 3), (3, 4), (10, 11), (20, 20)])
    )
    got = {r["node"]: r["component"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20}


def test_components_deep_chain_converges(spark):
    # diameter 12 chain — exercises multi-round convergence
    pairs = [(i, i + 1) for i in range(12)]
    out = connected_components(edges_df(spark, pairs))
    assert {r["component"] for r in out.collect()} == {0}


def test_dedup_clusters_canonical_flags(spark):
    pairs = spark.createDataFrame(
        [Row(doc_a=5, doc_b=9), Row(doc_a=9, doc_b=12), Row(doc_a=30, doc_b=31)]
    )
    out = {r["doc_id"]: (r["cluster_id"], r["is_canonical"]) for r in dedup_clusters(pairs).collect()}
    assert out == {5: (5, 1), 9: (5, 0), 12: (5, 0), 30: (30, 1), 31: (30, 0)}


def test_components_raise_on_exhausted_iterations(spark):
    import pytest as _pytest

    pairs = [(i, i + 1) for i in range(10)]  # diameter 10 chain
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges_df(spark, pairs), max_iterations=2)


# --- Schank–Wagner degree orientation (triangle census skew guard) ---


def test_degree_orientation_preserves_triangle_count(spark):
    from pyspark.sql import functions as F

    from data_seedling_spark.queries_mining import orient_edges_by_degree

    # K4 on {1,2,3,4} (4 triangles) plus a pendant edge and a separate
    # triangle {10,11,12}: 5 triangles total.
    und = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5),
           (10, 11), (11, 12), (10, 12)]
    edges = spark.createDataFrame(und, "u long, v long")
    o = orient_edges_by_degree(edges)
    e1, e2, e3 = o.alias("e1"), o.alias("e2"), o.alias("e3")
    wedge = (F.col("e1.src") == F.col("e2.src")) & (
        (F.col("e1.dst_d") < F.col("e2.dst_d"))
        | ((F.col("e1.dst_d") == F.col("e2.dst_d")) & (F.col("e1.dst") < F.col("e2.dst")))
    )
    tri = (
        e1.join(e2, wedge)
        .join(e3, (F.col("e3.src") == F.col("e1.dst")) & (F.col("e3.dst") == F.col("e2.dst")))
        .count()
    )
    assert tri == 5
    # Orientation is a bijection on the edge set.
    assert o.count() == len(und)


def test_degree_orientation_bounds_hot_vertex_wedges(spark):
    from pyspark.sql import functions as F

    from data_seedling_spark.queries_mining import orient_edges_by_degree

    # Star: hub 0 (the LOWEST id — worst case for id-orientation)
    # joined to 60 leaves, plus one triangle hanging off two leaves.
    pairs = [(0, i) for i in range(1, 61)] + [(1, 2)]
    edges = spark.createDataFrame(pairs, "u long, v long")

    # id-orientation pivots every wedge at the hub: 60·59/2 = 1770.
    id_out = (
        edges.groupBy("u").agg(F.count("*").alias("d"))
        .agg(F.max("d").alias("m")).collect()[0]["m"]
    )
    assert id_out == 60  # hub out-degree under id order

    # Degree orientation points every star edge leaf→hub: the hub's
    # out-degree (= wedge-pivot work) collapses to 0, and the max
    # pivot degree anywhere is the 2 of the triangle's leaves.
    o = orient_edges_by_degree(edges)
    deg_out = (
        o.groupBy("src").agg(F.count("*").alias("d"))
        .agg(F.max("d").alias("m")).collect()[0]["m"]
    )
    assert deg_out <= 2


def test_star_contraction_matches_label_propagation_and_handles_chains(spark):
    """Star contraction equals min-label propagation on a random
    graph, and converges inside a small round budget on a 400-node
    chain — the diameter-bound topology where per-round label
    propagation would need ~400 rounds (the O(log n) vs O(diameter)
    difference that matters on web-scale duplicate graphs)."""
    import random

    from pyspark.sql import Row

    from data_seedling_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    random.seed(11)
    edges = [Row(src=random.randint(0, 120), dst=random.randint(0, 120))
             for _ in range(90)]
    df = spark.createDataFrame(edges)
    lp = {(r["node"], r["component"])
          for r in connected_components(df, max_iterations=100).collect()}
    star = {(r["node"], r["component"])
            for r in connected_components_star(df).collect()}
    assert star == lp

    chain = spark.createDataFrame(
        [Row(src=i, dst=i + 1) for i in range(400)]
    )
    # budget far below the chain's diameter: only a logarithmic-round
    # algorithm can finish
    out = connected_components_star(chain, max_iterations=12).collect()
    assert len(out) == 401
    assert {r["component"] for r in out} == {0}


def test_bfs_hops_chain_and_unreachable(spark):
    """BFS on a chain: levels are exact hop distances, traversal stops
    at max_hops, disconnected nodes never appear, and an injected
    source frame overrides the min-id default."""
    from data_seedling_spark.operators.graph import bfs_hops
    from pyspark.sql import functions as F

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (100, 101)],
        ["src", "dst"],
    )
    got = {
        r["node"]: r["hops"]
        for r in bfs_hops(edges, max_hops=3).collect()
    }
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}
    src = spark.range(1).select(F.lit(3).alias("node"))
    got3 = {
        r["node"]: r["hops"]
        for r in bfs_hops(edges, max_hops=2, source=src).collect()
    }
    assert got3 == {3: 0, 2: 1, 4: 1, 1: 2, 5: 2}


def test_bellman_ford_weighted_chain(spark):
    """Cheapest cost prefers a longer-but-lighter route and respects
    the round bound."""
    from data_seedling_spark.operators.graph import bellman_ford
    from pyspark.sql import functions as F

    # 1→3 direct costs 10; 1→2→3 costs 2+3=5; node 4 needs 2 hops
    edges = spark.createDataFrame(
        [(1, 3, 10), (1, 2, 2), (2, 3, 3), (3, 4, 1)],
        ["src", "dst", "w"],
    )
    got = {r["node"]: r["cost"] for r in bellman_ford(edges, rounds=3).collect()}
    assert got == {1: 0, 2: 2, 3: 5, 4: 6}
    # with only 1 round, the relaxed path to 3 is the direct edge
    got1 = {r["node"]: r["cost"] for r in bellman_ford(edges, rounds=1).collect()}
    assert got1[3] == 10 and 4 not in got1


def test_label_propagation_majority_vote_wins(spark):
    """The density-weighted property that distinguishes LPA from CC's
    min-anything propagation: a node with TWO neighbors in cluster A
    and ONE in cluster B adopts A's label by majority (not by id
    order — B's round-1 label here is numerically smaller than
    nothing, the vote is 2:1)."""
    from data_seedling_spark.operators.graph import (
        label_propagation_communities,
    )

    # star A: center 1, leaves 2,3,4; star B: center 10, leaves 11,12,13
    # bridge node 20 touches A-leaves 2,3 and B-leaf 11
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (10, 11), (10, 12), (10, 13),
         (20, 2), (20, 3), (20, 11)],
        ["src", "dst"],
    )
    labels = {
        r["node"]: r["label"]
        for r in label_propagation_communities(edges, rounds=2).collect()
    }
    # round 1: A-leaves -> 1, B-leaves -> 10; round 2: node 20 sees
    # votes {1: 2 (from 2,3), 10: 1 (from 11)} -> majority 1
    assert labels[20] == 1


def test_entity_resolution_transitive_closure_and_survivorship(spark):
    """ER golden record: a typo CHAIN A~B~C (lev(A,B)=lev(B,C)=1 but
    lev(A,C)=2 edges absent from the pair stage under stricter
    thresholds) must still land in ONE cluster via transitive closure,
    and the survivorship rules must be deterministic functions of the
    member set."""
    from data_seedling_spark.operators.graph import (
        connected_components_star,
    )

    # pair stage output for a 3-chain plus a separate 2-cluster
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], ["part_a", "part_b"]
    )
    cc = connected_components_star(pairs, src="part_a", dst="part_b")
    comp = {r["node"]: r["component"] for r in cc.collect()}
    assert comp[1] == comp[2] == comp[3] == 1
    assert comp[10] == comp[11] == 10
