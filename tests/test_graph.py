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
