"""Connected components (operators/graph.py): chain propagation over
multiple rounds, isolation, undirectedness, and the convergence guard."""

from __future__ import annotations

import pytest

from distgrep_spark.operators.graph import connected_components, dedup_clusters


def cc(spark, n_vertices, edge_list, **kw):
    v = spark.createDataFrame([(i,) for i in range(n_vertices)], "id long")
    e = spark.createDataFrame(edge_list, "src long, dst long")
    return {
        r["id"]: r["comp"] for r in connected_components(v, e, **kw).collect()
    }


def test_chain_needs_multiple_rounds(spark):
    """0-1-2-3-4 chain: label 0 must walk 4 hops."""
    got = cc(spark, 6, [(0, 1), (1, 2), (2, 3), (3, 4)])
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0, 5: 5}


def test_edges_are_undirected(spark):
    """(4,0) written high-to-low must still pull 4 into component 0."""
    got = cc(spark, 5, [(4, 0), (3, 4)])
    assert got[3] == 0 and got[4] == 0


def test_two_components(spark):
    got = cc(spark, 6, [(0, 1), (2, 3), (3, 4)])
    assert got == {0: 0, 1: 0, 2: 2, 3: 2, 4: 2, 5: 5}


def test_convergence_guard_raises(spark):
    with pytest.raises(RuntimeError, match="did not converge"):
        cc(spark, 12, [(i, i + 1) for i in range(11)], max_iter=2)


def test_dedup_clusters_keep_one_per_cluster(spark):
    df = spark.createDataFrame(
        [(0, "x"), (1, "x"), (2, "y"), (3, "x"), (4, "z")], ["doc_id", "text"]
    )
    pairs = spark.createDataFrame([(0, 1), (1, 3)], ["doc_a", "doc_b"])
    clusters = dedup_clusters(df, pairs)
    kept = clusters.where("doc_id = cluster_rep")
    assert {r["doc_id"] for r in kept.collect()} == {0, 2, 4}
