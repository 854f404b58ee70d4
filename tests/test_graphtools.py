"""GraphTools: append/merge/sampling/edge-indexing + approx CC."""

import pytest

from networkit_spark.graph import Graph
from networkit_spark.graphtools import (
    append,
    index_edges,
    merge,
    random_edge,
    random_edges,
    random_node,
    random_nodes,
)
from networkit_spark.operators.triangles import approx_global_clustering


def test_append_disjoint_union(spark):
    g = Graph.of(spark, [(0, 1), (1, 2)], n=3)
    g1 = Graph.of(spark, [(0, 1)], n=2)
    out = append(g, g1)
    assert out.num_nodes() == 5
    assert out.num_edges() == 3
    ids = {r["id"] for r in out.nodes.collect()}
    assert ids == {0, 1, 2, 3, 4}
    pairs = {(r["src"], r["dst"]) for r in out.canonical_undirected_edges().collect()}
    assert (3, 4) in pairs


def test_merge_identifies_ids(spark):
    g = Graph.of(spark, [(0, 1)], n=3)
    g1 = Graph.of(spark, [(1, 2), (0, 1)], n=3)
    out = merge(g, g1)
    assert out.num_nodes() == 3
    assert out.num_edges() == 2  # (0,1) deduped


def test_random_sampling_deterministic(spark):
    g = Graph.of(spark, [(i, i + 1) for i in range(20)], n=21)
    assert random_node(g, seed=1) == random_node(g, seed=1)
    a = {r["id"] for r in random_nodes(g, 5, seed=2).collect()}
    b = {r["id"] for r in random_nodes(g, 5, seed=2).collect()}
    assert a == b and len(a) == 5
    assert random_edge(g, seed=3) == random_edge(g, seed=3)
    es = random_edges(g, 4, seed=4).collect()
    assert len(es) == 4


def test_index_edges_dense_and_shared(spark):
    g = Graph.of(spark, [(0, 1), (1, 2), (0, 2), (2, 3)], n=4)
    idx = index_edges(g)
    # both orientations share one id; ids are dense 0..3
    by_pair = {}
    for r in idx.collect():
        key = tuple(sorted((r["src"], r["dst"])))
        by_pair.setdefault(key, set()).add(r["edge_id"])
    assert all(len(v) == 1 for v in by_pair.values())
    all_ids = {next(iter(v)) for v in by_pair.values()}
    assert all_ids == {0, 1, 2, 3}


def test_approx_global_cc_k4_is_one(spark):
    k4 = Graph.of(spark, [(a, b) for a in range(4) for b in range(a + 1, 4)], n=4)
    assert approx_global_clustering(k4, trials=200, seed=1) == pytest.approx(1.0)


def test_approx_global_cc_near_exact(spark):
    from networkit_spark.operators.triangles import global_clustering_coefficient

    edges = [(i, (i + 1) % 12) for i in range(12)] + [(i, (i + 2) % 12) for i in range(12)]
    g = Graph.of(spark, edges, n=12)
    exact = global_clustering_coefficient(g)
    approx = approx_global_clustering(g, trials=4000, seed=7)
    assert approx == pytest.approx(exact, abs=0.12)


def test_to_weighted_and_max_degree(spark):
    g = Graph.of(spark, [(0, 1), (0, 2), (0, 3)], n=4)
    assert not g.weighted and g.to_weighted().weighted
    assert g.max_degree() == 3
    assert g.max_weighted_degree() == pytest.approx(3.0)
