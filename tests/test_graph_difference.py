"""GraphDifference + RandomSpanningForest + ApproxSpanningEdge (r7)."""

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.matching import random_spanning_forest
from networkit_spark.operators.numerics import (
    approx_spanning_edge,
    spanning_edge_centrality,
)
from networkit_spark.streaming.dynamics import apply_events, graph_difference


def test_graph_difference_edits_and_counts(spark):
    g1 = Graph.of(spark, [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 2.0)], weighted=True, n=4)
    g2 = Graph.of(spark, [(0, 1, 1.0), (2, 3, 5.0), (0, 3, 1.0)], weighted=True, n=4)
    d = graph_difference(g1, g2)
    assert d["num_edge_removals"] == 1  # (1,2)
    assert d["num_edge_additions"] == 1  # (0,3)
    assert d["num_weight_updates"] == 1  # (2,3) 2 -> 5
    assert d["num_node_removals"] == 0 and d["num_node_additions"] == 0
    assert d["num_edits"] == 3
    # replay: applying the edits to g1 reproduces g2
    g2p = apply_events(g1, d["edits"])
    a = {
        (int(r["src"]), int(r["dst"])): float(r["weight"])
        for r in g2p.edges.filter(F.col("src") <= F.col("dst")).collect()
    }
    b = {
        (int(r["src"]), int(r["dst"])): float(r["weight"])
        for r in g2.edges.filter(F.col("src") <= F.col("dst")).collect()
    }
    assert a == b


def test_graph_difference_nodes(spark):
    g1 = Graph.of(spark, [(0, 1)], n=4)  # nodes 0..3
    g2 = Graph.of(spark, [(0, 1), (5, 6)], n=7)  # adds 4..6, keeps 0..3
    d = graph_difference(g1, g2)
    assert d["num_node_additions"] == 3  # 4, 5, 6 >= g1 bound
    assert d["num_node_removals"] == 0
    g1b = Graph.of(spark, [(0, 1)], n=6)  # nodes 0..5
    g3 = Graph(
        nodes=spark.createDataFrame([(0,), (1,), (3,)], "id long"),
        edges=g1b.edges,
        directed=False,
        weighted=False,
    )
    d2 = graph_difference(g1b, g3)
    assert d2["num_node_removals"] == 3  # 2, 4, 5
    d3 = graph_difference(g3, g1b)
    # g3's bound is max id 3 + 1 = 4: node 2 restores, 4 and 5 are additions
    assert d3["num_node_restorations"] == 1
    assert d3["num_node_additions"] == 2
    with pytest.raises(ValueError):
        graph_difference(g1, Graph.of(spark, [(0, 1)], directed=True))


def test_random_spanning_forest(spark):
    K = [(a, b) for a in range(6) for b in range(a + 1, 6)]
    g = Graph.of(spark, K, n=6)
    f = {(int(r["src"]), int(r["dst"])) for r in random_spanning_forest(g, seed=3).collect()}
    assert len(f) == 5  # spanning tree of K6
    # acyclic + connected: union-find check
    parent = list(range(6))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in f:
        ru, rv = find(u), find(v)
        assert ru != rv  # no cycle
        parent[ru] = rv
    assert len({find(i) for i in range(6)}) == 1
    assert f == {
        (int(r["src"]), int(r["dst"]))
        for r in random_spanning_forest(g, seed=3).collect()
    }
    f2 = {(int(r["src"]), int(r["dst"])) for r in random_spanning_forest(g, seed=4).collect()}
    assert len(f2) == 5


def test_approx_spanning_edge_close_to_exact(spark):
    g = Graph.of(spark, [(0, 1), (1, 2), (2, 0), (2, 3)], n=4)
    exact = {
        (int(r["src"]), int(r["dst"])): float(r["score"])
        for r in spanning_edge_centrality(g).collect()
    }
    approx = {
        (int(r["src"]), int(r["dst"])): float(r["score"])
        for r in approx_spanning_edge(g, eps=0.1, seed=5).collect()
    }
    # bridge edge is exactly 1 in both; cycle edges near 2/3
    assert exact[(2, 3)] == pytest.approx(1.0, abs=1e-6)
    assert approx[(2, 3)] == pytest.approx(1.0, rel=0.25)
    for k in exact:
        assert approx[k] == pytest.approx(exact[k], rel=0.5)
    with pytest.raises(ValueError):
        approx_spanning_edge(Graph.of(spark, [], n=3))
