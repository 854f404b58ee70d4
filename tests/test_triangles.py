import numpy as np
import pytest

from networkit_spark.graph import Graph
from networkit_spark.generators import erdos_renyi, complete
from networkit_spark.operators.triangles import (
    avg_local_clustering_coefficient,
    global_clustering_coefficient,
    local_clustering_coefficient,
    total_triangles,
    triangle_count_per_edge,
    triangle_count_per_node,
)

from tests.fixtures import G8W_EDGES, G8W_N, K4_EDGES, numpy_triangles_per_node


def _per_node(df, n):
    rows = {r["id"]: r["triangles"] for r in df.collect()}
    return np.array([rows[i] for i in range(n)])


def test_k4(spark):
    """FIXTURES §2.6: K4 → tri/node=3, total=4, all CCs = 1.0."""
    g = Graph.of(spark, K4_EDGES, n=4)
    assert (_per_node(triangle_count_per_node(g), 4) == 3).all()
    assert total_triangles(g) == 4
    assert global_clustering_coefficient(g) == pytest.approx(1.0)
    lcc = {r["id"]: r["lcc"] for r in local_clustering_coefficient(g).collect()}
    assert all(v == pytest.approx(1.0) for v in lcc.values())
    per_edge = triangle_count_per_edge(g)
    assert all(r["triangles"] == 2 for r in per_edge.collect())


def test_g8w_vs_algebraic_oracle(spark):
    """tri(u) = diag(A³)/2 (AlgebraicTriangleCounting.hpp:59-71)."""
    g = Graph.of(spark, G8W_EDGES, n=G8W_N, weighted=True)
    exp = numpy_triangles_per_node(G8W_N, G8W_EDGES)
    got = _per_node(triangle_count_per_node(g), G8W_N)
    assert (got == exp).all()


def test_er_graphs_vs_oracle(spark):
    n = 60
    for p, seed in [(0.1, 1), (0.25, 2)]:
        g = erdos_renyi(spark, n, p, seed=seed)
        edges = [(r["src"], r["dst"]) for r in g.canonical_undirected_edges().collect()]
        exp = numpy_triangles_per_node(n, edges)
        got = _per_node(triangle_count_per_node(g), n)
        assert (got == exp).all()
        # global CC via numpy too
        deg = np.zeros(n)
        for u, v in edges:
            deg[u] += 1
            deg[v] += 1
        wedges = (deg * (deg - 1)).sum()
        exp_gcc = 2.0 * exp.sum() / wedges
        assert global_clustering_coefficient(g) == pytest.approx(exp_gcc)


def test_self_loops_and_multiedges_ignored(spark):
    """Triangle counting runs on the simple graph: loops and duplicate
    edges must not create phantom triangles."""
    edges = K4_EDGES + [(0, 0), (1, 1), (0, 1), (1, 0)]
    g = Graph.of(spark, edges, n=4)
    assert total_triangles(g) == 4
    assert (_per_node(triangle_count_per_node(g), 4) == 3).all()


def test_directed_graph_counts_underlying_undirected(spark):
    g = Graph.of(spark, [(0, 1), (1, 2), (2, 0)], n=3, directed=True)
    assert total_triangles(g) == 1


def test_avg_local_cc_k5_minus_edge(spark):
    g = complete(spark, 5)
    assert avg_local_clustering_coefficient(g) == pytest.approx(1.0)
