"""Katz / eigenvector / k-core / BFS golden tests on tiny graphs.

Reference oracles computed with the same recurrences on numpy (semantics
match KatzCentrality.cpp:28-75 / EigenvectorCentrality.cpp:21-67 /
CoreDecomposition.cpp peeling / BFS.cpp hop counts).
"""

from __future__ import annotations

import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.kcore import core_decomposition
from networkit_spark.operators.spectral import eigenvector_centrality, katz_centrality
from networkit_spark.operators.traversal import bfs
from tests.fixtures import G8W_EDGES, G8W_EIGENVECTOR, G8W_N


def _scores(df):
    return {r["id"]: r["score"] for r in df.collect()}


def test_eigenvector_matches_numpy_power_iteration(spark):
    # NOTE: no bipartite fixtures here — power iteration with NetworKit's
    # length-only convergence check oscillates on bipartite graphs (the
    # spectrum has ±λ); the reference has the same behavior.
    import numpy as np

    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2), (1, 4)]
    n = 5
    A = np.zeros((n, n))
    for u, v in edges:
        A[u, v] = A[v, u] = 1.0
    x = np.ones(n)
    old_len = 0.0
    while True:
        x = A @ x
        ln = np.linalg.norm(x)
        x = x / ln
        if abs(ln - old_len) <= 1e-9:
            break
        old_len = ln
    g = Graph.of(spark, edges, n=n)
    s = _scores(eigenvector_centrality(g, tol=1e-9).scores)
    for i in range(n):
        assert abs(s[i] - x[i]) < 1e-6


def test_katz_matches_numpy_recurrence(spark):
    import numpy as np

    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)]
    n = 4
    A = np.zeros((n, n))
    for u, v in edges:
        A[u, v] = A[v, u] = 1.0
    max_deg = int(A.sum(axis=1).max())
    alpha, beta, tol = 1.0 / (1 + max_deg), 0.1, 1e-8
    x = np.ones(n)
    old_len = 0.0
    while True:
        x = beta + alpha * (A @ (1.0 + x))
        ln = np.linalg.norm(x)
        if abs(ln - old_len) <= tol:
            break
        old_len = ln
    expected = x / ln
    g = Graph.of(spark, edges, n=n)
    s = _scores(katz_centrality(g, tol=tol).scores)
    for i in range(n):
        assert abs(s[i] - expected[i]) < 1e-6


def test_eigenvector_g8w_golden(spark):
    # weighted 8-node golden fixture (CentralityGTest.cpp:541-565)
    g = Graph.of(spark, G8W_EDGES, n=G8W_N, weighted=True)
    s = _scores(eigenvector_centrality(g, tol=1e-9).scores)
    for i, exp in enumerate(G8W_EIGENVECTOR):
        assert abs(s[i] - exp) < 1e-4


def test_core_decomposition_kite(spark):
    # K4 on {0,1,2,3} + path 3-4-5: cores K4=3, 4 and 5 = 1, isolated 6 = 0
    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)] + [(3, 4), (4, 5)]
    g = Graph.of(spark, edges, n=7)
    cores = {r["id"]: r["core"] for r in core_decomposition(g).collect()}
    assert cores == {0: 3, 1: 3, 2: 3, 3: 3, 4: 1, 5: 1, 6: 0}


def test_bfs_undirected_and_directed(spark):
    # path 0-1-2-3 plus branch 1-4; node 5 unreachable
    g = Graph.of(spark, [(0, 1), (1, 2), (2, 3), (1, 4)], n=6)
    d = {r["node"]: r["dist"] for r in bfs(g, 0).collect()}
    assert d == {0: 0, 1: 1, 2: 2, 3: 3, 4: 2}
    gd = Graph.of(spark, [(0, 1), (1, 2), (2, 0), (3, 0)], n=4, directed=True)
    d = {r["node"]: r["dist"] for r in bfs(gd, 0).collect()}
    assert d == {0: 0, 1: 1, 2: 2}
    dr = {r["node"]: r["dist"] for r in bfs(gd, 0, reverse=True).collect()}
    assert dr == {0: 0, 2: 1, 3: 1, 1: 2}


def test_katz_warm_start_dynamic_update(spark):
    """DynKatzCentrality pattern (centrality/DynKatzCentrality.cpp): after
    an edge insertion, warm-starting from the previous fixpoint converges
    in far fewer iterations and reaches the same scores as a cold run."""
    from networkit_spark.operators.spectral import katz_centrality

    base = [(i, i + 1) for i in range(30)] + [(0, 15)]
    g0 = Graph.of(spark, base, n=31)
    r0 = katz_centrality(g0, tol=1e-9)
    assert r0.converged

    g1 = Graph.of(spark, base + [(5, 25)], n=31)
    cold = katz_centrality(g1, tol=1e-9)
    warm = katz_centrality(g1, tol=1e-9, initial_scores=r0.raw_scores)
    assert warm.converged
    assert warm.iterations < cold.iterations
    c = {r["id"]: r["score"] for r in cold.scores.collect()}
    w = {r["id"]: r["score"] for r in warm.scores.collect()}
    for v in range(31):
        assert w[v] == pytest.approx(c[v], abs=1e-5), v


def test_local_partition_coverage(spark):
    """LocalPartitionCoverage.cpp: in-cluster weight / weighted degree,
    0 for isolated nodes, 1.0 max."""
    from networkit_spark.operators.degrees import local_partition_coverage

    # two triangles {0,1,2} {3,4,5} + bridge (2,3); node 6 isolated
    edges = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    g = Graph.of(spark, edges, n=7)
    labels = spark.createDataFrame(
        [(i, 0 if i < 3 else 1) for i in range(7)], "node long, label long"
    )
    got = {r["id"]: r["score"] for r in local_partition_coverage(g, labels).collect()}
    assert got[0] == 1.0 and got[1] == 1.0
    assert abs(got[2] - 2.0 / 3.0) < 1e-12  # 2 of 3 edges internal
    assert abs(got[3] - 2.0 / 3.0) < 1e-12
    assert got[6] == 0.0


def test_incomplete_dijkstra_explored_and_bound(spark):
    """IncompleteDijkstra.cpp: explored nodes are never entered; max_dist
    truncates; unrestricted run matches sssp."""
    from networkit_spark.operators.distance import incomplete_dijkstra, sssp

    edges = [(0, 1, 1.0), (1, 2, 2.0), (0, 3, 5.0), (3, 4, 1.0), (2, 4, 1.0)]
    g = Graph.of(spark, edges, n=5, weighted=True)
    full = {r["node"]: r["dist"] for r in sssp(g, 0).collect()}
    got = {r["node"]: r["dist"] for r in incomplete_dijkstra(g, [0]).collect()}
    assert got == {k: v for k, v in full.items() if v != float("inf")} or got == full

    # exclude node 1: 2 and 4 only reachable the long way
    ex = spark.createDataFrame([(1,)], "id long")
    got2 = {r["node"]: r["dist"] for r in incomplete_dijkstra(g, [0], explored=ex).collect()}
    assert got2[3] == 5.0 and got2[4] == 6.0 and got2[2] == 7.0 and 1 not in got2

    got3 = {r["node"]: r["dist"] for r in incomplete_dijkstra(g, [0], max_dist=3.0).collect()}
    assert set(got3) == {0, 1, 2} and got3[2] == 3.0
