"""SpectralColoring + bfsSample (reference networkit/coloring.py,
networkit/sampling.py)."""

import numpy as np
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.coloring import (
    adjacency_eigenvectors,
    bfs_sample,
    spectral_coloring,
)


def _coloring(df):
    return {int(r["id"]): int(r["color"]) for r in df.collect()}


def _valid(coloring, edges):
    return all(coloring[u] != coloring[v] for u, v in edges if u != v)


def test_adjacency_eigenvectors_match_numpy(spark):
    # 6-cycle: eigenvalues 2cos(2πk/6) = {2, 1, 1, -1, -1, -2}
    edges = [(i, (i + 1) % 6) for i in range(6)]
    g = Graph.of(spark, edges, n=6)
    vals, vecs = adjacency_eigenvectors(g, 2, iters=200, seed=1)
    assert abs(vals[0] - (-2.0)) < 1e-6 and abs(vals[1] - (-1.0)) < 1e-4
    rows = {int(r["id"]): (float(r["v0"]), float(r["v1"])) for r in vecs.collect()}
    v0 = np.array([rows[i][0] for i in range(6)])
    # λ=-2 eigenvector of C6 is the alternating vector ±1/√6
    expect = np.array([1, -1, 1, -1, 1, -1]) / np.sqrt(6)
    assert np.allclose(v0, expect, atol=1e-6) or np.allclose(v0, -expect, atol=1e-6)
    # residual check for the deflated second pair
    A = np.zeros((6, 6))
    for u, v in edges:
        A[u, v] = A[v, u] = 1
    v1 = np.array([rows[i][1] for i in range(6)])
    assert np.linalg.norm(A @ v1 - vals[1] * v1) < 1e-3


def test_spectral_coloring_bipartite_two_colors(spark):
    # even cycle: bipartite, the bottom eigenvector splits it exactly
    g = Graph.of(spark, [(i, (i + 1) % 8) for i in range(8)], n=8)
    col = _coloring(spectral_coloring(g, max_depth=4, iters=120, seed=2))
    assert _valid(col, [(i, (i + 1) % 8) for i in range(8)])
    assert len(set(col.values())) == 2
    assert set(col.values()) == {0, 1}  # creation-order ids


def test_spectral_coloring_odd_cycle_and_clique(spark):
    edges5 = [(i, (i + 1) % 5) for i in range(5)]
    col5 = _coloring(spectral_coloring(Graph.of(spark, edges5, n=5), iters=120))
    assert _valid(col5, edges5)
    assert len(set(col5.values())) >= 3  # odd cycle needs 3
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    colk = _coloring(spectral_coloring(Graph.of(spark, k4, n=4), iters=120))
    assert _valid(colk, k4)
    assert len(set(colk.values())) == 4


def test_spectral_coloring_deterministic_and_valid_random(spark):
    rng = np.random.default_rng(7)
    edges = sorted({(int(a), int(b)) for a, b in rng.integers(0, 24, (60, 2)) if a < b})
    g = Graph.of(spark, edges, n=24)
    a = _coloring(spectral_coloring(g, seed=3))
    b = _coloring(spectral_coloring(g, seed=3))
    assert a == b
    assert _valid(a, edges)
    assert set(a.values()) == set(range(len(set(a.values()))))


def test_bfs_sample(spark):
    # path 0..9 plus a far branch: sample from 0 with k=4 keeps 0..4
    g = Graph.of(spark, [(i, i + 1) for i in range(9)], n=10)
    sub = bfs_sample(g, source=0, k=4)
    ids = {int(r["id"]) for r in sub.nodes.collect()}
    assert ids == {0, 1, 2, 3, 4}
    es = {
        (int(r["src"]), int(r["dst"]))
        for r in sub.canonical_undirected_edges().collect()
    }
    assert es == {(0, 1), (1, 2), (2, 3), (3, 4)}
    # k larger than the reachable set: everything comes back
    all_sub = bfs_sample(g, source=0, k=100)
    assert all_sub.nodes.count() == 10
