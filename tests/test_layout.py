"""PivotMDS + edge-crossing tests — dense-numpy replay oracle.

The oracle recomputes the whole PivotMDS pipeline (BFS/Dijkstra
distances, present-only raw-distance double centering, Gram matrix,
seeded power iteration, projection) with dense numpy — independent of
every Spark code path except the pivot draw, which is read back from
``_pivot_table`` so both sides embed the same CSR columns.
"""

import numpy as np
import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.layout import (
    _pivot_table,
    num_edge_crossings,
    pivot_mds,
)


def _dense_dists(n, edges, src, weighted=False):
    """O(n²) Dijkstra/BFS; returns (dist array, reached mask)."""
    adj = {u: [] for u in range(n)}
    for e in edges:
        u, v = e[0], e[1]
        w = float(e[2]) if weighted else 1.0
        adj[u].append((v, w))
        adj[v].append((u, w))
    dist = np.full(n, np.inf)
    dist[src] = 0.0
    done = np.zeros(n, dtype=bool)
    for _ in range(n):
        cand = np.where(~done, dist, np.inf)
        u = int(np.argmin(cand))
        if not np.isfinite(cand[u]):
            break
        done[u] = True
        for v, w in adj[u]:
            if dist[u] + w < dist[v]:
                dist[v] = dist[u] + w
    return dist, np.isfinite(dist)


def _dense_pivot_mds(n, edges, pivot_rows, dim, seed, weighted=False):
    k = len(pivot_rows)
    D = np.zeros((n, k))
    present = np.zeros((n, k), dtype=bool)
    for root, j in pivot_rows:
        d, reach = _dense_dists(n, edges, root, weighted)
        D[reach, j] = d[reach]
        present[reach, j] = True
    rm = np.where(present, D, 0.0).sum(axis=1) / k
    cm = np.where(present, D, 0.0).sum(axis=0) / n
    g = np.where(present, D, 0.0).sum() / (n * k)
    B = np.where(present, D - rm[:, None] - cm[None, :] + g, 0.0)
    CC = B.T @ B
    pos = np.zeros((n, dim))
    for d in range(dim):
        rng = np.random.default_rng(seed * 1009 + d)
        x = 2.0 * rng.random(k) - 1.0
        for _ in range(1500):
            old = x
            x = CC @ old
            norm = np.linalg.norm(x)
            if norm == 0.0:
                x = old
                break
            x = x / norm
            if np.linalg.norm(x - old) <= 1e-6:
                break
        denom = float(x @ x)
        lam = float(x @ (CC @ x)) / denom if denom else 0.0
        pos[:, d] = B @ x
        CC = CC - (lam / (denom if denom else 1.0)) * np.outer(x, x)
    return pos


def _collect_pos(df):
    return {r["id"]: list(r["pos"]) for r in df.collect()}


def test_pivot_mds_matches_dense_replay_unweighted(spark):
    # two cycles bridged by a path + two isolated nodes (exercises the
    # present-only centering: isolated pivots/nodes stay exact 0 in C)
    n = 32
    edges = [(i, (i + 1) % 10) for i in range(10)]
    edges += [(10 + i, 10 + (i + 1) % 10) for i in range(10)]
    edges += [(9, 20), (20, 21), (21, 10), (5, 25), (25, 26)]
    g = Graph.of(spark, edges, n=n)
    piv = [(r["root"], r["j"]) for r in _pivot_table(g, 8, 42).collect()]
    assert len(piv) == 8
    got = _collect_pos(pivot_mds(g, dim=2, num_pivots=8, seed=42))
    want = _dense_pivot_mds(n, edges, piv, dim=2, seed=42)
    scale = max(1.0, float(np.abs(want).max()))
    for i in range(n):
        assert got[i] == pytest.approx(list(want[i]), abs=1e-6 * scale)


def test_pivot_mds_matches_dense_replay_weighted(spark):
    n = 12
    edges = [(i, i + 1, 1.0 + (i % 3)) for i in range(n - 1)] + [
        (0, 6, 0.5),
        (3, 9, 2.5),
    ]
    g = Graph.of(spark, edges, n=n, weighted=True)
    piv = [(r["root"], r["j"]) for r in _pivot_table(g, 5, 7).collect()]
    got = _collect_pos(pivot_mds(g, dim=2, num_pivots=5, seed=7))
    want = _dense_pivot_mds(n, edges, piv, dim=2, seed=7, weighted=True)
    scale = max(1.0, float(np.abs(want).max()))
    for i in range(n):
        assert got[i] == pytest.approx(list(want[i]), abs=1e-6 * scale)


def test_pivot_mds_path_is_monotone_and_clamps_pivots(spark):
    # all-pivots path graph == classical MDS of the centered distance
    # matrix: the principal axis orders the path monotonically.
    # num_pivots=99 > n exercises the reference's clamp branch.
    n = 10
    g = Graph.of(spark, [(i, i + 1) for i in range(n - 1)], n=n)
    pos = _collect_pos(pivot_mds(g, dim=2, num_pivots=99, seed=42))
    xs = [pos[i][0] for i in range(n)]
    diffs = np.diff(xs)
    assert np.all(diffs > 0) or np.all(diffs < 0)


def test_num_edge_crossings_cross_and_parallel(spark):
    g = Graph.of(spark, [(0, 1), (2, 3)], n=4)
    cross = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 1.0]), (2, [0.0, 1.0]), (3, [1.0, 0.0])],
        "id long, pos array<double>",
    )
    assert num_edge_crossings(g, cross) == 1
    flat = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 1.0])],
        "id long, pos array<double>",
    )
    assert num_edge_crossings(g, flat) == 0


def test_num_edge_crossings_guard(spark):
    g = Graph.of(spark, [(0, 1), (1, 2), (2, 0)], n=3)
    coords = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "id long, pos array<double>",
    )
    with pytest.raises(ValueError, match="max_edges"):
        num_edge_crossings(g, coords, max_edges=2)
    # reference quirk: edges sharing an endpoint count as "crossing"
    # when the shared point lies inside both segments' x-ranges — the
    # triangle's ordered-pair trace gives 3 counts // 2 == 1 in the C++
    # arithmetic, and the NULL-propagating Spark version lands on the
    # same total
    assert num_edge_crossings(g, coords, max_edges=None) == 1
