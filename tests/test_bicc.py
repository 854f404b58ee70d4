"""BiconnectedComponents (Tarjan-Vishkin) vs the reference fixture and a
python Hopcroft-Tarjan oracle."""

import random

import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.bicc import (
    articulation_points,
    biconnected_components,
    number_of_biconnected_components,
)

# BiconnectedComponentsGTest.cpp:20-37 — expects 4 components
TINY_EDGES = [
    (0, 1), (1, 2), (1, 3), (1, 4), (0, 5), (0, 6),
    (4, 5), (2, 3), (6, 8), (6, 7), (7, 8),
]
TINY_N = 9


def _py_bicc(n, edges):
    """Iterative Hopcroft-Tarjan: returns list of frozensets of edges."""
    adj = {u: [] for u in range(n)}
    for i, (u, v) in enumerate(edges):
        adj[u].append((v, i))
        adj[v].append((u, i))
    visited = [False] * n
    depth = [0] * n
    low = [0] * n
    parent = [None] * n
    stack_edges = []
    comps = []

    for root in range(n):
        if visited[root] or not adj[root]:
            continue
        # iterative DFS
        dfs_stack = [(root, iter(adj[root]))]
        visited[root] = True
        while dfs_stack:
            u, it = dfs_stack[-1]
            advanced = False
            for v, ei in it:
                if not visited[v]:
                    stack_edges.append(ei)
                    visited[v] = True
                    parent[v] = u
                    depth[v] = depth[u] + 1
                    low[v] = depth[v]
                    dfs_stack.append((v, iter(adj[v])))
                    advanced = True
                    break
                elif v != parent[u] and depth[v] < depth[u]:
                    stack_edges.append(ei)
                    low[u] = min(low[u], depth[v])
            if not advanced:
                dfs_stack.pop()
                if dfs_stack:
                    p = dfs_stack[-1][0]
                    low[p] = min(low[p], low[u])
                    if low[u] >= depth[p]:
                        comp = set()
                        while True:
                            ei = stack_edges.pop()
                            comp.add(ei)
                            eu, ev = edges[ei]
                            if {eu, ev} == {p, u}:
                                break
                        comps.append(frozenset(comp))
    return comps


def _same_partition(edges, spark_rows, py_comps):
    idx = {tuple(sorted(e)): i for i, e in enumerate(edges)}
    got = {}
    for r in spark_rows:
        got.setdefault(r["comp"], set()).add(idx[(r["src"], r["dst"])])
    return sorted(map(sorted, got.values())) == sorted(
        sorted(c) for c in py_comps
    )


def test_bicc_tiny_reference_fixture(spark):
    g = Graph.of(spark, TINY_EDGES, n=TINY_N)
    assert number_of_biconnected_components(g) == 4
    rows = biconnected_components(g).collect()
    assert _same_partition(TINY_EDGES, rows, _py_bicc(TINY_N, TINY_EDGES))
    arts = {r["id"] for r in articulation_points(g).collect()}
    # by hand: removing 0 or 1 disconnects; 6 separates {7,8}-cycle? no -
    # 6 is in cycle 6-7-8 AND bridges to 0 -> articulation; 4,5 are in the
    # cycle 0-1-4-5 -> not articulation
    assert arts == {0, 1, 6}


@pytest.mark.parametrize("seed", [3, 17])
def test_bicc_random_vs_hopcroft_tarjan(spark, seed):
    rnd = random.Random(seed)
    n = 24
    edges = sorted(
        {
            tuple(sorted((rnd.randrange(n), rnd.randrange(n))))
            for _ in range(34)
        }
    )
    edges = [e for e in edges if e[0] != e[1]]
    g = Graph.of(spark, edges, n=n)
    rows = biconnected_components(g).collect()
    py = _py_bicc(n, edges)
    assert len(rows) == len(edges) - sum(
        1 for u in range(n) if not any(u in e for e in edges)
    ) * 0  # every non-loop edge labeled exactly once
    assert len(rows) == len(edges)
    assert _same_partition(edges, rows, py)
