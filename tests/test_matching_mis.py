"""Luby MIS, suitor matching, Borůvka spanning forest tests."""

from __future__ import annotations

import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.matching import (
    luby_independent_set,
    spanning_forest,
    suitor_matching,
)


def test_luby_is_maximal_independent(spark):
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0), (1, 3)]
    g = Graph.of(spark, edges, n=6)  # node 5 isolated → always in the set
    sel = {r["id"] for r in luby_independent_set(g, seed=5).collect() if r["in_set"]}
    assert 5 in sel
    # independent: no edge inside the set
    assert not any(u in sel and v in sel for u, v in edges)
    # maximal: every non-member has a neighbor in the set
    nbrs = {}
    for u, v in edges:
        nbrs.setdefault(u, set()).add(v)
        nbrs.setdefault(v, set()).add(u)
    for node in range(5):
        if node not in sel:
            assert nbrs[node] & sel


def test_suitor_matching_prefers_heavy_edges(spark):
    # path 0-1-2-3 with middle edge heaviest → match (1,2) and leave 0,3
    g = Graph.of(spark, [(0, 1, 1.0), (1, 2, 9.0), (2, 3, 1.0)], n=4, weighted=True)
    m = {(r["u"], r["v"]) for r in suitor_matching(g).collect()}
    assert m == {(1, 2)}
    # two disjoint heavy edges both match
    g2 = Graph.of(spark, [(0, 1, 5.0), (2, 3, 5.0), (1, 2, 1.0)], n=4, weighted=True)
    m2 = {(r["u"], r["v"]) for r in suitor_matching(g2).collect()}
    assert m2 == {(0, 1), (2, 3)}


def test_matching_is_valid(spark):
    edges = [(0, 1, 3.0), (1, 2, 2.0), (2, 3, 4.0), (3, 0, 1.0), (1, 3, 5.0)]
    g = Graph.of(spark, edges, n=4, weighted=True)
    m = [(r["u"], r["v"]) for r in suitor_matching(g).collect()]
    seen = [x for uv in m for x in uv]
    assert len(seen) == len(set(seen))  # no node matched twice
    assert all((u, v) in {(a, b) for a, b, _ in edges} or (v, u) in {(a, b) for a, b, _ in edges} for u, v in m)


def test_spanning_forest_mst(spark):
    # known MST: square with diagonal
    edges = [(0, 1, 1.0), (1, 2, 2.0), (2, 3, 1.0), (3, 0, 3.0), (0, 2, 5.0)]
    g = Graph.of(spark, edges, n=4, weighted=True)
    f = {(r["src"], r["dst"]): r["weight"] for r in spanning_forest(g).collect()}
    assert set(f) == {(0, 1), (1, 2), (2, 3)}
    assert sum(f.values()) == 4.0
    # forest on a disconnected graph: one tree per component, n - #comp edges
    g2 = Graph.of(spark, [(0, 1, 1.0), (2, 3, 1.0)], n=5, weighted=True)
    assert spanning_forest(g2).count() == 2


def test_luby_empty_graph(spark):
    from networkit_spark.graph import Graph
    from networkit_spark.operators.matching import luby_independent_set

    empty_nodes = spark.createDataFrame([], "id long")
    empty_edges = spark.createDataFrame([], "src long, dst long, weight double")
    g = Graph(nodes=empty_nodes, edges=empty_edges, directed=False)
    assert luby_independent_set(g).count() == 0


def test_suitor_matching_is_maximal_on_increasing_path(spark):
    """A path with strictly increasing weights matches one pair per round;
    the loop must run to exhaustion, not a fixed cap (SuitorMatcher is
    always maximal)."""
    from networkit_spark.graph import Graph
    from networkit_spark.operators.matching import suitor_matching

    n = 24
    edges = [(i, i + 1, float(i + 1)) for i in range(n - 1)]
    g = Graph.of(spark, edges, n=n, weighted=True)
    pairs = [(r["u"], r["v"]) for r in suitor_matching(g).collect()]
    matched = {x for uv in pairs for x in uv}
    # maximality: no live edge between two unmatched nodes remains
    for u, v, _ in edges:
        assert u in matched or v in matched, (u, v, sorted(pairs))


def _cut_clustering_python(edges, n, alpha):
    """Transcription of community/CutClustering.cpp over a python
    Edmonds-Karp (augmented sink t = n, capacity alpha to every node)."""
    from collections import defaultdict, deque

    cap = defaultdict(float)
    adj = defaultdict(set)

    def add(u, v, w):
        cap[(u, v)] += w
        cap[(v, u)] += w
        adj[u].add(v)
        adj[v].add(u)

    for a, b in edges:
        add(a, b, 1.0)
    t = n
    for u in range(n):
        add(u, t, alpha)

    def min_cut_source_side(s):
        res = dict(cap)
        while True:
            # BFS augmenting path
            par = {s: None}
            q = deque([s])
            while q and t not in par:
                x = q.popleft()
                for y in adj[x]:
                    if y not in par and res.get((x, y), 0) > 1e-12:
                        par[y] = x
                        q.append(y)
            if t not in par:
                break
            path = []
            y = t
            while par[y] is not None:
                path.append((par[y], y))
                y = par[y]
            aug = min(res[(a, b)] for a, b in path)
            for a, b in path:
                res[(a, b)] -= aug
                res[(b, a)] = res.get((b, a), 0) + aug
        seen = {s}
        q = deque([s])
        while q:
            x = q.popleft()
            for y in adj[x]:
                if y not in seen and res.get((x, y), 0) > 1e-12:
                    seen.add(y)
                    q.append(y)
        return seen - {t}

    deg = defaultdict(int)
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    labels = {}
    for u in sorted(range(n), key=lambda x: (-deg[x], x)):
        if u in labels:
            continue
        for v in min_cut_source_side(u):
            labels[v] = u
    return labels


def test_cut_clustering_matches_python_oracle(spark):
    """cut_clustering == reference-transcribed min-cut oracle on a
    planted two-clique graph and a seeded random graph."""
    import random

    from networkit_spark.operators.flow import cut_clustering

    k5a = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    k5b = [(a, b) for a in range(5, 10) for b in range(a + 1, 10)]
    planted = k5a + k5b + [(4, 5)]
    g = Graph.of(spark, planted, n=10)
    got = {r["node"]: r["label"] for r in cut_clustering(g, alpha=0.3).collect()}
    want = _cut_clustering_python(planted, 10, 0.3)
    assert got == want
    # the two cliques separate at this alpha
    assert {got[i] for i in range(5)}.isdisjoint({got[i] for i in range(5, 10)})

    rng = random.Random(4)
    edges = sorted({tuple(sorted(rng.sample(range(10), 2))) for _ in range(16)})
    g2 = Graph.of(spark, edges, n=10)
    got2 = {r["node"]: r["label"] for r in cut_clustering(g2, alpha=0.4).collect()}
    assert got2 == _cut_clustering_python(edges, 10, 0.4)


def test_path_growing_matcher(spark):
    """path_growing_matcher (matching/PathGrowingMatcher.cpp,
    MatcherGTest.cpp:90-110): perfect matching on the 50-clique, proper
    matchings everywhere, the Drake-Hougardy 1/2 guarantee on weighted
    fixtures, and the reference's contract raises (directed graphs,
    self-loops, the max_edges driver-state guard)."""
    import itertools
    import random

    from networkit_spark.operators.matching import path_growing_matcher

    # 50-clique -> proper perfect matching (the reference gtest)
    n = 50
    clique = [(a, b) for a in range(n) for b in range(a + 1, n)]
    got = path_growing_matcher(Graph.of(spark, clique, n=n)).collect()
    seen = [x for r in got for x in (r["src"], r["dst"])]
    assert len(got) == n // 2 and len(set(seen)) == len(seen) == n

    # weighted 1/2-approximation vs brute force, three seeds
    for seed in (1, 2, 3):
        rng = random.Random(seed)
        m = 10
        edges = sorted(
            (a, b, float(rng.randint(1, 9)))
            for a, b in {tuple(sorted(rng.sample(range(m), 2))) for _ in range(18)}
        )
        g = Graph.of(spark, edges, n=m, weighted=True)
        rows = path_growing_matcher(g).collect()
        ends = [x for r in rows for x in (r["src"], r["dst"])]
        assert len(set(ends)) == len(ends)  # proper
        wgot = sum(r["weight"] for r in rows)

        def best_matching(es):
            best = 0.0
            for k in range(1, len(es) + 1):
                for comb in itertools.combinations(es, k):
                    nodes = [x for a, b, _ in comb for x in (a, b)]
                    if len(set(nodes)) == len(nodes):
                        best = max(best, sum(w for *_, w in comb))
            return best

        opt = best_matching(edges)
        assert wgot >= 0.5 * opt - 1e-9, (seed, wgot, opt)

    # contract raises
    gd = Graph.of(spark, [(0, 1)], n=2, directed=True)
    with pytest.raises(ValueError, match="undirected"):
        path_growing_matcher(gd)
    gl = Graph.of(spark, [(0, 0), (0, 1)], n=2)
    with pytest.raises(ValueError, match="self-loops"):
        path_growing_matcher(gl)
    gbig = Graph.of(spark, clique, n=n)
    with pytest.raises(ValueError, match="max_edges"):
        path_growing_matcher(gbig, max_edges=10)
