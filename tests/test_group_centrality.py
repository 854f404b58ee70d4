"""Group centralities vs the reference gtest golden and brute force."""

import itertools

import pytest

from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.group_centrality import group_closeness, group_degree

# CentralityGTest.cpp:1584-1608 fixture
GC8_EDGES = [(0, 2), (1, 2), (2, 3), (2, 4), (3, 5), (4, 5), (5, 6), (5, 7), (0, 5)]


def test_group_closeness_reference_golden(spark):
    g = Graph.of(spark, GC8_EDGES, n=8)
    group, farness = group_closeness(g, k=3)
    assert sorted(group) == [0, 2, 5]
    # farness of {0,2,5}: remaining nodes 1,3,4,6,7 all at distance 1
    assert farness == pytest.approx(5.0, abs=1e-12)


def _py_group_degree_score(adj, group, n, count_group=False):
    covered = 0
    for u in range(n):
        if u in group:
            continue
        if any(v in group for v in adj[u]):
            covered += 1
    return covered + (len(group) if count_group else 0)


def test_group_degree_beats_half_of_optimum(spark):
    """GroupDegree's greedy guarantee from the reference test
    (CentralityGTest.cpp:1408-1460): score > 0.5 * brute-force optimum."""
    import random

    rnd = random.Random(42)
    n, k = 12, 4
    edges = [(u, v) for u in range(n) for v in range(u + 1, n) if rnd.random() < 0.3]
    adj = {u: set() for u in range(n)}
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)

    g = Graph.of(spark, edges, n=n)
    group, score = group_degree(g, k=k)
    assert len(group) == k
    assert score == _py_group_degree_score(adj, set(group), n)

    opt = max(
        _py_group_degree_score(adj, set(c), n)
        for c in itertools.combinations(range(n), k)
    )
    assert score > 0.5 * opt

    # count_group_nodes variant: (1 - 1/e) * (opt + k) bound
    group2, score2 = group_degree(g, k=k, count_group_nodes=True)
    assert score2 == _py_group_degree_score(adj, set(group2), n, count_group=True)


def test_group_degree_greedy_is_exact_marginal(spark):
    """First pick must be the max-degree node (ties -> smallest id)."""
    edges = [(0, 1), (0, 2), (0, 3), (4, 5)]
    g = Graph.of(spark, edges, n=6)
    group, score = group_degree(g, k=1)
    assert group == [0]
    assert score == 3


def _ged_walk_python(edges, n, group, alpha, levels):
    """Transcription of GedWalk.cpp evaluateGroup (unweighted sym)."""
    nbrs = {u: [] for u in range(n)}
    for a, b in edges:
        nbrs[a].append(b)
        nbrs[b].append(a)
    ing = set(group)
    hit = [1.0 if u in ing else 0.0 for u in range(n)]
    miss = [0.0 if u in ing else 1.0 for u in range(n)]
    score = 0.0
    for lvl in range(1, levels + 1):
        nh, nm = [0.0] * n, [0.0] * n
        for u in range(n):
            if u in ing:
                nh[u] = sum(hit[v] + miss[v] for v in nbrs[u])
            else:
                nh[u] = sum(hit[v] for v in nbrs[u])
                nm[u] = sum(miss[v] for v in nbrs[u])
        hit, miss = nh, nm
        score += (alpha ** lvl) * sum(hit)
    return score


def test_ged_walk_score_and_greedy_group(spark):
    """ged_walk_score == reference DP transcription; the greedy group
    picks the walk-central bridge first on a barbell."""
    from networkit_spark.operators.group_centrality import (
        ged_walk_group,
        ged_walk_score,
    )

    k4a = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    k4b = [(a, b) for a in range(5, 9) for b in range(a + 1, 9)]
    edges = k4a + k4b + [(3, 4), (4, 5)]
    n = 9
    g = Graph.of(spark, edges, n=n)
    alpha = 0.2
    for group in ([4], [0, 4], [2, 7]):
        got = ged_walk_score(g, group, alpha, levels=4)
        want = _ged_walk_python(edges, n, group, alpha, 4)
        assert abs(got - want) < 1e-9, (group, got, want)

    grp = ged_walk_group(g, k=2, alpha=alpha, levels=4)
    assert len(grp) == 2
    # greedy must beat any singleton-extension baseline it considered
    s_grp = ged_walk_score(g, grp, alpha, levels=4)
    assert s_grp >= ged_walk_score(g, [0, 5], alpha, levels=4) - 1e-9


def test_group_closeness_refinements_improve_or_hold(spark):
    """LocalSwaps / GrowShrink (GroupClosenessLocalSwaps.cpp,
    GroupClosenessGrowShrink.cpp contracts): starting from a degraded
    group, each refinement's farness is <= the start's and never beats
    the optimum; membership stays valid and size-preserving."""
    import itertools
    import random

    from networkit_spark.operators.group_centrality import (
        group_closeness_grow_shrink,
        group_closeness_local_swaps,
    )

    n = 14
    rng = random.Random(21)
    edges = sorted({tuple(sorted(rng.sample(range(n), 2))) for _ in range(24)})
    g = Graph.of(spark, edges, n=n)

    # pure-python all-pairs hop distances (the graph is tiny) so the
    # exhaustive optimum does not cost 364 Spark BFS runs
    from collections import deque

    nbrs = {u: set() for u in range(n)}
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)

    def bfs(s):
        d = {s: 0}
        q = deque([s])
        while q:
            u = q.popleft()
            for w in nbrs[u]:
                if w not in d:
                    d[w] = d[u] + 1
                    q.append(w)
        return d

    D = {s: bfs(s) for s in range(n)}

    def exact_farness(S):
        tot = 0
        for x in range(n):
            ds = [D[s][x] for s in S if x in D[s]]
            if ds:
                tot += min(ds)
        return float(tot)

    # a deliberately bad starting group: three leaf-most ids
    start = [n - 1, n - 2, n - 3]
    f0 = exact_farness(start)
    best = min(
        exact_farness(list(S)) for S in itertools.combinations(range(n), 3)
    )

    for refine in (group_closeness_local_swaps, group_closeness_grow_shrink):
        grp, far = refine(g, start, 4)
        assert len(grp) == 3 and len(set(grp)) == 3
        assert all(0 <= u < n for u in grp)
        assert far == exact_farness(grp)
        assert best <= far <= f0, (refine.__name__, far, f0, best)
    # swaps must actually help from this start
    _, far_ls = group_closeness_local_swaps(g, start, 4)
    assert far_ls < f0
