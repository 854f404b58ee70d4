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


def _hop_dists(edges, n):
    from collections import deque

    nbrs = {u: set() for u in range(n)}
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    D = {}
    for s in range(n):
        d = {s: 0}
        q = deque([s])
        while q:
            u = q.popleft()
            for w in nbrs[u]:
                if w not in d:
                    d[w] = d[u] + 1
                    q.append(w)
        D[s] = d
    return D


def _harmonic_score(D, n, S):
    tot = 0.0
    for v in range(n):
        if v in S:
            continue
        ds = [D[s][v] for s in S if v in D[s]]
        if ds and min(ds) > 0:
            tot += 1.0 / min(ds)
    return tot


def test_group_harmonic_closeness_greedy_and_quality(spark):
    """group_harmonic_closeness follows the exact-marginal greedy
    (smallest-id ties) and clears the gtest quality bar
    (CentralityGTest.cpp:2122-2183): score/opt >= (1 - 1/e)/2 on
    undirected unweighted graphs, group size k, members unique; k
    bounds raise like the reference ctor."""
    import itertools
    import math
    import random

    from networkit_spark.operators.group_centrality import group_harmonic_closeness

    n = 14
    rng = random.Random(5)
    edges = sorted({tuple(sorted(rng.sample(range(n), 2))) for _ in range(24)})
    g = Graph.of(spark, edges, n=n)
    D = _hop_dists(edges, n)

    def py_greedy(k):
        group, best = [], {}
        for _ in range(k):
            gains = {}
            for u in range(n):
                if u in group:
                    continue
                gain = 0.0
                for v, du in D[u].items():
                    if v == u or v in group or du <= 0:
                        continue
                    bd = best.get(v)
                    if bd is None or du < bd:
                        gain += 1.0 / du - (1.0 / bd if bd is not None else 0.0)
                if u in best:
                    gain -= 1.0 / best[u]
                gains[u] = gain
            u = min(gains, key=lambda x: (-gains[x], x))
            group.append(u)
            for v, d in D[u].items():
                if d > 0 and (best.get(v) is None or d < best[v]):
                    best[v] = d
            for m in group:
                best.pop(m, None)
        return group, sum(1.0 / d for d in best.values())

    for k in (2, 3):
        got_group, got_score = group_harmonic_closeness(g, k=k)
        want_group, want_score = py_greedy(k)
        assert got_group == want_group, (k, got_group, want_group)
        assert got_score == pytest.approx(want_score, abs=1e-9)
        assert got_score == pytest.approx(
            _harmonic_score(D, n, set(got_group)), abs=1e-9
        )
        opt = max(
            _harmonic_score(D, n, set(S))
            for S in itertools.combinations(range(n), k)
        )
        ratio = (1.0 - 1.0 / math.e) / 2.0
        assert opt >= got_score - 1e-9
        assert got_score / opt >= ratio, (k, got_score, opt)

    with pytest.raises(ValueError, match=r"k must be"):
        group_harmonic_closeness(g, k=0)
    with pytest.raises(ValueError, match=r"k must be"):
        group_harmonic_closeness(g, k=n)


def test_group_closeness_local_search_refines_to_local_opt(spark):
    """group_closeness_local_search
    (GroupClosenessLocalSearch.cpp): refined farness <= start and >= the
    exhaustive optimum across 3 seeds; at convergence NO swap clears the
    1/(k(n-k)) relative-decrease bar (insuffcientDecrease:139-144);
    empty groups raise (gtest contract)."""
    import itertools
    import random

    from networkit_spark.operators.group_centrality import (
        group_closeness_local_search,
    )

    n, k = 13, 3
    for seed in (1, 2, 3):
        rng = random.Random(seed)
        edges = sorted({tuple(sorted(rng.sample(range(n), 2))) for _ in range(22)})
        g = Graph.of(spark, edges, n=n)
        D = _hop_dists(edges, n)

        def far(S):
            tot = 0
            for v in range(n):
                ds = [D[s][v] for s in S if v in D[s]]
                if ds:
                    tot += min(ds)
            return float(tot)

        start = [n - 1, n - 2, n - 3]
        grp, f, iters = group_closeness_local_search(
            g, start, run_grow_shrink=False
        )
        assert len(grp) == k == len(set(grp))
        assert f == far(grp)
        assert f <= far(start)
        opt = min(far(list(S)) for S in itertools.combinations(range(n), k))
        assert f >= opt
        # local optimality under the reference's acceptance bar
        thr = 1.0 / (k * (n - k))
        for u in grp:
            for v in range(n):
                if v in grp:
                    continue
                nf = far(sorted(set(grp) - {u} | {v}))
                assert (f - nf) / f < thr, (seed, u, v, f, nf)

    # grow-shrink preprocessing only helps
    _, f_gs, _ = group_closeness_local_search(g, start, run_grow_shrink=True)
    assert f_gs <= far(start)

    with pytest.raises(ValueError, match="empty"):
        group_closeness_local_search(g, [], run_grow_shrink=False)


def test_swap_eval_exact_on_disconnected_graph(spark):
    """Regression for the swap-evaluation decomposition: on a
    DISCONNECTED graph the (u, v) farness must count group-reached nodes
    that the candidate does not reach (the old full-outer shape dropped
    them when another candidate reached the node). local_swaps and
    local_search replay a python best-improvement transcription
    exactly."""
    from networkit_spark.operators.group_centrality import (
        group_closeness_local_search,
        group_closeness_local_swaps,
    )

    # two components: a 6-star (0 center) and a 4-path
    edges = [(0, 1), (0, 2), (0, 3), (0, 4), (0, 5), (6, 7), (7, 8), (8, 9)]
    n = 10
    g = Graph.of(spark, edges, n=n)
    D = _hop_dists(edges, n)

    def far(S):
        tot = 0
        for v in range(n):
            ds = [D[s][v] for s in S if v in D[s]]
            if ds:
                tot += min(ds)
        return float(tot)

    start = [5, 9]  # a star leaf + a path end: both bad
    grp, f, _ = group_closeness_local_search(g, start, run_grow_shrink=False)
    assert f == far(grp)
    # best-improvement first swap under the reference's REACHABLE-ONLY
    # farness convention (GroupClosenessLocalSearch.cpp
    # traversalFromGroup:326-355 sums only BFS-visited nodes): dropping
    # the star coverage entirely scores best — farness({6,9}) counts
    # just nodes 7, 8 at distance 1. Pre-fix, the undercounting
    # decomposition scored these swaps wrongly; now the applied swap's
    # farness must equal the brute-force value exactly.
    assert grp == [6, 9] and f == 2.0

    grp2, f2 = group_closeness_local_swaps(g, start, max_swaps=4, beam=9)
    assert f2 == far(grp2)
    assert grp2 == [6, 9] and f2 == 2.0


def test_group_refinements_weighted_dispatch(spark):
    """On WEIGHTED graphs the refinement passes evaluate farness over
    Dijkstra distances (the reference's edgeweight template), not hop
    counts: local_search from a bad seed converges to the brute-force
    weighted optimum on a small fixture."""
    import heapq
    import itertools

    from networkit_spark.operators.group_centrality import (
        group_closeness_local_search,
        group_closeness_local_swaps,
    )

    # weighted wheel-ish fixture where the hop-optimal and the
    # weight-optimal 2-groups differ: hub 0 has CHEAP spokes to 1..3 and
    # expensive spokes to 4..6; node 7 bridges 4..6 cheaply
    edges = [(0, 1, 1.0), (0, 2, 1.0), (0, 3, 1.0),
             (0, 4, 10.0), (0, 5, 10.0), (0, 6, 10.0),
             (7, 4, 1.0), (7, 5, 1.0), (7, 6, 1.0), (0, 7, 2.0)]
    n = 8
    g = Graph.of(spark, edges, n=n, weighted=True)

    nbrs = {u: [] for u in range(n)}
    for a, b, w in edges:
        nbrs[a].append((b, w))
        nbrs[b].append((a, w))

    def dij(s):
        dist = {s: 0.0}
        pq = [(0.0, s)]
        while pq:
            d, u = heapq.heappop(pq)
            if d > dist.get(u, 1e18):
                continue
            for w, c in nbrs[u]:
                if d + c < dist.get(w, 1e18):
                    dist[w] = d + c
                    heapq.heappush(pq, (d + c, w))
        return dist

    D = {s: dij(s) for s in range(n)}

    def far(S):
        return float(sum(min(D[s][x] for s in S) for x in range(n)))

    opt = min(far(list(S)) for S in itertools.combinations(range(n), 2))
    grp, f, _ = group_closeness_local_search(g, [5, 6], run_grow_shrink=False)
    assert f == far(grp)
    assert f == opt  # {0, 7} at weighted farness; hop farness would differ
    assert sorted(grp) == [0, 7]

    grp2, f2 = group_closeness_local_swaps(g, [5, 6], max_swaps=4, beam=7)
    assert f2 == far(grp2) and f2 <= far([5, 6])


def test_group_family_all_pairs_guards(spark):
    """The all-pairs defaults of the group family raise above max_nodes
    (the cut_clustering/DynBetweennessOneNode convention); small-graph
    results are unchanged by the guard plumbing, and an explicit
    `sources`/`beam` restriction bypasses the cap entirely."""
    from networkit_spark.operators.group_centrality import (
        group_closeness_local_search,
        group_harmonic_closeness,
    )

    g = Graph.of(spark, GC8_EDGES, n=8)
    with pytest.raises(ValueError, match="max_nodes"):
        group_closeness(g, k=3, max_nodes=4)
    with pytest.raises(ValueError, match="max_nodes"):
        group_harmonic_closeness(g, k=3, max_nodes=4)
    with pytest.raises(ValueError, match="max_nodes"):
        group_closeness_local_search(g, [0, 1], max_nodes=4)

    # restricted runs do not hit the guard even under a tiny cap
    srcs = g.nodes.filter(F.col("id") < 5)
    group_harmonic_closeness(g, k=2, sources=srcs, max_nodes=4)
    group_closeness_local_search(
        g, [0, 1], run_grow_shrink=False, max_iterations=1, beam=3, max_nodes=4
    )

    # guard plumbing leaves small-graph answers unchanged
    grp_default, f_default = group_closeness(g, k=3)
    grp_optout, f_optout = group_closeness(g, k=3, max_nodes=None)
    assert grp_default == grp_optout and f_default == f_optout
