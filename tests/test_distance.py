"""Distance kernels vs numpy oracles: Brandes betweenness, closeness,
harmonic, diameter, Bellman-Ford SSSP, SCC."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.distance import (
    betweenness,
    closeness_centrality,
    diameter_exact,
    diameter_range,
    estimate_betweenness,
    harmonic_closeness,
    multi_source_bfs,
    sssp,
)
from networkit_spark.operators.scc import strongly_connected_components
from tests.fixtures import G8W_EDGES, G8W_N


def _adj(n, edges, directed=False, weighted=False):
    INF = float("inf")
    D = np.full((n, n), INF)
    np.fill_diagonal(D, 0.0)
    for e in edges:
        u, v = int(e[0]), int(e[1])
        w = float(e[2]) if (weighted and len(e) > 2) else 1.0
        D[u, v] = min(D[u, v], w)
        if not directed:
            D[v, u] = min(D[v, u], w)
    return D


def _floyd(D):
    n = D.shape[0]
    D = D.copy()
    for k in range(n):
        D = np.minimum(D, D[:, k:k + 1] + D[k:k + 1, :])
    return D


def numpy_brandes(n, edges, directed=False):
    """Exact Brandes over unweighted hops (Betweenness.cpp:47-78)."""
    adj = [[] for _ in range(n)]
    for e in edges:
        u, v = int(e[0]), int(e[1])
        adj[u].append(v)
        if not directed:
            adj[v].append(u)
    bc = np.zeros(n)
    for s in range(n):
        sigma = np.zeros(n)
        sigma[s] = 1
        dist = np.full(n, -1)
        dist[s] = 0
        order = [s]
        q = [s]
        while q:
            nq = []
            for u in q:
                for w in adj[u]:
                    if dist[w] < 0:
                        dist[w] = dist[u] + 1
                        nq.append(w)
                        order.append(w)
            for u in q:
                for w in adj[u]:
                    if dist[w] == dist[u] + 1:
                        sigma[w] += sigma[u]
            q = nq
        delta = np.zeros(n)
        for w in reversed(order):
            for v in adj[w]:
                if dist[v] == dist[w] + 1:
                    delta[w] += sigma[w] / sigma[v] * (1 + delta[v])
            if w != s:
                bc[w] += delta[w]
    return bc


G10 = [(0, 1), (1, 2), (2, 3), (3, 4), (1, 5), (5, 6), (6, 2), (4, 7), (7, 8), (8, 9), (9, 4), (0, 9)]


def test_msbfs_distances(spark):
    g = Graph.of(spark, G10, n=10)
    res = multi_source_bfs(g, spark.range(10).select("id"))
    got = {(r["root"], r["node"]): r["dist"] for r in res.visited.collect()}
    D = _floyd(_adj(10, G10))
    for i in range(10):
        for j in range(10):
            if np.isfinite(D[i, j]):
                assert got[(i, j)] == int(D[i, j]), (i, j)


def test_betweenness_exact_vs_numpy(spark):
    g = Graph.of(spark, G10, n=10)
    got = {r["id"]: r["score"] for r in betweenness(g).collect()}
    exp = numpy_brandes(10, G10)
    for i in range(10):
        assert got[i] == pytest.approx(exp[i], abs=1e-9), i


def test_betweenness_g8w_unweighted_view(spark):
    edges = [(u, v) for u, v, _ in G8W_EDGES]
    g = Graph.of(spark, edges, n=G8W_N)
    got = {r["id"]: r["score"] for r in betweenness(g, normalized=True).collect()}
    exp = numpy_brandes(G8W_N, edges) / ((G8W_N - 1) * (G8W_N - 2))
    for i in range(G8W_N):
        assert got[i] == pytest.approx(exp[i], abs=1e-9), i


def test_estimate_betweenness_all_sources(spark):
    """With n_samples == n the estimator touches every source; the
    linear-scaled estimator is deterministic and bounded by 2n/k scaling."""
    g = Graph.of(spark, G10, n=10)
    got = {r["id"]: r["score"] for r in estimate_betweenness(g, n_samples=10).collect()}
    assert len(got) == 10
    assert all(v >= 0 for v in got.values())
    # exact-sample estimate must rank the articulation chain nodes high
    exact = numpy_brandes(10, G10)
    top_exact = int(np.argmax(exact))
    assert got[top_exact] >= np.median(list(got.values()))


def test_closeness_standard_and_normalized(spark):
    g = Graph.of(spark, G10, n=10)
    D = _floyd(_adj(10, G10))
    got = {r["id"]: r["score"] for r in closeness_centrality(g).collect()}
    gotn = {
        r["id"]: r["score"]
        for r in closeness_centrality(g, normalized=True).collect()
    }
    for i in range(10):
        s = D[i][np.isfinite(D[i])].sum()
        assert got[i] == pytest.approx(1.0 / s, abs=1e-12)
        assert gotn[i] == pytest.approx(9.0 / s, abs=1e-12)


def test_closeness_disconnected_generalized(spark):
    edges = [(0, 1), (1, 2), (3, 4)]
    g = Graph.of(spark, edges, n=6)  # node 5 isolated
    got = {r["id"]: r["score"] for r in closeness_centrality(g, variant="generalized").collect()}
    # node 0: reaches 1 (d1), 2 (d2) -> (r)/sum/(n-1) with reached counted
    # per reference: reached includes the root; score=(reached-1)/sum... our
    # agg counts reached-1 directly (dist>0 rows)
    assert got[5] == 0.0
    assert got[0] == pytest.approx((2) / 3.0 / 5.0, abs=1e-12)
    assert got[3] == pytest.approx((1) / 1.0 / 5.0, abs=1e-12)


def test_harmonic(spark):
    g = Graph.of(spark, G10, n=10)
    D = _floyd(_adj(10, G10))
    got = {r["id"]: r["score"] for r in harmonic_closeness(g).collect()}
    for i in range(10):
        s = (1.0 / D[i][(D[i] > 0) & np.isfinite(D[i])]).sum()
        assert got[i] == pytest.approx(s, abs=1e-12)


def test_diameter(spark):
    g = Graph.of(spark, G10, n=10)
    D = _floyd(_adj(10, G10))
    exact = int(D[np.isfinite(D)].max())
    assert diameter_exact(g) == exact
    lb, ub = diameter_range(g)
    assert lb <= exact <= ub


def test_sssp_weighted(spark):
    w_edges = [(u, v, (u + v) % 5 + 1.0) for u, v in G10]
    g = Graph.of(spark, w_edges, n=10, weighted=True)
    D = _floyd(_adj(10, w_edges, weighted=True))
    got = {r["node"]: r["dist"] for r in sssp(g, 0).collect()}
    for i in range(10):
        assert got[i] == pytest.approx(D[0, i], abs=1e-9), i


def test_sssp_unreachable_absent(spark):
    g = Graph.of(spark, [(0, 1, 2.0)], n=3, weighted=True)
    got = {r["node"]: r["dist"] for r in sssp(g, 0).collect()}
    assert got == {0: 0.0, 1: 2.0}


def numpy_scc(n, edges):
    """Tarjan-free oracle: mutual reachability via boolean closure."""
    R = np.eye(n, dtype=bool)
    for u, v in edges:
        R[u, v] = True
    for k in range(n):
        R = R | (R[:, k:k + 1] & R[k:k + 1, :])
    label = np.arange(n)
    for i in range(n):
        for j in range(n):
            if R[i, j] and R[j, i]:
                label[j] = min(label[j], label[i])
    return label


DG = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5), (5, 3), (6, 6), (1, 6), (7, 0)]


def test_scc_vs_numpy(spark):
    g = Graph.of(spark, DG, n=8, directed=True)
    got = {r["node"]: r["label"] for r in strongly_connected_components(g).collect()}
    exp = numpy_scc(8, [(u, v) for u, v in DG])
    assert len(got) == 8
    for i in range(8):
        assert got[i] == exp[i], (i, got, exp)


def test_scc_dag_all_singletons(spark):
    dag = [(0, 1), (0, 2), (1, 3), (2, 3)]
    g = Graph.of(spark, dag, n=4, directed=True)
    got = {r["node"]: r["label"] for r in strongly_connected_components(g).collect()}
    assert got == {i: i for i in range(4)}


def test_scc_single_cycle(spark):
    cyc = [(i, (i + 1) % 6) for i in range(6)]
    g = Graph.of(spark, cyc, n=6, directed=True)
    got = {r["node"]: r["label"] for r in strongly_connected_components(g).collect()}
    assert set(got.values()) == {0}


def numpy_brandes_weighted(n, edges, directed=False):
    """Weighted Brandes oracle via Dijkstra per source."""
    import heapq

    adj = [[] for _ in range(n)]
    for e in edges:
        u, v, w = int(e[0]), int(e[1]), float(e[2])
        adj[u].append((v, w))
        if not directed:
            adj[v].append((u, w))
    bc = np.zeros(n)
    for s in range(n):
        dist = [float("inf")] * n
        dist[s] = 0.0
        sigma = np.zeros(n)
        sigma[s] = 1
        order = []
        pq = [(0.0, s)]
        done = [False] * n
        while pq:
            d, u = heapq.heappop(pq)
            if done[u]:
                continue
            done[u] = True
            order.append(u)
            for v, w in adj[u]:
                nd = d + w
                if nd < dist[v] - 1e-12:
                    dist[v] = nd
                    heapq.heappush(pq, (nd, v))
        # sigma over DAG in dist order
        for u in order:
            for v, w in adj[u]:
                if abs(dist[u] + w - dist[v]) <= 1e-9:
                    sigma[v] += sigma[u]
        delta = np.zeros(n)
        for u in reversed(order):
            for v, w in adj[u]:
                if abs(dist[u] + w - dist[v]) <= 1e-9 and sigma[v] > 0:
                    delta[u] += sigma[u] / sigma[v] * (1 + delta[v])
            if u != s:
                bc[u] += delta[u]
    return bc


WG = [(0, 1, 2.0), (1, 2, 1.0), (0, 2, 4.0), (2, 3, 1.0), (3, 4, 2.0), (4, 0, 9.0), (1, 4, 6.0)]


def test_weighted_betweenness_vs_numpy(spark):
    from networkit_spark.operators.distance import betweenness_weighted

    g = Graph.of(spark, WG, n=5, weighted=True)
    got = {r["id"]: r["score"] for r in betweenness_weighted(g).collect()}
    exp = numpy_brandes_weighted(5, WG)
    for i in range(5):
        assert got[i] == pytest.approx(exp[i], abs=1e-9), (i, got, exp)


def test_weighted_closeness(spark):
    from networkit_spark.operators.distance import closeness_centrality_weighted

    g = Graph.of(spark, WG, n=5, weighted=True)
    D = _floyd(_adj(5, WG, weighted=True))
    got = {r["id"]: r["score"] for r in closeness_centrality_weighted(g).collect()}
    for i in range(5):
        assert got[i] == pytest.approx(1.0 / D[i].sum(), abs=1e-12)


def test_multi_source_sssp_matches_single(spark):
    from networkit_spark.operators.distance import multi_source_sssp

    g = Graph.of(spark, WG, n=5, weighted=True)
    vis = multi_source_sssp(g, spark.range(5).select("id"))
    got = {(r["root"], r["node"]): r["dist"] for r in vis.collect()}
    D = _floyd(_adj(5, WG, weighted=True))
    for i in range(5):
        for j in range(5):
            assert got[(i, j)] == pytest.approx(D[i, j], abs=1e-9)


def numpy_edge_betweenness(n, edges, directed=False):
    adj = [[] for _ in range(n)]
    for e in edges:
        u, v = int(e[0]), int(e[1])
        adj[u].append(v)
        if not directed:
            adj[v].append(u)
    eb = {}
    for s in range(n):
        sigma = np.zeros(n)
        sigma[s] = 1
        dist = np.full(n, -1)
        dist[s] = 0
        order = [s]
        q = [s]
        while q:
            nq = []
            for u in q:
                for w in adj[u]:
                    if dist[w] < 0:
                        dist[w] = dist[u] + 1
                        nq.append(w)
                        order.append(w)
            for u in q:
                for w in adj[u]:
                    if dist[w] == dist[u] + 1:
                        sigma[w] += sigma[u]
            q = nq
        delta = np.zeros(n)
        for w in reversed(order):
            for v in adj[w]:
                if dist[v] == dist[w] + 1:
                    c = sigma[w] / sigma[v] * (1 + delta[v])
                    key = (min(w, v), max(w, v))
                    eb[key] = eb.get(key, 0.0) + c
                    delta[w] += c
    return eb


def test_edge_betweenness_vs_numpy(spark):
    from networkit_spark.operators.distance import edge_betweenness

    g = Graph.of(spark, G10, n=10)
    got = {(r["src"], r["dst"]): r["score"] for r in edge_betweenness(g).collect()}
    exp = numpy_edge_betweenness(10, G10)
    assert set(got) == set(exp)
    for k in exp:
        assert got[k] == pytest.approx(exp[k], abs=1e-9), k


def test_sssp_update_additions_matches_recompute(spark):
    from networkit_spark.operators.distance import sssp, sssp_update_additions

    base = [(0, 1, 2.0), (1, 2, 3.0), (2, 3, 1.0), (3, 4, 4.0)]
    g = Graph.of(spark, base, n=6, weighted=True)
    d0 = sssp(g, 0)
    added = [(0, 3, 1.5), (4, 5, 1.0)]
    g2 = Graph.of(spark, base + added, n=6, weighted=True)
    add_df = spark.createDataFrame(added, "src long, dst long, weight double")
    upd = {r["node"]: r["dist"] for r in sssp_update_additions(g2, d0, add_df).collect()}
    fresh = {r["node"]: r["dist"] for r in sssp(g2, 0).collect()}
    assert upd == fresh, (upd, fresh)


def test_closeness_standard_raises_on_disconnected(spark):
    """Reference parity: Closeness.cpp checkConnectedComponents throws on
    disconnected input for the standard variant (ADVICE r2 #1)."""
    edges = [(0, 1), (1, 2), (3, 4)]
    g = Graph.of(spark, edges, n=6)
    with pytest.raises(ValueError, match="disconnected"):
        closeness_centrality(g, variant="standard").collect()
    # explicit opt-out computes reachable-set closeness (documented deviation)
    got = {
        r["id"]: r["score"]
        for r in closeness_centrality(g, check_connected=False).collect()
    }
    assert got[3] == pytest.approx(1.0, abs=1e-12)


def test_betweenness_weighted_rejects_nonpositive_weights(spark):
    """Zero-weight edges create a cycle in the 'DAG' (ADVICE r2 #2)."""
    from networkit_spark.operators.distance import betweenness_weighted

    edges = [(0, 1, 0.0), (1, 2, 1.0), (2, 0, 1.0)]
    df = spark.createDataFrame(edges, "src long, dst long, weight double")
    sym = df.union(df.selectExpr("dst as src", "src as dst", "weight"))
    g = Graph(
        nodes=spark.range(3).toDF("id"),
        edges=sym,
        directed=False,
        weighted=True,
    )
    with pytest.raises(ValueError, match="strictly positive"):
        betweenness_weighted(g).collect()


def test_approx_betweenness_epsilon_guarantee(spark):
    """RK ε-δ bound (ApproxBetweenness.cpp:30-95): every node's sampled
    score within ε of exact betweenness / (n(n-1)), across seeds."""
    from networkit_spark.operators.distance import approx_betweenness

    g = Graph.of(spark, G10, n=10)
    exact = numpy_brandes(10, G10)
    n = 10
    eps = 0.15
    for seed in (1, 42, 99):
        got = {
            r["id"]: r["score"]
            for r in approx_betweenness(g, epsilon=eps, delta=0.1, seed=seed).collect()
        }
        for v in range(n):
            assert abs(got[v] - exact[v] / (n * (n - 1))) <= eps, (seed, v, got[v])


def test_approx_betweenness_deterministic_and_small_graphs(spark):
    from networkit_spark.operators.distance import approx_betweenness

    g = Graph.of(spark, G10, n=10)
    a = sorted(approx_betweenness(g, seed=7).collect())
    b = sorted(approx_betweenness(g, seed=7).collect())
    assert a == b
    # vd <= 2 -> all zeros (reference early-exit)
    tri = Graph.of(spark, [(0, 1), (1, 2), (0, 2)], n=3)
    assert all(r["score"] == 0.0 for r in approx_betweenness(tri).collect())


def test_betweenness_deep_chain_no_plan_blowup(spark):
    """Depth-50 path graph: the per-level dependency unions must fold
    periodically (lineage truncation) and still match the closed form —
    path betweenness of node i (0-indexed, n nodes) = 2·i·(n-1-i)."""
    n = 51
    chain = [(i, i + 1) for i in range(n - 1)]
    g = Graph.of(spark, chain, n=n)
    got = {r["id"]: r["score"] for r in betweenness(g).collect()}
    for i in range(n):
        assert got[i] == pytest.approx(2.0 * i * (n - 1 - i), abs=1e-9), i


def test_dyn_top_harmonic_composition(spark):
    """DynTopHarmonicCloseness pattern: incremental APSP update + harmonic
    re-derivation equals a fresh all-pairs computation."""
    from networkit_spark.operators.distance import (
        apsp_update_additions,
        harmonic_from_distances,
    )

    base = [(0, 1), (1, 2), (3, 4)]
    added = [(2, 3)]
    g0 = Graph.of(spark, base, n=5)
    g1 = Graph.of(spark, base + added, n=5)
    d0 = multi_source_bfs(g0, g0.nodes, with_sigma=False).visited
    upd = apsp_update_additions(
        d0, spark.createDataFrame(added, "src long, dst long")
    )
    inc = {
        r["id"]: r["score"]
        for r in harmonic_from_distances(upd, g1.nodes).collect()
    }
    fresh = {r["id"]: r["score"] for r in harmonic_closeness(g1).collect()}
    for v in range(5):
        assert inc[v] == pytest.approx(fresh[v], abs=1e-12), v


def test_approx_group_betweenness_finds_bottleneck(spark):
    """Barbell: the bridge node must be the first greedy pick."""
    from networkit_spark.operators.distance import approx_group_betweenness

    k5a = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    k5b = [(a, b) for a in range(6, 11) for b in range(a + 1, 11)]
    edges = k5a + k5b + [(4, 5), (5, 6)]  # node 5 bridges the cliques
    g = Graph.of(spark, edges, n=11)
    group = approx_group_betweenness(g, k=2, epsilon=0.15, seed=2)
    assert len(group) == 2
    assert group[0] == 5
    # deterministic
    assert approx_group_betweenness(g, k=2, epsilon=0.15, seed=2) == group


def test_dyn_betweenness_update_matches_recompute(spark):
    """DynBetweenness batch insertion == fresh exact Brandes."""
    from networkit_spark.operators.distance import betweenness_update_additions

    base = [(0, 1), (1, 2), (2, 3), (4, 5), (5, 6), (3, 4)]
    added = [(0, 6), (2, 5)]
    g0 = Graph.of(spark, base, n=7)
    g1 = Graph.of(spark, base + added, n=7)
    old = betweenness(g0)
    upd = {
        r["id"]: r["score"]
        for r in betweenness_update_additions(
            g0, g1, spark.createDataFrame(added, "src long, dst long"), old
        ).collect()
    }
    fresh = {r["id"]: r["score"] for r in betweenness(g1).collect()}
    for v in range(7):
        assert upd[v] == pytest.approx(fresh[v], abs=1e-9), v


def test_bidirectional_bfs_matches_full_bfs(spark):
    """BidirectionalBFS == full-BFS hop distance on seeded random graphs,
    including an unreachable pair (distance/BidirectionalBFS.cpp)."""
    import random

    from networkit_spark.operators.distance import bidirectional_bfs
    from networkit_spark.operators.traversal import bfs

    for seed in (1, 2, 3):
        rng = random.Random(seed)
        n = 24
        edges = sorted({tuple(sorted(rng.sample(range(n), 2))) for _ in range(40)})
        g = Graph.of(spark, edges, n=n)
        full = {r["node"]: r["dist"] for r in bfs(g, 0).collect()}
        for t in (1, 5, n - 1):
            want = float(full.get(t, float("inf")))
            got = bidirectional_bfs(g, 0, t)
            assert got == want, (seed, t, got, want)
    # same-node short-circuit
    g2 = Graph.of(spark, [(0, 1)], n=3)
    assert bidirectional_bfs(g2, 1, 1) == 0.0
    assert bidirectional_bfs(g2, 0, 2) == float("inf")


def test_bidirectional_dijkstra_matches_sssp(spark):
    """BidirectionalDijkstra == full weighted SSSP distance on seeded
    random weighted graphs, incl. unreachable + same-node cases
    (distance/BidirectionalDijkstra.cpp:30-150 stopping rule)."""
    import random

    from networkit_spark.operators.distance import bidirectional_dijkstra, sssp

    for seed in (1, 2, 3):
        rng = random.Random(seed)
        n = 20
        edges = sorted(
            {
                (*sorted(rng.sample(range(n), 2)), float(rng.randint(1, 9)))
                for _ in range(34)
            }
        )
        g = Graph.of(spark, edges, n=n, weighted=True)
        full = {r["node"]: r["dist"] for r in sssp(g, 0).collect()}
        for t in (1, 7, n - 1):
            want = float(full.get(t, float("inf")))
            got = bidirectional_dijkstra(g, 0, t)
            assert got == pytest.approx(want, abs=1e-9), (seed, t, got, want)
    g2 = Graph.of(spark, [(0, 1, 2.0)], n=3, weighted=True)
    assert bidirectional_dijkstra(g2, 1, 1) == 0.0
    assert bidirectional_dijkstra(g2, 0, 2) == float("inf")


def test_kadabra_betweenness_epsilon_bound_and_adaptive_stop(spark):
    """Kadabra: within-epsilon of exact normalized betweenness across
    seeds, and the empirical-Bernstein stop uses FEWER samples than the
    RK fixed bound on an easy instance (KadabraBetweenness.cpp)."""
    import math

    from networkit_spark.operators.distance import betweenness, kadabra_betweenness

    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 0), (1, 4), (2, 6), (6, 7)]
    n = 8
    g = Graph.of(spark, edges, n=n)
    exact = {
        r["id"]: r["score"] / (n * (n - 1)) for r in betweenness(g).collect()
    }
    eps = 0.35
    for seed in (1, 2, 7):
        got = {
            r["id"]: r["score"]
            for r in kadabra_betweenness(g, epsilon=eps, delta=0.1, seed=seed).collect()
        }
        assert all(abs(got[v] - exact[v]) <= eps for v in exact), (seed, got, exact)
    # determinism
    a = kadabra_betweenness(g, epsilon=eps, delta=0.1, seed=3).collect()
    b = kadabra_betweenness(g, epsilon=eps, delta=0.1, seed=3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_all_simple_paths_reference_fixture(spark):
    """AllSimplePathsGTest.testAllSimplePaths: the 4 exact paths 3→1 on
    the gtest graph (directed), plus cutoff truncation and the s==t
    singleton."""
    from networkit_spark.operators.reachability import all_simple_paths

    # the gtest uses input/example.edgelist + added edges 9<->6; the
    # relevant directed reachable structure for paths 3→1:
    edges = [
        (3, 7), (7, 10), (3, 10), (10, 9), (9, 6), (6, 9),
        (6, 1), (6, 5), (5, 1),
    ]
    g = Graph.of(spark, edges, n=11, directed=True)
    got = sorted(tuple(r["path"]) for r in all_simple_paths(g, 3, 1).collect())
    want = sorted(
        [
            (3, 7, 10, 9, 6, 1),
            (3, 7, 10, 9, 6, 5, 1),
            (3, 10, 9, 6, 1),
            (3, 10, 9, 6, 5, 1),
        ]
    )
    assert got == want
    # cutoff counts EDGES: 5 keeps the three ≤5-edge paths, 4 keeps one
    short = sorted(tuple(r["path"]) for r in all_simple_paths(g, 3, 1, cutoff=5).collect())
    assert short == sorted(
        [(3, 7, 10, 9, 6, 1), (3, 10, 9, 6, 1), (3, 10, 9, 6, 5, 1)]
    )
    assert [tuple(r["path"]) for r in all_simple_paths(g, 3, 1, cutoff=4).collect()] == [
        (3, 10, 9, 6, 1)
    ]
    assert [tuple(r["path"]) for r in all_simple_paths(g, 3, 3).collect()] == [(3,)]
    assert all_simple_paths(g, 1, 3).count() == 0


def _approx_closeness_python(edges, n, k, eps, seed):
    """Set-form transcription of approx_closeness (portable_hash draw)."""
    from collections import deque

    from networkit_spark.functions.porthash import md5_mod_py

    nbrs = {u: set() for u in range(n)}
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    samples = sorted(range(n), key=lambda u: (md5_mod_py(u, salt=f"ac{seed}:"), u))[:k]
    sset = set(samples)

    def bfs(s):
        dist = {s: 0}
        q = deque([s])
        while q:
            u = q.popleft()
            for w in nbrs[u]:
                if w not in dist:
                    dist[w] = dist[u] + 1
                    q.append(w)
        return dist

    D = {s: bfs(s) for s in samples}
    far = {}
    for s in samples:
        far[s] = float(sum(D[s].values()))
    piv, delta = {}, {}
    for u in range(n):
        cands = sorted((D[s][u], s) for s in samples if u in D[s])
        if cands:
            delta[u], piv[u] = float(cands[0][0]), cands[0][1]
    for u in range(n):
        if u in sset or u not in piv:
            continue
        p = piv[u]
        lcs = lcn = hcs = 0.0
        for s in samples:
            if u not in D[s]:
                continue
            d = float(D[s][u])
            dp = float(D[s][p]) if p in D[s] else None
            lc = (eps == 0) or d <= delta[u] * (1.0 / eps - 1.0) or (
                dp is not None and dp <= delta[u] / eps
            )
            if lc:
                lcs += d
                lcn += 1
            elif dp is not None and dp >= d:
                hcs += d
        hsum = hnum = 0.0
        if eps > 0:
            thr = delta[u] / eps
            for w in range(n):
                if w in sset or w not in D[p]:
                    continue
                dw = float(D[p][w])
                if dw > thr:
                    hsum += dw
                    hnum += 1
        if lcn > 0:
            lnum = float(n - 1) - hnum - float(k) + lcn
            far[u] = hsum + hcs + lcs / (lcn / lnum)
    return {
        u: (1.0 / far[u] if u in far and far[u] > 0 else 0.0) for u in range(n)
    }


def test_approx_closeness_matches_set_form_and_exact(spark):
    """approx_closeness == the set-form Cohen-estimator transcription
    exactly (eps 0 and 0.5, three seeds), == exact closeness when every
    node is sampled, and lands near exact closeness on average
    (centrality/ApproxCloseness.cpp:70-160 undirected path)."""
    import random

    from networkit_spark.operators.distance import (
        approx_closeness,
        closeness_centrality,
    )

    n = 24
    rng = random.Random(7)
    edges = sorted({tuple(sorted(rng.sample(range(n), 2))) for _ in range(50)})
    g = Graph.of(spark, edges, n=n)

    for seed in (1, 2, 3):
        for eps in (0.0, 0.5):
            got = {
                r["id"]: r["score"]
                for r in approx_closeness(
                    g, n_samples=6, epsilon=eps, seed=seed, portable_hash=True
                ).collect()
            }
            want = _approx_closeness_python(edges, n, 6, eps, seed)
            assert got == pytest.approx(want, abs=1e-12), (seed, eps)

    # k = n: every node sampled -> exact closeness
    full = {
        r["id"]: r["score"]
        for r in approx_closeness(g, n_samples=n, portable_hash=True).collect()
    }
    exact = {
        r["id"]: r["score"]
        for r in closeness_centrality(g, check_connected=False).collect()
    }
    assert full == pytest.approx(exact, abs=1e-12)

    # estimator sanity: mean relative farness error under 35% at k=6
    est = {
        r["id"]: r["score"]
        for r in approx_closeness(g, n_samples=6, epsilon=0.5, seed=1,
                                  portable_hash=True).collect()
    }
    errs = [
        abs(1.0 / est[u] - 1.0 / exact[u]) / (1.0 / exact[u])
        for u in range(n)
        if est[u] > 0 and exact[u] > 0
    ]
    assert sum(errs) / len(errs) < 0.35


def test_approx_closeness_weighted_batched(spark):
    """The weighted branch runs ONE batched multi_source_sssp (shared
    runner records a single relax-round sequence, not k driver-serialized
    SSSP chains) and matches the eps=0 set-form estimator on weighted
    Dijkstra distances; k = n reproduces exact weighted closeness."""
    import heapq
    import random

    from networkit_spark.functions.porthash import md5_mod_py
    from networkit_spark.operators.distance import (
        approx_closeness,
        closeness_centrality_weighted,
    )
    from networkit_spark.plans.superstep import SuperstepRunner

    n = 16
    rng = random.Random(11)
    edges = sorted(
        (a, b, float(rng.randint(1, 5)))
        for a, b in {tuple(sorted(rng.sample(range(n), 2))) for _ in range(34)}
    )
    g = Graph.of(spark, edges, n=n, weighted=True)

    nbrs = {u: [] for u in range(n)}
    for a, b, w in edges:
        nbrs[a].append((b, w))
        nbrs[b].append((a, w))

    def dijkstra(s):
        dist = {s: 0.0}
        pq = [(0.0, s)]
        while pq:
            d, u = heapq.heappop(pq)
            if d > dist.get(u, float("inf")):
                continue
            for w, c in nbrs[u]:
                nd = d + c
                if nd < dist.get(w, float("inf")):
                    dist[w] = nd
                    heapq.heappush(pq, (nd, w))
        return dist

    seed, k = 1, 5
    samples = sorted(range(n), key=lambda u: (md5_mod_py(u, salt=f"ac{seed}:"), u))[:k]
    D = {s: dijkstra(s) for s in samples}
    far = {s: float(sum(D[s].values())) for s in samples}
    for u in range(n):
        if u in far:
            continue
        lcs = sum(D[s][u] for s in samples if u in D[s])
        lcn = sum(1 for s in samples if u in D[s])
        if lcn:
            far[u] = lcs / (lcn / (float(n - 1) - k + lcn))
    want = {u: (1.0 / far[u] if far.get(u, 0.0) > 0 else 0.0) for u in range(n)}

    runner = SuperstepRunner(spark)
    got = {
        r["id"]: r["score"]
        for r in approx_closeness(
            g, n_samples=k, seed=seed, portable_hash=True, runner=runner
        ).collect()
    }
    assert got == pytest.approx(want, abs=1e-12)
    # one batched run: the shared runner saw each relax round once, in
    # order, bounded by the hop-diameter — not k separate chains
    steps = [m["superstep"] for m in runner.metrics]
    assert steps == sorted(set(steps)) and 0 < len(steps) <= n + 1

    exact = {
        r["id"]: r["score"]
        for r in closeness_centrality_weighted(g).collect()
    }
    full = {
        r["id"]: r["score"]
        for r in approx_closeness(g, n_samples=n, portable_hash=True).collect()
    }
    assert full == pytest.approx(exact, abs=1e-12)


def _k_path_python(edges, n, k, t, seed):
    """Transcription of k_path_centrality's portable walk contract."""
    from networkit_spark.functions.porthash import md5_mod_py

    nbrs = {u: set() for u in range(n)}
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    counter = {u: 0 for u in range(n)}
    for wid in range(1, t + 1):
        s = md5_mod_py(wid, salt=f"kp{seed}:s:") % n
        l = md5_mod_py(wid, salt=f"kp{seed}:l:") % k + 1
        path = [s]
        cur = s
        for j in range(1, l + 1):
            cands = sorted(w for w in nbrs[cur] if w not in path)
            if not cands:
                break
            drw = md5_mod_py(wid, salt=f"kp{seed}:c:{j}:")
            cur = cands[drw % len(cands)]
            path.append(cur)
            counter[cur] += 1
    return {u: float(k) * float(n) * (counter[u] / float(t)) for u in range(n)}


def test_k_path_centrality_matches_transcription(spark):
    """k_path_centrality (centrality/KPathCentrality.cpp): the parallel
    self-avoiding walk table equals the sequential transcription exactly
    in portable mode, the default t follows the reference formula, and
    high-degree hubs outrank leaves."""
    import random

    from networkit_spark.operators.distance import k_path_centrality

    n = 18
    rng = random.Random(13)
    edges = sorted({tuple(sorted(rng.sample(range(n), 2))) for _ in range(30)})
    # add a hub: node 0 connected to everything
    edges = sorted(set(edges) | {(0, v) for v in range(1, n)})
    g = Graph.of(spark, edges, n=n)
    for seed in (1, 2):
        got = {
            r["id"]: r["score"]
            for r in k_path_centrality(
                g, alpha=0.2, k=3, t=400, seed=seed, portable_hash=True
            ).collect()
        }
        want = _k_path_python(edges, n, 3, 400, seed)
        assert got == pytest.approx(want, abs=1e-12), seed
    hub = got[0]
    assert hub >= max(v for u, v in got.items() if u != 0) * 0.8


def test_volume_and_nfh_on_cycle(spark):
    """Volume (distance/Volume.cpp) and NeighborhoodFunctionHeuristic
    (distance/NeighborhoodFunctionHeuristic.cpp) on a vertex-transitive
    cycle, where the exact answers are closed-form regardless of which
    nodes get sampled."""
    from networkit_spark.operators.distance import volume
    from networkit_spark.operators.sketches import neighborhood_function_heuristic

    n = 8
    cyc = Graph.of(spark, [(i, (i + 1) % n) for i in range(n)], n=n)
    # ball of radius 2 on a cycle = 5 nodes around any root
    assert volume(cyc, 2.0, samples=6, seed=1) == 5.0
    assert volume(cyc, [1.0, 2.5, 0.0], samples=4, seed=2) == [3.0, 5.0, 1.0]

    # NFH with every node sampled: exact interior, pinned endpoints
    nf = neighborhood_function_heuristic(cyc, n_samples=n, seed=1)
    assert nf == [2 * n, 2 * n + 16, 2 * n + 32, n * (n - 1)]

    import pytest as _p

    with _p.raises(ValueError, match="connected"):
        neighborhood_function_heuristic(
            Graph.of(spark, [(0, 1), (2, 3)], n=4), n_samples=2
        )


def _ref_affected(edges_without, n, u, v, directed=False):
    """Transcription of AffectedNodes.cpp getAffectedNodes: BFS-distance
    tables on the WITHOUT-edge graph, pruned-BFS affected sets, min
    distances, and the undirected-addition improvement bounds."""
    from collections import Counter, deque

    nbrs = {w: set() for w in range(n)}
    rnbrs = {w: set() for w in range(n)}
    for a, b in edges_without:
        nbrs[a].add(b)
        rnbrs[b].add(a)
        if not directed:
            nbrs[b].add(a)
            rnbrs[a].add(b)

    def bfs(s, adj):
        dist = {s: 0.0}
        q = deque([s])
        while q:
            x = q.popleft()
            for w in adj[x]:
                if w not in dist:
                    dist[w] = dist[x] + 1
                    q.append(w)
        return dist

    inf = float("inf")
    if directed:
        du = bfs(u, rnbrs)
        dv = bfs(v, rnbrs)
        aff = {
            w for w in range(n)
            if w == u or (w != v and du.get(w, inf) + 1 < dv.get(w, inf))
        }
        return aff, du, dv, {}
    du = bfs(u, nbrs)
    dv = bfs(v, nbrs)
    aff_u = {
        w for w in range(n)
        if w != u and (w == v or dv.get(w, inf) + 1 < du.get(w, inf))
    }
    aff_v = {
        w for w in range(n)
        if w != v and (w == u or du.get(w, inf) + 1 < dv.get(w, inf))
    }
    h_old_u, h_old_v, h_new_u, h_new_v = Counter(), Counter(), Counter(), Counter()
    for w in range(n):
        ou, ov = du.get(w, inf), dv.get(w, inf)
        for val, h in ((ou, h_old_u), (ov, h_old_v),
                       (min(ou, ov + 1), h_new_u), (min(ov, ou + 1), h_new_v)):
            if val != inf:
                h[int(val)] += 1
    lu = max([k for k in h_new_u if k > 0], default=0)
    lv = max([k for k in h_new_v if k > 0], default=0)
    iu = {i: sum((h_new_v[j] - h_old_v[j]) / (i + j) for j in range(1, lv + 1))
          for i in range(1, lu + 1)}
    iv = {i: sum((h_new_u[j] - h_old_u[j]) / (i + j) for j in range(1, lu + 1))
          for i in range(1, lv + 1)}
    imp = {}
    for w in aff_u:
        nv = min(dv.get(w, inf), du.get(w, inf) + 1)
        imp[w] = iu.get(int(nv), 0.0) if nv != inf else 0.0
    for w in aff_v:  # reference write order: affectedV overwrites
        nu = min(du.get(w, inf), dv.get(w, inf) + 1)
        imp[w] = iv.get(int(nu), 0.0) if nu != inf else 0.0
    return aff_u | aff_v, du, dv, imp


def test_affected_nodes_addition_and_removal(spark):
    """affected_nodes (distance/AffectedNodes.cpp): the closed-form
    affected sets, min distances, and undirected-addition improvement
    bounds match a transcription of the reference's pruned BFS on seeded
    graphs, for additions, removals, and the directed reverse case."""
    import random

    from networkit_spark.operators.reachability import affected_nodes

    inf = float("inf")
    n = 16
    rng = random.Random(13)
    base = sorted({tuple(sorted(rng.sample(range(n), 2))) for _ in range(22)})
    # an addition between two far apart nodes + a removal case
    uu, vv = 0, 15
    without = [e for e in base if e != (uu, vv)]

    # ADDITION: g has the edge; old distances come from skipping it
    g_with = Graph.of(spark, without + [(uu, vv)], n=n)
    got = {
        r["node"]: (r["dist"], r["improvement"])
        for r in affected_nodes(g_with, "EDGE_ADDITION", uu, vv).collect()
    }
    aff, du, dv, imp = _ref_affected(without, n, uu, vv)
    assert set(got) == aff
    for w in aff:
        assert got[w][0] == min(du.get(w, inf), dv.get(w, inf))
        assert got[w][1] == pytest.approx(imp[w], abs=1e-12), w

    # REMOVAL: g is the post-removal graph
    g_post = Graph.of(spark, without, n=n)
    got_rm = {
        r["node"]: r["dist"]
        for r in affected_nodes(g_post, "EDGE_REMOVAL", uu, vv).collect()
    }
    assert set(got_rm) == aff
    for w in aff:
        assert got_rm[w] == min(du.get(w, inf), dv.get(w, inf))

    # DIRECTED addition: reverse-search semantics
    d_edges = [(a, b) for a, b in without]
    gd = Graph.of(spark, d_edges + [(uu, vv)], n=n, directed=True)
    got_d = {
        r["node"]: r["dist"]
        for r in affected_nodes(gd, "EDGE_ADDITION", uu, vv).collect()
    }
    aff_d, du_d, dv_d, _ = _ref_affected(d_edges, n, uu, vv, directed=True)
    assert set(got_d) == aff_d
    for w in aff_d:
        assert got_d[w] == min(du_d.get(w, inf), dv_d.get(w, inf))

    # DIRECTED addition with a PRE-EXISTING reciprocal v→u edge: the
    # without-edge base skips only the added u→v arc (the reference's
    # bfsWithoutStartNeighbor skips a single arc), so shortest paths
    # through v→u must still count (ADVICE r6: the old both-direction
    # filter silently dropped them)
    d_recip = d_edges + [(vv, uu)]
    gdr = Graph.of(spark, d_recip + [(uu, vv)], n=n, directed=True)
    got_r = {
        r["node"]: r["dist"]
        for r in affected_nodes(gdr, "EDGE_ADDITION", uu, vv).collect()
    }
    aff_r, du_r, dv_r, _ = _ref_affected(d_recip, n, uu, vv, directed=True)
    assert set(got_r) == aff_r
    for w in aff_r:
        assert got_r[w] == min(du_r.get(w, inf), dv_r.get(w, inf))

    with pytest.raises(ValueError, match="event_type"):
        affected_nodes(g_with, "NODE_ADDITION", uu, vv)
