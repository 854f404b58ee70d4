"""Round-7 SCD additions: SetConductance, CombinedSCD, RandomBFS,
SCDGroundTruthComparison, TwoPhaseL."""

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.scd import (
    combined_scd,
    gce,
    random_bfs_scd,
    scd_ground_truth_comparison,
    set_conductance,
    two_phase_l,
)


def _ids(df):
    return {int(r[0]) for r in df.collect()}


def _two_cliques(spark):
    K = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    K2 = [(a + 4, b + 4) for a, b in K]
    return Graph.of(spark, K + K2 + [(0, 4)], n=8)


def test_set_conductance(spark):
    g = _two_cliques(spark)
    c = spark.createDataFrame([(i,) for i in range(4)], "node long")
    # cut=1, vol(C)=2*6+1=13, total volume=2*13=26, rest=13 -> 1/13
    assert abs(set_conductance(g, c) - 1 / 13) < 1e-12
    # whole graph: rest volume 0 -> 1.0
    allc = spark.createDataFrame([(i,) for i in range(8)], "node long")
    assert set_conductance(g, allc) == 1.0
    with pytest.raises(ValueError):
        set_conductance(Graph.of(spark, [(0, 1)], directed=True), c)


def test_set_conductance_self_loop_double_count(spark):
    g = Graph.of(spark, [(0, 1), (1, 1), (1, 2), (2, 3)])
    c = spark.createDataFrame([(0,), (1,)], "node long")
    # vol(C) = deg0(1) + deg1(1+2*loop+1) = 1 + 4 = 5; cut = 1 (1-2)
    # totalEdgeWeight = 4 -> total volume 8, rest 3 -> 1/3
    assert abs(set_conductance(g, c) - 1 / 3) < 1e-12


def test_two_phase_l_two_cliques(spark):
    # Reference pruning quirk (hand-traced from TwoPhaseL.cpp): a member
    # whose removal leaves Lex UNCHANGED is removed (the keep condition
    # demands strictly-raised Lex), so the bridge endpoint 4 is evicted
    # from {4..7}; seeding AT the bridge endpoint evicts the seed itself
    # and expandOneCommunity returns the empty set.
    g = _two_cliques(spark)
    assert _ids(two_phase_l(g, [5])) == {5, 6, 7}
    assert _ids(two_phase_l(g, [1])) == {1, 2, 3}
    assert _ids(two_phase_l(g, [0])) == set()


def test_two_phase_l_loops_raise(spark):
    with pytest.raises(ValueError, match="self-loops"):
        two_phase_l(Graph.of(spark, [(0, 0), (0, 1)]), [0])


def test_combined_scd(spark):
    g = _two_cliques(spark)

    def first(gg, seed):
        return spark.createDataFrame([(int(seed),)], "node long")

    def second(gg, members):
        return gce(gg, [int(r[0]) for r in members.collect()])

    com = _ids(combined_scd(g, 1, first, second))
    assert com == {0, 1, 2, 3}


def test_random_bfs_scd(spark):
    g = Graph.of(spark, [(i, i + 1) for i in range(9)], n=10)
    # explicit size: BFS ball around 0 of 4 nodes = {0,1,2,3}
    com = _ids(random_bfs_scd(g, [0], com_size=4))
    assert com == {0, 1, 2, 3}
    # cover-driven size: subset 0 holds 5 nodes including the seed
    cover = spark.createDataFrame(
        [(i, 0) for i in range(5)] + [(i, 1) for i in range(5, 10)],
        "node long, subset long",
    )
    com2 = _ids(random_bfs_scd(g, [0], cover=cover))
    assert com2 == {0, 1, 2, 3, 4}
    # deterministic partial level
    assert _ids(random_bfs_scd(g, [5], com_size=4, seed=3)) == _ids(
        random_bfs_scd(g, [5], com_size=4, seed=3)
    )


def test_scd_ground_truth_comparison(spark):
    g = _two_cliques(spark)
    gt = spark.createDataFrame(
        [(i, 0) for i in range(4)] + [(i, 1) for i in range(4, 8)],
        "node long, subset long",
    )
    found = spark.createDataFrame(
        [(0, 0), (0, 1), (0, 2), (0, 3), (5, 4), (5, 5)], "seed long, node long"
    )
    res = scd_ground_truth_comparison(g, gt, found)
    scores = {int(r["seed"]): r for r in res["scores"].collect()}
    assert scores[0]["jaccard"] == 1.0 and scores[0]["f1"] == 1.0
    # seed 5: found {4,5} vs truth {4..7}: overlap 2, jac 2/4, prec 1, rec 0.5
    assert abs(scores[5]["jaccard"] - 0.5) < 1e-12
    assert abs(scores[5]["recall"] - 0.5) < 1e-12
    assert scores[5]["precision"] == 1.0
    assert abs(res["avg_jaccard"] - 0.75) < 1e-12
    # ignore_seeds: same here (seed in its own truth subset)
    res2 = scd_ground_truth_comparison(g, gt, found, ignore_seeds=True)
    assert abs(res2["avg_jaccard"] - 0.75) < 1e-12


def test_local_t_two_cliques(spark):
    from networkit_spark.operators.scd import local_t

    g = _two_cliques(spark)
    # seed inside a clique: triangles keep the expansion inside it —
    # adding the bridge endpoint would raise T_ext without T_in gain
    com = _ids(local_t(g, [1], max_iterations=10))
    assert {1, 2, 3}.issubset(com) and com.issubset({0, 1, 2, 3})


def test_local_t_dense_replay(spark):
    import itertools

    import numpy as np
    from networkit_spark.operators.scd import local_t

    rng = np.random.default_rng(11)
    n = 14
    edges = sorted({(int(a), int(b)) for a, b in rng.integers(0, n, (40, 2)) if a < b})
    eset = set(edges)
    adj = {v: set() for v in range(n)}
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    tris = [
        (a, b, c)
        for a, b, c in itertools.combinations(range(n), 3)
        if (a, b) in eset and (b, c) in eset and (a, c) in eset
    ]

    def dense_local_t(seeds, iters):
        members = set(seeds)
        for _ in range(iters):
            t_in = sum(1 for t in tris if sum(x in members for x in t) == 3)
            t_ext = sum(1 for t in tris if sum(x in members for x in t) == 1)
            cur = max(0, t_in * (t_in - t_ext))
            shell = sorted(
                {w for v in members for w in adj[v]} - members
            )
            u_max, bs, be = None, cur, float("inf")
            for v in shell:
                ni = sum(
                    1
                    for t in tris
                    if v in t and sum(x in members for x in t if x != v) == 2
                )
                ne = sum(
                    1
                    for t in tris
                    if v in t and sum(x in members for x in t if x != v) == 0
                )
                ns = sum(
                    1
                    for t in tris
                    if v in t and sum(x in members for x in t if x != v) == 1
                )
                n_in, n_ext = t_in + ni, t_ext + ne - ns
                ns_score = max(0, n_in * (n_in - n_ext))
                if ns_score > bs or (ns_score == bs and n_ext < be):
                    u_max, bs, be = v, ns_score, n_ext
            if u_max is None:
                break
            members.add(u_max)
        return members

    g = Graph.of(spark, edges, n=n)
    got = _ids(local_t(g, [0], max_iterations=5))
    assert got == dense_local_t([0], 5)


def test_lte_dense_replay(spark):
    import math

    import numpy as np
    from networkit_spark.operators.scd import local_tightness_expansion

    rng = np.random.default_rng(5)
    n = 16
    edges = sorted({(int(a), int(b)) for a, b in rng.integers(0, n, (48, 2)) if a < b})
    adj = {v: {} for v in range(n)}
    for u, v in edges:
        adj[u][v] = 1.0
        adj[v][u] = 1.0

    wd = {v: math.sqrt(1.0 + sum(w * w for w in adj[v].values())) for v in range(n)}

    def s(u, v):
        tsum = 2.0 * adj[u][v] + sum(
            adj[u][y] * adj[v][y] for y in adj[u] if y in adj[v]
        )
        return tsum / (wd[u] * wd[v])

    tot = {v: sum(s(v, u) for u in adj[v]) for v in range(n)}

    def dense_lte(seeds, alpha=1.0):
        members = set(seeds)
        discarded = set()
        while True:
            per = {}
            for u in members:
                for v in adj[u]:
                    per[v] = per.get(v, 0.0) + s(u, v)
            internal = sum(per.get(v, 0.0) for v in members)
            external = sum(tot[v] - per.get(v, 0.0) for v in members)
            shell = sorted(
                (v for v in per if v not in members and v not in discarded),
                key=lambda v: (-per[v], v),
            )
            accepted = None
            for v in shell:
                iv = per[v]
                ev = tot[v] - iv
                lhs = external / internal if internal != 0 else (
                    math.inf if external > 0 else math.nan
                )
                rhs = (alpha * ev - iv) / (2 * iv) if iv != 0 else math.nan
                if (lhs - rhs) > 0:
                    accepted = v
                    break
                discarded.add(v)
            if accepted is None:
                return members
            members.add(accepted)

    g = Graph.of(spark, edges, n=n)
    got = {
        int(r[0])
        for r in local_tightness_expansion(g, [2], alpha=1.0).collect()
    }
    assert got == dense_lte([2])


def test_lte_two_cliques(spark):
    from networkit_spark.operators.scd import local_tightness_expansion

    g = _two_cliques(spark)
    com = {int(r[0]) for r in local_tightness_expansion(g, [5]).collect()}
    assert {5, 6, 7}.issubset(com) and com.issubset({4, 5, 6, 7})
