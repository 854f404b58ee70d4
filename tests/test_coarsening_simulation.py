"""MatchingCoarsening / ClusteringProjector / HashingOverlapper / SEIR."""

import numpy as np
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.coarsening import (
    _djb2,
    hashing_overlapper,
    matching_coarsening,
    project_back,
    project_back_to_finest,
)
from networkit_spark.operators.simulation import epidemic_simulation_seir


def _pairs(df):
    return {(int(r[0]), int(r[1])) for r in df.collect()}


def _map(df, k, v):
    return {int(r[k]): int(r[v]) for r in df.collect()}


# ---------------------------------------------------------------- coarsening


def test_matching_coarsening_path(spark):
    # path 0-1-2-3-4, matching {(0,1),(2,3)} -> coarse nodes {01}=0,{23}=1,{4}=2
    g = Graph.of(spark, [(0, 1), (1, 2), (2, 3), (3, 4)])
    m = spark.createDataFrame([(0, 1), (2, 3)], "u long, v long")
    cg, f2c = matching_coarsening(g, m)
    # carried nodes (0, 2, 4) get ordinal ids 0, 1, 2; mates inherit
    assert _map(f2c, "node", "coarse") == {0: 0, 1: 0, 2: 1, 3: 1, 4: 2}
    # fine edges: (0,1)->self 0, (1,2)->(0,1), (2,3)->self 1, (3,4)->(1,2)
    ce = {
        (int(r["src"]), int(r["dst"])): float(r["weight"])
        for r in cg.edges.filter(F.col("src") <= F.col("dst")).collect()
    }
    assert ce == {(0, 0): 1.0, (0, 1): 1.0, (1, 1): 1.0, (1, 2): 1.0}


def test_matching_coarsening_no_self_loops_and_weights(spark):
    # triangle with weights; matching (0,1): parallel fine edges fold
    g = Graph.of(spark, [(0, 1, 5.0), (0, 2, 2.0), (1, 2, 3.0)], weighted=True)
    m = spark.createDataFrame([(0, 1)], "u long, v long")
    cg, f2c = matching_coarsening(g, m, no_self_loops=True)
    assert _map(f2c, "node", "coarse") == {0: 0, 1: 0, 2: 1}
    ce = {
        (int(r["src"]), int(r["dst"])): float(r["weight"])
        for r in cg.edges.filter(F.col("src") <= F.col("dst")).collect()
    }
    # (0,2) and (1,2) both become coarse (0,1): 2+3; the matched edge drops
    assert ce == {(0, 1): 5.0}


def test_project_back_and_to_finest(spark):
    g = Graph.of(spark, [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5)])
    m1 = spark.createDataFrame([(0, 1), (2, 3), (4, 5)], "u long, v long")
    cg1, f2c1 = matching_coarsening(g, m1)  # 6 -> 3 nodes
    m2 = spark.createDataFrame([(0, 1)], "u long, v long")
    cg2, f2c2 = matching_coarsening(cg1, m2)  # 3 -> 2 nodes
    labels2 = cg2.nodes.select(
        F.col("id").alias("node"), (F.col("id") % 2).alias("label")
    )
    fine1 = project_back(f2c2, labels2)  # level-1 labels
    finest = project_back_to_finest(labels2, [f2c1, f2c2])
    l1 = _map(fine1, "node", "label")
    lf = _map(finest, "node", "label")
    # coarse2 node 0 covers coarse1 {0,1} = fine {0,1,2,3}; node 1 covers {4,5}
    assert lf == {0: 0, 1: 0, 2: 0, 3: 0, 4: 1, 5: 1}
    # consistency: finest == fine1 composed through f2c1
    comp = _map(f2c1, "node", "coarse")
    assert all(lf[v] == l1[comp[v]] for v in range(6))


def _djb2_py(key: int) -> int:
    h = 5381
    for i in range(8):
        b = (key >> (8 * i)) & 255
        if b == 0:
            break
        h = h * 33 + b
    return h


def test_djb2_column_matches_python(spark):
    keys = [0, 1, 255, 256, 0x1200, 65535, 1 << 16, 0xDEADBEEF, (1 << 62) + 12345]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {int(r["k"]): int(r["h"]) for r in df.select("k", _djb2(F.col("k")).alias("h")).collect()}
    assert got == {k: _djb2_py(k) for k in keys}


def test_hashing_overlapper_two(spark):
    g = Graph.of(spark, [(i, i + 1) for i in range(9)], n=10)
    p1 = g.nodes.select(F.col("id").alias("node"), (F.col("id") % 2).alias("label"))
    p2 = g.nodes.select(F.col("id").alias("node"), (F.col("id") % 3).alias("label"))
    core = _map(hashing_overlapper(g, [p1, p2]), "node", "label")
    # overlap of %2 and %3 == %6 as a partition (compacted by raw hash order)
    groups = {}
    for v, c in core.items():
        groups.setdefault(c, set()).add(v)
    expected = {}
    for v in range(10):
        expected.setdefault(v % 6, set()).add(v)
    assert sorted(sorted(s) for s in groups.values()) == sorted(
        sorted(s) for s in expected.values()
    )
    # compacted: dense 0..k-1
    assert set(core.values()) == set(range(6))
    # raw-hash ascending order preserved by replaying the reference hash
    raw = {
        v: _djb2_py((((v % 2) ^ 0xFFFF) << 16) | ((v % 3) ^ 0xFFFF)) for v in range(10)
    }
    order = {h: i for i, h in enumerate(sorted(set(raw.values())))}
    assert core == {v: order[raw[v]] for v in range(10)}


def test_hashing_overlapper_many_and_degenerate(spark):
    g = Graph.of(spark, [(i, i + 1) for i in range(7)], n=8)
    ps = [
        g.nodes.select(F.col("id").alias("node"), (F.col("id") % m).alias("label"))
        for m in (2, 3, 4)
    ]
    core = _map(hashing_overlapper(g, ps), "node", "label")
    raw = {
        v: sum((_djb2_py((v % m) * (c + 2)) & 0xFFFF) for c, m in enumerate((2, 3, 4)))
        for v in range(8)
    }
    order = {h: i for i, h in enumerate(sorted(set(raw.values())))}
    assert core == {v: order[raw[v]] for v in range(8)}
    # 0 clusterings -> 1-clustering; 1 -> itself compacted
    assert set(_map(hashing_overlapper(g, []), "node", "label").values()) == {0}
    one = _map(hashing_overlapper(g, [ps[1]]), "node", "label")
    assert one == {v: v % 3 for v in range(8)}


# ---------------------------------------------------------------- SEIR


def _np_seir(n, edges, t_max, thr_frac, e_time, i_time, zero, seed):
    """Dense replay of the portable-draw SEIR sweep."""
    from networkit_spark.functions.porthash import DEFAULT_PRIME, md5_mod_py

    adj = [[] for _ in range(n)]
    for u, v in edges:
        adj[u].append(v)
        adj[v].append(u)
    threshold = int(thr_frac * DEFAULT_PRIME)
    state = [0] * n
    ts = [0] * n
    state[zero] = 2
    rows = []
    for t in range(t_max):
        inf = [u for u in range(n) if state[u] == 2]
        exposed = set()
        for u in inf:
            for v in adj[u]:
                if md5_mod_py(u * 1_000_003 + v, salt=f"seir{seed}.{t}:") < threshold:
                    exposed.add(v)
        new_state, new_ts = state[:], ts[:]
        for v in range(n):
            if state[v] == 1 and t - ts[v] >= e_time:
                new_state[v], new_ts[v] = 2, t
            elif state[v] == 2 and t - ts[v] >= i_time:
                new_state[v], new_ts[v] = 3, t
            elif state[v] == 0 and v in exposed:
                new_state[v], new_ts[v] = 1, t
        state, ts = new_state, new_ts
        for s in range(4):
            rows.append((zero, t, s, state.count(s)))
    return rows


def test_seir_matches_dense_replay(spark):
    rng = np.random.default_rng(3)
    n = 40
    edges = sorted(
        {(int(a), int(b)) for a, b in rng.integers(0, n, (120, 2)) if a < b}
    )
    g = Graph.of(spark, edges, n=n)
    got = [
        (int(r["zero"]), int(r["t"]), int(r["state"]), int(r["population"]))
        for r in epidemic_simulation_seir(
            g, t_max=10, trans_p=0.4, e_time=2, i_time=3, zero=0, seed=9
        ).collect()
    ]
    exp = _np_seir(n, edges, 10, 0.4, 2, 3, 0, 9)
    assert sorted(got) == sorted(exp)


def test_seir_invariants(spark):
    # star: zero at hub; populations always sum to n; R monotone; S monotone dec
    g = Graph.of(spark, [(0, i) for i in range(1, 13)], n=13)
    out = epidemic_simulation_seir(
        g, t_max=8, trans_p=0.9, e_time=1, i_time=2, zero=0, seed=4
    ).collect()
    by_t = {}
    for r in out:
        by_t.setdefault(int(r["t"]), {})[int(r["state"])] = int(r["population"])
    for t, c in by_t.items():
        assert sum(c.values()) == 13
    rs = [by_t[t][3] for t in sorted(by_t)]
    ss = [by_t[t][0] for t in sorted(by_t)]
    assert rs == sorted(rs) and ss == sorted(ss, reverse=True)
    # hub leaves I after i_time rounds and lands in R
    assert by_t[max(by_t)][3] >= 1
