"""Round-3 operator batch: generators (WS/BA/Chung-Lu), Simmelian
overlap, LocalMax matching, GCE, reachability."""

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import Graph


def test_watts_strogatz_shape_and_determinism(spark):
    from networkit_spark.generators import watts_strogatz

    g = watts_strogatz(spark, n=100, k=2, beta=0.2, seed=7)
    m = g.canonical_undirected_edges().count()
    # lattice has n*k edges; rewiring only ever drops on collision
    assert 150 <= m <= 200
    assert g.num_nodes() == 100
    g2 = watts_strogatz(spark, n=100, k=2, beta=0.2, seed=7)
    a = sorted(map(tuple, g.canonical_undirected_edges().collect()))
    b = sorted(map(tuple, g2.canonical_undirected_edges().collect()))
    assert a == b
    # beta=0 keeps the exact lattice
    g0 = watts_strogatz(spark, n=50, k=3, beta=0.0, seed=7)
    exp = sorted(
        tuple(sorted((i, (i + j) % 50))) for i in range(50) for j in range(1, 4)
    )
    assert sorted(map(tuple, g0.canonical_undirected_edges().collect())) == sorted(set(exp))


def test_barabasi_albert_power_law_hubs(spark):
    from networkit_spark.generators import barabasi_albert

    g = barabasi_albert(spark, n=500, k=3, seed=11)
    deg = (
        g.canonical_undirected_edges()
        .selectExpr("stack(2, src, dst) as (id)")
        .groupBy("id")
        .count()
        .collect()
    )
    degs = sorted((r["count"] for r in deg), reverse=True)
    # preferential attachment: heavy hub tail — max degree far above mean
    mean = sum(degs) / len(degs)
    assert degs[0] > 4 * mean
    # determinism
    g2 = barabasi_albert(spark, n=500, k=3, seed=11)
    assert sorted(map(tuple, g.canonical_undirected_edges().collect())) == sorted(
        map(tuple, g2.canonical_undirected_edges().collect())
    )


def test_chung_lu_expected_degrees(spark):
    from networkit_spark.generators import chung_lu

    w = [20.0] * 30 + [2.0] * 300
    g = chung_lu(spark, w, seed=5)
    deg = {
        r["id"]: r["count"]
        for r in g.canonical_undirected_edges()
        .selectExpr("stack(2, src, dst) as (id)")
        .groupBy("id")
        .count()
        .collect()
    }
    heavy = sum(deg.get(i, 0) for i in range(30)) / 30
    light = sum(deg.get(i, 0) for i in range(30, 330)) / 300
    # expected degree ratio 10:1, allow wide sampling noise
    assert heavy > 4 * light


def test_simmelian_overlap_matches_bruteforce(spark):
    from networkit_spark.operators.sparsification import simmelian_overlap_scores

    import random

    rnd = random.Random(3)
    n = 18
    edges = sorted(
        {tuple(sorted((rnd.randrange(n), rnd.randrange(n)))) for _ in range(45)}
    )
    edges = [e for e in edges if e[0] != e[1]]
    g = Graph.of(spark, edges, n=n)
    max_rank = 3

    # brute force: triangles per edge, competition-ranked neighbors
    adj = {u: set() for u in range(n)}
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    tri = {
        (u, v): len(adj[u] & adj[v]) for u, v in edges
    }
    def topk(u):
        ranked = sorted(adj[u], key=lambda w: -tri[tuple(sorted((u, w)))])
        out = set()
        rank = 0
        last = None
        for i, w in enumerate(ranked, 1):
            t = tri[tuple(sorted((u, w)))]
            if t != last:
                rank = i
                last = t
            if rank <= max_rank:
                out.add(w)
        return out

    got = {
        (r["src"], r["dst"]): r["score"]
        for r in simmelian_overlap_scores(g, max_rank=max_rank).collect()
    }
    for u, v in edges:
        exp = len(topk(u) & topk(v))
        assert got[(u, v)] == exp, (u, v, got[(u, v)], exp)


def test_local_max_matching_valid_and_dominant(spark):
    from networkit_spark.operators.matching import local_max_matching

    edges = [(0, 1, 5.0), (1, 2, 3.0), (2, 3, 4.0), (3, 4, 1.0), (4, 5, 2.0)]
    df = spark.createDataFrame(edges, "src long, dst long, weight double")
    sym = df.union(df.selectExpr("dst as src", "src as dst", "weight"))
    g = Graph(nodes=spark.range(6).toDF("id"), edges=sym, directed=False, weighted=True)
    got = sorted((r["u"], r["v"]) for r in local_max_matching(g).collect())
    # path weights 5,3,4,1,2: local maxima (0,1) and (2,3); then (4,5)
    assert got == [(0, 1), (2, 3), (4, 5)]
    # matching validity on a random graph: no shared endpoints, maximal
    import random

    rnd = random.Random(9)
    redges = sorted({tuple(sorted((rnd.randrange(30), rnd.randrange(30)))) for _ in range(60)})
    redges = [e for e in redges if e[0] != e[1]]
    rg = Graph.of(spark, redges, n=30)
    m = [(r["u"], r["v"]) for r in local_max_matching(rg).collect()]
    used = [x for p in m for x in p]
    assert len(used) == len(set(used))
    matched = set(used)
    for u, v in redges:  # maximality: no live edge remains
        assert u in matched or v in matched


def test_gce_expands_planted_community(spark):
    from networkit_spark.operators.scd import gce

    # two 6-cliques joined by one bridge edge
    c1 = [(a, b) for a in range(6) for b in range(a + 1, 6)]
    c2 = [(a, b) for a in range(6, 12) for b in range(a + 1, 12)]
    edges = c1 + c2 + [(5, 6)]
    g = Graph.of(spark, edges, n=12)
    members = sorted(r["node"] for r in gce(g, seeds=[0]).collect())
    assert members == [0, 1, 2, 3, 4, 5]


def test_reachable_nodes_directed(spark):
    from networkit_spark.operators.reachability import reachable_nodes

    edges = [(0, 1), (1, 2), (3, 2)]
    g = Graph.of(spark, edges, n=5, directed=True)
    got = {r["id"]: r["reachable"] for r in reachable_nodes(g).collect()}
    assert got == {0: 3, 1: 2, 2: 1, 3: 2, 4: 1}


def test_commute_time_distance_vs_pinv(spark):
    """CG Laplacian solve vs numpy pseudoinverse (CommuteTimeDistance.cpp
    runSinglePair: sqrt(vol · (e_u − e_v)ᵀ L⁺ (e_u − e_v)))."""
    import numpy as np

    from networkit_spark.operators.numerics import commute_time_distance

    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2), (3, 4)]
    n = 5
    g = Graph.of(spark, edges, n=n)
    A = np.zeros((n, n))
    for u, v in edges:
        A[u][v] = A[v][u] = 1.0
    L = np.diag(A.sum(1)) - A
    Lp = np.linalg.pinv(L)
    vol = A.sum()
    pairs = [(0, 4), (1, 3), (0, 2)]
    got = {
        (r["u"], r["v"]): r["ectd"]
        for r in commute_time_distance(g, pairs).collect()
    }
    for u, v in pairs:
        e = np.zeros(n)
        e[u], e[v] = 1.0, -1.0
        exp = float(np.sqrt(vol * e @ Lp @ e))
        assert got[(u, v)] == pytest.approx(exp, rel=1e-5), (u, v)


def test_max_flow_clrs_fixture(spark):
    """Push-relabel value == known max flow (CLRS fig. 26 network, 23)."""
    from networkit_spark.operators.flow import max_flow

    arcs = [
        (0, 1, 16.0), (0, 2, 13.0), (1, 3, 12.0), (2, 1, 4.0), (2, 4, 14.0),
        (3, 2, 9.0), (3, 5, 20.0), (4, 3, 7.0), (4, 5, 4.0),
    ]
    e = spark.createDataFrame(arcs, "src long, dst long, weight double")
    g = Graph(nodes=spark.range(6).toDF("id"), edges=e, directed=True, weighted=True)
    assert max_flow(g, 0, 5) == pytest.approx(23.0, abs=1e-9)


def test_max_flow_undirected_and_disconnected(spark):
    from networkit_spark.operators.flow import max_flow

    # diamond: two vertex-disjoint unit paths -> flow 2
    edges = [(0, 1, 1.0), (1, 3, 1.0), (0, 2, 1.0), (2, 3, 1.0)]
    e = spark.createDataFrame(edges, "src long, dst long, weight double")
    sym = e.union(e.selectExpr("dst as src", "src as dst", "weight"))
    g = Graph(nodes=spark.range(4).toDF("id"), edges=sym, directed=False, weighted=True)
    assert max_flow(g, 0, 3) == pytest.approx(2.0, abs=1e-9)
    # disconnected sink -> 0
    e2 = spark.createDataFrame([(0, 1, 1.0)], "src long, dst long, weight double")
    sym2 = e2.union(e2.selectExpr("dst as src", "src as dst", "weight"))
    g2 = Graph(nodes=spark.range(3).toDF("id"), edges=sym2, directed=False, weighted=True)
    assert max_flow(g2, 0, 2) == pytest.approx(0.0, abs=1e-9)


def test_laplacian_centrality_reference_goldens(spark):
    """CentralityGTest testLaplacianCentrality(Unweighted): exact."""
    from networkit_spark.operators.spectral import laplacian_centrality

    edges = [(0, 1), (0, 2), (1, 2), (1, 3), (1, 4), (4, 5)]
    g = Graph.of(spark, edges, n=6)
    got = {r["id"]: r["score"] for r in laplacian_centrality(g).collect()}
    assert [got[i] for i in range(6)] == [18.0, 34.0, 18.0, 10.0, 16.0, 6.0]
    # weighted + normalized fixture (CentralityGTest.cpp:1340-1384)
    wedges = [(0, 1, 4.0), (0, 2, 2.0), (1, 2, 1.0), (1, 3, 2.0), (1, 4, 2.0), (4, 5, 1.0)]
    df = spark.createDataFrame(wedges, "src long, dst long, weight double")
    sym = df.union(df.selectExpr("dst as src", "src as dst", "weight"))
    gw = Graph(
        nodes=spark.range(6).toDF("id"), edges=sym, directed=False, weighted=True
    )
    gotw = {r["id"]: r["score"] for r in laplacian_centrality(gw).collect()}
    assert [gotw[i] for i in range(6)] == [140.0, 180.0, 56.0, 44.0, 52.0, 8.0]
    gotn = {
        r["id"]: round(r["score"], 10)
        for r in laplacian_centrality(gw, normalized=True).collect()
    }
    assert [gotn[i] for i in range(6)] == [0.70, 0.90, 0.28, 0.22, 0.26, 0.04]


def test_scan_and_forest_fire_scores(spark):
    from networkit_spark.operators.sparsification import (
        forest_fire_scores,
        scan_structural_similarity_scores,
    )

    edges = [(0, 1), (0, 2), (1, 2), (2, 3)]
    g = Graph.of(spark, edges, n=4)
    got = {
        (r["src"], r["dst"]): r["score"]
        for r in scan_structural_similarity_scores(g).collect()
    }
    import math

    assert got[(0, 1)] == pytest.approx(2 / math.sqrt(3 * 3), abs=1e-12)
    assert got[(2, 3)] == pytest.approx(1 / math.sqrt(4 * 2), abs=1e-12)

    ff = forest_fire_scores(g, pf=0.9, n_fires=8, seed=3)
    rows = {(r["src"], r["dst"]): r["score"] for r in ff.collect()}
    assert set(rows) == {(0, 1), (0, 2), (1, 2), (2, 3)}
    assert any(v > 0 for v in rows.values())
    # deterministic
    ff2 = {
        (r["src"], r["dst"]): r["score"]
        for r in forest_fire_scores(g, pf=0.9, n_fires=8, seed=3).collect()
    }
    assert rows == ff2


def test_graphtools_sort_and_random_neighbor(spark):
    from networkit_spark.graphtools import random_neighbor, sort_edges_by_weight

    edges = [(0, 1, 3.0), (1, 2, 1.0), (2, 3, 2.0)]
    df = spark.createDataFrame(edges, "src long, dst long, weight double")
    sym = df.union(df.selectExpr("dst as src", "src as dst", "weight"))
    g = Graph(nodes=spark.range(4).toDF("id"), edges=sym, directed=False, weighted=True)
    got = [tuple(r) for r in sort_edges_by_weight(g).select("weight").collect()]
    assert got == [(1.0,), (2.0,), (3.0,)]
    nb = random_neighbor(g, 1, seed=5)
    assert nb in (0, 2)
    assert random_neighbor(g, 1, seed=5) == nb


def test_matrix_market_and_cover_roundtrip(spark, tmp_path):
    from networkit_spark.sources.readers import (
        read_cover,
        read_cover_text,
        read_matrix_market,
        write_cover,
    )

    mm = tmp_path / "m.mtx"
    mm.write_text(
        "%%MatrixMarket matrix coordinate real symmetric\n"
        "% comment\n"
        "4 4 3\n"
        "1 2 1.5\n"
        "2 3 2.0\n"
        "3 4 1.0\n"
    )
    g = read_matrix_market(spark, str(mm))
    assert not g.directed
    e = sorted(map(tuple, g.canonical_undirected_edges().select("src", "dst").collect()))
    assert e == [(0, 1), (1, 2), (2, 3)]

    cov = spark.createDataFrame(
        [(0, 0), (0, 1), (1, 1), (2, 0)], "node long, subset long"
    )
    p = str(tmp_path / "cover")
    write_cover(cov, p)
    back = sorted(map(tuple, read_cover(spark, p).collect()))
    assert back == [(0, 0), (0, 1), (1, 1), (2, 0)]

    ct = tmp_path / "c.cover"
    ct.write_text("0 1\n1\n0\n")
    got = sorted(map(tuple, read_cover_text(spark, str(ct)).collect()))
    assert got == [(0, 0), (0, 1), (1, 1), (2, 0)]


def test_dot_writer(spark, tmp_path):
    from networkit_spark.sources.readers import write_dot

    g = Graph.of(spark, [(0, 1), (1, 2)], n=3)
    p = str(tmp_path / "g.dot")
    write_dot(g, p)
    txt = "\n".join(
        r["value"] for r in spark.read.text(p).collect()
    )
    assert "graph G {" in txt and "0 -- 1;" in txt and "}" in txt


def test_spanning_edge_centrality_exact_and_jl(spark):
    """Effective resistance vs numpy pinv (SpanningEdgeCentrality.cpp)."""
    import numpy as np

    from networkit_spark.operators.numerics import (
        spanning_edge_centrality,
        spanning_edge_centrality_jl,
    )

    edges = [(0, 1), (1, 2), (2, 0), (2, 3)]
    n = 4
    g = Graph.of(spark, edges, n=n)
    A = np.zeros((n, n))
    for u, v in edges:
        A[u][v] = A[v][u] = 1.0
    Lp = np.linalg.pinv(np.diag(A.sum(1)) - A)

    def reff(u, v):
        ei = np.zeros(n)
        ei[u], ei[v] = 1, -1
        return float(ei @ Lp @ ei)

    got = {
        (r["src"], r["dst"]): r["score"]
        for r in spanning_edge_centrality(g, tol=1e-8).collect()
    }
    for e_ in edges:
        u, v = sorted(e_)
        assert got[(u, v)] == pytest.approx(reff(u, v), rel=1e-4), (u, v)
    # bridge edge (2,3) must have R_eff exactly 1
    assert got[(2, 3)] == pytest.approx(1.0, rel=1e-4)

    # JL sketch tier: k=16 keeps CI time low; JL error ~ 1/sqrt(k), so
    # assert the loose multiplicative band and the relative ORDER of the
    # bridge (max R_eff) vs the cycle edges
    jl = {
        (r["src"], r["dst"]): r["score"]
        for r in spanning_edge_centrality_jl(g, k=16, tol=1e-5, seed=3).collect()
    }
    for e_ in edges:
        u, v = sorted(e_)
        assert 0.25 * reff(u, v) <= jl[(u, v)] <= 2.5 * reff(u, v), (u, v)
    assert max(jl, key=jl.get) == (2, 3)


def test_metis_and_snap_writer_roundtrip(spark, tmp_path):
    from networkit_spark.sources.readers import (
        read_metis,
        read_snap,
        write_metis,
        write_snap,
    )

    edges = [(0, 1), (1, 2), (2, 3), (0, 3), (1, 3)]
    g = Graph.of(spark, edges, n=5)  # node 4 isolated
    pm = str(tmp_path / "g.metis")
    write_metis(g, pm)
    back = read_metis(spark, pm)
    assert back.num_nodes() == 5
    assert sorted(map(tuple, back.canonical_undirected_edges().collect())) == sorted(
        edges
    )
    ps = str(tmp_path / "g.snap")
    write_snap(g, ps)
    back2 = read_snap(spark, ps)
    assert back2.canonical_undirected_edges().count() == len(edges)


def test_permanence_two_cliques(spark):
    from networkit_spark.operators.community_quality import permanence

    # two triangles bridged: permanence formula by hand for node 0
    edges = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (0, 3)]
    g = Graph.of(spark, edges, n=6)
    labels = spark.createDataFrame(
        [(i, 0 if i < 3 else 1) for i in range(6)], "node long, label long"
    )
    got = {r["id"]: r["permanence"] for r in permanence(g, labels).collect()}
    # node 0: I=2 (1,2), Emax=1 (community 1 via node 3), deg=3,
    # C_in = 1 triangle / C(2,2)=1 -> 1.0; perm = 2/(1*3) - 0 = 2/3
    assert got[0] == pytest.approx(2 / 3, abs=1e-12)
    # node 1: I=2, Emax=1(floor), deg=2, C_in=1 -> 2/(1*2) - 0 = 1.0
    assert got[1] == pytest.approx(1.0, abs=1e-12)


def test_approx_electrical_closeness_ranking(spark):
    """JL-estimated electrical closeness: center of a star beats leaves."""
    from networkit_spark.operators.numerics import approx_electrical_closeness

    edges = [(0, i) for i in range(1, 7)] + [(1, 2), (3, 4)]
    g = Graph.of(spark, edges, n=7)
    got = {
        r["id"]: r["score"]
        for r in approx_electrical_closeness(g, k=16, tol=1e-5, seed=4).collect()
    }
    assert got[0] == max(got.values())
    assert all(v > 0 for v in got.values())


def test_umsf_and_random_msf(spark):
    from networkit_spark.operators.matching import (
        random_maximum_spanning_forest,
        union_maximum_spanning_forest,
    )

    # square with two heavy parallel paths: weights force a unique max
    # forest except a tie on (2,3)/(0,3)
    edges = [(0, 1, 3.0), (1, 2, 3.0), (2, 3, 1.0), (0, 3, 1.0), (0, 2, 2.0)]
    df = spark.createDataFrame(edges, "src long, dst long, weight double")
    sym = df.union(df.selectExpr("dst as src", "src as dst", "weight"))
    g = Graph(nodes=spark.range(4).toDF("id"), edges=sym, directed=False, weighted=True)
    umsf = sorted(
        (r["src"], r["dst"]) for r in union_maximum_spanning_forest(g).collect()
    )
    # heaviest edges (0,1),(1,2) always in; (0,2) w=2 connects already-
    # connected endpoints via heavier edges -> OUT; both w=1 edges tie:
    # each is in SOME max forest -> both in
    assert umsf == [(0, 1), (0, 3), (1, 2), (2, 3)]

    rmsf = random_maximum_spanning_forest(g, seed=3)
    rows = sorted((r["src"], r["dst"], r["weight"]) for r in rmsf.collect())
    assert len(rows) == 3  # spanning tree of 4 nodes
    assert {(0, 1, 3.0), (1, 2, 3.0)} <= {(a, b, w) for a, b, w in rows}
    total = sum(w for _, _, w in rows)
    assert total == pytest.approx(7.0)  # 3+3+1 (either tie winner)
    # deterministic
    rows2 = sorted(
        (r["src"], r["dst"], r["weight"])
        for r in random_maximum_spanning_forest(g, seed=3).collect()
    )
    assert rows == rows2


def test_random_msf_close_weights(spark):
    """Regression (round-4 ADVICE): tie-break must be lexicographic, not an
    additive jitter — distinct weights with gaps < 0.5 must still yield the
    true maximum forest for EVERY seed, and both edge orientations must
    carry the identical tie-break."""
    from networkit_spark.operators.matching import random_maximum_spanning_forest

    edges = [(0, 1, 0.52), (1, 2, 0.51), (0, 2, 0.50)]
    df = spark.createDataFrame(edges, "src long, dst long, weight double")
    sym = df.union(df.selectExpr("dst as src", "src as dst", "weight"))
    g = Graph(nodes=spark.range(3).toDF("id"), edges=sym, directed=False, weighted=True)
    for seed in (1, 3, 4):
        got = sorted(
            (r["src"], r["dst"])
            for r in random_maximum_spanning_forest(g, seed=seed).collect()
        )
        assert got == [(0, 1), (1, 2)], (seed, got)


def test_quadrangle_count_per_edge(spark):
    from networkit_spark.operators.triangles import quadrangle_count_per_edge

    # C4 plus a chord-less pendant
    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (3, 4)]
    g = Graph.of(spark, edges, n=5)
    got = {
        (r["src"], r["dst"]): r["quadrangles"]
        for r in quadrangle_count_per_edge(g).collect()
    }
    for e in [(0, 1), (1, 2), (2, 3), (0, 3)]:
        assert got[e] == 1, e
    assert got[(3, 4)] == 0


def test_clique_detect(spark):
    from networkit_spark.operators.scd import clique_detect

    # K4 on {0,1,2,3} + triangle {0,4,5}: seed 0's largest clique = K4
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    edges = k4 + [(0, 4), (0, 5), (4, 5)]
    g = Graph.of(spark, edges, n=6)
    got = sorted(r["node"] for r in clique_detect(g, seed=0).collect())
    assert got == [0, 1, 2, 3]
    got5 = sorted(r["node"] for r in clique_detect(g, seed=5).collect())
    assert got5 == [0, 4, 5]


def test_lfm_local_planted_community(spark):
    from networkit_spark.operators.scd import lfm_local

    c1 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    c2 = [(a, b) for a in range(5, 10) for b in range(a + 1, 10)]
    edges = c1 + c2 + [(4, 5)]
    g = Graph.of(spark, edges, n=10)
    members = sorted(r["node"] for r in lfm_local(g, seeds=[0]).collect())
    assert members == [0, 1, 2, 3, 4]
