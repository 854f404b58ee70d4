"""Maximal cliques (ego-net Bron-Kerbosch) and hyperplane LSH."""

import itertools

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.cliques import maximal_cliques


def py_maximal_cliques(n, edges):
    adj = {i: set() for i in range(n)}
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    out = []

    def bk(r, p, x):
        if not p and not x:
            out.append(tuple(sorted(r)))
            return
        pivot = max(p | x, key=lambda u: len(adj[u] & p))
        for u in sorted(p - adj[pivot]):
            bk(r | {u}, p & adj[u], x & adj[u])
            p = p - {u}
            x = x | {u}

    bk(set(), set(range(n)), set())
    return sorted(out)


CLIQUE_G = [
    (0, 1), (0, 2), (1, 2), (1, 3), (2, 3),  # K4 minus (0,3)
    (3, 4), (4, 5), (3, 5), (5, 6),          # triangle 3-4-5, pendant 6
]


def test_maximal_cliques_vs_bk(spark):
    g = Graph.of(spark, CLIQUE_G, n=8)  # node 7 isolated
    got = sorted(
        tuple(r["clique"]) for r in maximal_cliques(g, min_size=2).collect()
    )
    exp = [c for c in py_maximal_cliques(8, CLIQUE_G) if len(c) >= 2]
    assert got == exp, (got, exp)


def test_maximal_cliques_singletons(spark):
    g = Graph.of(spark, [(0, 1)], n=3)
    got = sorted(tuple(r["clique"]) for r in maximal_cliques(g, min_size=1).collect())
    assert got == [(0, 1), (2,)]


def test_maximal_cliques_k5(spark):
    k5 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    g = Graph.of(spark, k5, n=5)
    got = [tuple(r["clique"]) for r in maximal_cliques(g).collect()]
    assert got == [(0, 1, 2, 3, 4)]


def test_hyperplane_lsh_groups_similar(spark):
    from networkit_spark.pipeline.similarity import (
        cosine_near_dupes,
        hyperplane_lsh_buckets,
    )

    rows = []
    for i in range(20):
        base = [1.0 if d == (i % 4) * 8 else 0.05 for d in range(32)]
        rows.append((i, [float(x) for x in base]))
    # pairs i, i+4 share direction exactly
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    b = hyperplane_lsh_buckets(embs, planes=8, seed=3)
    bucket = {r["id"]: r["bucket"] for r in b.collect()}
    # identical-direction vectors must share buckets
    for i in range(16):
        assert bucket[i] == bucket[i + 4], (i, bucket)
    # bucketed near-dup join finds the identical-direction pairs
    withb = embs.join(b.withColumnRenamed("id", "vec_id"), "vec_id")
    pairs = cosine_near_dupes(withb, threshold=0.99, bucket_col="bucket")
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 4) in got and (1, 5) in got


def test_ivf_topk_kmeans_recall(spark):
    """K-means IVF must recover most exact top-1 neighbors on clustered data."""
    from networkit_spark.pipeline.similarity import cosine_topk, ivf_topk_kmeans

    rows = []
    for i in range(60):
        c = i % 3
        vec = [(1.0 if d // 10 == c else 0.0) + 0.01 * ((i * 7 + d) % 5) for d in range(30)]
        rows.append((i, [float(x) for x in vec]))
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = embs.filter(F.col("vec_id") < 6)
    exact = {
        r["query_id"]: r["neighbor_id"]
        for r in cosine_topk(embs, queries, k=1).collect()
    }
    approx = {
        r["query_id"]: r["neighbor_id"]
        for r in ivf_topk_kmeans(embs, queries, k=1, n_centroids=3, nprobe=1, seed=9).collect()
    }
    hits = sum(1 for q in exact if approx.get(q) == exact[q])
    assert hits >= 5, (hits, exact, approx)


def test_cliques_degeneracy_anchor_and_max_ego(spark):
    """Planted hub (star + clique): degeneracy-rank anchoring keeps the
    hub's own BK task trivial, max_ego drops oversized egos with a
    logged count, and the unbounded run still enumerates everything."""
    from networkit_spark.operators.cliques import maximal_cliques

    # hub 0 joined to 20 leaves, plus a K4 on 21..24 (disjoint from star)
    star = [(0, i) for i in range(1, 21)]
    k4 = [(a, b) for a in range(21, 25) for b in range(a + 1, 25)]
    g = Graph.of(spark, star + k4, n=25)

    full = {tuple(r["clique"]) for r in maximal_cliques(g, min_size=2).collect()}
    # every star edge is a maximal 2-clique; the K4 is one maximal clique
    assert (21, 22, 23, 24) in full
    assert all((0, i) in full for i in range(1, 21))

    # hub forward set is tiny under degeneracy rank (hub ranks last in
    # its class), so max_ego=5 must NOT drop the K4 or the star pairs
    capped = {
        tuple(r["clique"])
        for r in maximal_cliques(g, min_size=2, max_ego=5).collect()
    }
    assert capped == full

    # an aggressive cap on a denser graph drops egos (and only then)
    k8 = [(a, b) for a in range(8) for b in range(a + 1, 8)]
    g8 = Graph.of(spark, k8, n=8)
    few = {
        tuple(r["clique"])
        for r in maximal_cliques(g8, min_size=2, max_ego=3).collect()
    }
    allk8 = {
        tuple(r["clique"]) for r in maximal_cliques(g8, min_size=2).collect()
    }
    assert allk8 == {tuple(range(8))}
    assert len(few) < len(allk8) or few != allk8  # the K8 clique was dropped
