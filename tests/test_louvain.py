"""PLM (Louvain) quality tests — mirrors how the reference tests PLM:
modularity quality + planted-partition recovery, never exact labels
(PLM is order-dependent in the reference too)."""

from __future__ import annotations

from networkit_spark.generators import clustered_random
from networkit_spark.graph import Graph
from networkit_spark.operators.community_quality import equal_clusterings, modularity
from networkit_spark.operators.louvain import plm


def test_plm_two_cliques(spark):
    k5a = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    k5b = [(a + 5, b + 5) for a, b in k5a]
    g = Graph.of(spark, k5a + k5b + [(4, 5)], n=10)
    res = plm(g, max_rounds=10)
    labels = {r["node"]: r["label"] for r in res.labels.collect()}
    assert len({labels[i] for i in range(5)}) == 1
    assert len({labels[i] for i in range(5, 10)}) == 1
    assert labels[0] != labels[9]
    q = modularity(g, res.labels)
    assert q > 0.3


def test_plm_planted_partition_recovers_truth(spark):
    g, truth = clustered_random(spark, 30, 3, p_intra=1.0, p_inter=0.0, seed=11)
    res = plm(g, max_rounds=10)
    assert equal_clusterings(res.labels, truth)


def test_plm_improves_modularity_vs_singletons(spark):
    g, _ = clustered_random(spark, 24, 3, p_intra=0.9, p_inter=0.05, seed=3)
    res = plm(g, max_rounds=10)
    singletons = g.nodes.selectExpr("id AS node", "id AS label")
    assert modularity(g, res.labels) > modularity(g, singletons) + 0.2


def test_agglomerative_clusterer_recovers_planted_partition(spark):
    """ParallelAgglomerativeClusterer: disconnected planted cliques
    agglomerate into exactly their components; a bridged variant yields
    a valid >=2-community clustering with positive modularity (the
    reference's own tests grade this algorithm by quality, since its
    maximal matching may legitimately merge across a bridge)."""
    from networkit_spark.operators.community_quality import modularity
    from networkit_spark.operators.louvain import agglomerative_clusterer

    k5a = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    k5b = [(a, b) for a in range(5, 10) for b in range(a + 1, 10)]
    g0 = Graph.of(spark, k5a + k5b, n=10)
    got0 = {r["node"]: r["label"] for r in agglomerative_clusterer(g0).collect()}
    assert {got0[i] for i in range(5)}.isdisjoint({got0[i] for i in range(5, 10)})

    g = Graph.of(spark, k5a + k5b + [(4, 5)], n=10)
    labels = agglomerative_clusterer(g)
    got = {r["node"]: r["label"] for r in labels.collect()}
    assert set(got) == set(range(10))
    assert len(set(got.values())) >= 2
    q = modularity(g, labels)
    assert q > 0.25, q


def test_louvain_map_equation_planted_partition(spark):
    """LouvainMapEquation: planted two-clique graph minimizes the map
    equation into the two cliques; deterministic across runs."""
    from networkit_spark.operators.louvain import louvain_map_equation

    k5a = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    k5b = [(a, b) for a in range(5, 10) for b in range(a + 1, 10)]
    g = Graph.of(spark, k5a + k5b + [(4, 5)], n=10)
    labels = louvain_map_equation(g)
    got = {r["node"]: r["label"] for r in labels.collect()}
    assert len({got[i] for i in range(5)}) == 1
    assert len({got[i] for i in range(5, 10)}) == 1
    assert {got[i] for i in range(5)}.isdisjoint({got[i] for i in range(5, 10)})
    got2 = {r["node"]: r["label"] for r in louvain_map_equation(g).collect()}
    assert got2 == got
