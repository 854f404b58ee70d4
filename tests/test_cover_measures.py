"""Cover measures, sampled Rand measures, DynamicNMIDistance (r7)."""

from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.community_quality import (
    cover_f1_similarity,
    cover_hub_dominance,
    dynamic_nmi_distance,
    nmi_distance,
    sampled_graph_structural_rand_dissimilarity,
    sampled_node_structural_rand_dissimilarity,
)


def _cover(spark, rows):
    return spark.createDataFrame(rows, "node long, subset long")


def test_cover_f1_similarity_exact_match(spark):
    g = Graph.of(spark, [(0, 1), (2, 3)], n=4)
    c = _cover(spark, [(0, 0), (1, 0), (2, 1), (3, 1)])
    res = cover_f1_similarity(g, c, c)
    assert res["unweighted_avg"] == 1.0 and res["min"] == 1.0


def test_cover_f1_similarity_partial(spark):
    g = Graph.of(spark, [(0, 1), (1, 2), (2, 3)], n=4)
    c = _cover(spark, [(0, 0), (1, 0), (2, 0), (3, 0)])  # one cluster of 4
    ref = _cover(spark, [(0, 0), (1, 0), (2, 1), (3, 1)])  # two halves
    res = cover_f1_similarity(g, c, ref)
    # overlap 2 with each half: precision 2/2=1, recall 2/4 -> F1 = 2/3
    assert abs(res["unweighted_avg"] - 2 / 3) < 1e-12
    # weighted: one cluster, sz 4, memberships 4 -> same
    assert abs(res["weighted_avg"] - 2 / 3) < 1e-12


def test_cover_f1_overlapping_memberships(spark):
    g = Graph.of(spark, [(0, 1)], n=3)
    c = _cover(spark, [(0, 0), (1, 0), (1, 1), (2, 1)])  # node 1 in both
    res = cover_f1_similarity(g, c, c)
    assert res["unweighted_avg"] == 1.0
    assert res["values"].count() == 2


def test_cover_hub_dominance(spark):
    # star 0-(1,2,3) plus isolated subset {4}
    g = Graph.of(spark, [(0, 1), (0, 2), (0, 3)], n=5)
    c = _cover(spark, [(0, 0), (1, 0), (2, 0), (3, 0), (4, 1)])
    res = cover_hub_dominance(g, c)
    vals = {int(r["subset"]): float(r["value"]) for r in res["values"].collect()}
    assert vals == {0: 1.0, 1: 1.0}  # hub deg 3 / (4-1); singleton 1
    # overlapping: node 0 also in subset 1 -> subset 1 {0, 4}, no internal edge
    c2 = _cover(spark, [(0, 0), (1, 0), (2, 0), (3, 0), (4, 1), (0, 1)])
    res2 = cover_hub_dominance(g, c2)
    vals2 = {int(r["subset"]): float(r["value"]) for r in res2["values"].collect()}
    assert vals2[1] == 0.0  # max internal degree 0 over size-2 subset


def test_sampled_rand_measures(spark):
    g = Graph.of(spark, [(i, i + 1) for i in range(29)], n=30)
    lab = g.nodes.select(F.col("id").alias("node"), (F.col("id") % 3).alias("label"))
    same_n = sampled_node_structural_rand_dissimilarity(lab, lab, max_samples=20)
    same_g = sampled_graph_structural_rand_dissimilarity(g, lab, lab, max_samples=20)
    assert same_n == 0.0 and same_g == 0.0
    other = g.nodes.select(F.col("id").alias("node"), (F.col("id") % 2).alias("label"))
    d = sampled_node_structural_rand_dissimilarity(lab, other, max_samples=20, seed=1)
    assert 0.0 <= d <= 1.0
    assert d == sampled_node_structural_rand_dissimilarity(
        lab, other, max_samples=20, seed=1
    )


def test_dynamic_nmi_distance_restriction(spark):
    g = Graph.of(spark, [(0, 1), (1, 2), (2, 3)], n=4)
    old = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 1), (3, 1), (9, 5)], "node long, label long"
    )
    new = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 1), (3, 1)], "node long, label long"
    )
    # node 9 (absent from g and new) must not affect the distance
    assert dynamic_nmi_distance(g, old, new) == nmi_distance(new, new)
    assert dynamic_nmi_distance(g, old, new) == 0.0
    flipped = spark.createDataFrame(
        [(0, 1), (1, 0), (2, 0), (3, 1)], "node long, label long"
    )
    assert dynamic_nmi_distance(g, old, flipped) > 0.0
