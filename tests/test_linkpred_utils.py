"""Round-7 linkprediction utilities."""

import math

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.linkprediction import (
    adjusted_rand_index,
    algebraic_distance_index,
    link_thresholder_by_count,
    link_thresholder_by_percentage,
    link_thresholder_by_score,
    missing_links_finder,
    precision_recall_points,
    random_link_sampler_by_count,
    random_link_sampler_by_percentage,
    same_community_index,
)


def _pairs_df(spark, rows):
    return spark.createDataFrame(rows, "u long, v long")


def _scores(df):
    return {(int(r["u"]), int(r["v"])): float(r["score"]) for r in df.collect()}


def test_adjusted_rand_index_reference_formula(spark):
    # square 0-1-2-3-0: N(0)={1,3}, N(2)={1,3} -> common=2, union=2
    g = Graph.of(spark, [(0, 1), (1, 2), (2, 3), (3, 0)], n=4)
    s = _scores(adjusted_rand_index(g, _pairs_df(spark, [(0, 2), (0, 1)])))
    # pair (0,2): a=2, b=c=2, d=4-2=2; num=2(4-4)=0
    assert s[(0, 2)] == 0.0
    # pair (0,1): N(0)={1,3}, N(1)={0,2}: a=0, b=c=4, d=0 -> num=2(0-16)
    # denom = 0+0+0+16+0+16+0 = 32 -> -1.0
    assert s[(0, 1)] == -1.0


def test_same_community_index(spark):
    # two triangles joined by one edge: PLM puts each triangle together
    tri2 = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    g = Graph.of(spark, tri2, n=6)
    s = _scores(same_community_index(g, _pairs_df(spark, [(0, 1), (0, 5), (3, 5)])))
    assert s[(0, 1)] == 1.0 and s[(3, 5)] == 1.0 and s[(0, 5)] == 0.0
    # explicit labels path
    labels = g.nodes.select(F.col("id").alias("node"), (F.col("id") % 2).alias("label"))
    s2 = _scores(same_community_index(g, _pairs_df(spark, [(0, 2), (0, 1)]), labels))
    assert s2 == {(0, 2): 1.0, (0, 1): 0.0}


def test_algebraic_distance_index(spark):
    # two cliques joined by a bridge: intra-clique pairs land closer
    K = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    K2 = [(a + 4, b + 4) for a, b in K]
    g = Graph.of(spark, K + K2 + [(0, 4)], n=8)
    s = _scores(
        algebraic_distance_index(
            g, _pairs_df(spark, [(1, 2), (1, 5)]), num_systems=6, num_iters=25, seed=3
        )
    )
    assert s[(1, 2)] < s[(1, 5)]
    # deterministic
    s2 = _scores(
        algebraic_distance_index(
            g, _pairs_df(spark, [(1, 2), (1, 5)]), num_systems=6, num_iters=25, seed=3
        )
    )
    assert s == s2


def test_missing_links_finder(spark):
    g = Graph.of(spark, [(0, 1), (1, 2), (2, 3), (3, 4)], n=5)
    d2 = {(int(r["u"]), int(r["v"])) for r in missing_links_finder(g, 2).collect()}
    assert d2 == {(0, 2), (1, 3), (2, 4)}
    d4 = {(int(r["u"]), int(r["v"])) for r in missing_links_finder(g, 4).collect()}
    assert d4 == {(0, 4)}


def test_link_thresholder(spark):
    scored = spark.createDataFrame(
        [(0, 1, 0.9), (0, 2, 0.5), (1, 2, 0.5), (2, 3, 0.1)],
        "u long, v long, score double",
    )
    by_s = {(int(r["u"]), int(r["v"])) for r in link_thresholder_by_score(scored, 0.5).collect()}
    assert by_s == {(0, 1), (0, 2), (1, 2)}
    by_c = {(int(r["u"]), int(r["v"])) for r in link_thresholder_by_count(scored, 2).collect()}
    assert by_c == {(0, 1), (0, 2)}  # tie 0.5 broken by (u, v) asc
    by_p = {(int(r["u"]), int(r["v"])) for r in link_thresholder_by_percentage(scored, 0.5).collect()}
    assert by_p == by_c
    with pytest.raises(ValueError):
        link_thresholder_by_count(scored, 9)
    with pytest.raises(ValueError):
        link_thresholder_by_percentage(scored, 1.5)


def test_random_link_sampler(spark):
    g = Graph.of(spark, [(i, j) for i in range(6) for j in range(i + 1, 6)], n=6)
    tr = random_link_sampler_by_count(g, 10, seed=7)
    assert tr.canonical_undirected_edges().count() == 10
    assert tr.nodes.count() == 6  # node set preserved
    tr2 = random_link_sampler_by_count(g, 10, seed=7)
    a = {(int(r["src"]), int(r["dst"])) for r in tr.canonical_undirected_edges().collect()}
    b = {(int(r["src"]), int(r["dst"])) for r in tr2.canonical_undirected_edges().collect()}
    assert a == b
    half = random_link_sampler_by_percentage(g, 0.5, seed=1)
    assert half.canonical_undirected_edges().count() == 7  # int(0.5 * 15)
    with pytest.raises(ValueError):
        random_link_sampler_by_count(g, 16)


def test_precision_recall_points(spark):
    scored = spark.createDataFrame(
        [(0.9, 1), (0.8, 0), (0.7, 1), (0.6, 0)], "score double, label int"
    )
    pts = {
        (round(float(r["recall"]), 6), round(float(r["precision"]), 6))
        for r in precision_recall_points(scored).collect()
    }
    # thresholds desc: t=.9 -> r=.5 p=1; t=.8 -> r=.5 p=.5 (replaces);
    # t=.7 -> r=1 p=2/3; t=.6 -> r=1 p=.5 (replaces)
    assert pts == {(0.5, 0.5), (1.0, 0.5)}
