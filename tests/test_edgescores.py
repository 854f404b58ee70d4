"""edgescores/ + remaining sparsification score classes."""

import math

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.edgescores import (
    chance_corrected_triangle_score,
    edge_score_as_weight,
    edge_score_blender,
    edge_score_linearizer,
    edge_score_normalizer,
    geometric_mean_score,
    multiscale_score,
    random_edge_score,
    random_node_edge_score,
)


def _scores(df):
    return {(int(r["src"]), int(r["dst"])): float(r["score"]) for r in df.collect()}


def _mk(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long, score double")


TRI = [(0, 1), (0, 2), (1, 2), (2, 3)]


def test_as_weight_blender_normalizer(spark):
    g = Graph.of(spark, TRI, n=4)
    s = _mk(spark, [(0, 1, 2.0), (0, 2, 3.0), (1, 2, 4.0), (2, 3, 5.0)])
    wg = edge_score_as_weight(g, s, squared=True, offset=1.0, factor=2.0)
    w = {
        (int(r["src"]), int(r["dst"])): float(r["weight"])
        for r in wg.edges.filter(F.col("src") < F.col("dst")).collect()
    }
    assert w == {(0, 1): 9.0, (0, 2): 19.0, (1, 2): 33.0, (2, 3): 51.0}

    s1 = _mk(spark, [(0, 1, 9.0), (0, 2, 9.0), (1, 2, 9.0), (2, 3, 9.0)])
    sel = spark.createDataFrame(
        [(0, 1, True), (0, 2, False), (1, 2, True), (2, 3, False)],
        "src long, dst long, sel boolean",
    )
    blended = _scores(edge_score_blender(s, s1, sel))
    assert blended == {(0, 1): 9.0, (0, 2): 3.0, (1, 2): 9.0, (2, 3): 9.0 if False else 5.0}

    norm = _scores(edge_score_normalizer(s, lower=0.0, upper=1.0))
    exp = {(0, 1): 0.0, (0, 2): 1 / 3, (1, 2): 2 / 3, (2, 3): 1.0}
    assert all(abs(norm[k] - v) < 1e-12 for k, v in exp.items())
    inv = _scores(edge_score_normalizer(s, invert=True))
    expi = {(0, 1): 1.0, (0, 2): 2 / 3, (1, 2): 1 / 3, (2, 3): 0.0}
    assert all(abs(inv[k] - v) < 1e-12 for k, v in expi.items())


def test_linearizer(spark):
    g = Graph.of(spark, TRI, n=4)
    s = _mk(spark, [(0, 1, 10.0), (0, 2, 1.0), (1, 2, 7.0), (2, 3, 7.0)])
    lin = _scores(edge_score_linearizer(g, s))
    # ascending: (0,2)=0, ties (1,2)<(2,3) by canonical pair, (0,1)=1
    assert lin == {(0, 2): 0.0, (1, 2): 1 / 3, (2, 3): 2 / 3, (0, 1): 1.0}
    inv = _scores(edge_score_linearizer(g, s, inverse=True))
    assert inv == {(0, 1): 0.0, (1, 2): 1 / 3, (2, 3): 2 / 3, (0, 2): 1.0}
    single = _scores(edge_score_linearizer(g, _mk(spark, [(0, 1, 3.0)])))
    assert single == {(0, 1): 0.5}


def test_geometric_mean_and_multiscale(spark):
    g = Graph.of(spark, TRI, n=4)
    s = _mk(spark, [(0, 1, 1.0), (0, 2, 2.0), (1, 2, 3.0), (2, 3, 4.0)])
    gm = _scores(geometric_mean_score(g, s))
    # sums: 0->3, 1->4, 2->9, 3->4
    assert abs(gm[(0, 1)] - 1 / math.sqrt(12)) < 1e-12
    assert abs(gm[(2, 3)] - 4 / math.sqrt(36)) < 1e-12

    ms = _scores(multiscale_score(g, s))
    # node 2: deg 3, sum 9; p(2,3)=4/9 -> 1-(5/9)^2; node 3 deg 1 -> 1-(1)^0 = 0
    assert abs(ms[(2, 3)] - (1 - (5 / 9) ** 2)) < 1e-12
    # edge (0,1): u=0 deg2 sum3 p=1/3 -> 1-(2/3)^1; v=1 deg2 sum4 p=1/4 -> 1-(3/4)^1
    assert abs(ms[(0, 1)] - max(1 / 3, 1 / 4)) < 1e-12


def test_chance_corrected_triangles(spark):
    g = Graph.of(spark, TRI, n=4)
    cc = _scores(chance_corrected_triangle_score(g))
    # (0,1): tri=1, (2-1)(2-1)=1 -> 1*(4-2)/1 = 2; (2,3): tri=0, deg(3)=1 -> 1
    assert cc[(0, 1)] == 2.0 and cc[(0, 2)] == 1.0 and cc[(1, 2)] == 1.0
    assert cc[(2, 3)] == 1.0


def test_random_scores(spark):
    g = Graph.of(spark, TRI, n=4)
    r = _scores(random_edge_score(g, seed=1))
    assert all(0.0 <= v < 1.0 for v in r.values()) and len(set(r.values())) == 4
    assert r == _scores(random_edge_score(g, seed=1))

    rne = _scores(random_node_edge_score(g, seed=3))
    assert sorted(rne.values()) == [0.0, 0.25, 0.5, 0.75]
    assert rne == _scores(random_node_edge_score(g, seed=3))
    with pytest.raises(ValueError, match="max_edges"):
        random_node_edge_score(g, max_edges=2)
