"""Link prediction, assortativity, sparsification, ANF sketch tests."""

from __future__ import annotations

import math

import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.linkprediction import (
    common_neighbor_scores,
    degree_assortativity,
    preferential_attachment,
)
from networkit_spark.operators.sketches import (
    effective_diameter_approx,
    neighborhood_function,
)
from networkit_spark.operators.sparsification import (
    global_threshold_filter,
    jaccard_similarity_scores,
)


def test_common_neighbor_scores_square(spark):
    # square 0-1-2-3-0: non-edges are the diagonals (0,2) and (1,3),
    # each with exactly 2 common neighbors of degree 2
    g = Graph.of(spark, [(0, 1), (1, 2), (2, 3), (3, 0)], n=4)
    rows = {(r["u"], r["v"]): r for r in common_neighbor_scores(g).collect()}
    assert set(rows) == {(0, 2), (1, 3)}
    r = rows[(0, 2)]
    assert r["common"] == 2
    assert abs(r["jaccard"] - 2 / 2) < 1e-12  # |N∩|=2, |N∪|=2+2-2=2
    assert abs(r["adamic_adar"] - 2 / math.log(2)) < 1e-9
    assert abs(r["resource_alloc"] - 1.0) < 1e-12


def test_common_neighbor_scores_includes_edges(spark):
    # triangle: with include_existing_edges every edge pair has 1 common nbr
    g = Graph.of(spark, [(0, 1), (1, 2), (0, 2)], n=3)
    rows = common_neighbor_scores(g, include_existing_edges=True).collect()
    assert {(r["u"], r["v"]) for r in rows} == {(0, 1), (0, 2), (1, 2)}
    assert all(r["common"] == 1 for r in rows)
    assert common_neighbor_scores(g).count() == 0  # all pairs are edges


def test_preferential_attachment(spark):
    g = Graph.of(spark, [(0, 1), (0, 2), (0, 3), (1, 2)], n=4)
    pairs = spark.createDataFrame([(1, 3), (2, 3)], "u long, v long")
    pa = {(r["u"], r["v"]): r["pref_attach"] for r in preferential_attachment(g, pairs).collect()}
    assert pa == {(1, 3): 2, (2, 3): 2}  # deg1=2, deg2=2, deg3=1


def test_degree_assortativity_star_negative(spark):
    # stars are maximally disassortative
    g = Graph.of(spark, [(0, i) for i in range(1, 6)], n=6)
    assert degree_assortativity(g) < -0.99


def test_jaccard_sparsifier(spark):
    # two triangles sharing node 4 via a bridge edge (2,3):
    # intra-triangle edges have tri=1 > 0; the bridge has tri=0
    edges = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    g = Graph.of(spark, edges, n=6)
    scores = {(r["src"], r["dst"]): r["score"] for r in jaccard_similarity_scores(g).collect()}
    assert scores[(2, 3)] == 0.0
    assert scores[(0, 1)] > 0.0
    filtered = global_threshold_filter(g, jaccard_similarity_scores(g), 0.0)
    kept = {tuple(r) for r in filtered.canonical_undirected_edges().collect()}
    assert (2, 3) not in kept and len(kept) == 6
    assert filtered.num_nodes() == 6  # nodes preserved


def test_anf_neighborhood_function_path(spark):
    # path 0-1-2-3: exact pairs within h hops: h=1: 6, h=2: 10, h=3: 12
    # (ordered pairs including self at h≥... our estimate counts node+reached
    # INCLUDING itself via its own initial bit)
    g = Graph.of(spark, [(0, 1), (1, 2), (2, 3)], n=4)
    nf = neighborhood_function(g, k=128, bits=32, seed=7)
    # sketch estimate of the FINAL closure (4 nodes × 4 reachable = 16,
    # incl. self) — allow generous sketch error
    assert 10 <= nf[-1] <= 24
    assert len(nf) >= 3  # needs ≥3 hops to saturate a 4-path
    ed = effective_diameter_approx(g, k=128, bits=32, seed=7)
    assert 1.0 <= ed <= 4.0


def test_anf_monotone_and_deterministic(spark):
    g = Graph.of(spark, [(0, 1), (1, 2), (2, 3), (3, 4), (0, 4), (1, 3)], n=5)
    a = neighborhood_function(g, k=64, bits=32, seed=3)
    b = neighborhood_function(g, k=64, bits=32, seed=3)
    assert a == b  # deterministic across runs
    assert all(a[i] <= a[i + 1] + 1e-9 for i in range(len(a) - 1))


def test_katz_index_matches_walk_counts(spark):
    """KatzIndex score = sum damping^l * walks_l (KatzIndex.cpp:34-90)."""
    from networkit_spark.operators.linkprediction import katz_index

    edges = [(0, 1), (1, 2), (2, 3), (0, 2)]
    g = Graph.of(spark, edges, n=4)
    import numpy as np

    A = np.zeros((4, 4))
    for u, v in edges:
        A[u][v] = A[v][u] = 1
    beta, L = 0.1, 4
    M = sum((beta**l) * np.linalg.matrix_power(A, l) for l in range(1, L + 1))
    pairs = spark.createDataFrame([(0, 3), (1, 3), (0, 2)], "u long, v long")
    got = {
        (r["u"], r["v"]): r["katz"]
        for r in katz_index(g, pairs, max_path_length=L, damping=beta).collect()
    }
    for (u, v), s in got.items():
        assert s == pytest.approx(M[u][v], rel=1e-9), (u, v)


def test_roc_auc_and_points(spark):
    """AUC vs hand-computed mid-rank value, incl. ties."""
    from networkit_spark.operators.linkprediction import roc_auc, roc_points

    rows = [(0.9, 1), (0.8, 1), (0.8, 0), (0.5, 0), (0.4, 1), (0.2, 0)]
    df = spark.createDataFrame(rows, "score double, label int")
    # mid-rank AUC: P=3, N=3; pairs (pos,neg): (.9 beats all 3)
    # (.8: beats .5,.2; ties .8-neg = .5) -> 2.5 ; (.4 beats .2) -> 1
    # AUC = (3 + 2.5 + 1)/9
    assert roc_auc(df) == pytest.approx(6.5 / 9, abs=1e-12)
    pts = roc_points(df).collect()
    assert any(abs(p["fpr"] - 1.0) < 1e-12 and abs(p["tpr"] - 1.0) < 1e-12 for p in pts)
    with pytest.raises(ValueError):
        roc_auc(spark.createDataFrame([(0.5, 1)], "score double, label int"))
