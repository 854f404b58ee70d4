import numpy as np
import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.pagerank import pagerank
from networkit_spark.operators.ranking import ranking

from tests.fixtures import (
    G8W_EDGES,
    G8W_N,
    G8W_PAGERANK,
    G8W_PAGERANK_NORM,
    numpy_pagerank,
)


def _scores(df, n):
    rows = {r["id"]: r["score"] for r in df.collect()}
    return np.array([rows[i] for i in range(n)])


def test_pagerank_g8w_golden(spark):
    """Golden Matlab values, CentralityGTest.cpp:607-621 (tol 1e-4)."""
    g = Graph.of(spark, G8W_EDGES, n=G8W_N, weighted=True)
    res = pagerank(g, damp=0.85, tol=1e-8)
    got = _scores(res.scores, G8W_N)
    assert np.allclose(got, G8W_PAGERANK, atol=1e-4)
    assert res.converged
    # allclose 1e-6 vs the exact-semantics numpy oracle (north rule)
    exp, _ = numpy_pagerank(G8W_N, G8W_EDGES, damp=0.85, tol=1e-8)
    assert np.allclose(got, exp, atol=1e-6)


def test_pagerank_g8w_normalized(spark):
    """CentralityGTest.cpp:649-663."""
    g = Graph.of(spark, G8W_EDGES, n=G8W_N, weighted=True)
    res = pagerank(g, damp=0.85, tol=1e-8, normalized=True)
    got = _scores(res.scores, G8W_N)
    assert np.allclose(got, G8W_PAGERANK_NORM, atol=1e-4)


def test_pagerank_directed_with_dangling(spark):
    """Directed graph with dangling nodes — leaked mass fixed only at the
    end (PageRank.cpp:75-80); oracle implements identical semantics."""
    edges = [(0, 1), (0, 2), (1, 2), (2, 3), (4, 2), (3, 3)]
    n = 6  # node 5 isolated, node 4 source-only, node 3 self-loop sink
    g = Graph.of(spark, edges, n=n, directed=True)
    res = pagerank(g, damp=0.85, tol=1e-10)
    exp, _ = numpy_pagerank(n, edges, damp=0.85, tol=1e-10, directed=True)
    assert np.allclose(_scores(res.scores, n), exp, atol=1e-6)


def test_pagerank_l1_and_max_iterations(spark):
    g = Graph.of(spark, G8W_EDGES, n=G8W_N, weighted=True)
    res = pagerank(g, tol=1e-12, norm="l1", max_iterations=2)
    assert res.iterations == 2 and not res.converged
    exp, it = numpy_pagerank(G8W_N, G8W_EDGES, tol=1e-12, norm="l1", max_iterations=2)
    assert it == 2
    assert np.allclose(_scores(res.scores, G8W_N), exp, atol=1e-9)


def test_pagerank_iteration_count_matches_oracle(spark):
    g = Graph.of(spark, G8W_EDGES, n=G8W_N, weighted=True)
    res = pagerank(g, tol=1e-8)
    _, it = numpy_pagerank(G8W_N, G8W_EDGES, tol=1e-8)
    assert res.iterations == it


def test_ranking_tie_break(spark):
    """Centrality.cpp:29-41 — desc score, ties asc id."""
    df = spark.createDataFrame(
        [(3, 0.5), (1, 0.7), (2, 0.5), (0, 0.1)], "id long, score double"
    )
    got = [r["id"] for r in ranking(df).collect()]
    assert got == [1, 2, 3, 0]


def test_pagerank_self_loop_invariance(spark):
    """test_algorithms.py:152-177 — adding weight-preserving self-loops
    keeps PageRank finite and normalized to sum 1."""
    edges = G8W_EDGES + [(6, 6, 2.0)]
    g = Graph.of(spark, edges, n=G8W_N, weighted=True)
    res = pagerank(g)
    total = sum(r["score"] for r in res.scores.collect())
    assert total == pytest.approx(1.0, abs=1e-9)
