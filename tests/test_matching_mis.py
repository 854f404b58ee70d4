"""Luby MIS, suitor matching, Borůvka spanning forest tests."""

from __future__ import annotations

from networkit_spark.graph import Graph
from networkit_spark.operators.matching import (
    luby_independent_set,
    spanning_forest,
    suitor_matching,
)


def test_luby_is_maximal_independent(spark):
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0), (1, 3)]
    g = Graph.of(spark, edges, n=6)  # node 5 isolated → always in the set
    sel = {r["id"] for r in luby_independent_set(g, seed=5).collect() if r["in_set"]}
    assert 5 in sel
    # independent: no edge inside the set
    assert not any(u in sel and v in sel for u, v in edges)
    # maximal: every non-member has a neighbor in the set
    nbrs = {}
    for u, v in edges:
        nbrs.setdefault(u, set()).add(v)
        nbrs.setdefault(v, set()).add(u)
    for node in range(5):
        if node not in sel:
            assert nbrs[node] & sel


def test_suitor_matching_prefers_heavy_edges(spark):
    # path 0-1-2-3 with middle edge heaviest → match (1,2) and leave 0,3
    g = Graph.of(spark, [(0, 1, 1.0), (1, 2, 9.0), (2, 3, 1.0)], n=4, weighted=True)
    m = {(r["u"], r["v"]) for r in suitor_matching(g).collect()}
    assert m == {(1, 2)}
    # two disjoint heavy edges both match
    g2 = Graph.of(spark, [(0, 1, 5.0), (2, 3, 5.0), (1, 2, 1.0)], n=4, weighted=True)
    m2 = {(r["u"], r["v"]) for r in suitor_matching(g2).collect()}
    assert m2 == {(0, 1), (2, 3)}


def test_matching_is_valid(spark):
    edges = [(0, 1, 3.0), (1, 2, 2.0), (2, 3, 4.0), (3, 0, 1.0), (1, 3, 5.0)]
    g = Graph.of(spark, edges, n=4, weighted=True)
    m = [(r["u"], r["v"]) for r in suitor_matching(g).collect()]
    seen = [x for uv in m for x in uv]
    assert len(seen) == len(set(seen))  # no node matched twice
    assert all((u, v) in {(a, b) for a, b, _ in edges} or (v, u) in {(a, b) for a, b, _ in edges} for u, v in m)


def test_spanning_forest_mst(spark):
    # known MST: square with diagonal
    edges = [(0, 1, 1.0), (1, 2, 2.0), (2, 3, 1.0), (3, 0, 3.0), (0, 2, 5.0)]
    g = Graph.of(spark, edges, n=4, weighted=True)
    f = {(r["src"], r["dst"]): r["weight"] for r in spanning_forest(g).collect()}
    assert set(f) == {(0, 1), (1, 2), (2, 3)}
    assert sum(f.values()) == 4.0
    # forest on a disconnected graph: one tree per component, n - #comp edges
    g2 = Graph.of(spark, [(0, 1, 1.0), (2, 3, 1.0)], n=5, weighted=True)
    assert spanning_forest(g2).count() == 2


def test_luby_empty_graph(spark):
    from networkit_spark.graph import Graph
    from networkit_spark.operators.matching import luby_independent_set

    empty_nodes = spark.createDataFrame([], "id long")
    empty_edges = spark.createDataFrame([], "src long, dst long, weight double")
    g = Graph(nodes=empty_nodes, edges=empty_edges, directed=False)
    assert luby_independent_set(g).count() == 0


def test_suitor_matching_is_maximal_on_increasing_path(spark):
    """A path with strictly increasing weights matches one pair per round;
    the loop must run to exhaustion, not a fixed cap (SuitorMatcher is
    always maximal)."""
    from networkit_spark.graph import Graph
    from networkit_spark.operators.matching import suitor_matching

    n = 24
    edges = [(i, i + 1, float(i + 1)) for i in range(n - 1)]
    g = Graph.of(spark, edges, n=n, weighted=True)
    pairs = [(r["u"], r["v"]) for r in suitor_matching(g).collect()]
    matched = {x for uv in pairs for x in uv}
    # maximality: no live edge between two unmatched nodes remains
    for u, v, _ in edges:
        assert u in matched or v in matched, (u, v, sorted(pairs))
