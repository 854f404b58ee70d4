"""Round-8 layout/broadcast policy: memoization, the env-tunable row
limit, and — most importantly — that every kernel's broadcast fast path
and shuffle fallback produce IDENTICAL results (the scale-adaptive
policy must never change answers, only plans)."""

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.edge_layout import (
    broadcast_row_limit,
    maybe_broadcast,
    partitioned_edges,
)

G8W = [
    (0, 2, 3.0), (1, 2, 2.0), (2, 3, 3.0), (2, 4, 2.0), (2, 5, 1.5),
    (3, 5, 3.0), (4, 5, 2.0), (5, 6, 3.0), (5, 7, 2.0),
]
G20 = [
    (0, 1), (1, 2), (2, 4), (4, 8), (8, 16), (16, 19), (3, 5), (5, 6),
    (6, 7), (7, 9), (10, 11), (10, 18), (10, 12), (18, 17), (13, 14),
]


def test_layout_memoized_per_relation_and_key(spark):
    g = Graph.of(spark, G20, n=20)
    a = partitioned_edges(g.edges, "src")
    b = partitioned_edges(g.edges, "src")
    c = partitioned_edges(g.edges, "dst")
    assert a is b  # same relation + key -> one cached layout
    assert a is not c
    assert a.count() == g.edges.count()


def test_broadcast_row_limit_env(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_BROADCAST_ROWS", "123")
    assert broadcast_row_limit() == 123
    monkeypatch.delenv("SPARK_GRAFT_BROADCAST_ROWS")
    assert broadcast_row_limit() == 4_000_000


def test_maybe_broadcast_policy(spark, monkeypatch):
    df = spark.range(10)
    monkeypatch.setenv("SPARK_GRAFT_BROADCAST_ROWS", "0")
    assert maybe_broadcast(df, 10) is df  # disabled -> untouched
    monkeypatch.delenv("SPARK_GRAFT_BROADCAST_ROWS")
    assert maybe_broadcast(df, None) is df  # unknown rows -> untouched
    assert maybe_broadcast(df, 10) is not df  # hinted copy


@pytest.mark.parametrize("limit", ["0", "4000000"])
def test_kernels_identical_under_both_plans(spark, monkeypatch, limit, tmp_path):
    """pagerank / components / plp / sssp / triangles / kcore give the
    same answers whether the per-node vectors broadcast (default) or the
    shuffle fallbacks run (limit=0)."""
    monkeypatch.setenv("SPARK_GRAFT_BROADCAST_ROWS", limit)
    from networkit_spark.operators.components import connected_components
    from networkit_spark.operators.distance import sssp
    from networkit_spark.operators.kcore import core_decomposition
    from networkit_spark.operators.pagerank import pagerank
    from networkit_spark.operators.plp import plp
    from networkit_spark.operators.triangles import total_triangles

    g8 = Graph.of(spark, G8W, n=8, directed=False, weighted=True)
    res = pagerank(g8, damp=0.85, tol=1e-8)
    scores = {r["id"]: round(r["score"], 4) for r in res.scores.collect()}
    assert [scores[i] for i in range(8)] == [
        0.0753, 0.0565, 0.2552, 0.1319, 0.0942, 0.2552, 0.0753, 0.0565
    ]
    assert res.iterations == 59

    g20 = Graph.of(spark, G20, n=20)
    comp = {r["node"]: r["label"] for r in connected_components(g20).collect()}
    assert len(set(comp.values())) == 5
    assert comp[0] == comp[19] and comp[3] == comp[7]

    labels = plp(g20, max_iterations=10).labels
    assert labels.count() == 20

    k4 = Graph.of(spark, [(i, j) for i in range(4) for j in range(i + 1, 4)], n=4)
    assert total_triangles(k4) == 4
    cores = {r["id"]: r["core"] for r in core_decomposition(k4).collect()}
    assert all(cores[i] == 3 for i in range(4))

    gw = Graph.of(
        spark, [(0, 1, 1.0), (1, 2, 2.0), (2, 3, 1.5), (0, 3, 10.0)], n=4, weighted=True
    )
    d = {r["node"]: r["dist"] for r in sssp(gw, 0).collect()}
    assert d[3] == 4.5


def test_simple_flag_canonical_equivalence(spark):
    """simple=True canonical fast path == the defensive dedupe path."""
    e = spark.createDataFrame(
        [(u, v, 1.0) for u, v in G20] + [(v, u, 1.0) for u, v in G20],
        "src long, dst long, weight double",
    )
    nodes = spark.range(20).select("id")
    g_plain = Graph(nodes=nodes, edges=e, directed=False, weighted=False)
    g_simple = Graph(nodes=nodes, edges=e, directed=False, weighted=False, simple=True)
    a = sorted(tuple(r) for r in g_plain.canonical_undirected_edges().collect())
    b = sorted(tuple(r) for r in g_simple.canonical_undirected_edges().collect())
    assert a == b
