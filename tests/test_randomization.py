"""Edge-switching randomization: degree sequence preserved, graph simple."""

from pyspark.sql import functions as F

from networkit_spark.generators import clustered_random
from networkit_spark.graph import Graph
from networkit_spark.operators.randomization import edge_switching


def test_edge_switching_preserves_degrees(spark):
    g, _ = clustered_random(spark, n=60, k=3, p_intra=0.5, p_inter=0.05, seed=4)
    before = {r["id"]: r["deg"] for r in g.degrees().collect()}
    m_before = g.num_edges()
    g2 = edge_switching(g, rounds=6, seed=11)
    after = {r["id"]: r["deg"] for r in g2.degrees().collect()}
    assert after == before
    assert g2.num_edges() == m_before
    # still simple: canonical edges unique, no self-loops
    e = g2.canonical_undirected_edges()
    assert e.count() == e.distinct().count()
    assert g2.num_self_loops() == 0
    # and the chain actually moved
    e1 = {(r["src"], r["dst"]) for r in g.canonical_undirected_edges().collect()}
    e2 = {(r["src"], r["dst"]) for r in e.collect()}
    assert e1 != e2


def test_edge_switching_deterministic(spark):
    g, _ = clustered_random(spark, n=40, k=2, p_intra=0.5, p_inter=0.1, seed=5)
    a = edge_switching(g, rounds=3, seed=7)
    b = edge_switching(g, rounds=3, seed=7)
    ea = sorted((r["src"], r["dst"]) for r in a.canonical_undirected_edges().collect())
    eb = sorted((r["src"], r["dst"]) for r in b.canonical_undirected_edges().collect())
    assert ea == eb


def test_global_curveball_preserves_degrees_and_simplicity(spark):
    from networkit_spark.operators.randomization import global_curveball

    rnd = __import__("random").Random(5)
    n = 40
    edges = sorted(
        {tuple(sorted((rnd.randrange(n), rnd.randrange(n)))) for _ in range(120)}
    )
    edges = [e for e in edges if e[0] != e[1]]
    g = Graph.of(spark, edges, n=n)
    out = global_curveball(g, rounds=4, seed=11)

    def degs(gr):
        return sorted(
            (r["src"], r["c"])
            for r in gr.canonical_undirected_edges()
            .selectExpr("src as a", "dst as b")
            .selectExpr("stack(2, a, b) as (src)")
            .groupBy("src")
            .agg(F.count("*").alias("c"))
            .collect()
        )

    assert degs(out) == degs(g)
    ce = out.canonical_undirected_edges().select("src", "dst")
    assert ce.count() == ce.distinct().count() == len(edges)
    assert ce.filter("src = dst").count() == 0
    # deterministic across invocations
    a = sorted(map(tuple, global_curveball(g, rounds=2, seed=7)
                   .canonical_undirected_edges().select("src", "dst").collect()))
    b = sorted(map(tuple, global_curveball(g, rounds=2, seed=7)
                   .canonical_undirected_edges().select("src", "dst").collect()))
    assert a == b
    # ... and actually shuffles edges
    orig = set(map(tuple, edges))
    got = set(a)
    assert got != orig


def test_degree_preserving_shuffle(spark):
    from networkit_spark.operators.randomization import degree_preserving_shuffle

    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0), (0, 2), (5, 6)]
    g = Graph.of(spark, edges, n=8)  # node 7 isolated
    out = degree_preserving_shuffle(g, seed=9)

    def degmap(gr):
        return {
            r["src"]: r["c"]
            for r in gr.canonical_undirected_edges()
            .selectExpr("stack(2, src, dst) as (src)")
            .groupBy("src").agg(F.count("*").alias("c")).collect()
        }

    d0, d1 = degmap(g), degmap(out)
    # per-ID degree preserved exactly (shuffle only permutes within classes)
    for v in range(8):
        assert d0.get(v, 0) == d1.get(v, 0), v
    # same edge count, still simple
    ce = out.canonical_undirected_edges()
    assert ce.count() == len(edges) == ce.distinct().count()
    # deterministic
    a = sorted(map(tuple, degree_preserving_shuffle(g, seed=9)
                   .canonical_undirected_edges().collect()))
    b = sorted(map(tuple, out.canonical_undirected_edges().collect()))
    assert a == b
