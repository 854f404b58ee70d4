"""Triangle counting — parity target #4 — plus clustering coefficients.

Reference semantics:
- per-edge triangle counts with DEGREE-ORDERED orientation
  ``isOutEdge(u,v) = deg(u)>deg(v) or (deg equal and u<v)``
  (``edgescores/TriangleEdgeScore.cpp:24-27``, wedge scan ``:62-104``);
- local clustering coefficient ``c(u) = 2·tri(u)/(d(u)(d(u)−1))``
  (``centrality/LocalClusteringCoefficient.cpp:81-83``);
- exact global CC = closed wedges / all wedges
  (``global/ClusteringCoefficient.cpp:169-219``);
- small-n oracle identity: ``tri(u) = diag(A³)/2``
  (``algebraic/algorithms/AlgebraicTriangleCounting.hpp:59-71``).

Spark plan — the classic degree-ordered wedge join:
  1. canonical undirected edges (src<dst, loops dropped, deduped);
  2. orient every edge from LOW (deg,id) to HIGH (deg,id) → a DAG whose
     max out-degree is O(√m) regardless of hub size — this orientation IS
     the skew defense (same trick as the reference, inverted direction is
     immaterial);
  3. wedges at the lowest corner: fwd ⋈ fwd on src with dst₁ < dst₂
     (dedupe per wedge);
  4. close each wedge against fwd — triangles (a,b,c).
Per-node counts: explode the 3 corners → groupBy(count).
Per-edge counts: union the 3 corner pairs (canonicalized) → groupBy.

Scale notes: the self-join shuffles the oriented edge table twice; both
sides are pre-partitioned by the join key so AQE reuses the exchange. The
orientation bounds every join group, so there is no salting to do — the
skew is eliminated structurally, not mitigated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.edge_layout import derived_layout, maybe_broadcast


def _oriented(g: Graph) -> DataFrame:
    """Canonical edges oriented low→high by (deg, id). Returns (src, dst).

    r8 plan: the degree vector (|V| rows) is broadcast below the row
    limit so the two orientation joins never shuffle the edge table
    (guide §3.1); above the limit the planner falls back to its size
    estimate as before.
    """
    edges = g.canonical_undirected_edges()  # src < dst, no loops, deduped
    n = g.num_nodes()
    if g.simple and not g.directed:
        # the symmetric simple relation counts each neighbor exactly once
        # per endpoint — groupBy(src) IS the simple-graph degree, and it
        # runs exchange-free on the shared src layout
        from networkit_spark.plans.edge_layout import partitioned_edges

        deg = (
            partitioned_edges(g.edges, "src")
            .groupBy(F.col("src").alias("id"))
            .agg(F.count(F.lit(1)).alias("deg"))
        )
    else:
        deg = (
            edges.select(F.col("src").alias("id"))
            .unionByName(edges.select(F.col("dst").alias("id")))
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
    deg = maybe_broadcast(deg, n)
    e = (
        edges.join(deg.withColumnRenamed("id", "src").withColumnRenamed("deg", "dsrc"), "src")
        .join(deg.withColumnRenamed("id", "dst").withColumnRenamed("deg", "ddst"), "dst")
    )
    lo_first = (F.col("dsrc") < F.col("ddst")) | (
        (F.col("dsrc") == F.col("ddst")) & (F.col("src") < F.col("dst"))
    )
    return e.select(
        F.when(lo_first, F.col("src")).otherwise(F.col("dst")).alias("src"),
        F.when(lo_first, F.col("dst")).otherwise(F.col("src")).alias("dst"),
    )


def _oriented_layout(g: Graph) -> DataFrame:
    """Memoized src-partitioned cached copy of the degree-oriented DAG —
    the adjacency layout every triangle query (per-node counts, per-edge
    scores, clustering coefficients, total count) shares; the wedge
    self-join below then runs exchange-free on the cached partitioning
    (guide §2.4)."""
    return derived_layout(g.edges, "tri_oriented", lambda: _oriented(g).repartition("src"))


def triangles(g: Graph) -> DataFrame:
    """All triangles as rows (a, b, c): a = lowest corner in the degree
    order; (a,b),(a,c),(b,c) all oriented edges. Each triangle appears
    exactly once."""
    fwd = _oriented_layout(g)
    e1 = fwd.alias("e1")
    e2 = fwd.alias("e2")
    wedges = e1.join(
        e2,
        (F.col("e1.src") == F.col("e2.src")) & (F.col("e1.dst") < F.col("e2.dst")),
    ).select(
        F.col("e1.src").alias("a"), F.col("e1.dst").alias("b"), F.col("e2.dst").alias("c")
    )
    # Every wedge has b < c by construction, so the closing edge can be
    # looked up in ID-canonical orientation — half the rows of the old
    # both-orientations union — and broadcast below the row limit, which
    # leaves the (potentially O(m^1.5)-sized) wedge relation UNSHUFFLED.
    closer = fwd.select(
        F.least("src", "dst").alias("b"), F.greatest("src", "dst").alias("c")
    )
    m = fwd.count()  # cached layout — cheap, and exact input for the policy
    return wedges.join(maybe_broadcast(closer, m), ["b", "c"], "left_semi")


def triangle_count_per_node(g: Graph) -> DataFrame:
    """(id, triangles LONG) for every node (0 when none)."""
    tri = triangles(g)
    corners = (
        tri.select(F.col("a").alias("id"))
        .unionByName(tri.select(F.col("b").alias("id")))
        .unionByName(tri.select(F.col("c").alias("id")))
    )
    counts = corners.groupBy("id").agg(F.count(F.lit(1)).alias("triangles"))
    return (
        g.nodes.join(counts, "id", "left")
        .select("id", F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles"))
    )


def triangle_count_per_edge(g: Graph) -> DataFrame:
    """(src, dst, triangles) per canonical undirected edge (src < dst) —
    TriangleEdgeScore semantics (``edgescores/TriangleEdgeScore.cpp``)."""
    tri = triangles(g)
    pairs = (
        tri.select(F.col("a").alias("x"), F.col("b").alias("y"))
        .unionByName(tri.select(F.col("a").alias("x"), F.col("c").alias("y")))
        .unionByName(tri.select(F.col("b").alias("x"), F.col("c").alias("y")))
    )
    canon = pairs.select(
        F.least("x", "y").alias("src"), F.greatest("x", "y").alias("dst")
    )
    counts = canon.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("triangles"))
    return (
        g.canonical_undirected_edges()
        .join(counts, ["src", "dst"], "left")
        .select(
            "src", "dst", F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles")
        )
    )


def total_triangles(g: Graph) -> int:
    return triangles(g).count()


def _simple_degrees(g: Graph) -> DataFrame:
    """Degrees of the simple graph (loops removed, deduped) — the degree
    used by clustering coefficients."""
    if g.simple and not g.directed:
        from networkit_spark.plans.edge_layout import partitioned_edges

        return (
            partitioned_edges(g.edges, "src")
            .groupBy(F.col("src").alias("id"))
            .agg(F.count(F.lit(1)).alias("deg"))
        )
    edges = g.canonical_undirected_edges()
    return (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )


def local_clustering_coefficient(g: Graph) -> DataFrame:
    """(id, lcc DOUBLE): 2·tri/(d(d−1)), 0 when d<2
    (``centrality/LocalClusteringCoefficient.cpp:81-83``)."""
    tri = triangle_count_per_node(g)
    deg = _simple_degrees(g)
    return (
        tri.join(deg, "id", "left")
        .select(
            "id",
            F.when(
                F.coalesce("deg", F.lit(0)) >= 2,
                2.0 * F.col("triangles") / (F.col("deg") * (F.col("deg") - 1)),
            )
            .otherwise(F.lit(0.0))
            .alias("lcc"),
        )
    )


def global_clustering_coefficient(g: Graph) -> float:
    """Exact global CC = 2·Σ tri(u) / Σ d(u)(d(u)−1)
    (``global/ClusteringCoefficient.cpp:204-217``)."""
    tri = triangle_count_per_node(g)
    deg = _simple_degrees(g)
    row = (
        tri.join(deg, "id", "left")
        .agg(
            F.sum(2.0 * F.col("triangles")).alias("closed"),
            F.sum(
                F.coalesce(F.col("deg"), F.lit(0))
                * (F.coalesce(F.col("deg"), F.lit(0)) - 1)
            ).alias("wedges"),
        )
        .collect()[0]
    )
    return (row["closed"] / row["wedges"]) if row["wedges"] else 0.0


def avg_local_clustering_coefficient(g: Graph) -> float:
    """Mean local CC over nodes with degree ≥ 2
    (``global/ClusteringCoefficient.cpp:19-132`` avgLocal with turbo)."""
    lcc = local_clustering_coefficient(g)
    deg = _simple_degrees(g)
    row = (
        lcc.join(deg, "id", "left")
        .filter(F.coalesce("deg", F.lit(0)) >= 2)
        .agg(F.avg("lcc"))
        .collect()[0]
    )
    return row[0] or 0.0


def approx_global_clustering(g: Graph, trials: int = 10000, seed: int = 42) -> float:
    """Wedge-sampled global CC estimate
    (``global/ClusteringCoefficient.cpp:221-283`` approxGlobal).

    The reference samples wedge apexes with probability ∝ d(d−1) via a
    prefix-sum + RNG; the distributed, deterministic analogue allocates
    each node a STRATIFIED share trials·w_v/W of the trial budget (same
    estimator expectation, no driver-side prefix array), then draws two
    distinct neighbor indexes per trial from seeded hashes and checks
    closure with one join against the canonical edge set. Everything is
    column expressions + two keyed joins — no Python in the row path.
    """
    adj = (g.symmetrized_edges() if g.directed else g.edges).filter(
        F.col("src") != F.col("dst")
    ).select("src", "dst").dropDuplicates(["src", "dst"])
    w = Window.partitionBy("src").orderBy("dst")
    indexed = adj.withColumn("idx", F.row_number().over(w) - 1).cache()
    deg = indexed.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    tot = deg.agg(F.sum(F.col("deg") * (F.col("deg") - 1))).collect()[0][0] or 0
    if tot == 0:
        return 0.0

    # Trials strictly proportional to the d(d-1) wedge share — no min-1
    # floor (a floor over-weights low-degree apexes on skewed graphs and
    # can blow the requested trial budget); nodes whose share rounds to
    # zero simply get no trials, keeping the estimator unbiased.
    alloc = (
        deg.filter(F.col("deg") >= 2)
        .select(
            "src",
            "deg",
            F.round(
                F.lit(float(trials)) * F.col("deg") * (F.col("deg") - 1) / F.lit(float(tot))
            ).cast("long").alias("k"),
        )
        .filter(F.col("k") >= 1)
    )
    t = alloc.select(
        "src",
        "deg",
        F.explode(F.sequence(F.lit(0), F.col("k") - 1)).alias("trial"),
    )
    h1 = F.pmod(F.xxhash64("src", "trial", F.lit(seed)), F.col("deg"))
    h2r = F.pmod(F.xxhash64("src", "trial", F.lit(seed + 1)), F.col("deg") - 1)
    t = t.select(
        "src",
        "trial",
        h1.alias("i1"),
        # distinct second index without rejection sampling
        F.when(h2r >= h1, h2r + 1).otherwise(h2r).alias("i2"),
    )
    picked = (
        t.join(
            indexed.select("src", F.col("dst").alias("u"), F.col("idx").alias("i1")),
            ["src", "i1"],
        )
        .join(
            indexed.select("src", F.col("dst").alias("w2"), F.col("idx").alias("i2")),
            ["src", "i2"],
        )
        .select(
            F.least("u", "w2").alias("a"), F.greatest("u", "w2").alias("b")
        )
    )
    canon = adj.filter(F.col("src") < F.col("dst")).select(
        F.col("src").alias("a"), F.col("dst").alias("b"), F.lit(1).alias("closed")
    )
    agg = picked.join(canon, ["a", "b"], "left").agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.coalesce("closed", F.lit(0))).alias("tri")
    ).collect()[0]
    return float(agg["tri"]) / float(agg["n"]) if agg["n"] else 0.0


def quadrangle_count_per_edge(g: Graph) -> DataFrame:
    """(src, dst, quadrangles) — 4-cycles through each canonical edge
    (``sparsification/ChibaNishizekiQuadrangleEdgeScore.cpp`` quantity):
    # pairs (x, y) with u~x, x~y, y~v, x ≠ v, y ≠ u.

    Cost: Σ_e d(u)·d(v) candidate pairs before the closing semi-join —
    quadratic in hub degree. Run on subgraphs / sparsified graphs at
    scale (the reference's use is backbone scoring on moderate graphs).
    """
    adj = (g.symmetrized_edges() if g.directed else g.edges).filter(
        F.col("src") != F.col("dst")
    ).select("src", "dst").dropDuplicates(["src", "dst"])
    e = (
        adj.select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        ).dropDuplicates(["src", "dst"])
    )
    cand = (
        e.join(adj.select(F.col("src").alias("src"), F.col("dst").alias("x")), "src")
        .join(adj.select(F.col("src").alias("dst"), F.col("dst").alias("y")), "dst")
        .filter((F.col("x") != F.col("dst")) & (F.col("y") != F.col("src")))
        .filter(F.col("x") != F.col("y"))
    )
    quads = (
        cand.join(
            adj.select(F.col("src").alias("x"), F.col("dst").alias("y")),
            ["x", "y"],
            "left_semi",
        )
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("quadrangles"))
    )
    return e.join(quads, ["src", "dst"], "left").select(
        "src", "dst", F.coalesce("quadrangles", F.lit(0)).alias("quadrangles")
    )
