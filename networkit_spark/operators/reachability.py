"""Reachability (reference module ``reachability/``).

- ``reachable_nodes``: exact per-source reachable-set sizes
  (``reachability/ReachableNodes.cpp`` exact=true) via the batched
  multi-source BFS — one shuffle per hop level shared across ALL
  sources, so k sources cost O(diameter) rounds total. For the
  estimated tier at 100 TB use the ANF sketches in ``sketches.py``
  (same contract as the reference's exact=false bounds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.pin import pin


def reachable_nodes(g: Graph, sources: DataFrame | None = None) -> DataFrame:
    """(id, reachable LONG): number of nodes reachable from each source
    (the source itself included, matching the reference's count)."""
    from networkit_spark.operators.distance import multi_source_bfs

    src = sources if sources is not None else g.nodes
    vis = multi_source_bfs(g, src, with_sigma=False).visited
    counts = vis.groupBy(F.col("root").alias("id")).agg(
        F.count(F.lit(1)).alias("reachable")
    )
    base = src.select(F.col(src.columns[0]).cast("long").alias("id"))
    return base.join(counts, "id", "left").select(
        "id", F.coalesce("reachable", F.lit(1)).alias("reachable")
    )


def all_simple_paths(
    g: Graph,
    source: int,
    target: int,
    cutoff: int | None = None,
) -> DataFrame:
    """(path ARRAY<LONG>) — every simple source→target path of length ≤
    ``cutoff`` (``reachability/AllSimplePaths.cpp`` contract; cutoff
    defaults to n−1, the longest possible simple path).

    Frontier expansion over path-state rows: each round extends every
    open path by the out-edges whose head is not already on it —
    O(cutoff) rounds, each one edge join + an array-membership filter.
    The OUTPUT is inherently exponential in the worst case (the
    reference shares that), so cutoff is the scale lever: bounded-hop
    queries stay bounded; the frontier holds only open paths.
    """
    spark = g.edges.sparkSession
    n = g.num_nodes()
    cutoff = int(cutoff) if cutoff is not None else max(n - 1, 0)
    s, t = int(source), int(target)
    edges = (g.symmetrized_edges() if not g.directed else g.edges).select(
        "src", "dst"
    ).transform(pin)
    if s == t:
        return spark.createDataFrame([([s],)], "path array<long>")
    open_paths = spark.createDataFrame(
        [([s], s)], "path array<long>, last long"
    )
    done = None
    for _ in range(cutoff):
        ext = (
            open_paths.join(edges.withColumnRenamed("src", "last"), "last")
            .filter(~F.array_contains("path", F.col("dst")))
            .select(
                F.concat(F.col("path"), F.array(F.col("dst"))).alias("path"),
                F.col("dst").alias("last"),
            )
            .transform(pin)
        )
        arrived = ext.filter(F.col("last") == t).select("path")
        if done is None:
            done = arrived
        else:
            done = done.unionByName(arrived)
        open_paths = ext.filter(F.col("last") != t)
        if open_paths.limit(1).count() == 0:
            break
    if done is None:
        return spark.createDataFrame([], "path array<long>")
    return done


def affected_nodes(
    g: Graph, event_type: str, u: int, v: int
) -> DataFrame:
    """AffectedNodes (``distance/AffectedNodes.cpp``): the set of nodes
    whose shortest-path distances change under a single edge event, each
    with its distance to the modification and — for undirected
    additions — the reference's harmonic-closeness improvement upper
    bound. Returns (node, dist, improvement).

    ``g`` is the graph AFTER the event, matching the reference ctor
    (additions: the new edge is present and the old distances come from
    skipping it, ``bfsWithoutStartNeighbor``; removals: the edge is
    gone). The reference's pruned second BFS reduces to a closed form —
    a node improves from u's side iff 1 + d_V(w) < d_U(w) over the
    WITHOUT-edge distances (every intermediate on an improving path is
    itself improving, so the pruned frontier reaches exactly that set) —
    which is two roots of ONE batched multi-source BFS plus a join, no
    per-node exploration. Documented deviations: the affected set is
    returned deduplicated (the reference concatenates both sides'
    lists), directed events get ``improvement`` = NULL (the reference
    computes a one-sided forward bound there), and an out-of-range
    level lookup — undefined behavior in the reference — yields 0.0.

    ``dist`` = min distance to an endpoint on the without-edge graph
    (``AffectedNodes.cpp:72-74`` additions, ``:253-255`` removals);
    improvement indexing per ``AffectedNodes.cpp:166-174``.
    """
    from networkit_spark.operators.distance import multi_source_bfs
    from networkit_spark.streaming.dynamics import EDGE_ADDITION, EDGE_REMOVAL

    if event_type not in (EDGE_ADDITION, EDGE_REMOVAL):
        raise ValueError("event_type must be EDGE_ADDITION or EDGE_REMOVAL")
    spark = g.edges.sparkSession
    u, v = int(u), int(v)
    edges = g.edges
    if event_type == EDGE_ADDITION:
        # skip ONLY the added edge: on directed graphs a pre-existing
        # reciprocal v→u edge stays in the without-edge base (the
        # reference's bfsWithoutStartNeighbor(u, v) skips a single arc,
        # AffectedNodes.cpp:62-74); undirected storage carries both
        # orientations of the one added edge, so both rows go
        skip = (F.col("src") == u) & (F.col("dst") == v)
        if not g.directed:
            skip = skip | ((F.col("src") == v) & (F.col("dst") == u))
        edges = edges.filter(~skip)
    base = Graph(
        nodes=g.nodes,
        edges=edges.localCheckpoint(eager=True),
        directed=g.directed,
        weighted=False,
    )
    if g.directed:
        # reverse search: distances TO u / TO v on the without-edge graph
        base = Graph(
            nodes=base.nodes,
            edges=base.edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
            ),
            directed=True,
            weighted=False,
        )
    roots = spark.createDataFrame([(u,), (v,)], "id long")
    vis = (
        multi_source_bfs(base, roots, with_sigma=False)
        .visited.select("root", "node", "dist")
    )
    inf = F.lit(float("inf"))
    du = vis.filter(F.col("root") == u).select("node", F.col("dist").alias("du"))
    dv = vis.filter(F.col("root") == v).select("node", F.col("dist").alias("dv"))
    d = (
        g.nodes.select(F.col("id").alias("node"))
        .join(du, "node", "left")
        .join(dv, "node", "left")
        .select(
            "node",
            F.coalesce(F.col("du").cast("double"), inf).alias("du"),
            F.coalesce(F.col("dv").cast("double"), inf).alias("dv"),
        )
    ).localCheckpoint(eager=True)

    if g.directed:
        # affected = {u} ∪ {w : rev_dU(w) + 1 < rev_dV(w)} (w ≠ v start);
        # additions report min(rev_dU, rev_dV) (AffectedNodes.cpp:190-192),
        # removals report rev_dV alone (:301-306)
        aff = d.filter(
            (F.col("node") == u)
            | ((F.col("node") != v) & (F.col("du") + 1.0 < F.col("dv")))
        )
        ddist = (
            F.least("du", "dv") if event_type == EDGE_ADDITION else F.col("dv")
        )
        return aff.select(
            "node",
            ddist.alias("dist"),
            F.lit(None).cast("double").alias("improvement"),
        )

    aff_u = (F.col("node") != u) & (
        (F.col("node") == v) | (F.col("dv") + 1.0 < F.col("du"))
    )
    aff_v = (F.col("node") != v) & (
        (F.col("node") == u) | (F.col("du") + 1.0 < F.col("dv"))
    )
    aff = d.filter(aff_u | aff_v).withColumn("in_u", aff_u).withColumn("in_v", aff_v)
    out_dist = F.least("du", "dv").alias("dist")
    if event_type == EDGE_REMOVAL:
        return aff.select("node", out_dist, F.lit(None).cast("double").alias("improvement"))

    # --- improvement bounds (undirected additions, AffectedNodes.cpp:84-174)
    new_u = F.least(F.col("du"), F.col("dv") + 1.0)
    new_v = F.least(F.col("dv"), F.col("du") + 1.0)
    hists = (
        d.select(
            F.col("du").alias("old_u"), F.col("dv").alias("old_v"),
            new_u.alias("new_u"), new_v.alias("new_v"),
        )
        .collect()
    )
    import collections

    h_old_u: dict[int, int] = collections.Counter()
    h_old_v: dict[int, int] = collections.Counter()
    h_new_u: dict[int, int] = collections.Counter()
    h_new_v: dict[int, int] = collections.Counter()
    for r in hists:
        for key, hist in (("old_u", h_old_u), ("old_v", h_old_v),
                          ("new_u", h_new_u), ("new_v", h_new_v)):
            val = r[key]
            if val != float("inf"):
                hist[int(val)] += 1
    lv_u = max([k for k in h_new_u if k > 0], default=0)
    lv_v = max([k for k in h_new_v if k > 0], default=0)
    imp_u = {
        i: sum(
            (h_new_v.get(j, 0) - h_old_v.get(j, 0)) / float(i + j)
            for j in range(1, lv_v + 1)
        )
        for i in range(1, lv_u + 1)
    }
    imp_v = {
        i: sum(
            (h_new_u.get(j, 0) - h_old_u.get(j, 0)) / float(i + j)
            for j in range(1, lv_u + 1)
        )
        for i in range(1, lv_v + 1)
    }
    map_u = spark.createDataFrame(
        [(k, val) for k, val in imp_u.items()] or [(-1, 0.0)], "lvl long, iu double"
    )
    map_v = spark.createDataFrame(
        [(k, val) for k, val in imp_v.items()] or [(-1, 0.0)], "lvl long, iv double"
    )
    # affectedU rows index levelImprovementU by new_v; affectedV rows (which
    # overwrite shared nodes, mirroring the reference's write order) index
    # levelImprovementV by new_u
    out = (
        aff.withColumn("nu", new_u.cast("long"))
        .withColumn("nv", new_v.cast("long"))
        .join(F.broadcast(map_u), F.col("nv") == F.col("lvl"), "left")
        .drop("lvl")
        .join(F.broadcast(map_v), F.col("nu") == F.col("lvl"), "left")
        .select(
            "node",
            out_dist,
            F.when(F.col("in_v"), F.coalesce("iv", F.lit(0.0)))
            .otherwise(F.coalesce("iu", F.lit(0.0)))
            .alias("improvement"),
        )
    )
    return out
