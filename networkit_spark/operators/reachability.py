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
