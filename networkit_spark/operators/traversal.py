"""BFS — hop distances from a source (frontier-join supersteps).

Reference: ``distance/BFS.cpp`` (79 LoC): single-source hop counts over
out-edges (directed) or the symmetric adjacency (undirected); unreachable
nodes keep distance = ∞.

Spark plan: classic frontier loop —

    frontier₀ = {source}
    frontierₖ₊₁ = (frontierₖ ⋈ edges).dst  ∖  visited

Each superstep shuffles only the frontier (≤|V| rows) against the cached
edge relation; ``visited`` is maintained as a growing (node, dist) table.
On small-diameter link graphs this terminates in O(diameter) rounds; the
frontier join is hash-based (no broadcast — frontiers can be |V|-sized on
expander graphs; no sort — the edge table is streamed from cache).

Returns REACHED nodes only: (node LONG, dist LONG). Unreachable = absent
(the DataFrame analogue of infinity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.superstep import SuperstepRunner


def bfs(
    g: Graph,
    source: int,
    reverse: bool = False,
    max_depth: int | None = None,
    runner: SuperstepRunner | None = None,
) -> DataFrame:
    """(node LONG, dist LONG) for every node reachable from ``source``."""
    spark = g.edges.sparkSession
    runner = runner or SuperstepRunner(spark)
    max_depth = max_depth if max_depth is not None else 1 << 30

    edges = g.edges
    if reverse and g.directed:
        edges = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    # src-partitioned cache: frontier joins reuse the layout every hop
    edges = edges.select("src", "dst").repartition("src").cache()
    edges.count()

    visited = spark.createDataFrame(
        [(int(source), 0)], "node long, dist long"
    ).localCheckpoint(eager=True)
    frontier = visited.select("node")

    depth = 0
    while depth < max_depth:
        depth += 1
        nxt = (
            edges.join(
                frontier.withColumnRenamed("node", "src").hint("shuffle_hash"), "src"
            )
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
        )
        nxt = nxt.localCheckpoint(eager=True)
        n_new = nxt.count()
        runner.record(depth, frontier=n_new)
        if n_new == 0:
            break
        visited = visited.unionByName(
            nxt.select("node", F.lit(depth).cast("long").alias("dist"))
        )
        visited = runner.persist_step(visited, depth)
        frontier = nxt.select("node")

    return visited
