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

    from networkit_spark.plans.edge_layout import (
        broadcast_row_limit,
        maybe_broadcast,
        partitioned_edges,
    )

    base = g.edges
    key_fwd, key_bwd = "src", "dst"
    if reverse and g.directed:
        key_fwd, key_bwd = "dst", "src"
    bcast_rows = broadcast_row_limit()

    visited = spark.createDataFrame(
        [(int(source), 0)], "node long, dist long"
    ).localCheckpoint(eager=True)
    frontier = visited.select("node")
    frontier_rows = 1
    visited_rows = 1

    depth = 0
    while depth < max_depth:
        depth += 1
        # adaptive level plan (guide §2.4): broadcast the frontier over
        # the dst-side layout — the distinct over the gather key and the
        # broadcast anti-join then run exchange-free; shuffled-hash over
        # the src-side layout above the row limit.
        fr = frontier.withColumnRenamed("node", key_fwd)
        if frontier_rows <= bcast_rows:
            e = partitioned_edges(base, key_bwd)
            fr = F.broadcast(fr)
        else:
            e = partitioned_edges(base, key_fwd)
            fr = fr.hint("shuffle_hash")
        nxt = (
            e.join(fr, key_fwd)
            .select(F.col(key_bwd).alias("node"))
            .distinct()
            .join(
                maybe_broadcast(visited.select("node"), visited_rows),
                "node",
                "left_anti",
            )
        )
        nxt = nxt.localCheckpoint(eager=False)  # count materializes: 1 job
        n_new = nxt.count()
        frontier_rows = n_new
        visited_rows += n_new
        runner.record(depth, frontier=n_new)
        if n_new == 0:
            break
        visited = visited.unionByName(
            nxt.select("node", F.lit(depth).cast("long").alias("dist"))
        )
        visited = runner.persist_step(visited, depth)
        frontier = nxt.select("node")
        if visited_rows >= g.num_nodes():  # all nodes reached: done
            break

    return visited
