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
