"""Degree centrality (``centrality/DegreeCentrality.cpp:15-48``).

Semantics: score(v) = degree(v); by DEFAULT self-loops are ignored
(``DegreeCentrality.cpp:12`` default ``ignoreSelfLoops=true`` subtracts the
loop; golden fixture ``test_centrality.py:10-28`` expects [2,1,4,2,2,5,1,1]
on the 8-node self-loop graph). ``normalized`` divides by the maximum
possible degree: n−1 when ignoring loops, n otherwise
(``DegreeCentrality.cpp:41-49``). ``in_degree=True`` counts in-degree on
directed graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph


def degree_centrality(
    g: Graph,
    in_degree: bool = False,
    normalized: bool = False,
    ignore_self_loops: bool = True,
) -> DataFrame:
    """(id, score DOUBLE) for every node."""
    edges = g.edges
    if ignore_self_loops:
        edges = edges.filter(F.col("src") != F.col("dst"))
    key = "dst" if in_degree else "src"
    d = edges.groupBy(F.col(key).alias("id")).agg(F.count(F.lit(1)).alias("deg"))
    out = g.nodes.join(d, "id", "left").select(
        "id", F.coalesce("deg", F.lit(0)).cast("double").alias("score")
    )
    if normalized:
        n = g.num_nodes()
        max_deg = float(n - 1 if ignore_self_loops else n)
        if max_deg > 0:
            out = out.select("id", (F.col("score") / F.lit(max_deg)).alias("score"))
    return out


def sfigality(g):
    """(id, score): fraction of neighbors with strictly higher degree
    (``centrality/Sfigality.cpp:15-30``). Nodes with degree 0 score 0."""
    from pyspark.sql import functions as F

    adj = (g.symmetrized_edges() if g.directed else g.edges).filter(
        F.col("src") != F.col("dst")
    ).select("src", "dst")
    deg = adj.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("deg"))
    j = (
        adj.join(deg.withColumnRenamed("id", "src").withColumnRenamed("deg", "du"), "src")
        .join(deg.withColumnRenamed("id", "dst").withColumnRenamed("deg", "dv"), "dst")
        .groupBy(F.col("src").alias("id"))
        .agg(
            (F.sum(F.when(F.col("du") < F.col("dv"), 1).otherwise(0)) / F.count(F.lit(1))).alias("score")
        )
    )
    return g.nodes.join(j, "id", "left").select(
        "id", F.coalesce("score", F.lit(0.0)).alias("score")
    )


def local_partition_coverage(g: Graph, labels: DataFrame) -> DataFrame:
    """(id, score): fraction of a node's weighted degree that stays inside
    its own cluster (``centrality/LocalPartitionCoverage.cpp:11-29``) —
    0 for isolated nodes, maximum 1.

    One label join per edge endpoint + one keyed aggregation; the
    partition table is dimension-sized and broadcast by Catalyst.
    """
    lab = labels.select(
        F.col(labels.columns[0]).cast("long").alias("node"),
        F.col(labels.columns[1]).cast("long").alias("label"),
    )
    sym = g.symmetrized_edges() if g.directed else g.edges
    joined = (
        sym.join(lab.withColumnRenamed("node", "src").withColumnRenamed("label", "lu"), "src")
        .join(lab.withColumnRenamed("node", "dst").withColumnRenamed("label", "lv"), "dst")
    )
    per = joined.groupBy(F.col("src").alias("id")).agg(
        F.sum(F.when(F.col("lu") == F.col("lv"), F.col("weight")).otherwise(0.0)).alias("inw"),
        F.sum("weight").alias("wdeg"),
    )
    return g.nodes.join(per, "id", "left").select(
        "id",
        F.when(F.col("inw") > 0, F.col("inw") / F.col("wdeg"))
        .otherwise(0.0)
        .alias("score"),
    )
