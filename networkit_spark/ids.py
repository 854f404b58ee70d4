"""Dense-id assignment and compaction.

NetworKit readers remap arbitrary external ids to consecutive internal ids
``0..n-1`` in first-seen order (``io/SNAPGraphReader.cpp:27-40``);
``GraphTools::getContinuousNodeIds`` compacts a graph with holes
(``GraphTools.hpp:378-385``). First-seen order is a single-threaded notion;
the distributed equivalent is any *deterministic total order* — we use the
natural sort order of the external key, which is stable across cluster
sizes and re-runs (component/label parity is relabel-invariant anyway, see
``community/GraphClusteringTools.cpp:99-115``).

Scale note: the remap is a ``dense_rank`` over the distinct key set — one
shuffle over |V| rows (≪ |E|), computed once at ingest and joined back onto
the edge table (sort-merge or AQE-broadcast depending on |V|).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from networkit_spark.graph import Graph


def assign_dense_ids(df: DataFrame, cols: list[str]) -> DataFrame:
    """Map each distinct tuple of ``cols`` to a dense id 0..k-1.

    Returns a DataFrame with ``cols`` + ``id LONG``, ordered by the natural
    sort of ``cols`` (deterministic across parallelism levels).
    """
    w = Window.orderBy(*[F.col(c) for c in cols])
    return (
        df.select(*cols)
        .distinct()
        .withColumn("id", (F.dense_rank().over(w) - F.lit(1)).cast("long"))
    )


def remap_edges(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> tuple[DataFrame, DataFrame]:
    """Remap arbitrary src/dst keys to dense long ids.

    Returns (remapped_edges, mapping) where mapping has (key, id).
    """
    keys = (
        edges.select(F.col(src_col).alias("key"))
        .unionByName(edges.select(F.col(dst_col).alias("key")))
        .distinct()
    )
    mapping = assign_dense_ids(keys, ["key"])
    out = (
        edges.join(mapping.withColumnRenamed("key", src_col), src_col)
        .withColumnRenamed("id", "__src_id")
        .join(mapping.withColumnRenamed("key", dst_col), dst_col)
        .withColumnRenamed("id", "__dst_id")
    )
    keep = [c for c in edges.columns if c not in (src_col, dst_col)]
    out = out.select(
        F.col("__src_id").alias("src"), F.col("__dst_id").alias("dst"), *keep
    )
    return out, mapping


def compact_graph(g: Graph) -> Graph:
    """GraphTools::getCompactedGraph (``GraphTools.hpp:378``): relabel node
    ids to 0..n-1 preserving structure."""
    mapping = assign_dense_ids(g.nodes.select(F.col("id").alias("key")), ["key"])
    e = (
        g.edges.join(mapping.withColumnRenamed("key", "src"), "src")
        .withColumnRenamed("id", "new_src")
        .join(mapping.withColumnRenamed("key", "dst"), "dst")
        .withColumnRenamed("id", "new_dst")
        .select(
            F.col("new_src").alias("src"),
            F.col("new_dst").alias("dst"),
            "weight",
        )
    )
    n = mapping.select(F.col("id")).distinct()
    return Graph(nodes=n, edges=e, directed=g.directed, weighted=g.weighted)
