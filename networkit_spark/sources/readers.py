"""Edge-list readers — Spark-native equivalents of the ``io/`` module.

- ``read_edge_list``: configurable text edge list (separator, comment
  prefix, firstNode offset) — ``io/EdgeListReader.cpp`` semantics.
- ``read_snap``: whitespace pairs, ``#`` comments, dedupes multi-edges and
  remaps ids to dense 0..n-1 (``io/SNAPGraphReader.cpp:18-111``).
- ``read_metis``: METIS adjacency format (header "n m [fmt]", 1-based
  neighbor lists) — ``io/METISGraphReader.cpp``.

All of these are ``spark.read`` scans + column ops; the remap is the
rank-join from ids.py. Writers: ``write_edge_list`` (csv) and Parquet via
plain ``df.write`` — our native format is Parquet adjacency (SURVEY §2.1).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.ids import remap_edges


def read_edge_list(
    spark: SparkSession,
    path: str,
    separator: str = "\t",
    comment_prefix: str = "#",
    first_node: int = 0,
    directed: bool = False,
    continuous: bool = True,
    weighted: bool = False,
) -> Graph:
    """EdgeListReader (``io/EdgeListReader.hpp:38``)."""
    df = spark.read.csv(path, sep=separator, comment=comment_prefix or None)
    cols = [F.col("_c0").cast("long"), F.col("_c1").cast("long")]
    if weighted and "_c2" in df.columns:
        cols.append(F.col("_c2").cast("double").alias("weight"))
    e = df.select(*cols).toDF(*(["src", "dst", "weight"][: len(cols)]))
    if first_node:
        e = e.withColumn("src", F.col("src") - first_node).withColumn(
            "dst", F.col("dst") - first_node
        )
    if not continuous:
        e, _ = remap_edges(e)
    return Graph.from_edges(e, directed=directed, weighted=weighted)


def read_snap(spark: SparkSession, path: str, directed: bool = False) -> Graph:
    """SNAPGraphReader: whitespace pairs, # comments, dedupe, dense remap
    (``io/SNAPGraphReader.cpp:18-111``)."""
    lines = spark.read.text(path).filter(
        ~F.col("value").startswith("#") & (F.trim("value") != "")
    )
    parts = F.split(F.trim(F.col("value")), r"\s+")
    e = lines.select(
        parts.getItem(0).cast("long").alias("src"),
        parts.getItem(1).cast("long").alias("dst"),
    )
    e, _ = remap_edges(e)
    return Graph.from_edges(e, directed=directed, dedupe=True)


def read_metis(spark: SparkSession, path: str) -> Graph:
    """METISGraphReader: line i (1-based, after header) lists neighbors of
    node i-1 as 1-based ids (``io/METISGraphReader.cpp``)."""
    raw = spark.read.text(path)
    w = Window.orderBy(F.monotonically_increasing_id())
    numbered = raw.withColumn("ln", F.row_number().over(w))
    body = numbered.filter(
        (F.col("ln") > 1) & (~F.col("value").startswith("%"))
    )
    e = (
        body.select(
            (F.col("ln") - 2).alias("src"),
            F.explode(
                F.filter(F.split(F.trim("value"), r"\s+"), lambda x: x != "")
            ).alias("nbr"),
        )
        .select("src", (F.col("nbr").cast("long") - 1).alias("dst"))
        .filter(F.col("src") <= F.col("dst"))  # undirected, stored twice in file
    )
    header = numbered.filter(F.col("ln") == 1).select("value").collect()[0][0]
    n = int(header.split()[0])
    nodes = spark.range(n).select("id")
    return Graph.from_edges(e, nodes=nodes)


def write_edge_list(g: Graph, path: str, separator: str = "\t") -> None:
    """EdgeListWriter: one canonical row per edge."""
    e = g.canonical_undirected_edges() if not g.directed else g.edges.select("src", "dst")
    e.select(
        F.concat_ws(separator, F.col("src"), F.col("dst")).alias("value")
    ).write.mode("overwrite").text(path)


def write_partition(labels, path: str) -> None:
    """PartitionWriter analogue: persist a (node, label) partition as
    Parquet — the engine's native partition format (the reference's text
    format at ``io/PartitionWriter.cpp`` is line-ordered and therefore
    inherently sequential; Parquet keeps it distributed + schema'd)."""
    labels.select("node", "label").write.mode("overwrite").parquet(path)


def read_partition(spark: SparkSession, path: str):
    """Read a Parquet partition written by ``write_partition``."""
    return spark.read.parquet(path).select("node", "label")


def read_partition_text(spark: SparkSession, path: str):
    """Legacy PartitionReader (``io/PartitionReader.cpp``): text file where
    LINE i holds the subset id of node i. The format itself is
    line-ordered, so this is a small-file compatibility path: a single
    file's lines are zipped with their index (deterministic for one
    file — splits follow byte order). Use Parquet partitions at scale."""
    rdd = spark.sparkContext.textFile(path).zipWithIndex()
    return spark.createDataFrame(
        rdd.map(lambda t: (int(t[1]), int(t[0].strip()))), "node long, label long"
    )
