"""Dense-id assignment and compaction.

NetworKit readers remap arbitrary external ids to consecutive internal ids
``0..n-1`` in first-seen order (``io/SNAPGraphReader.cpp:27-40``);
``GraphTools::getContinuousNodeIds`` compacts a graph with holes
(``GraphTools.hpp:378-385``). First-seen order is a single-threaded notion;
the distributed equivalent is any *deterministic total order* — we use the
natural sort order of the external key, which is stable across cluster
sizes and re-runs (component/label parity is relabel-invariant anyway, see
``community/GraphClusteringTools.cpp:99-115``).

Scale note: the remap is a two-phase rank over the distinct key set —
a global ``Window.orderBy`` would funnel all |V| keys through ONE task
(the dense-id scale-killer at 10¹²-file ingest). Instead: range-partition
the distinct keys, rank within each range partition in parallel, then add
exclusive-prefix-sum partition offsets (one tiny collect of per-partition
counts). Range partitioning puts every key of partition *i* before every
key of partition *i+1*, so offset + local rank == global rank no matter
where the sampled boundaries land — output is identical at any
parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from networkit_spark.graph import Graph


def assign_dense_ids(df: DataFrame, cols: list[str], buckets: int | None = None) -> DataFrame:
    """Map each distinct tuple of ``cols`` to a dense id 0..k-1 in the
    natural sort order of ``cols`` (deterministic across parallelism).

    Returns a DataFrame with ``cols`` + ``id LONG``.
    """
    spark = df.sparkSession
    if buckets is None:
        buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    distinct = df.select(*cols).distinct()
    parts = distinct.repartitionByRange(
        buckets, *[F.col(c) for c in cols]
    ).withColumn("__pid", F.spark_partition_id())
    # pin the partition layout so counts and ranks see the same pids
    parts = parts.localCheckpoint(eager=True)
    counts = {
        int(r["__pid"]): int(r["n"])
        for r in parts.groupBy("__pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = [], 0
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    if not offsets:
        return distinct.withColumn("id", F.lit(0).cast("long")).limit(0)
    off_df = spark.createDataFrame(offsets, "__pid int, __off long")
    w = Window.partitionBy("__pid").orderBy(*[F.col(c) for c in cols])
    return (
        parts.withColumn("__rk", F.row_number().over(w) - F.lit(1))
        .join(F.broadcast(off_df), "__pid")
        .select(*cols, (F.col("__rk") + F.col("__off")).cast("long").alias("id"))
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
