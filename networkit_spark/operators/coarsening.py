"""Coarsening and partition-combination operators.

Reference: ``coarsening/MatchingCoarsening.cpp``,
``coarsening/ClusteringProjector.cpp``, ``overlap/HashingOverlapper.cpp``.
(``ParallelPartitionCoarsening`` lives in
:mod:`networkit_spark.operators.community_quality` as :func:`coarsen`.)

All three are single-pass join/agg shapes: the fine→coarse map is a
rank over the carried node set (bucketed, no global window), the coarse
edge build is one groupBy-sum over the canonical fine edges, projection
is a chain of broadcast-sized joins, and the overlapper hash is a pure
column expression (unrolled djb2) so the whole thing stays inside
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.community_quality import compact_labels


def matching_coarsening(
    g: Graph, matching: DataFrame, no_self_loops: bool = False
) -> tuple[Graph, DataFrame]:
    """Contract each matched pair into one supernode
    (``coarsening/MatchingCoarsening.cpp:16-56``).

    ``matching``: (u, v) pairs with u < v (the convention of
    :func:`networkit_spark.operators.matching.suitor_matching` /
    ``local_max_matching``). Returns ``(coarse_graph, fine_to_coarse)``
    where ``fine_to_coarse`` is (node, coarse).

    Coarse ids follow the reference's sequential forNodes scan
    (``MatchingCoarsening.cpp:24-38``): a node is *carried* iff it is
    unmatched or the smaller endpoint of its pair, and carried nodes
    get consecutive ids in ascending node order; the larger endpoint
    inherits its mate's id. The ordinal rank uses the bucketed
    two-phase rank from :func:`compact_labels` — no global window.

    Edge weights: every canonical fine edge (v ≤ u, self-loops once)
    adds its weight to the coarse pair {cv, cu}
    (``MatchingCoarsening.cpp:40-49``); ``no_self_loops`` drops
    collapsed intra-pair edges.
    """
    if g.directed:
        raise ValueError("MatchingCoarsening is only defined for undirected graphs")
    larger = matching.select(F.col("v").alias("id"), F.col("u").alias("mate"))
    carried = g.nodes.join(larger.select("id"), "id", "left_anti")
    carried_map = compact_labels(
        carried.select(F.col("id").alias("node"), F.col("id").alias("label"))
    ).select(F.col("node"), F.col("label").alias("coarse"))
    inherited = larger.join(
        carried_map.withColumnRenamed("node", "mate"), "mate"
    ).select(F.col("id").alias("node"), "coarse")
    fine_to_coarse = carried_map.unionByName(inherited)

    # canonical weighted relation incl. self-loops once: symmetric storage
    # holds both orientations of non-loops, so src <= dst keeps each edge
    # exactly once (canonical_undirected_edges drops loops and weights)
    fine = g.edges.filter(F.col("src") <= F.col("dst")).select(
        "src", "dst", F.col("weight").cast("double").alias("weight")
    )
    mapped = (
        fine.join(
            fine_to_coarse.withColumnRenamed("node", "src").withColumnRenamed(
                "coarse", "cu"
            ),
            "src",
        )
        .join(
            fine_to_coarse.withColumnRenamed("node", "dst").withColumnRenamed(
                "coarse", "cv"
            ),
            "dst",
        )
        .select(
            F.least("cu", "cv").alias("src"),
            F.greatest("cu", "cv").alias("dst"),
            "weight",
        )
    )
    if no_self_loops:
        mapped = mapped.filter(F.col("src") != F.col("dst"))
    coarse_edges = mapped.groupBy("src", "dst").agg(F.sum("weight").alias("weight"))
    coarse_nodes = fine_to_coarse.select(F.col("coarse").alias("id")).distinct()
    cg = Graph.from_edges(
        coarse_edges, directed=False, weighted=True, nodes=coarse_nodes
    )
    return cg, fine_to_coarse


def project_back(fine_to_coarse: DataFrame, coarse_labels: DataFrame) -> DataFrame:
    """Project a coarse clustering onto the fine graph
    (``ClusteringProjector::projectBack``,
    ``coarsening/ClusteringProjector.cpp:14-27``): fine node → its
    supernode's cluster. One join; (node, label)."""
    return fine_to_coarse.join(
        coarse_labels.select(F.col("node").alias("coarse"), "label"), "coarse"
    ).select("node", "label")


def project_back_to_finest(
    coarse_labels: DataFrame, maps: list[DataFrame]
) -> DataFrame:
    """Project a clustering at the coarsest level down a hierarchy of
    fine→coarse maps (``ClusteringProjector::projectBackToFinest``,
    ``ClusteringProjector.cpp:29-61``). ``maps`` is ordered fine→coarse
    (maps[0] maps the finest level); each is (node, coarse).

    The reference composes the maps per node in a driver array; here the
    composition is the same chain of joins, each level shrinking
    geometrically."""
    if not maps:
        return coarse_labels
    cur = maps[0]
    for m in maps[1:]:
        cur = cur.join(
            m.select(F.col("node").alias("coarse"), F.col("coarse").alias("nxt")),
            "coarse",
        ).select("node", F.col("nxt").alias("coarse"))
    return project_back(cur, coarse_labels)


def _djb2(key: Column) -> Column:
    """Unrolled djb2 over the little-endian bytes of a non-negative
    int64, stopping at the first zero byte — bit-identical to the
    reference's ``while ((c = *str++))`` loop over ``(unsigned char*)
    &cid`` (``overlap/HashingOverlapper.cpp:17-26``). Eight chained
    CASEs, pure codegen; the running value stays < 2^63 (≤ 8 steps of
    h·33+255 from 5381)."""
    h = F.lit(5381).cast("long")
    alive = F.lit(True)
    for i in range(8):
        b = F.shiftrightunsigned(key, 8 * i).bitwiseAND(F.lit(255))
        alive = alive & (b != 0)
        h = F.when(alive, h * 33 + b).otherwise(h)
    return h


def hashing_overlapper(g: Graph, partitions: list[DataFrame]) -> DataFrame:
    """Combine clusterings into their overlap (core) clustering by
    hashing (``overlap/HashingOverlapper.cpp:14-85``). Each input is
    (node, label); returns (node, label) with labels compacted to
    0..k−1 in ascending raw-hash order (``Partition::compact``).

    - 0 clusterings → the 1-clustering (label 0);
    - 1 → the clustering itself (compacted);
    - 2 → djb2 of ``((first ^ 0xffff) << 16) | (second ^ 0xffff)``
      (``HashingOverlapper.cpp:47-62``);
    - ≥3 → Σ_c (djb2((c+2)·label_c) & 0xffff) from 0
      (``HashingOverlapper.cpp:64-75``).
    """
    if len(partitions) == 0:
        return g.nodes.select(
            F.col("id").alias("node"), F.lit(0).cast("long").alias("label")
        )
    if len(partitions) == 1:
        return compact_labels(partitions[0].select("node", "label"))
    if len(partitions) == 2:
        first, second = partitions
        joined = first.select("node", F.col("label").alias("l1")).join(
            second.select("node", F.col("label").alias("l2")), "node"
        )
        key = F.shiftleft(
            F.col("l1").bitwiseXOR(F.lit(65535)).cast("long"), 16
        ).bitwiseOR(F.col("l2").bitwiseXOR(F.lit(65535)).cast("long"))
        raw = joined.select("node", _djb2(key).alias("label"))
        return compact_labels(raw)
    parts = [
        p.select("node", _djb2((F.col("label") * (c + 2)).cast("long")).bitwiseAND(
            F.lit(65535)
        ).alias(f"h{c}"))
        for c, p in enumerate(partitions)
    ]
    joined = parts[0]
    for p in parts[1:]:
        joined = joined.join(p, "node")
    total = sum((F.col(f"h{c}") for c in range(1, len(partitions))), F.col("h0"))
    raw = joined.select("node", total.cast("long").alias("label"))
    return compact_labels(raw)
