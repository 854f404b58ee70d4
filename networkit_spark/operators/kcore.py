"""Core decomposition — k-core numbers via H-index fixed point.

Reference semantics: ``centrality/CoreDecomposition.cpp`` (bucket-queue
peeling, 341 LoC; ctor ``CoreDecomposition.hpp:47``): ``core(v)`` = the
largest k such that v belongs to a subgraph where every node has degree
≥ k. NetworKit peels degree levels sequentially — a chain of O(k_max)
dependent phases, the wrong shape for a shuffle-based engine.

Our kernel instead iterates the **neighborhood H-index** (Lü, Zhou,
Zhang, Stanley, "The H-index of a network node and its relation to degree
and coreness", Nature Communications 2016): start with h⁰(v) = degree(v)
and repeatedly set

    hᵗ⁺¹(v) = H({hᵗ(u) : u ∈ N(v)})   (largest k with ≥ k neighbors ≥ k)

The sequence is monotonically non-increasing and its fixed point is
exactly coreness(v). Rounds needed ≈ graph-dependent but small in
practice (≤ O(diameter · …)); every round is ONE join + ONE windowed
aggregation over the edge table — fully parallel, no level-by-level
serial chain, lineage truncated per round.

Spark plan per round:
    nb   = edges ⋈ h on neighbor side        (shuffle of |V| h-vector)
    rank = row_number over (partitionBy node, orderBy h desc)
    h'   = groupBy(node).agg(max(least(rank, h)))   — the H-index
Convergence when no node decreased (values never increase).

Self-loops are dropped up front (NetworKit's CoreDecomposition requires a
loop-free graph — same contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.edge_layout import (
    broadcast_row_limit,
    derived_layout,
    maybe_broadcast,
)
from networkit_spark.plans.superstep import SuperstepRunner


def core_decomposition(
    g: Graph,
    runner: SuperstepRunner | None = None,
    max_rounds: int = 1 << 30,
) -> DataFrame:
    """(id LONG, core LONG) for every node; isolated nodes have core 0."""
    spark = g.edges.sparkSession
    runner = runner or SuperstepRunner(spark)

    sym = g.symmetrized_edges() if g.directed else g.edges
    # r8 layout (guide §2.4): SRC-partitioned memoized cache. The h-gather
    # joins on dst with the |V|-sized h vector BROADCAST (below the row
    # limit), which preserves the src hashing — so the H-index window
    # (partitionBy node = src) and the groupBy(node) after it both run
    # WITHOUT an Exchange. The old plan shuffled the edge-scale neighbor
    # relation for the window sort every round.
    edges = derived_layout(
        g.edges,
        "kcore_simple_src",
        lambda: sym.filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .dropDuplicates(["src", "dst"])
        .repartition("src"),
    )

    # h⁰ = degree (isolated nodes: 0 — already their coreness)
    deg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("h")
    )
    h = (
        g.nodes.join(deg, "id", "left")
        .select("id", F.coalesce("h", F.lit(0)).cast("long").alias("h"))
        .localCheckpoint(eager=True)
    )

    n = g.num_nodes()
    w = Window.partitionBy("node").orderBy(F.desc("hv"), F.asc("nbr"))
    rounds = 0
    changed_nodes: DataFrame | None = None  # None ⇒ everyone recomputes
    last_changed = n
    small = n <= broadcast_row_limit()
    while rounds < max_rounds:
        rounds += 1
        hj = h.withColumnRenamed("id", "dst")
        hj = F.broadcast(hj) if small else hj.hint("shuffle_hash")
        nbh = (
            edges.join(hj, "dst")
            .select(
                F.col("src").alias("node"),
                F.col("dst").alias("nbr"),
                F.col("h").alias("hv"),
            )
        )
        # active set: h only ever DECREASES, so a node's H-index can only
        # change when one of its neighbors decreased last round — once the
        # frontier is small, recompute only those (same gating as PLP:
        # the extra semi-join is worth one edge-table pass only after the
        # frontier has collapsed below ~40% of |V|)
        if changed_nodes is not None and last_changed < 0.4 * n:
            targets = (
                edges.join(
                    maybe_broadcast(
                        changed_nodes.withColumnRenamed("id", "dst"), last_changed
                    ),
                    "dst",
                    "left_semi",
                )
                .select(F.col("src").alias("node"))
                .distinct()
            )
            nbh = nbh.join(maybe_broadcast(targets, n), "node", "left_semi")
        hidx = (
            nbh.withColumn("rn", F.row_number().over(w))
            .groupBy("node")
            .agg(F.max(F.least(F.col("rn"), F.col("hv"))).alias("h_new"))
        )
        hx = hidx.withColumnRenamed("node", "id")
        hx = F.broadcast(hx) if small else hx.hint("shuffle_hash")
        new_h = (
            h.withColumnRenamed("h", "h_old")
            .join(hx, "id", "left")
            .select(
                "id",
                F.coalesce(F.col("h_new"), F.col("h_old")).cast("long").alias("h"),
                "h_old",
            )
        )
        new_h = new_h.localCheckpoint(eager=True)
        changed = new_h.filter(F.col("h") != F.col("h_old")).count()
        changed_nodes = new_h.filter(F.col("h") != F.col("h_old")).select("id")
        last_changed = changed
        h = new_h.select("id", "h")
        runner.record(rounds, changed=changed)
        if changed == 0:
            break

    return h.select("id", F.col("h").alias("core"))
