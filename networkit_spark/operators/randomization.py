"""Degree-preserving graph randomization — parallel double edge swaps.

Reference: ``randomization/EdgeSwitchingMarkovChainRandomization.cpp``
and ``randomization/GlobalCurveball.cpp`` — Markov chains of
degree-preserving swaps: pick two edges (a,b), (c,d), rewire to (a,d),
(c,b) unless that creates a self-loop or a duplicate.

The reference's chain is sequential (one swap at a time). The
distributed analogue performs MANY INDEPENDENT swaps per round (public
"parallel double edge switching" construction):

  1. hash-bucket the canonical edges with a per-round seed; pair edges
     inside each bucket (row_number // 2 — no global ordering needed);
  2. propose the rewire for every pair, with a seeded coin choosing
     (a,d),(c,b) vs (a,c),(b,d);
  3. REJECT any proposal that (i) makes a self-loop, (ii) duplicates a
     surviving edge, or (iii) collides with another proposal — rejected
     pairs keep their original edges, so every round is a valid
     transition of the same Markov chain.

Each round = one bucket shuffle + two anti-joins; the stationary
distribution is uniform over simple graphs with the given degree
sequence, as for the sequential chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from networkit_spark.graph import Graph


def edge_switching(g: Graph, rounds: int = 10, seed: int = 42) -> Graph:
    """Randomize an undirected simple graph preserving every degree."""
    if g.directed:
        raise ValueError("edge_switching expects an undirected graph")
    edges = g.canonical_undirected_edges().localCheckpoint(eager=True)

    # Bucket count scales with |E| so the per-bucket row_number window
    # stays bounded (~TARGET_BUCKET_SIZE edges per single-task window)
    # instead of m/constant — the global-window bottleneck at scale.
    m = edges.count()
    TARGET_BUCKET_SIZE = 4096
    for rnd in range(rounds):
        h = F.xxhash64("src", "dst", F.lit(seed), F.lit(rnd))
        buckets = max(32, m // TARGET_BUCKET_SIZE)
        w = Window.partitionBy("bucket").orderBy("h")
        paired = (
            edges.select("src", "dst", h.alias("h"), F.pmod(h, F.lit(buckets)).alias("bucket"))
            .withColumn("rn", F.row_number().over(w))
            .withColumn("pair", F.concat_ws("_", "bucket", (F.col("rn") / 2).cast("long")))
            .withColumn("side", F.pmod(F.col("rn"), F.lit(2)))
        )
        a = paired.filter("side = 1").select(
            "pair", F.col("src").alias("a"), F.col("dst").alias("b")
        )
        b = paired.filter("side = 0").select(
            "pair", F.col("src").alias("c"), F.col("dst").alias("d"), "h"
        )
        pairs = a.join(b, "pair")  # unpaired leftovers drop out (kept as-is)

        coin = F.pmod(F.xxhash64("pair", F.lit(seed), F.lit(rnd + 101)), F.lit(2)) == 0
        p1s = F.when(coin, F.least("a", "d")).otherwise(F.least("a", "c"))
        p1d = F.when(coin, F.greatest("a", "d")).otherwise(F.greatest("a", "c"))
        p2s = F.when(coin, F.least("c", "b")).otherwise(F.least("b", "d"))
        p2d = F.when(coin, F.greatest("c", "b")).otherwise(F.greatest("b", "d"))
        prop = pairs.select(
            "pair", "a", "b", "c", "d",
            p1s.alias("n1s"), p1d.alias("n1d"), p2s.alias("n2s"), p2d.alias("n2d"),
        )
        # validity: no self-loops, the two new edges distinct
        prop = prop.withColumn(
            "ok0",
            (F.col("n1s") != F.col("n1d"))
            & (F.col("n2s") != F.col("n2d"))
            & ~((F.col("n1s") == F.col("n2s")) & (F.col("n1d") == F.col("n2d"))),
        )
        # collision with EXISTING edges: conservative — a new edge must not
        # equal ANY current edge except the pair's own two originals.
        # (Checking against "edges minus all proposals' originals" instead
        # would let a proposal collide with an edge a LATER-rejected pair
        # keeps — two-phase acceptance can't see its own rejection set, so
        # over-reject; fewer swaps per round, chain validity guaranteed.)
        okp = prop.filter("ok0")
        new_edges = okp.select(
            "pair", "a", "b", "c", "d", F.col("n1s").alias("src"), F.col("n1d").alias("dst")
        ).unionByName(
            okp.select("pair", "a", "b", "c", "d", F.col("n2s").alias("src"), F.col("n2d").alias("dst"))
        )
        own_old = (
            (F.col("src") == F.least("a", "b")) & (F.col("dst") == F.greatest("a", "b"))
        ) | (
            (F.col("src") == F.least("c", "d")) & (F.col("dst") == F.greatest("c", "d"))
        )
        clash_exist = (
            new_edges.join(edges, ["src", "dst"], "left_semi")
            .filter(~own_old)
            .select("pair")
        )
        new_edges = new_edges.select("pair", "src", "dst")
        clash_prop = (
            new_edges.groupBy("src", "dst")
            .agg(F.count(F.lit(1)).alias("k"), F.collect_set("pair").alias("ps"))
            .filter("k > 1")
            .select(F.explode("ps").alias("pair"))
        )
        bad = clash_exist.unionByName(clash_prop).distinct()
        accepted = prop.filter("ok0").join(bad, "pair", "left_anti")

        acc_old = accepted.select(
            F.least("a", "b").alias("src"), F.greatest("a", "b").alias("dst")
        ).unionByName(
            accepted.select(F.least("c", "d").alias("src"), F.greatest("c", "d").alias("dst"))
        )
        acc_new = accepted.select(
            F.col("n1s").alias("src"), F.col("n1d").alias("dst")
        ).unionByName(accepted.select(F.col("n2s").alias("src"), F.col("n2d").alias("dst")))
        edges = (
            edges.join(acc_old, ["src", "dst"], "left_anti")
            .unionByName(acc_new)
            .localCheckpoint(eager=True)
        )

    out = edges.withColumn("weight", F.lit(1.0))
    return Graph.from_edges(out, directed=False, nodes=g.nodes)
