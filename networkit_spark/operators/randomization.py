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
from networkit_spark.plans.pin import pin


def edge_switching(
    g: Graph, rounds: int = 10, seed: int = 42, portable_hash: bool = False
) -> Graph:
    """Randomize an undirected simple graph preserving every degree.

    ``portable_hash`` draws the pairing/coin hashes from the md5-based
    cross-engine hash (``functions/porthash.py``) so a DuckDB oracle can
    replay the identical swap rounds; the default ``xxhash64`` is the
    cheaper internal path."""
    from networkit_spark.functions.porthash import md5_mod
    if g.directed:
        raise ValueError("edge_switching expects an undirected graph")
    edges = g.canonical_undirected_edges().transform(pin)

    # Bucket count scales with |E| so the per-bucket row_number window
    # stays bounded (~TARGET_BUCKET_SIZE edges per single-task window)
    # instead of m/constant — the global-window bottleneck at scale.
    m = edges.count()
    TARGET_BUCKET_SIZE = 4096
    for rnd in range(rounds):
        h = (
            md5_mod(F.concat_ws("_", "src", "dst"), salt=f"es{seed}:{rnd}:")
            if portable_hash
            else F.xxhash64("src", "dst", F.lit(seed), F.lit(rnd))
        )
        buckets = max(32, m // TARGET_BUCKET_SIZE)
        # (h, src, dst) order: deterministic even on hash collisions
        w = Window.partitionBy("bucket").orderBy("h", "src", "dst")
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

        coin = (
            F.pmod(md5_mod(F.col("pair"), salt=f"esc{seed}:{rnd}:"), F.lit(2)) == 0
            if portable_hash
            else F.pmod(F.xxhash64("pair", F.lit(seed), F.lit(rnd + 101)), F.lit(2)) == 0
        )
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
            .transform(pin)
        )

    out = edges.withColumn("weight", F.lit(1.0))
    return Graph.from_edges(out, directed=False, nodes=g.nodes)


def global_curveball(
    g: Graph, rounds: int = 5, seed: int = 42, portable_hash: bool = False
) -> Graph:
    """GlobalCurveball (``randomization/GlobalCurveball.cpp``) —
    synchronous distributed variant of the curveball trade chain.

    Each round pairs every node with one partner (seeded hash-bucket
    pairing, no global ordering); each pair (u, v) trades its DISJOINT
    neighbor sets: neighbors adjacent to the other node (or equal to it)
    stay put, the remaining assigned neighbors are pooled and
    redistributed by a seeded per-trade hash — u draws |A| of the pool,
    v the rest, preserving both degrees and simplicity (a node only
    receives vertices not already adjacent to it).

    DEVIATION (documented): the reference executes trades sequentially;
    here every trade in a round sees the PRE-round adjacency, and each
    edge participates in at most one trade per round (it is assigned to
    the endpoint whose trade-pair hashes smaller; edges with an unpaired
    or same-pair endpoint rest this round). Degree sequence and
    simplicity are preserved exactly — verified in pytest — and the
    chain remains degree-preserving-uniform in the curveball family;
    only the mixing schedule differs.

    Scale shape: per round one node-pairing shuffle (bucketed
    row_number, bounded window), one edge→pair assignment join, and one
    per-trade redistribution window bounded by deg(u)+deg(v).
    """
    from networkit_spark.functions.porthash import md5_mod

    if g.directed:
        raise ValueError("global_curveball expects an undirected graph")
    edges = g.canonical_undirected_edges().select("src", "dst").localCheckpoint(
        eager=True
    )
    n = g.num_nodes()
    TARGET_BUCKET = 4096
    nbuckets = max(32, n // TARGET_BUCKET)

    for rnd in range(rounds):
        h = (
            md5_mod(F.col("id"), salt=f"cb{seed}:{rnd}:")
            if portable_hash
            else F.xxhash64("id", F.lit(seed), F.lit(rnd))
        )
        wb = Window.partitionBy("bucket").orderBy("h", "id")
        paired = (
            g.nodes.select("id", h.alias("h"), F.pmod(h, F.lit(nbuckets)).alias("bucket"))
            .withColumn("rn", F.row_number().over(wb))
            .withColumn(
                "pair",
                F.concat_ws("_", F.lit(rnd), "bucket", (F.col("rn") / 2).cast("long")),
            )
            .withColumn("side", F.pmod("rn", F.lit(2)))
        )
        # drop pairs with only one member (odd bucket tail)
        sizes = paired.groupBy("pair").agg(F.count(F.lit(1)).alias("c"))
        paired = (
            paired.join(sizes.filter("c = 2").select("pair"), "pair", "left_semi")
            .select(
                "id",
                "pair",
                "side",
                (
                    md5_mod(F.col("pair"), salt="cbp:")
                    if portable_hash
                    else F.xxhash64("pair")
                ).alias("ph"),
            )
        ).transform(pin)

        pa = paired.select(
            F.col("id").alias("src"),
            F.col("pair").alias("pair_a"),
            F.col("side").alias("side_a"),
            F.col("ph").alias("ph_a"),
        )
        pb = paired.select(
            F.col("id").alias("dst"),
            F.col("pair").alias("pair_b"),
            F.col("side").alias("side_b"),
            F.col("ph").alias("ph_b"),
        )
        e = edges.join(pa, "src", "left").join(pb, "dst", "left")
        # owner: endpoint whose pair hashes smaller (ties: src side); edges
        # inside one pair or touching an unpaired node rest this round
        both = e.filter(
            F.col("pair_a").isNotNull()
            & F.col("pair_b").isNotNull()
            & (F.col("pair_a") != F.col("pair_b"))
        )
        rest = e.join(
            both.select("src", "dst"), ["src", "dst"], "left_anti"
        ).select("src", "dst")

        owner_is_src = (F.col("ph_a") < F.col("ph_b")) | (
            (F.col("ph_a") == F.col("ph_b")) & (F.col("pair_a") <= F.col("pair_b"))
        )
        assigned = both.select(
            F.when(owner_is_src, F.col("src")).otherwise(F.col("dst")).alias("owner"),
            F.when(owner_is_src, F.col("dst")).otherwise(F.col("src")).alias("w"),
            F.when(owner_is_src, F.col("pair_a")).otherwise(F.col("pair_b")).alias(
                "pair"
            ),
            F.when(owner_is_src, F.col("side_a")).otherwise(F.col("side_b")).alias(
                "side"
            ),
        )
        # other member of the trade + adjacency test against it
        other = paired.select(
            "pair", (1 - F.col("side")).alias("side"), F.col("id").alias("other")
        )
        assigned = assigned.join(other, ["pair", "side"])
        sym = edges.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).select(F.col("src").alias("other"), F.col("dst").alias("w"))
        adj_other = assigned.join(sym, ["other", "w"], "left_semi").withColumn(
            "tradeable", F.lit(False)
        )
        pool = assigned.join(sym, ["other", "w"], "left_anti").filter(
            F.col("w") != F.col("other")
        )
        stay = adj_other.select("owner", "w").unionByName(
            assigned.join(pool.select("pair", "w"), ["pair", "w"], "left_anti")
            .join(adj_other.select("pair", "w"), ["pair", "w"], "left_anti")
            .select("owner", "w")
        )
        # redistribute the pool: per pair, |A| = side-0-owned rows go to
        # the side-0 member, the rest to side-1; selection by seeded hash
        wp = Window.partitionBy("pair").orderBy(
            (
                md5_mod(F.col("w"), salt=f"cbw{seed}:{rnd}:")
                if portable_hash
                else F.xxhash64("w", F.lit(seed), F.lit(rnd + 777))
            ),
            F.col("w"),
        )
        counts = pool.groupBy("pair").agg(
            F.sum(F.when(F.col("side") == 1, 1).otherwise(0)).alias("n_first")
        )
        members = paired.groupBy("pair").agg(
            F.max(F.when(F.col("side") == 1, F.col("id"))).alias("m_first"),
            F.max(F.when(F.col("side") == 0, F.col("id"))).alias("m_second"),
        )
        redis = (
            pool.withColumn("prn", F.row_number().over(wp))
            .join(counts, "pair")
            .join(members, "pair")
            .select(
                F.when(F.col("prn") <= F.col("n_first"), F.col("m_first"))
                .otherwise(F.col("m_second"))
                .alias("owner"),
                "w",
            )
        )
        new_assigned = stay.unionByName(redis).select(
            F.least("owner", "w").alias("src"), F.greatest("owner", "w").alias("dst")
        )
        edges = rest.unionByName(new_assigned).transform(pin)

    sym_out = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).withColumn("weight", F.lit(1.0))
    return Graph(nodes=g.nodes, edges=sym_out, directed=False, weighted=g.weighted)


def degree_preserving_shuffle(g: Graph, seed: int = 42) -> Graph:
    """DegreePreservingShuffle (``randomization/DegreePreservingShuffle.cpp``):
    permute node identities WITHIN equal-degree classes — the resulting
    graph is isomorphic with relabeled vertices, exactly preserving the
    degree sequence per node id.

    Columnar permutation: inside each degree class, rank nodes twice
    (by id — the canonical order; by seeded hash — the shuffled order)
    and map rank→rank. Windows are per degree class; the degree-1 class
    can be large, which is the same bounded-window trade-off as the
    edge-switching bucketing (salt via pmod if a class ever dominates).
    """
    sym = (g.symmetrized_edges() if g.directed else g.edges).filter(
        F.col("src") != F.col("dst")
    )
    deg = (
        sym.select("src", "dst")
        .dropDuplicates(["src", "dst"])
        .groupBy(F.col("src").alias("id"))
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    classes = g.nodes.join(deg, "id", "left").select(
        "id", F.coalesce("deg", F.lit(0)).alias("deg")
    )
    w_id = Window.partitionBy("deg").orderBy("id")
    w_h = Window.partitionBy("deg").orderBy(
        F.xxhash64("id", F.lit(seed)), F.col("id")
    )
    by_id = classes.select("deg", "id", F.row_number().over(w_id).alias("rk"))
    by_h = classes.select(
        "deg", F.col("id").alias("new_id"), F.row_number().over(w_h).alias("rk")
    )
    mapping = by_id.join(by_h, ["deg", "rk"]).select("id", "new_id").localCheckpoint(
        eager=True
    )
    e = (
        g.edges.join(mapping.withColumnRenamed("id", "src"), "src")
        .withColumnRenamed("new_id", "nsrc")
        .join(mapping.withColumnRenamed("id", "dst"), "dst")
        .withColumnRenamed("new_id", "ndst")
        .select(
            F.col("nsrc").alias("src"),
            F.col("ndst").alias("dst"),
            *([F.col("weight")] if "weight" in g.edges.columns else []),
        )
    )
    return Graph(nodes=g.nodes, edges=e, directed=g.directed, weighted=g.weighted)
