"""PLM — Louvain community detection (local moving + multilevel coarsening).

Reference: ``community/PLM.cpp`` (325 LoC). Semantics matched:

- singleton init; node volume = weightedDegree + self-loop weight again
  (``PLM.cpp:44-47``);
- move gain for u from community C to D
  (``PLM.cpp:130-135``, modGain):

      Δ = (aff(u,D) − aff(u,C∖u)) / ω(E)
        + γ·((vol(C∖u) − vol(D∖u))·vol(u)) / (2·ω(E)²)

  where aff(u,X) = edge weight from u into X (self-loops excluded,
  ``PLM.cpp:105-111``); move to the best D with Δ > 0;
- when a pass stops moving, contract by the labels
  (ParallelPartitionCoarsening) and recurse; prolong labels back down
  (``PLM.cpp`` coarsen/prolong).

The reference's move phase is asynchronous (OpenMP threads race on
labels); a synchronous superstep would oscillate on symmetric graphs
(two cliques swapping wholesale), so we gate moves by node-id parity per
round — the standard determinization in distributed Louvain — which
makes output identical at every cluster size. Tests therefore assert
modularity quality and planted-partition recovery, matching how the
reference's own tests treat PLM (quality, not exact labels).

Every round is three shuffles: affinity join-agg, best-move window,
volume re-aggregation. Community volumes are |labels|-sized — broadcast
or hash-joined by Catalyst as appropriate.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.community_quality import coarsen
from networkit_spark.plans.superstep import SuperstepRunner


@dataclass
class PLMResult:
    labels: DataFrame  # (node LONG, label LONG)
    levels: int
    moves: int


def _local_moving(
    g: Graph,
    gamma: float,
    max_rounds: int,
    runner: SuperstepRunner,
    portable_hash: bool = False,
) -> tuple[DataFrame, int]:
    """One Louvain move phase. Returns ((node, label), total moves)."""
    # r8 (guide §2.4): src-partitioned shared layout; the per-round
    # affinity join broadcasts the label vector, so the (node, cand)
    # aggregation AND the best-move window (both keyed by src) run
    # without an Exchange. n-scale side tables (volumes, community
    # volumes, moves) are broadcast below the row limit too.
    from networkit_spark.plans.edge_layout import (
        broadcast_row_limit,
        maybe_broadcast,
        partitioned_edges,
    )

    n = g.num_nodes()
    small = n <= broadcast_row_limit()
    edges = partitioned_edges(
        g.symmetrized_edges() if g.directed else g.edges, "src"
    ).select("src", "dst", "weight")
    loops = edges.filter(F.col("src") == F.col("dst")).select(
        F.col("src").alias("id"), F.col("weight").alias("loop_w")
    ).groupBy("id").agg(F.sum("loop_w").alias("loop_w"))
    nonloop = edges.filter(F.col("src") != F.col("dst"))

    total = g.total_edge_weight()
    if total == 0:
        return g.nodes.select(
            F.col("id").alias("node"), F.col("id").alias("label")
        ), 0
    divisor = 2.0 * total * total

    vol_node = (
        g.degrees()
        .join(loops, "id", "left")
        .select(
            "id",
            (F.col("wdeg") + F.coalesce("loop_w", F.lit(0.0))).alias("vol"),
        )
        .localCheckpoint(eager=True)
    )
    labels = vol_node.select(F.col("id").alias("node"), F.col("id").alias("label"))
    labels = labels.localCheckpoint(eager=True)

    w_best = Window.partitionBy("node").orderBy(F.desc("delta"), F.asc("cand"))
    total_moves = 0
    quiet = 0
    for rnd in range(max_rounds):
        comm_vol = (
            labels.join(
                maybe_broadcast(vol_node.withColumnRenamed("id", "node"), n), "node"
            )
            .groupBy("label")
            .agg(F.sum("vol").alias("cvol"))
        )
        # affinity of u to each neighboring community (self-loops excluded)
        lj = labels.select(
            F.col("node").alias("dst"), F.col("label").alias("cand")
        )
        lj = F.broadcast(lj) if small else lj.hint("shuffle_hash")
        aff = (
            nonloop.join(lj, "dst")
            .groupBy(F.col("src").alias("node"), "cand")
            .agg(F.sum("weight").alias("aff"))
        )
        cur = labels.withColumnRenamed("label", "cur")
        # random-half gate: only a seeded-random half of the nodes may move
        # per round. Synchronous Louvain oscillates (pairs/cliques swap
        # wholesale every round); a DETERMINISTIC alternation (e.g. id
        # parity) re-coordinates the same sets every other round and the
        # oscillation persists — a hashed random half breaks such cycles
        # with probability 1 while staying reproducible at any parallelism.
        if portable_hash:
            from networkit_spark.functions.porthash import md5_mod

            # md5-porthash gate so a DuckDB oracle replays identical rounds
            movable = md5_mod(F.col("node"), salt=f"plm{rnd}:") % 2 == 0
        else:
            movable = F.xxhash64(F.col("node"), F.lit(rnd), F.lit(9172)) % 2 == 0
        cand = (
            aff.join(cur, "node")
            .filter(movable)
            .filter(F.col("cand") != F.col("cur"))
            # aff to own community (0 when none)
            .join(
                aff.select(
                    "node", F.col("cand").alias("cur"), F.col("aff").alias("aff_own")
                ),
                ["node", "cur"],
                "left",
            )
            .join(maybe_broadcast(vol_node.withColumnRenamed("id", "node"), n), "node")
            .join(maybe_broadcast(comm_vol.withColumnRenamed("label", "cur").withColumnRenamed("cvol", "vol_cur"), n), "cur")
            .join(maybe_broadcast(comm_vol.withColumnRenamed("label", "cand").withColumnRenamed("cvol", "vol_cand"), n), "cand")
            .select(
                "node",
                "cand",
                "cur",
                (
                    (F.col("aff") - F.coalesce("aff_own", F.lit(0.0))) / F.lit(total)
                    + F.lit(gamma)
                    * (
                        (F.col("vol_cur") - F.col("vol")) - F.col("vol_cand")
                    )
                    * F.col("vol")
                    / F.lit(divisor)
                ).alias("delta"),
            )
        )
        moves = (
            cand.withColumn("rn", F.row_number().over(w_best))
            .filter((F.col("rn") == 1) & (F.col("delta") > 0))
            .select("node", F.col("cand").alias("new_label"))
        )
        mv = F.broadcast(moves) if small else moves.hint("shuffle_hash")
        new_labels = (
            labels.join(mv, "node", "left")
            .select(
                "node",
                F.coalesce("new_label", F.col("label")).alias("label"),
                F.col("new_label").isNotNull().alias("chg"),
            )
        )
        new_labels = runner.persist_step(new_labels, rnd + 1)
        n_moved = new_labels.filter("chg").count()
        labels = new_labels.select("node", "label")
        runner.record(rnd + 1, moved=n_moved)
        total_moves += n_moved
        quiet = quiet + 1 if n_moved == 0 else 0
        if quiet >= 2:  # both parities quiet in a row ⇒ stable
            break
    return labels, total_moves


def plm(
    g: Graph,
    gamma: float = 1.0,
    max_rounds: int = 32,
    max_levels: int = 10,
    runner: SuperstepRunner | None = None,
    portable_hash: bool = False,
) -> PLMResult:
    """Multilevel Louvain. Returns canonical (node, label) — labels are
    representative node ids at the coarsest level, compacted afterwards
    only by the caller if desired."""
    spark = g.edges.sparkSession
    runner = runner or SuperstepRunner(spark)

    mapping: DataFrame | None = None  # fine node -> current coarse label
    current = g
    levels = 0
    all_moves = 0
    while levels < max_levels:
        levels += 1
        labels, moved = _local_moving(
            current, gamma, max_rounds, runner, portable_hash
        )
        all_moves += moved
        mapping = (
            labels
            if mapping is None
            else mapping.join(
                labels.withColumnRenamed("node", "label2").withColumnRenamed(
                    "label", "new"
                ),
                mapping.label == F.col("label2"),
            ).select("node", F.col("new").alias("label"))
        )
        mapping = mapping.localCheckpoint(eager=True)
        n_comm = labels.select("label").distinct().count()
        n_nodes = current.num_nodes()
        if moved == 0 or n_comm == n_nodes:
            break
        cg = coarsen(current, labels)
        # EAGER localCheckpoint, not cache(): the coarse graph's lineage
        # references this level's final labels, which the superstep runner
        # unpersists two steps later — a lazily-cached frame evicted under
        # memory pressure would then recompute into a truncated lineage
        # ("Checkpoint block not found"). Materializing here severs the
        # dependency before the runner ages the labels out.
        current = Graph(
            nodes=cg.nodes.localCheckpoint(eager=True),
            edges=cg.edges.localCheckpoint(eager=True),
            directed=cg.directed,
            weighted=cg.weighted,
        )
    return PLMResult(labels=mapping, levels=levels, moves=all_moves)


def agglomerative_clusterer(
    g: Graph,
    min_communities: int = 2,
    rel_repeat_threshold: float = 5e-3,
    max_rounds: int = 64,
) -> DataFrame:
    """ParallelAgglomerativeClusterer
    (``community/ParallelAgglomerativeClusterer.cpp``): repeatedly score
    edges by the modularity merge gain
    Δmod(u,v) = (2ω(E)·ω(u,v) − ω(u)·ω(v)) / (2ω(E))², compute a heavy
    matching on those scores, contract matched pairs, and stop when the
    contraction shrinks the graph by less than ``rel_repeat_threshold``
    or fewer than ``min_communities`` remain. Coarsest supernodes are the
    clusters, projected back to the finest nodes as (node, label).

    Matching: the reference uses the sequential PathGrowingMatcher; the
    distributed analogue is :func:`~networkit_spark.operators.matching.
    local_max_matching` (locally-dominant edges — the same
    approximation family, documented deviation). Each round is one
    score join + the matching's O(log n) dominant-edge rounds + one
    contraction aggregation — all join-shaped.
    """
    from networkit_spark.operators.community_quality import coarsen
    from networkit_spark.operators.matching import local_max_matching

    current = g
    mapping = g.nodes.select(F.col("id").alias("node"), F.col("id").alias("label"))
    for _ in range(max_rounds):
        n = current.num_nodes()
        if n < min_communities:
            break
        tw = current.total_edge_weight()
        if tw <= 0:
            break
        sym = (
            current.symmetrized_edges() if current.directed else current.edges
        ).filter(F.col("src") != F.col("dst"))
        vol = sym.groupBy(F.col("src").alias("id")).agg(F.sum("weight").alias("vol"))
        canon_w = sym.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            "weight",
        ).dropDuplicates(["src", "dst"])
        scored_edges = (
            canon_w
            .join(vol.withColumnRenamed("id", "src").withColumnRenamed("vol", "vu"), "src")
            .join(vol.withColumnRenamed("id", "dst").withColumnRenamed("vol", "vv"), "dst")
            .select(
                "src",
                "dst",
                (
                    (2.0 * tw * F.col("weight") - F.col("vu") * F.col("vv"))
                    / (4.0 * tw * tw)
                ).alias("weight"),
            )
        )
        sg = Graph(
            nodes=current.nodes,
            edges=scored_edges.unionByName(
                scored_edges.select(
                    F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
                )
            ),
            directed=False,
            weighted=True,
        )
        m = local_max_matching(sg)
        n_matched = m.count()
        if n_matched == 0:
            break
        cn = n - n_matched
        # the reference DISCARDS the contraction that would shrink the
        # graph below min_communities (or below the relative threshold):
        # repeat is decided BEFORE Gcombined is adopted
        if cn < min_communities or (n - cn) / float(n) <= rel_repeat_threshold:
            break
        labels = (
            current.nodes.join(
                m.select(F.col("u").alias("id"), F.col("u").alias("rep")).unionByName(
                    m.select(F.col("v").alias("id"), F.col("u").alias("rep"))
                ),
                "id",
                "left",
            )
            .select(
                F.col("id").alias("node"),
                F.coalesce("rep", F.col("id")).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        mapping = (
            mapping.join(
                labels.withColumnRenamed("node", "l2").withColumnRenamed("label", "new"),
                mapping.label == F.col("l2"),
            )
            .select("node", F.col("new").alias("label"))
            .localCheckpoint(eager=True)
        )
        cg = coarsen(current, labels)
        current = Graph(
            nodes=cg.nodes.localCheckpoint(eager=True),
            edges=cg.edges.localCheckpoint(eager=True),
            directed=False,
            weighted=True,
        )
    return mapping


def louvain_map_equation(
    g: Graph,
    max_rounds: int = 32,
    portable_hash: bool = False,
) -> DataFrame:
    """LouvainMapEquation (``community/LouvainMapEquation.cpp``,
    synchronous variant): local moving that MINIMIZES the map equation —
    per candidate move the reference's fitnessChange terms
    (totalCut', cluster cut', cut+volume') are evaluated under the
    p·log(p/totalVolume) normalization and the node takes the strictly
    better target, ties to the smaller cluster id. Cluster cut/volume
    tables are |labels|-sized aggregations recomputed per round; moves
    are gated to a seeded random half per round — the same oscillation
    determinization as our PLM (the reference's synchronous mode applies
    batched moves instead; documented deviation). Returns (node, label).
    """
    import math

    spark = g.edges.sparkSession
    # r8: same layout/broadcast policy as the PLM move phase above
    from networkit_spark.plans.edge_layout import (
        broadcast_row_limit,
        maybe_broadcast,
        partitioned_edges,
    )

    n_nodes = g.num_nodes()
    small = n_nodes <= broadcast_row_limit()
    edges = partitioned_edges(
        g.symmetrized_edges() if g.directed else g.edges, "src"
    ).select("src", "dst", "weight")
    loops = (
        edges.filter(F.col("src") == F.col("dst"))
        .groupBy(F.col("src").alias("id"))
        .agg((F.sum("weight")).alias("loop_w"))
    )
    nonloop = edges.filter(F.col("src") != F.col("dst"))
    vol_node = (
        g.degrees()
        .join(loops, "id", "left")
        .select(
            "id",
            (F.col("wdeg") + F.coalesce("loop_w", F.lit(0.0))).alias("vol"),
            F.coalesce("loop_w", F.lit(0.0)).alias("loop"),
        )
        .localCheckpoint(eager=True)
    )
    total_volume = float(vol_node.agg(F.sum("vol")).collect()[0][0] or 0.0)
    if total_volume <= 0:
        return g.nodes.select(F.col("id").alias("node"), F.col("id").alias("label"))

    labels = vol_node.select(F.col("id").alias("node"), F.col("id").alias("label"))
    labels = labels.localCheckpoint(eager=True)

    def plogp(col):
        x = col / F.lit(total_volume)
        return F.when(col > 0, x * F.log(x)).otherwise(0.0)

    for rnd in range(max_rounds):
        lab_src = labels.select(F.col("node").alias("src"), F.col("label").alias("lu"))
        lab_dst = labels.select(F.col("node").alias("dst"), F.col("label").alias("lv"))
        if small:
            lab_src, lab_dst = F.broadcast(lab_src), F.broadcast(lab_dst)
        le = nonloop.join(lab_src, "src").join(lab_dst, "dst")
        ccut = (
            le.filter(F.col("lu") != F.col("lv"))
            .groupBy(F.col("lu").alias("label"))
            .agg(F.sum("weight").alias("cut"))
        )
        cvol = (
            labels.join(
                maybe_broadcast(vol_node.withColumnRenamed("id", "node"), n_nodes),
                "node",
            )
            .groupBy("label")
            .agg(F.sum("vol").alias("cvol"))
        )
        cstate = cvol.join(ccut, "label", "left").select(
            "label", "cvol", F.coalesce("cut", F.lit(0.0)).alias("cut")
        )
        total_cut = float(cstate.agg(F.sum("cut")).collect()[0][0] or 0.0)

        aff = (
            nonloop.join(lab_dst, "dst")
            .groupBy(F.col("src").alias("node"), F.col("lv").alias("cand"))
            .agg(F.sum("weight").alias("aff"))
        )
        if portable_hash:
            from networkit_spark.functions.porthash import md5_mod

            movable = md5_mod(F.col("node"), salt=f"lme{rnd}:") % 2 == 0
        else:
            movable = F.xxhash64(F.col("node"), F.lit(rnd), F.lit(5711)) % 2 == 0

        cur = labels.withColumnRenamed("label", "cur")
        joined = (
            aff.join(cur, "node")
            .filter(movable)
            .join(
                aff.select("node", F.col("cand").alias("cur"), F.col("aff").alias("w_cur")),
                ["node", "cur"],
                "left",
            )
            .join(maybe_broadcast(vol_node.withColumnRenamed("id", "node"), n_nodes), "node")
            .join(
                maybe_broadcast(
                    cstate.select(
                        F.col("label").alias("cur"),
                        F.col("cvol").alias("vol_cur"),
                        F.col("cut").alias("cut_cur"),
                    ),
                    n_nodes,
                ),
                "cur",
            )
            .join(
                maybe_broadcast(
                    cstate.select(
                        F.col("label").alias("cand"),
                        F.col("cvol").alias("vol_t"),
                        F.col("cut").alias("cut_t"),
                    ),
                    n_nodes,
                ),
                "cand",
            )
            .withColumn("w_cur", F.coalesce("w_cur", F.lit(0.0)))
        )
        # fitnessChange(current → target), reference formula
        cdc = 2.0 * F.col("w_cur") - F.col("vol") + 2.0 * F.col("loop")
        cdt = F.col("vol") - 2.0 * F.col("aff") - 2.0 * F.col("loop")
        move_change = (
            plogp(F.lit(total_cut) + cdc + cdt)
            + (
                (plogp(F.col("cut_t") + cdt + F.col("vol_t") + F.col("vol"))
                 - plogp(F.col("cut_t") + F.col("vol_t")))
                - 2.0 * (plogp(F.col("cut_t") + cdt) - plogp(F.col("cut_t")))
            )
        )
        # fitnessChange(current → current) — the stay baseline
        stay_change = (
            plogp(F.lit(total_cut))
            + (
                (plogp(F.col("cut_cur") + F.col("vol_cur"))
                 - plogp(F.col("cut_cur") + cdc + F.col("vol_cur") - F.col("vol")))
                - 2.0 * (plogp(F.col("cut_cur")) - plogp(F.col("cut_cur") + cdc))
            )
        )
        delta_expr = move_change - stay_change
        if portable_hash:
            # portable mode also quantizes the fitness delta to 1e-12:
            # the p·log(p) terms are transcendental, so Spark's and a
            # replaying engine's log can differ in the last ulp (~1e-16
            # here); rounding absorbs that while mathematically-tied
            # candidates still quantize to the same grid point and fall
            # through to the deterministic (delta, cand) tie-break
            delta_expr = F.round(delta_expr, 12)
        scored = joined.filter(F.col("cand") != F.col("cur")).select(
            "node",
            "cand",
            delta_expr.alias("delta"),
        )
        w_best = Window.partitionBy("node").orderBy(F.asc("delta"), F.asc("cand"))
        moves = (
            scored.withColumn("rn", F.row_number().over(w_best))
            .filter((F.col("rn") == 1) & (F.col("delta") < -1e-15))
            .select("node", F.col("cand").alias("new_label"))
        )
        new_labels = (
            labels.join(moves, "node", "left")
            .select(
                "node",
                F.coalesce("new_label", F.col("label")).alias("label"),
                F.col("new_label").isNotNull().alias("chg"),
            )
            .localCheckpoint(eager=True)
        )
        n_moved = new_labels.filter("chg").count()
        labels = new_labels.select("node", "label")
        if n_moved == 0:
            break
    return labels
