"""Group centralities: greedy submodular selection.

- ``group_degree``: greedy max-coverage group degree
  (``centrality/GroupDegree.cpp:42-66`` greedy with lazy PQ; we compute
  EXACT marginal gains each round instead of lazy bounds — same greedy
  choice sequence, tie broken by smallest node id).
- ``group_closeness``: greedy farness minimization
  (``centrality/GroupCloseness.cpp`` greedy; reference gtest golden
  ``CentralityGTest.cpp:1584-1608``: k=3 on the 8-node fixture selects
  {0, 2, 5} — reproduced by this implementation).

Scale shape: ``group_degree`` is k rounds × (one semi-join + one
aggregation) over the edge table — each round shuffles only (node,
covered-flag) pairs. ``group_closeness`` materializes the batched
multi-source BFS distance table ONCE (the same O(n·m) the reference
pays), then each greedy round is a single join-agg over it; run it on a
subgraph or a sampled target set at 100 TB scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.pin import pin


def _all_pairs_guard(n: int, max_nodes: int | None, what: str) -> None:
    """House convention (``cut_clustering`` / ``DynBetweennessOneNode``):
    kernels whose default materializes an O(n²) (root, node) distance
    table raise above ``max_nodes`` unless the caller passes
    ``max_nodes=None`` to opt into the unbounded state explicitly."""
    if max_nodes is not None and n > max_nodes:
        raise ValueError(
            f"{what} materializes an O(n²) (root, node) distance table "
            f"by default: {n} nodes exceeds max_nodes={max_nodes}; pass "
            "a `sources`/`beam` restriction for scale, raise the cap, or "
            "pass max_nodes=None to opt into the all-pairs table "
            "explicitly"
        )


def group_degree(
    g: Graph, k: int = 5, count_group_nodes: bool = False
) -> tuple[list[int], int]:
    """Greedy group-degree maximization. Returns (group, score).

    Score semantics (``GroupDegree.cpp computeScore``): number of
    non-group nodes with at least one in-group (in-)neighbor; with
    ``count_group_nodes`` the group's own k nodes count too.
    """
    n = g.num_nodes()
    if k <= 0 or k > n:
        raise ValueError("k must be between 1 and n")
    out_e = g.edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    # coverage direction: a node is covered when an IN-neighbor is in the
    # group, so marginal gain counts OUT-neighbors (undirected: both).
    spark = out_e.sparkSession
    group: list[int] = []
    covered = spark.createDataFrame([], "id long")  # non-group covered nodes

    for _ in range(k):
        group_df = spark.createDataFrame([(i,) for i in group], "id long") if group else None
        cand_e = out_e
        if group_df is not None:
            cand_e = cand_e.join(
                F.broadcast(group_df.withColumnRenamed("id", "src")), "src", "left_anti"
            )
        # neighbors that would be NEWLY covered: dst not in group, not covered
        new_cover = cand_e.join(
            F.broadcast(covered.withColumnRenamed("id", "dst")), "dst", "left_anti"
        )
        if group_df is not None:
            new_cover = new_cover.join(
                F.broadcast(group_df.withColumnRenamed("id", "dst")), "dst", "left_anti"
            )
        counts = new_cover.groupBy(F.col("src").alias("id")).agg(
            F.count(F.lit(1)).alias("cnt")
        )
        # every non-group node is a candidate even at gain <= 0 — the
        # reference's greedy always fills the group to k members
        cand = g.nodes
        if group_df is not None:
            cand = cand.join(F.broadcast(group_df), "id", "left_anti")
        gains = cand.join(counts, "id", "left").select(
            "id", F.coalesce("cnt", F.lit(0)).alias("gain")
        )
        if not count_group_nodes:
            # joining the group removes u itself from the covered-outsider set
            gains = gains.join(
                F.broadcast(covered.withColumn("penalty", F.lit(1))), "id", "left"
            ).select(
                "id",
                (F.col("gain") - F.coalesce("penalty", F.lit(0))).alias("gain"),
            )
        else:
            gains = gains.select("id", (F.col("gain") + F.lit(1)).alias("gain"))
        best = gains.orderBy(F.desc("gain"), F.asc("id")).limit(1).collect()
        if not best:
            break
        u = int(best[0]["id"])
        group.append(u)
        group_df = spark.createDataFrame([(i,) for i in group], "id long")
        nbrs = (
            out_e.join(
                F.broadcast(group_df.withColumnRenamed("id", "src")), "src", "left_semi"
            )
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(F.broadcast(group_df), "id", "left_anti")
        )
        covered = nbrs.transform(pin)

    score = covered.count() + (len(group) if count_group_nodes else 0)
    return group, int(score)


def group_closeness(
    g: Graph,
    k: int = 3,
    sources: DataFrame | None = None,
    max_nodes: int | None = 20_000,
) -> tuple[list[int], float]:
    """Greedy group-closeness (farness minimization). Returns
    (group, farness) with farness = Σ_v min_{s∈S} d(s → v) over reachable
    (v, group) pairs; ties broken by smallest node id.

    The all-pairs hop-distance table is computed once with the batched
    multi-source BFS and reused across all k greedy rounds. With
    ``sources=None`` that table is O(n²): ``max_nodes`` (default 20k)
    raises on larger graphs; pass a ``sources`` restriction for scale or
    ``max_nodes=None`` to opt in explicitly.
    """
    from networkit_spark.operators.distance import multi_source_bfs

    spark = g.edges.sparkSession
    if sources is None:
        _all_pairs_guard(g.num_nodes(), max_nodes, "group_closeness(sources=None)")
    src = sources if sources is not None else g.nodes
    dist = (
        multi_source_bfs(g, src, with_sigma=False)
        .visited.select("root", "node", "dist")
        .transform(pin)
    )
    # Candidate pruning mirrors the reference's dominance filters
    # (GroupCloseness.cpp:183-186): degree-1 nodes and degree-2 nodes at
    # distance 1 from the group are dominated and never evaluated; when
    # every candidate is pruned the reference falls back to its
    # initialized maxNode — we make that fallback explicit as "smallest
    # node id not yet in the group" (matches the gtest golden {0,2,5}).
    deg = (
        g.edges.filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .dropDuplicates(["src", "dst"])
        .groupBy(F.col("src").alias("id"))
        .agg(F.count(F.lit(1)).alias("deg"))
    ).transform(pin)
    group: list[int] = []
    # best(v): current min distance from the group to v (absent = ∞)
    best: DataFrame | None = None

    for _ in range(k):
        if best is None:
            fitness = dist.groupBy(F.col("root").alias("id")).agg(
                F.sum("dist").alias("farness")
            )
        else:
            joined = dist.join(best, "node", "left")
            fitness = joined.groupBy(F.col("root").alias("id")).agg(
                F.sum(F.least(F.col("dist"), F.coalesce("bd", F.col("dist")))).alias(
                    "covered_sum"
                )
            )
            # nodes never reached by this candidate keep their current best
            rest = best.agg(F.sum("bd").alias("rest")).collect()[0]["rest"] or 0.0
            reached_by_cand = dist.join(best, "node").groupBy(
                F.col("root").alias("id")
            ).agg(F.sum("bd").alias("overlap"))
            fitness = (
                fitness.join(reached_by_cand, "id", "left")
                .select(
                    "id",
                    (
                        F.col("covered_sum")
                        + F.lit(float(rest))
                        - F.coalesce("overlap", F.lit(0.0))
                    ).alias("farness"),
                )
            )
        if group:
            gdf = spark.createDataFrame([(i,) for i in group], "id long")
            fitness = fitness.join(F.broadcast(gdf), "id", "left_anti")
        if best is not None:
            # dominance pruning (reference GroupCloseness.cpp:183-186)
            fitness = (
                fitness.join(deg, "id", "left")
                .join(best.withColumnRenamed("node", "id"), "id", "left")
                .filter(
                    (F.coalesce("deg", F.lit(0)) > 1)
                    & ~((F.col("bd") == 1) & (F.col("deg") == 2))
                    & (F.coalesce("bd", F.lit(1)) > 0)
                )
                .select("id", "farness")
            )
        bestrow = fitness.orderBy(F.asc("farness"), F.asc("id")).limit(1).collect()
        if not bestrow:
            # all candidates pruned: reference falls back to its default
            # maxNode — deterministically the smallest id outside the group
            fallback = (
                g.nodes.join(
                    F.broadcast(
                        spark.createDataFrame([(i,) for i in group], "id long")
                    ),
                    "id",
                    "left_anti",
                )
                .orderBy("id")
                .limit(1)
                .collect()
            )
            if not fallback:
                break
            u = int(fallback[0]["id"])
        else:
            u = int(bestrow[0]["id"])
        group.append(u)
        sel = dist.filter(F.col("root") == u).select(
            "node", F.col("dist").alias("nd")
        )
        if best is None:
            best = sel.withColumnRenamed("nd", "bd")
        else:
            best = (
                best.join(sel, "node", "full")
                .select(
                    "node",
                    F.least(
                        F.coalesce("bd", F.col("nd")), F.coalesce("nd", F.col("bd"))
                    ).alias("bd"),
                )
            )
        best = best.transform(pin)

    farness = float(best.agg(F.sum("bd")).collect()[0][0] or 0.0) if best is not None else 0.0
    return group, farness


def _member_mins(vis_members: DataFrame) -> DataFrame:
    """Per node: the two closest group members — (node, min1, arg1,
    min2). min2 is NULL when only one member reaches the node."""
    top2 = F.slice(
        F.sort_array(F.collect_list(F.struct("dist", "root"))), 1, 2
    )
    return (
        vis_members.groupBy("node")
        .agg(top2.alias("t"))
        .select(
            "node",
            F.col("t")[0]["dist"].alias("min1"),
            F.col("t")[0]["root"].alias("arg1"),
            # try_: ANSI mode errors on element_at past the end, and a
            # node reached by a single member has a 1-element slice
            F.try_element_at("t", F.lit(2))["dist"].alias("min2"),
        )
    )


def _swap_candidates(g: Graph, group: list[int], beam: int) -> list[int]:
    """Deterministic candidate beam: top-``beam`` non-members by degree
    (ties → smallest id)."""
    gset = {int(x) for x in group}
    deg = (
        (g.symmetrized_edges() if g.directed else g.edges)
        .filter(F.col("src") != F.col("dst"))
        .groupBy(F.col("src").alias("id"))
        .agg(F.count(F.lit(1)).alias("deg"))
        .orderBy(F.desc("deg"), F.asc("id"))
        .limit(beam + len(group))
        .collect()
    )
    return [int(r["id"]) for r in deg if int(r["id"]) not in gset][:beam]


def _group_dists(g: Graph, srcs: DataFrame) -> DataFrame:
    """(root, node, dist) from every source — batched BFS on unweighted
    graphs, batched multi-source SSSP (Dijkstra semantics) on weighted
    ones, mirroring the reference's count/edgeweight template split."""
    from networkit_spark.operators.distance import multi_source_bfs, multi_source_sssp

    if g.weighted:
        return multi_source_sssp(g, srcs).select("root", "node", "dist").transform(pin)
    return (
        multi_source_bfs(g, srcs, with_sigma=False)
        .visited.select("root", "node", "dist")
        .transform(pin)
    )


def _swap_farness(
    gdf: DataFrame, cdf: DataFrame, base: DataFrame, cv: DataFrame
) -> DataFrame:
    """Exact farness(S \\ {u} ∪ {v}) for every (member u, candidate v)
    pair: (u, v, new_farness).

    Decomposition over three disjoint node sets — member-reached nodes
    also reached by v (min of the two distances), member-reached nodes
    NOT reached by v (keep bd, via per-u total minus the matched part),
    and v-only nodes (dv). An inner node-join plus per-u / per-v totals;
    the earlier full-outer shape silently dropped the "reached by some
    OTHER candidate but not by v" bd mass, undercounting new_farness on
    disconnected or directed graphs. The (u, v) universe is an explicit
    broadcast cross so pairs whose candidate reaches no member-reached
    node still score (b_tot + c_only)."""
    matched = base.join(cv, "node").groupBy("u", "v").agg(
        F.sum(
            F.least(F.coalesce("bd", F.col("dv")), F.col("dv"))
        ).alias("shared"),
        F.sum("bd").alias("b_in"),
    )
    b_tot = base.groupBy("u").agg(F.sum("bd").alias("b_tot"))
    c_only = (
        cv.join(base.select("node").distinct(), "node", "left_anti")
        .groupBy("v")
        .agg(F.sum("dv").alias("c_only"))
    )
    universe = F.broadcast(
        gdf.withColumnRenamed("root", "u")
    ).crossJoin(F.broadcast(cdf.withColumnRenamed("root", "v")))
    return (
        universe.join(matched, ["u", "v"], "left")
        .join(b_tot, "u", "left")
        .join(c_only, "v", "left")
        .select(
            "u",
            "v",
            (
                F.coalesce("shared", F.lit(0.0))
                + F.coalesce("b_tot", F.lit(0.0))
                - F.coalesce("b_in", F.lit(0.0))
                + F.coalesce("c_only", F.lit(0.0))
            ).alias("new_farness"),
        )
    )


def group_closeness_local_swaps(
    g: Graph,
    group: list[int],
    max_swaps: int = 4,
    beam: int = 8,
) -> tuple[list[int], float]:
    """GroupClosenessLocalSwaps
    (``centrality/GroupClosenessLocalSwaps.cpp`` contract): refine a
    group by single-node exchanges — drop one member, add one outsider —
    accepting only swaps that STRICTLY decrease the group farness, up to
    ``max_swaps`` times. Returns (refined group, farness).

    The reference estimates farness decreases with 16-bit random gamma
    sketches (AVX path); here each round evaluates the candidate swaps
    EXACTLY — one batched BFS from members ∪ beam, the two closest
    members per node (so removing u falls back to min2), and one
    join-agg over (u, v, node) — a documented deviation that keeps the
    accept decision exact and deterministic. Farness uses the same
    reachable-set convention as :func:`group_closeness`. Candidates are
    a degree-ranked beam (the swap that helps must cover far mass, and
    high-coverage nodes dominate). Weighted graphs evaluate over the
    batched multi-source SSSP distances (the reference's edgeweight
    template)."""
    spark = g.edges.sparkSession
    group = [int(x) for x in group]
    farness = None
    for _ in range(max_swaps):
        cands = _swap_candidates(g, group, beam)
        if not cands:
            break
        srcs = spark.createDataFrame(
            [(x,) for x in group + cands], "id long"
        )
        vis = _group_dists(g, srcs)
        gdf = spark.createDataFrame([(x,) for x in group], "root long")
        mem = vis.join(F.broadcast(gdf), "root", "left_semi")
        mins = _member_mins(mem).transform(pin)
        farness = float(
            mins.agg(F.sum("min1")).collect()[0][0] or 0.0
        )
        # base_u(x): distance from S\{u}; NULL = unreached without u
        base = (
            mins.crossJoin(F.broadcast(gdf.withColumnRenamed("root", "u")))
            .select(
                "u",
                "node",
                F.when(F.col("arg1") != F.col("u"), F.col("min1"))
                .otherwise(F.col("min2"))
                .alias("bd"),
            )
        )
        cdf = spark.createDataFrame([(x,) for x in cands], "root long")
        cv = vis.join(F.broadcast(cdf), "root", "left_semi").select(
            F.col("root").alias("v"), "node", F.col("dist").alias("dv")
        )
        scored = (
            _swap_farness(gdf, cdf, base, cv)
            .orderBy(F.asc("new_farness"), F.asc("u"), F.asc("v"))
            .limit(1)
            .collect()
        )
        if not scored:
            break
        row = scored[0]
        if float(row["new_farness"]) >= farness:
            break
        group = sorted(set(group) - {int(row["u"])} | {int(row["v"])})
        farness = float(row["new_farness"])
    if farness is None:
        gdf0 = spark.createDataFrame([(x,) for x in group], "id long")
        vis0 = _group_dists(g, gdf0)
        farness = float(
            vis0.groupBy("node").agg(F.min("dist").alias("d")).agg(F.sum("d"))
            .collect()[0][0]
            or 0.0
        )
    return group, farness


def group_closeness_grow_shrink(
    g: Graph,
    group: list[int],
    max_iterations: int = 4,
    beam: int = 8,
) -> tuple[list[int], float]:
    """GroupClosenessGrowShrink
    (``centrality/GroupClosenessGrowShrink.cpp`` contract): per
    iteration, GROW the group by the farness-minimizing outsider (beam
    candidates), then SHRINK it by the member whose removal costs least;
    keep the result only if the iteration strictly improved. One batched
    BFS per iteration (members ∪ beam share the frontier); the grow and
    shrink evaluations reuse the same two-closest-members fallback
    tables as :func:`group_closeness_local_swaps`, exact instead of the
    reference's sketched estimates (documented deviation); weighted
    graphs use the batched multi-source SSSP distances."""
    spark = g.edges.sparkSession
    group = sorted(int(x) for x in group)
    _, farness = group_closeness_local_swaps(g, group, max_swaps=0)
    for _ in range(max_iterations):
        cands = _swap_candidates(g, group, beam)
        if not cands:
            break
        srcs = spark.createDataFrame([(x,) for x in group + cands], "id long")
        vis = _group_dists(g, srcs)
        gdf = spark.createDataFrame([(x,) for x in group], "root long")
        mins = _member_mins(
            vis.join(F.broadcast(gdf), "root", "left_semi")
        ).transform(pin)
        cdf = spark.createDataFrame([(x,) for x in cands], "root long")
        cv = vis.join(F.broadcast(cdf), "root", "left_semi").select(
            F.col("root").alias("v"), "node", F.col("dist").alias("dv")
        )
        # grow: farness(S ∪ {v}) = Σ min(min1, dv) over the union support
        # — inner join + totals so group-reached nodes that v does NOT
        # reach keep their min1 mass for EVERY v (the full-outer shape
        # dropped them for candidates that miss the node while another
        # candidate reaches it)
        m = mins.select("node", "min1")
        m_tot = float(m.agg(F.sum("min1")).collect()[0][0] or 0.0)
        g_matched = m.join(cv, "node").groupBy("v").agg(
            F.sum(F.least("min1", F.col("dv"))).alias("shared"),
            F.sum("min1").alias("m_in"),
        )
        g_only = (
            cv.join(m.select("node"), "node", "left_anti")
            .groupBy("v")
            .agg(F.sum("dv").alias("c_only"))
        )
        grow = (
            F.broadcast(cdf.withColumnRenamed("root", "v"))
            .join(g_matched, "v", "left")
            .join(g_only, "v", "left")
            .select(
                "v",
                (
                    F.coalesce("shared", F.lit(0.0))
                    + F.lit(m_tot)
                    - F.coalesce("m_in", F.lit(0.0))
                    + F.coalesce("c_only", F.lit(0.0))
                ).alias("f"),
            )
            .orderBy(F.asc("f"), F.asc("v"))
            .limit(1)
            .collect()
        )
        if not grow:
            break
        vstar = int(grow[0]["v"])
        grown = sorted(set(group) | {vstar})
        # shrink: recompute the two-closest table over S ∪ {v*} (its
        # BFS rows are already in vis), then farness(S' \ {u}) per u
        g2 = spark.createDataFrame([(x,) for x in grown], "root long")
        mins2 = _member_mins(vis.join(F.broadcast(g2), "root", "left_semi"))
        shrink = (
            mins2.crossJoin(F.broadcast(g2.withColumnRenamed("root", "u")))
            .select(
                "u",
                F.when(F.col("arg1") != F.col("u"), F.col("min1"))
                .otherwise(F.col("min2"))
                .alias("bd"),
            )
            .groupBy("u")
            .agg(F.sum("bd").alias("f"))
            .orderBy(F.asc("f"), F.asc("u"))
            .limit(1)
            .collect()
        )
        ustar = int(shrink[0]["u"])
        new_far = float(shrink[0]["f"] or 0.0)
        if new_far >= farness:
            break
        group = sorted(set(grown) - {ustar})
        farness = new_far
    return group, farness


def ged_walk_score(
    g: Graph, group: list[int], alpha: float, levels: int = 5
) -> float:
    """Exact GED-Walk score of a group (``centrality/GedWalk.cpp``
    evaluateGroup): Σ_{ℓ=1..L} α^ℓ · (# length-ℓ walks that touch the
    group), via the hit/miss walk DP — pathsHit/pathsMiss per node, one
    edge join-agg per level. The reference adapts L with spectral or
    geometric tail bounds; here L is a fixed parameter (documented
    deviation — the α^ℓ tail is geometric, so a few levels dominate)."""
    spark = g.edges.sparkSession
    edges = (g.symmetrized_edges() if g.directed else g.edges).select(
        "src", "dst", "weight"
    ).transform(pin)
    grp = spark.createDataFrame([(int(x),) for x in group], "id long")
    state = g.nodes.join(
        grp.withColumn("ing", F.lit(True)), "id", "left"
    ).select(
        "id",
        F.coalesce("ing", F.lit(False)).alias("ing"),
        F.when(F.coalesce("ing", F.lit(False)), 1.0).otherwise(0.0).alias("hit"),
        F.when(F.coalesce("ing", F.lit(False)), 0.0).otherwise(1.0).alias("miss"),
    ).transform(pin)
    score = 0.0
    for lvl in range(1, levels + 1):
        gathered = (
            edges.join(
                state.select(
                    F.col("id").alias("src"),
                    F.col("hit").alias("ph"),
                    F.col("miss").alias("pm"),
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("id"))
            .agg(
                F.sum(F.col("weight") * F.col("ph")).alias("gh"),
                F.sum(F.col("weight") * F.col("pm")).alias("gm"),
            )
        )
        state = (
            state.select("id", "ing")
            .join(gathered, "id", "left")
            .select(
                "id",
                "ing",
                F.when(
                    F.col("ing"),
                    F.coalesce("gh", F.lit(0.0)) + F.coalesce("gm", F.lit(0.0)),
                )
                .otherwise(F.coalesce("gh", F.lit(0.0)))
                .alias("hit"),
                F.when(F.col("ing"), 0.0)
                .otherwise(F.coalesce("gm", F.lit(0.0)))
                .alias("miss"),
            )
            .transform(pin)
        )
        lvl_hit = float(state.agg(F.sum("hit")).collect()[0][0] or 0.0)
        score += (alpha ** lvl) * lvl_hit
    return score


def ged_walk_group(
    g: Graph,
    k: int,
    alpha: float | None = None,
    levels: int = 5,
    candidates_per_round: int = 8,
) -> list[int]:
    """Greedy GED-Walk-maximizing group of size k
    (``centrality/GedWalk.cpp`` run, lazy-greedy strategy): per round,
    rank the non-members by the in×out walk-product UPPER BOUND on their
    marginal gain (the reference's gainBound), evaluate the top
    ``candidates_per_round`` exactly with the hit/miss DP, and add the
    best. Ties break by smallest node id. Default α = 1/(1+maxdeg), the
    same convention as our Katz default."""
    spark = g.edges.sparkSession
    edges = (g.symmetrized_edges() if g.directed else g.edges).select(
        "src", "dst", "weight"
    ).transform(pin)
    if alpha is None:
        max_deg = edges.groupBy("src").count().agg(F.max("count")).collect()[0][0] or 0
        alpha = 1.0 / (1.0 + max_deg)

    group: list[int] = []
    cur_score = 0.0
    for _ in range(k):
        grp = (
            spark.createDataFrame([(int(x),) for x in group], "id long")
            if group
            else spark.createDataFrame([], "id long")
        )
        # miss-graph DP: walks avoiding the current group, inbound and
        # outbound per node per level
        non = g.nodes.join(grp, "id", "left_anti")
        inw = {0: non.select("id", F.lit(1.0).alias("v"))}
        outw = {0: non.select("id", F.lit(1.0).alias("v"))}
        for lvl in range(1, levels + 1):
            inw[lvl] = (
                edges.join(inw[lvl - 1].withColumnRenamed("id", "src"), "src")
                .join(non.withColumnRenamed("id", "dst"), "dst", "left_semi")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.sum(F.col("weight") * F.col("v")).alias("v"))
                .transform(pin)
            )
            outw[lvl] = (
                edges.join(outw[lvl - 1].withColumnRenamed("id", "dst"), "dst")
                .join(non.withColumnRenamed("id", "src"), "src", "left_semi")
                .groupBy(F.col("src").alias("id"))
                .agg(F.sum(F.col("weight") * F.col("v")).alias("v"))
                .transform(pin)
            )
        # upper bound: Σ_ℓ α^ℓ Σ_{a+b=ℓ} in_a(x)·out_b(x)
        ub = None
        for lvl in range(1, levels + 1):
            for a in range(0, lvl + 1):
                term = (
                    inw[a]
                    .join(outw[lvl - a].withColumnRenamed("v", "w2"), "id")
                    .select(
                        "id",
                        (F.lit(alpha**lvl) * F.col("v") * F.col("w2")).alias("t"),
                    )
                )
                ub = term if ub is None else ub.unionByName(term)
        top = (
            ub.groupBy("id")
            .agg(F.sum("t").alias("bound"))
            .orderBy(F.desc("bound"), F.asc("id"))
            .limit(candidates_per_round)
            .collect()
        )
        best_node, best_gain = None, -1.0
        for r in top:
            cand = int(r["id"])
            s = ged_walk_score(g, group + [cand], alpha, levels)
            gain = s - cur_score
            if gain > best_gain + 1e-15 or (
                abs(gain - best_gain) <= 1e-15 and (best_node is None or cand < best_node)
            ):
                best_node, best_gain = cand, gain
        if best_node is None:
            break
        group.append(best_node)
        cur_score += best_gain
    return group


def group_harmonic_closeness(
    g: Graph,
    k: int = 3,
    sources: DataFrame | None = None,
    portable_sum: bool = False,
    max_nodes: int | None = 20_000,
) -> tuple[list[int], float]:
    """GroupHarmonicCloseness (``centrality/GroupHarmonicCloseness.cpp``,
    Angriman et al. ALENEX 2021): greedy submodular maximization of the
    group harmonic score ``score(S) = Σ_{v: d(S,v) > 0} 1/d(S,v)``
    (``GroupHarmonicCloseness.cpp scoreOfGroup:624-646`` — group members
    sit at distance 0 and contribute nothing). Returns (group, score).

    The reference prunes with per-node upper bounds and early-exit SSSPs
    (``prunedSSSP``); those prunings change WHICH candidates get scanned,
    never the greedy choice, so the distributed shape drops them and
    computes EXACT marginal gains every round (ties → smallest node id,
    the house convention): the (root, node) distance table is built ONCE
    with the batched multi-source BFS (``multi_source_sssp`` when
    weighted) and every greedy round is a single join-agg over it —
    gain(u) = Σ_v max(0, 1/d(u,v) − 1/d(S,v)) − 1/d(S,u).

    ``sources`` restricts the candidate set (and the distance table's
    roots) for 100-TB runs — the reference's k ∈ [1, n−1] bound check is
    kept. Raises ValueError outside that range. ``portable_sum`` folds
    the fractional gain terms in ascending-node order (and the final
    score likewise) so a SQL replay — and any cluster size — reproduces
    the argmax ties bit-identically; the default keeps the commutative
    parallel sum.
    """
    from networkit_spark.operators.distance import multi_source_bfs, multi_source_sssp

    spark = g.edges.sparkSession
    n = g.num_nodes()
    if k <= 0 or n <= k:
        raise ValueError("k must be in [1, n - 1]")
    if sources is None:
        _all_pairs_guard(n, max_nodes, "group_harmonic_closeness(sources=None)")
    src = sources if sources is not None else g.nodes
    if g.weighted:
        dist = multi_source_sssp(g, src).select("root", "node", "dist")
    else:
        dist = multi_source_bfs(g, src, with_sigma=False).visited.select(
            "root", "node", F.col("dist").cast("double").alias("dist")
        )
    dist = dist.filter(F.col("dist") > 0).transform(pin)

    group: list[int] = []
    best: DataFrame | None = None  # (node, bd): min dist from group, group rows dropped

    for _ in range(k):
        cand = dist
        if group:
            gdf_r = spark.createDataFrame([(i,) for i in group], "root long")
            gdf_n = spark.createDataFrame([(i,) for i in group], "node long")
            cand = cand.join(F.broadcast(gdf_r), "root", "left_anti").join(
                F.broadcast(gdf_n), "node", "left_anti"
            )
        def fold_or_sum(df: DataFrame, term) -> DataFrame:
            agg = (
                F.aggregate(
                    F.array_sort(F.collect_list(F.struct("node", term.alias("t")))),
                    F.lit(0.0),
                    lambda acc, x: acc + x["t"],
                )
                if portable_sum
                else F.sum(term)
            )
            return df.groupBy(F.col("root").alias("id")).agg(agg.alias("gain"))

        if best is None:
            gains = fold_or_sum(cand, F.lit(1.0) / F.col("dist"))
        else:
            improving = F.when(
                F.col("dist") < F.coalesce("bd", F.lit(float("inf"))),
                F.lit(1.0) / F.col("dist")
                - F.coalesce(F.lit(1.0) / F.col("bd"), F.lit(0.0)),
            ).otherwise(F.lit(0.0))
            gains = fold_or_sum(cand.join(best, "node", "left"), improving)
        allc = g.nodes if sources is None else src.select(
            F.col(src.columns[0]).cast("long").alias("id")
        )
        if group:
            allc = allc.join(
                F.broadcast(spark.createDataFrame([(i,) for i in group], "id long")),
                "id",
                "left_anti",
            )
        gains = allc.join(gains, "id", "left").select(
            "id", F.coalesce("gain", F.lit(0.0)).alias("gain")
        )
        if best is not None:
            # joining S zeroes the candidate's own contribution 1/d(S,u)
            own = best.select(
                F.col("node").alias("id"), (F.lit(1.0) / F.col("bd")).alias("own")
            )
            gains = gains.join(own, "id", "left").select(
                "id", (F.col("gain") - F.coalesce("own", F.lit(0.0))).alias("gain")
            )
        row = gains.orderBy(F.desc("gain"), F.asc("id")).limit(1).collect()
        if not row:
            break
        u = int(row[0]["id"])
        group.append(u)
        sel = dist.filter(F.col("root") == u).select(
            "node", F.col("dist").alias("nd")
        )
        if best is None:
            merged = sel.withColumnRenamed("nd", "bd")
        else:
            merged = best.join(sel, "node", "full").select(
                "node",
                F.least(
                    F.coalesce("bd", F.col("nd")), F.coalesce("nd", F.col("bd"))
                ).alias("bd"),
            )
        best = merged.join(
            F.broadcast(spark.createDataFrame([(i,) for i in group], "node long")),
            "node",
            "left_anti",
        ).transform(pin)

    if best is None:
        return group, 0.0
    term = F.lit(1.0) / F.col("bd")
    sc = (
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("node", term.alias("t")))),
            F.lit(0.0),
            lambda acc, x: acc + x["t"],
        )
        if portable_sum
        else F.sum(term)
    )
    score = float(best.agg(sc).collect()[0][0] or 0.0)
    return group, score


def group_closeness_local_search(
    g: Graph,
    group: list[int],
    run_grow_shrink: bool = True,
    max_iterations: int = 100,
    beam: int | None = None,
    max_nodes: int | None = 20_000,
) -> tuple[list[int], float, int]:
    """GroupClosenessLocalSearch
    (``centrality/GroupClosenessLocalSearch.cpp``, Angriman et al.
    ALENEX 2021): refine an initial group by vertex swaps, accepting a
    swap iff the RELATIVE farness decrease is at least 1/(k·(n−k))
    (``GroupClosenessLocalSearch.cpp insuffcientDecrease:139-144``),
    until no such swap exists or ``max_iterations`` swaps were made.
    Returns (group, farness, n_iterations). ``run_grow_shrink`` first
    refines the seed with :func:`group_closeness_grow_shrink`, matching
    the reference's default. Raises on an empty group (gtest contract).

    The reference scans members by cheapest-removal and candidates by a
    sketched DAG estimate, taking the FIRST sufficient swap; here every
    (member, outsider) pair is evaluated EXACTLY in one join-agg and the
    BEST sufficient swap is taken (documented deviation — both converge
    to the same local-optimality criterion: no swap clears the
    1/(k·(n−k)) bar). The (root, node) distance table is built once per
    swap from members ∪ candidates via the batched multi-source BFS
    (multi-source SSSP when weighted, the reference's edgeweight
    template); ``beam`` (None = all outsiders, the reference's O(n·k)
    sweep) caps the candidate set by degree rank for scale. With
    ``beam=None`` the table is O(n²) and the full id list is collected
    to the driver: ``max_nodes`` (default 20k) raises on larger graphs —
    pass a bounded ``beam`` for scale or ``max_nodes=None`` to opt in.
    """
    spark = g.edges.sparkSession
    group = sorted({int(x) for x in group})
    if not group:
        raise ValueError("the initial group must not be empty")
    n = g.num_nodes()
    if beam is None:
        _all_pairs_guard(n, max_nodes, "group_closeness_local_search(beam=None)")
    k = len(group)
    if run_grow_shrink:
        group, _ = group_closeness_grow_shrink(g, group)
        group = sorted(group)
    threshold_frac = 1.0 / float(k * max(n - k, 1))

    n_iter = 0
    farness = None
    all_ids: list[int] | None = None
    vis_full: DataFrame | None = None
    if beam is None:
        # distances are static across swaps — ONE batched all-source
        # run feeds every iteration instead of an APSP per swap
        all_ids = [int(r["id"]) for r in g.nodes.collect()]
        vis_full = _group_dists(g, g.nodes)
    while n_iter < max_iterations:
        if beam is None:
            gset = set(group)
            cands = [x for x in all_ids if x not in gset]
        else:
            cands = _swap_candidates(g, group, beam)
        if not cands:
            break
        if vis_full is not None:
            vis = vis_full
        else:
            srcs = spark.createDataFrame([(x,) for x in group + cands], "id long")
            vis = _group_dists(g, srcs)
        gdf = spark.createDataFrame([(x,) for x in group], "root long")
        mins = _member_mins(
            vis.join(F.broadcast(gdf), "root", "left_semi")
        ).transform(pin)
        farness = float(mins.agg(F.sum("min1")).collect()[0][0] or 0.0)
        base = mins.crossJoin(
            F.broadcast(gdf.withColumnRenamed("root", "u"))
        ).select(
            "u",
            "node",
            F.when(F.col("arg1") != F.col("u"), F.col("min1"))
            .otherwise(F.col("min2"))
            .alias("bd"),
        )
        cdf = spark.createDataFrame([(x,) for x in cands], "root long")
        cv = vis.join(F.broadcast(cdf), "root", "left_semi").select(
            F.col("root").alias("v"), "node", F.col("dist").alias("dv")
        )
        scored = (
            _swap_farness(gdf, cdf, base, cv)
            .orderBy(F.asc("new_farness"), F.asc("u"), F.asc("v"))
            .limit(1)
            .collect()
        )
        if not scored:
            break
        row = scored[0]
        new_far = float(row["new_farness"])
        if farness <= 0 or (farness - new_far) / farness < threshold_frac:
            break
        group = sorted(set(group) - {int(row["u"])} | {int(row["v"])})
        farness = new_far
        n_iter += 1
    if farness is None:
        _, farness = group_closeness_local_swaps(g, group, max_swaps=0)
    return group, farness, n_iter
