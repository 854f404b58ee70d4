"""Selective community detection — PageRankNibble.

Reference: ``scd/PageRankNibble.cpp`` (seeded community via personalized
PageRank + best-conductance sweep cut; the PPR there is the
Andersen-Chung-Lang push, an inherently sequential priority loop).

Spark-first rephrasing with identical semantics at the fixed point:

1. PERSONALIZED PageRank by power iteration —
   ``pr = (1-α)·e_seed + α·Pᵀ·pr`` — the same superstep plan as global
   PageRank, only the teleport vector is the seed indicator. Converges
   to the same PPR vector the push method approximates.
2. SWEEP CUT over the PPR support, ordered by pr/deg: for every prefix
   S_k, conductance φ(S_k) = (vol_k − 2·E_k) / min(vol_k, vol(V)−vol_k)
   where E_k = #edges internal to the prefix. Both terms are cumulative
   window sums over the rank order: vol_k = cumsum(deg); E_k =
   cumsum over edges bucketed at max(rank_u, rank_v). One sort over the
   SUPPORT (not the graph) — PPR support is local to the seed, so the
   single-partition window is bounded by the community scale, not |V|.

Returns the argmin-conductance prefix as the community.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.pin import pin
from networkit_spark.plans.superstep import SuperstepRunner


@dataclass
class NibbleResult:
    community: DataFrame  # (id LONG)
    conductance: float
    ppr: DataFrame  # (id, score) over the support


def personalized_pagerank(
    g: Graph,
    seed_nodes: DataFrame,
    alpha: float = 0.85,
    tol: float = 1e-10,
    max_iterations: int = 100,
    runner: SuperstepRunner | None = None,
) -> DataFrame:
    """(id, score): pr = (1-α)·e_S + α·Pᵀ·pr, power iteration."""
    spark = g.edges.sparkSession
    runner = runner or SuperstepRunner(spark)
    seeds = seed_nodes.select(F.col(seed_nodes.columns[0]).cast("long").alias("id"))
    n_seeds = seeds.count()
    if n_seeds == 0:
        raise ValueError("personalized_pagerank needs at least one seed")
    restart = seeds.select("id", F.lit((1.0 - alpha) / n_seeds).alias("restart"))
    restart = restart.transform(pin)

    out_deg = g.edges.groupBy("src").agg(F.sum("weight").alias("wdeg"))
    edges_deg = (
        g.edges.join(out_deg.hint("shuffle_hash"), "src")
        .select("src", "dst", (F.col("weight") / F.col("wdeg")).alias("frac"))
        .cache()
    )
    edges_deg.count()

    scores = restart.select("id", F.col("restart").alias("score")).localCheckpoint(
        eager=True
    )
    for it in range(1, max_iterations + 1):
        gathered = (
            edges_deg.join(
                scores.withColumnRenamed("id", "src").hint("shuffle_hash"), "src"
            )
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("frac") * F.col("score")).alias("gather"))
        )
        new = (
            gathered.join(restart, "id", "full")
            .select(
                "id",
                (
                    F.coalesce("restart", F.lit(0.0))
                    + F.lit(alpha) * F.coalesce("gather", F.lit(0.0))
                ).alias("score"),
            )
        )
        new = runner.persist_step(new, it)
        delta = (
            new.join(scores.withColumnRenamed("score", "old"), "id", "full")
            .agg(
                F.sum(
                    F.abs(
                        F.coalesce(F.col("score"), F.lit(0.0))
                        - F.coalesce(F.col("old"), F.lit(0.0))
                    )
                )
            )
            .collect()[0][0]
            or 0.0
        )
        scores = new
        runner.record(it, delta=delta)
        if delta <= tol:
            break
    return scores


def pagerank_nibble(
    g: Graph,
    seed: int,
    alpha: float = 0.85,
    tol: float = 1e-8,
    support_floor: float = 1e-9,
) -> NibbleResult:
    """PageRankNibble: best-conductance sweep over the PPR support."""
    spark = g.edges.sparkSession
    seeds = spark.createDataFrame([(int(seed),)], "id long")
    ppr = personalized_pagerank(g, seeds, alpha=alpha, tol=tol)
    support = ppr.filter(F.col("score") > support_floor)

    deg = g.degrees().select("id", "deg", "wdeg")
    total_vol = float(
        deg.agg(F.sum("wdeg")).collect()[0][0] or 0.0
    )
    ranked = (
        support.join(deg, "id")
        .filter(F.col("wdeg") > 0)
        .select("id", "wdeg", (F.col("score") / F.col("wdeg")).alias("key"))
    )
    w = Window.orderBy(F.desc("key"), F.asc("id"))
    ranked = ranked.withColumn("rank", F.row_number().over(w)).localCheckpoint(
        eager=True
    )

    # internal-edge mass per prefix: an edge (u,v) becomes internal when
    # the LATER endpoint enters, i.e. at max(rank_u, rank_v)
    r = ranked.select("id", "rank")
    internal_at = (
        g.edges.filter(F.col("src") < F.col("dst"))
        .join(r.withColumnRenamed("id", "src").withColumnRenamed("rank", "ru"), "src")
        .join(r.withColumnRenamed("id", "dst").withColumnRenamed("rank", "rv"), "dst")
        .select(
            F.greatest("ru", "rv").alias("rank"), F.col("weight").alias("iw")
        )
        .groupBy("rank")
        .agg(F.sum("iw").alias("internal_w"))
    )
    wcum = Window.orderBy("rank").rowsBetween(Window.unboundedPreceding, 0)
    sweep = (
        ranked.join(internal_at, "rank", "left")
        .select(
            "id",
            "rank",
            F.sum("wdeg").over(wcum).alias("vol"),
            (2.0 * F.sum(F.coalesce("internal_w", F.lit(0.0))).over(wcum)).alias(
                "int2"
            ),
        )
        .select(
            "id",
            "rank",
            F.when(
                F.least(F.col("vol"), F.lit(total_vol) - F.col("vol")) > 0,
                (F.col("vol") - F.col("int2"))
                / F.least(F.col("vol"), F.lit(total_vol) - F.col("vol")),
            )
            .otherwise(F.lit(float("inf")))
            .alias("phi"),
        )
    ).transform(pin)
    best = sweep.orderBy(F.asc("phi"), F.asc("rank")).limit(1).collect()
    if not best:
        return NibbleResult(community=seeds, conductance=0.0, ppr=ppr)
    k, phi = int(best[0]["rank"]), float(best[0]["phi"])
    community = sweep.filter(F.col("rank") <= k).select("id")
    return NibbleResult(community=community, conductance=phi, ppr=ppr)


def gce(
    g: Graph,
    seeds: list[int],
    objective: str = "M",
    max_iterations: int = 200,
) -> DataFrame:
    """GCE — greedy community expansion (``scd/GCE.cpp`` objective "M"):
    starting from the seed set, repeatedly add the shell node with the
    best ΔQ where Q = internalEdgeWeight / cut, while ΔQ > 0. Ties break
    by smallest node id (the reference draws uniformly among ties —
    documented deviation for determinism at any parallelism).

    Each round is one shell aggregation (neighbors of C with their
    int/ext degree split) — C is broadcast while it is small, which for
    seed-set expansion it is by construction. Returns (node,) members.
    """
    spark = g.edges.sparkSession
    sym = (g.symmetrized_edges() if g.directed else g.edges).filter(
        F.col("src") != F.col("dst")
    ).select("src", "dst", "weight").transform(pin)
    wdeg = sym.groupBy(F.col("src").alias("id")).agg(F.sum("weight").alias("wdeg"))

    com = spark.createDataFrame([(int(s),) for s in seeds], "node long")
    int_w = 0.0
    # cut = total weight from C to outside
    def stats(cdf):
        inside = sym.join(
            F.broadcast(cdf.withColumnRenamed("node", "src")), "src", "left_semi"
        )
        both = inside.join(
            F.broadcast(cdf.withColumnRenamed("node", "dst")), "dst", "left_semi"
        )
        iw = (both.agg(F.sum("weight")).collect()[0][0] or 0.0) / 2.0
        cut = (
            inside.join(cdf.withColumnRenamed("node", "dst"), "dst", "left_anti")
            .agg(F.sum("weight"))
            .collect()[0][0]
            or 0.0
        )
        return iw, cut

    int_w, cut = stats(com)
    q = int_w / cut if cut > 0 else 0.0
    for _ in range(max_iterations):
        shell = (
            sym.join(F.broadcast(com.withColumnRenamed("node", "dst")), "dst", "left_semi")
            .join(F.broadcast(com.withColumnRenamed("node", "src")), "src", "left_anti")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("weight").alias("intdeg"))
            .join(wdeg.withColumnRenamed("id", "node"), "node")
            .select(
                "node", "intdeg", (F.col("wdeg") - F.col("intdeg")).alias("extdeg")
            )
        )
        denom = F.lit(cut) - F.col("intdeg") + F.col("extdeg")
        qnew = F.when(denom > 0, (F.lit(int_w) + F.col("intdeg")) / denom).otherwise(
            F.lit(float("inf"))
        )
        best = (
            shell.select("node", "intdeg", "extdeg", qnew.alias("qnew"))
            .orderBy(F.desc("qnew"), F.asc("node"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["qnew"] - q <= 0:
            break
        row = best[0]
        com = (
            com.unionByName(
                spark.createDataFrame([(int(row["node"]),)], "node long")
            )
            .repartition(1)  # community is tiny by construction: keep the
            .transform(pin)  # plan at ONE partition per round
        )
        int_w += float(row["intdeg"])
        cut = cut - float(row["intdeg"]) + float(row["extdeg"])
        q = int_w / cut if cut > 0 else float("inf")
        if q == float("inf"):
            break
    return com


def clique_detect(g: Graph, seed: int) -> DataFrame:
    """CliqueDetect (``scd/CliqueDetect.cpp`` semantics): the seed
    community is the LARGEST maximal clique in the seed's ego-net
    (including the seed), ties by lexicographically smallest member set.
    Reuses the distributed ego-net Bron-Kerbosch kernel."""
    from networkit_spark.operators.cliques import maximal_cliques

    sym = (g.symmetrized_edges() if g.directed else g.edges).filter(
        F.col("src") != F.col("dst")
    )
    ego_ids = (
        sym.filter(F.col("src") == int(seed)).select(F.col("dst").alias("id"))
        .unionByName(g.nodes.filter(F.col("id") == int(seed)).select("id"))
        .distinct()
    )
    ego = g.subgraph_from_nodes(ego_ids)
    cl = maximal_cliques(ego, min_size=1)  # (clique array<long>, size)
    with_seed = cl.filter(F.array_contains("clique", int(seed)))
    best = (
        with_seed.select(F.sort_array("clique").alias("clique"), "size")
        .orderBy(F.desc("size"), F.asc("clique"))
        .limit(1)
    )
    return best.select(F.explode("clique").alias("node"))


def lfm_local(
    g: Graph, seeds: list[int], alpha: float = 1.0, max_iterations: int = 200
) -> DataFrame:
    """LFMLocal (``scd/LFMLocal.cpp:11-40``): fitness-based seed-set
    expansion, fitness f(C) = 2·w_in / (2·w_in + cut)^α. Greedy: add the
    shell node with the best fitness gain while positive; after every
    addition re-check members and drop any whose removal RAISES the
    fitness (the reference's cleanup sweep), repeating until stable.
    Ties by smallest node id. Returns (node,) members.
    """
    spark = g.edges.sparkSession
    sym = (g.symmetrized_edges() if g.directed else g.edges).filter(
        F.col("src") != F.col("dst")
    ).select("src", "dst", "weight").localCheckpoint(eager=True)
    wdeg = sym.groupBy(F.col("src").alias("id")).agg(F.sum("weight").alias("wdeg"))

    def fitness(iw, cut):
        denom = (2 * iw + cut) ** alpha
        return (2 * iw) / denom if denom > 0 else 0.0

    com = spark.createDataFrame([(int(s),) for s in seeds], "node long")

    def stats(cdf):
        inside = sym.join(
            F.broadcast(cdf.withColumnRenamed("node", "src")), "src", "left_semi"
        )
        both = inside.join(
            F.broadcast(cdf.withColumnRenamed("node", "dst")), "dst", "left_semi"
        )
        iw = (both.agg(F.sum("weight")).collect()[0][0] or 0.0) / 2.0
        cut = (
            inside.join(
                F.broadcast(cdf.withColumnRenamed("node", "dst")), "dst", "left_anti"
            ).agg(F.sum("weight")).collect()[0][0] or 0.0
        )
        return iw, cut

    iw, cut = stats(com)
    f = fitness(iw, cut)
    for _ in range(max_iterations):
        # candidate deltas: intdeg/extdeg of every shell node
        shell = (
            sym.join(F.broadcast(com.withColumnRenamed("node", "dst")), "dst", "left_semi")
            .join(F.broadcast(com.withColumnRenamed("node", "src")), "src", "left_anti")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("weight").alias("intdeg"))
            .join(wdeg.withColumnRenamed("id", "node"), "node")
            .collect()
        )
        best = None
        for r0 in shell:
            nid = int(r0["node"])
            intd, wd = float(r0["intdeg"]), float(r0["wdeg"])
            nf = fitness(iw + intd, cut - intd + (wd - intd))
            if nf > f and (best is None or nf > best[1] or (nf == best[1] and nid < best[0])):
                best = (nid, nf, intd, wd)
        if best is None:
            break
        com = com.unionByName(
            spark.createDataFrame([(best[0],)], "node long")
        ).repartition(1).localCheckpoint(eager=True)
        iw = iw + best[2]
        cut = cut - best[2] + (best[3] - best[2])
        f = best[1]
        # cleanup sweep: remove any member whose removal raises fitness
        changed = True
        while changed:
            changed = False
            memb = (
                sym.join(F.broadcast(com.withColumnRenamed("node", "dst")), "dst", "left_semi")
                .join(F.broadcast(com.withColumnRenamed("node", "src")), "src", "left_semi")
                .groupBy(F.col("src").alias("node"))
                .agg(F.sum("weight").alias("intdeg"))
                .join(wdeg.withColumnRenamed("id", "node"), "node")
                .collect()
            )
            seeds_set = {int(x) for x in seeds}
            for r0 in sorted(memb, key=lambda q: int(q["node"])):
                nid = int(r0["node"])
                if nid in seeds_set:
                    continue
                intd, wd = float(r0["intdeg"]), float(r0["wdeg"])
                nf = fitness(iw - intd, cut + intd - (wd - intd))
                if nf > f:
                    com = com.filter(F.col("node") != nid).repartition(1).localCheckpoint(
                        eager=True
                    )
                    iw, cut, f = iw - intd, cut + intd - (wd - intd), nf
                    changed = True
                    break
    return com


def tce(
    g: Graph,
    seeds: list[int],
    use_jaccard: bool = False,
    max_iterations: int = 200,
    portable_sum: bool = False,
) -> DataFrame:
    """TCE — triangle-weighted community expansion (``scd/TCE.cpp``):
    shell nodes are scored by their triangle-reinforced attachment to the
    community,

        score(v) = Σ_{u∈C, (u,v)∈E} (w(u,v) + Σ_{w∈N(u)∩N(v)} min(w(v,w), w(u,w)))
                   / (denom(u,v) · deg(v)),

    denom = min(wdeg(v), wdeg(u)) (or the Jaccard form wdeg(v)+wdeg(u)−nom);
    the best-scored shell node joins iff it IMPROVES conductance
    (cut'/vol' < cut/vol). The reference pops rejected nodes from its
    heap and re-inserts them only when a later-accepted neighbor updates
    their score — mirrored here with a ``rejected`` set cleared for the
    accepted node's neighbors. Ties on the score break by smallest node
    id (the reference's heap order is unspecified — documented
    deviation, same policy as :func:`gce`).

    Each round is one shell aggregation + one per-candidate-pair common
    neighbor join; C is broadcast while small, which seed expansion
    guarantees by construction. Returns (node,) members.
    """
    spark = g.edges.sparkSession
    sym = (
        (g.symmetrized_edges() if g.directed else g.edges)
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst", "weight")
        .transform(pin)
    )
    wdeg = sym.groupBy(F.col("src").alias("id")).agg(
        F.sum("weight").alias("wdeg"), F.count(F.lit(1)).alias("deg")
    ).transform(pin)

    com = spark.createDataFrame([(int(s),) for s in seeds], "node long")
    com = com.repartition(1).localCheckpoint(eager=True)
    rejected: set[int] = set()

    def stats(cdf):
        inside = sym.join(
            F.broadcast(cdf.withColumnRenamed("node", "src")), "src", "left_semi"
        )
        vol = inside.agg(F.sum("weight")).collect()[0][0] or 0.0
        cut = (
            inside.join(cdf.withColumnRenamed("node", "dst"), "dst", "left_anti")
            .agg(F.sum("weight"))
            .collect()[0][0]
            or 0.0
        )
        return float(vol), float(cut)

    vol, cut = stats(com)
    for _ in range(max_iterations):
        # shell edges: u in C, v outside
        shell_e = (
            sym.join(F.broadcast(com.withColumnRenamed("node", "src")), "src", "left_semi")
            .join(com.withColumnRenamed("node", "dst"), "dst", "left_anti")
            .select(F.col("src").alias("u"), F.col("dst").alias("v"), F.col("weight").alias("wuv"))
        )
        if rejected:
            rej = spark.createDataFrame([(int(x),) for x in rejected], "v long")
            shell_e = shell_e.join(F.broadcast(rej), "v", "left_anti")
        # common-neighbor reinforcement per (u, v)
        tri = (
            shell_e.join(
                sym.select(F.col("src").alias("u"), F.col("dst").alias("w"), F.col("weight").alias("wuw")),
                "u",
            )
            .join(
                sym.select(F.col("src").alias("v"), F.col("dst").alias("w"), F.col("weight").alias("wvw")),
                ["v", "w"],
            )
            .groupBy("u", "v")
            .agg(F.sum(F.least("wvw", "wuw")).alias("ts"))
        )
        scored = (
            shell_e.join(tri, ["u", "v"], "left")
            .join(wdeg.select(F.col("id").alias("u"), F.col("wdeg").alias("wdu")), "u")
            .join(
                wdeg.select(
                    F.col("id").alias("v"), F.col("wdeg").alias("wdv"), F.col("deg").alias("dv")
                ),
                "v",
            )
            .select(
                "v",
                "u",
                "wuv",
                (
                    (F.col("wuv") + F.coalesce("ts", F.lit(0.0)))
                    / (
                        (
                            (F.col("wdv") + F.col("wdu") - (F.col("wuv") + F.coalesce("ts", F.lit(0.0))))
                            if use_jaccard
                            else F.least("wdv", "wdu")
                        )
                        * F.col("dv")
                    )
                ).alias("s"),
            )
            .groupBy("v")
            .agg(
                # portable_sum: fold the per-u terms in ascending-u order —
                # a deterministic reduction a SQL replay (and any cluster
                # size) reproduces bit-identically; default keeps the
                # commutative parallel sum
                (
                    F.aggregate(
                        F.array_sort(F.collect_list(F.struct("u", "s"))),
                        F.lit(0.0),
                        lambda acc, x: acc + x["s"],
                    )
                    if portable_sum
                    else F.sum("s")
                ).alias("score"),
                F.sum("wuv").alias("cut_v"),
            )
        )
        best = (
            scored.join(wdeg.select(F.col("id").alias("v"), F.col("wdeg").alias("vvol")), "v")
            .orderBy(F.desc("score"), F.asc("v"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        row = best[0]
        v, vvol, cut_v = int(row["v"]), float(row["vvol"]), float(row["cut_v"])
        cut_new = cut + vvol - 2.0 * cut_v
        vol_new = vol + vvol
        if vol > 0 and (cut_new / vol_new) < (cut / vol):
            com = (
                com.unionByName(spark.createDataFrame([(v,)], "node long"))
                .repartition(1)
                .localCheckpoint(eager=True)
            )
            cut, vol = cut_new, vol_new
            nbrs_v = {
                int(r[0])
                for r in sym.filter(F.col("src") == v).select("dst").collect()
            }
            rejected -= nbrs_v
        else:
            rejected.add(v)
    return com


# --------------------------------------------------------------------------
# round-7 SCD additions
# --------------------------------------------------------------------------


def set_conductance(g: Graph, community: DataFrame) -> float:
    """SetConductance (``scd/SetConductance.cpp:10-40``):
    cut(C) / min(vol(C), vol(V∖C)) with self-loops counted twice in the
    community volume; 1.0 when either side has zero volume."""
    if g.directed:
        raise ValueError("SetConductance only supports undirected graphs.")
    ids = community.select(F.col(community.columns[0]).alias("node")).distinct()
    e = g.edges  # symmetric storage: per-endpoint rows = forEdgesOf
    inc = e.join(F.broadcast(ids.withColumnRenamed("node", "src")), "src", "left_semi")
    row = inc.join(
        F.broadcast(ids.withColumnRenamed("node", "dst")).withColumn("inn", F.lit(1)),
        "dst",
        "left",
    ).agg(
        F.sum(F.when(F.col("inn").isNull(), F.col("weight")).otherwise(0.0)).alias(
            "cut"
        ),
        F.sum(
            F.col("weight")
            + F.when(F.col("src") == F.col("dst"), F.col("weight")).otherwise(0.0)
        ).alias("vol"),
    ).collect()[0]
    cut = float(row["cut"] or 0.0)
    vol = float(row["vol"] or 0.0)
    loops = g.edges.filter(F.col("src") == F.col("dst"))
    total_w = float(g.edges.agg(F.sum("weight")).collect()[0][0] or 0.0)
    loop_w = float(loops.agg(F.sum("weight")).collect()[0][0] or 0.0)
    # symmetric storage holds non-loops twice and loops once:
    # totalEdgeWeight (per-edge) = (total_w - loop_w)/2 + loop_w
    total_volume = 2.0 * ((total_w - loop_w) / 2.0 + loop_w)
    rest = total_volume - vol
    if vol > 0 and rest > 0:
        return cut / min(vol, rest)
    return 1.0


def combined_scd(g: Graph, seed, first, second) -> DataFrame:
    """CombinedSCD (``scd/CombinedSCD.cpp``): run ``second`` on the
    community ``first`` produced from the seed — e.g. a CliqueDetect
    seed core refined by GCE. ``first`` is (g, seed) → DataFrame;
    ``second`` is (g, members: DataFrame) → DataFrame."""
    return second(g, first(g, seed))


def random_bfs_scd(
    g: Graph,
    seeds: list[int],
    com_size: int | None = None,
    cover: DataFrame | None = None,
    seed: int = 42,
) -> DataFrame:
    """RandomBFS (``scd/RandomBFS.cpp``): the baseline SCD — grow a BFS
    ball around the seed set until it reaches the target size; the last
    partial level is sampled. Target size: ``com_size``, else the size
    of a ground-truth ``cover`` subset containing EVERY seed (hash-drawn
    among candidates), else |seeds|. Deviations (documented): the
    reference shuffles the final level and draws the subset with its
    sequential RNG; here both use the portable md5 order (node-salted) —
    deterministic at any parallelism.
    """
    from networkit_spark.functions.porthash import md5_mod_py

    spark = g.edges.sparkSession
    target = com_size if com_size is not None else len(seeds)
    if com_size is None and cover is not None:
        per = (
            cover.join(
                spark.createDataFrame([(int(s),) for s in seeds], "node long"),
                "node",
            )
            .groupBy("subset")
            .agg(F.count(F.lit(1)).alias("k"))
            .filter(F.col("k") == len(set(seeds)))
            .select("subset")
        )
        sizes = {
            int(r["subset"]): int(r["n"])
            for r in cover.groupBy("subset")
            .agg(F.count(F.lit(1)).alias("n"))
            .join(per, "subset")
            .collect()
        }
        if sizes:
            pick = min(sizes, key=lambda s: (md5_mod_py(s, salt=f"rbfs{seed}:"), s))
            target = sizes[pick]
    sym = (g.symmetrized_edges() if g.directed else g.edges).filter(
        F.col("src") != F.col("dst")
    )
    result: set[int] = set()
    level = sorted(set(int(s) for s in seeds))
    while level and len(result) < target:
        if len(level) + len(result) < target:
            result.update(level)
        else:
            need = target - len(result)
            ordered = sorted(
                level, key=lambda v: (md5_mod_py(v, salt=f"rbfsl{seed}:"), v)
            )
            result.update(ordered[:need])
            break
        cur = spark.createDataFrame([(v,) for v in level], "src long")
        nxt = (
            sym.join(F.broadcast(cur), "src", "left_semi")
            .select("dst")
            .distinct()
            .collect()
        )
        level = sorted(v[0] for v in nxt if v[0] not in result)
    return spark.createDataFrame([(v,) for v in sorted(result)], "node long")


def scd_ground_truth_comparison(
    g: Graph,
    ground_truth: DataFrame,
    found: DataFrame,
    ignore_seeds: bool = False,
) -> dict:
    """SCDGroundTruthComparison (``scd/SCDGroundTruthComparison.cpp``):
    per seed community, the best Jaccard/F1/precision/recall against
    the ground-truth cover — restricted to the seed's own subsets
    unless ``ignore_seeds``. ``ground_truth``: (node, subset);
    ``found``: (seed, node). Returns {'scores': DataFrame(seed,
    jaccard, f1, precision, recall), 'avg_jaccard', 'avg_f1',
    'avg_precision', 'avg_recall'} — one membership join + per-seed
    max, all set algebra as join-aggs."""
    ids = g.nodes.select(F.col("id").alias("node"))
    gt = ground_truth.join(ids, "node")
    fnd = found.join(ids, "node")
    truth_sizes = gt.groupBy("subset").agg(F.count(F.lit(1)).alias("tsz"))
    found_sizes = fnd.groupBy("seed").agg(F.count(F.lit(1)).alias("fsz"))
    overlap = fnd.join(gt, "node").groupBy("seed", "subset").agg(
        F.count(F.lit(1)).alias("ol")
    )
    if not ignore_seeds:
        allowed = gt.select(F.col("node").alias("seed"), "subset")
        overlap = overlap.join(allowed, ["seed", "subset"], "left_semi")
    scored = (
        overlap.join(truth_sizes, "subset")
        .join(found_sizes, "seed")
        .withColumn(
            "jaccard",
            F.col("ol") / (F.col("fsz") + F.col("tsz") - F.col("ol")),
        )
        .withColumn("recall", F.col("ol") / F.col("tsz"))
        .withColumn("precision", F.col("ol") / F.col("fsz"))
        .withColumn(
            "f1",
            2.0
            * F.col("precision")
            * F.col("recall")
            / (F.col("precision") + F.col("recall")),
        )
        .groupBy("seed")
        .agg(
            F.max("jaccard").alias("jaccard"),
            F.max("f1").alias("f1"),
            F.max("precision").alias("precision"),
            F.max("recall").alias("recall"),
        )
    )
    scores = (
        found_sizes.select("seed")
        .join(scored, "seed", "left")
        .fillna(0.0, subset=["jaccard", "f1", "precision", "recall"])
    )
    row = scores.agg(
        F.avg("jaccard").alias("j"),
        F.avg("f1").alias("f"),
        F.avg("precision").alias("p"),
        F.avg("recall").alias("r"),
    ).collect()[0]
    return {
        "scores": scores,
        "avg_jaccard": float(row["j"] or 0.0),
        "avg_f1": float(row["f"] or 0.0),
        "avg_precision": float(row["p"] or 0.0),
        "avg_recall": float(row["r"] or 0.0),
    }


def two_phase_l(g: Graph, seeds: list[int], max_iterations: int = 200) -> DataFrame:
    """TwoPhaseL (``scd/TwoPhaseL.cpp``, Chen/Zaïane/Goebel): greedy
    L-metric expansion then a one-pass pruning sweep. L = Lin/Lex with
    Lin = 2·intW/|C| and Lex = cut/|boundary|. Adds accept the shell
    node maximizing L among those RAISING Lin (ties → smallest id; the
    reference draws uniformly — documented deviation); the pruning pass
    visits members in ascending id (reference order unspecified) and
    removes any whose removal does not both lower Lin and raise Lex.
    Per round: one shell aggregation + one exclusive-boundary count —
    the gce broadcast shape; community state stays distributed."""
    if g.edges.filter(F.col("src") == F.col("dst")).limit(1).count() > 0:
        raise ValueError("Graphs with self-loops are not supported in TwoPhaseL")
    spark = g.edges.sparkSession
    sym = (
        (g.symmetrized_edges() if g.directed else g.edges)
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst", "weight")
        .transform(pin)
    )
    wdeg = sym.groupBy(F.col("src").alias("id")).agg(F.sum("weight").alias("wdeg"))

    members = sorted(set(int(s) for s in seeds))

    def com_df(ms):
        return spark.createDataFrame([(v,) for v in ms], "node long")

    def stats(ms):
        """(intW, cut, boundary members ext-degrees dict, member intdeg)."""
        cdf = com_df(ms)
        inc = sym.join(
            F.broadcast(cdf.withColumnRenamed("node", "src")), "src", "left_semi"
        )
        per = (
            inc.join(
                F.broadcast(cdf.withColumnRenamed("node", "dst")).withColumn(
                    "inn", F.lit(1)
                ),
                "dst",
                "left",
            )
            .groupBy("src")
            .agg(
                F.sum(F.when(F.col("inn").isNotNull(), F.col("weight")).otherwise(0.0)).alias("ideg"),
                F.sum(F.when(F.col("inn").isNull(), F.col("weight")).otherwise(0.0)).alias("edeg"),
            )
            .collect()
        )
        ideg = {int(r["src"]): float(r["ideg"]) for r in per}
        edeg = {int(r["src"]): float(r["edeg"]) for r in per}
        for v in ms:  # isolated members
            ideg.setdefault(v, 0.0)
            edeg.setdefault(v, 0.0)
        int_w = sum(ideg.values()) / 2.0
        cut = sum(edeg.values())
        boundary = sum(1 for v in ms if edeg[v] > 0)
        return int_w, cut, boundary, ideg, edeg

    int_w, cut, boundary, _, _ = stats(members)
    if boundary == 0:
        return com_df(members)
    cur_lin = 2.0 * int_w / len(members)
    cur_lex = cut / boundary
    cur_l = cur_lin / cur_lex if cur_lex > 0 else float("inf")

    for _ in range(max_iterations):
        cdf = com_df(members)
        shell = (
            sym.join(F.broadcast(cdf.withColumnRenamed("node", "dst")), "dst", "left_semi")
            .join(F.broadcast(cdf.withColumnRenamed("node", "src")), "src", "left_anti")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("weight").alias("intdeg"))
            .join(wdeg.withColumnRenamed("id", "node"), "node")
            .select("node", "intdeg", (F.col("wdeg") - F.col("intdeg")).alias("extdeg"))
        )
        # exclusive boundary members: community nodes whose ONLY external
        # neighbor is v -> v's boundary credit
        ext = (
            sym.join(F.broadcast(cdf.withColumnRenamed("node", "src")), "src", "left_semi")
            .join(F.broadcast(cdf.withColumnRenamed("node", "dst")), "dst", "left_anti")
        )
        excl = (
            ext.groupBy("src")
            .agg(F.count(F.lit(1)).alias("cnt"), F.max("dst").alias("only"))
            .filter(F.col("cnt") == 1)
            .groupBy(F.col("only").alias("node"))
            .agg(F.count(F.lit(1)).alias("nexcl"))
        )
        cand = (
            shell.join(excl, "node", "left")
            .fillna(0, subset=["nexcl"])
            .collect()
        )
        best_v, best_l, best_row = None, cur_l, None
        for r in sorted(cand, key=lambda r: int(r["node"])):
            n_lin = 2.0 * (int_w + float(r["intdeg"])) / (len(members) + 1)
            bchange = (1 if float(r["extdeg"]) > 0 else 0) - int(r["nexcl"])
            nb = boundary + bchange
            if nb <= 0:
                continue
            n_lex = (cut - float(r["intdeg"]) + float(r["extdeg"])) / nb
            if n_lex <= 0:
                continue
            n_l = n_lin / n_lex
            if n_lin > cur_lin and n_l > best_l:
                best_v, best_l, best_row = int(r["node"]), n_l, r
        if best_v is None:
            break
        members = sorted(members + [best_v])
        int_w, cut, boundary, _, _ = stats(members)
        cur_lin = 2.0 * int_w / len(members)
        cur_lex = cut / boundary if boundary > 0 else 0.0
        if cur_lex <= 0:
            break
        cur_l = cur_lin / cur_lex

    # pruning pass: ascending id, state updated after each removal
    for v in sorted(members):
        if len(members) <= 1:
            break
        int_w, cut, boundary, ideg, edeg = stats(members)
        cur_lin = 2.0 * int_w / len(members)
        cur_lex = cut / boundary if boundary > 0 else 0.0
        # numFullyInternalNeighbors: community neighbors of v with edeg 0
        cdf = com_df([v])
        nbrs = [
            int(r["dst"])
            for r in sym.join(
                F.broadcast(cdf.withColumnRenamed("node", "src")), "src", "left_semi"
            )
            .select("dst")
            .collect()
        ]
        mset = set(members)
        nfull = sum(1 for u in nbrs if u in mset and edeg.get(u, 0.0) == 0.0)
        bchange = nfull - (1 if edeg[v] > 0 else 0)
        nb = boundary + bchange
        n_lin = 2.0 * (int_w - ideg[v]) / (len(members) - 1)
        n_lex = (cut + ideg[v] - edeg[v]) / nb if nb > 0 else float("inf")
        if not (cur_lin > n_lin and cur_lex < n_lex):
            members = [u for u in members if u != v]
    if not all(int(s) in set(members) for s in seeds):
        return spark.createDataFrame([], "node long")
    return com_df(sorted(members))


def local_t(g: Graph, seeds: list[int], max_iterations: int = 200) -> DataFrame:
    """LocalT (``scd/LocalT.cpp``, triangle-based expansion): greedily
    add the shell node maximizing Score(C) = max(0, T_in·(T_in − T_ext))
    where T_in counts triangles fully inside C and T_ext triangles with
    EXACTLY ONE vertex in C; equal-score candidates are accepted with
    the smallest resulting T_ext (the reference's tie rule — note an
    equal-score candidate always qualifies on the first comparison, so
    score-neutral growth continues until the shell empties; the
    ``max_iterations`` cap bounds that, house convention). Remaining
    ties break by smallest node id (the reference's unordered-set scan
    order is unspecified — documented deviation).

    Per round: one triangle enumeration anchored at C ∪ shell (wedge
    join over the frontier-restricted edge relation) + one aggregation;
    the community itself stays broadcast-small."""
    spark = g.edges.sparkSession
    sym = (
        (g.symmetrized_edges() if g.directed else g.edges)
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .transform(pin)
    )
    can = sym.filter(F.col("src") < F.col("dst")).transform(pin)

    members = sorted(set(int(s) for s in seeds))
    for _ in range(max_iterations):
        cdf = spark.createDataFrame([(v,) for v in members], "node long")
        shell_df = (
            sym.join(F.broadcast(cdf.withColumnRenamed("node", "src")), "src", "left_semi")
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(F.broadcast(cdf), "node", "left_anti")
        )
        anchored = F.broadcast(cdf.unionByName(shell_df))
        # triangles with >= 1 vertex in C ∪ shell: anchor the smallest
        # corner's edges at S-adjacent pairs, then classify all corners
        e1 = can.join(
            anchored.withColumnRenamed("node", "src"), "src", "left_semi"
        ).unionByName(
            can.join(anchored.withColumnRenamed("node", "dst"), "dst", "left_semi")
        ).distinct()
        tri = (
            e1.alias("ab")
            .join(
                e1.alias("bc"),
                (F.col("ab.src") == F.col("bc.src"))
                & (F.col("ab.dst") < F.col("bc.dst")),
            )
            .join(
                can.alias("ac"),
                (F.col("ac.src") == F.col("ab.dst"))
                & (F.col("ac.dst") == F.col("bc.dst")),
            )
            .select(
                F.col("ab.src").alias("a"),
                F.col("ab.dst").alias("b"),
                F.col("bc.dst").alias("c"),
            )
            .distinct()
        )
        mem = F.broadcast(cdf.withColumn("m", F.lit(1)))
        t = (
            tri.join(mem.withColumnRenamed("node", "a").withColumnRenamed("m", "ma"), "a", "left")
            .join(mem.withColumnRenamed("node", "b").withColumnRenamed("m", "mb"), "b", "left")
            .join(mem.withColumnRenamed("node", "c").withColumnRenamed("m", "mc"), "c", "left")
            .withColumn(
                "k",
                F.coalesce("ma", F.lit(0))
                + F.coalesce("mb", F.lit(0))
                + F.coalesce("mc", F.lit(0)),
            )
        ).localCheckpoint(eager=True)
        row = t.agg(
            F.sum(F.when(F.col("k") == 3, 1).otherwise(0)).alias("tin"),
            F.sum(F.when(F.col("k") == 1, 1).otherwise(0)).alias("text"),
        ).collect()[0]
        t_in, t_ext = int(row["tin"] or 0), int(row["text"] or 0)
        cur_score = max(0, t_in * (t_in - t_ext))
        # per-shell stats from the same classified triangle table
        corners = (
            t.select(F.col("a").alias("node"), "k").unionByName(
                t.select(F.col("b").alias("node"), "k")
            ).unionByName(t.select(F.col("c").alias("node"), "k"))
        )
        stats = {
            int(r["node"]): (int(r["ni"] or 0), int(r["ne"] or 0), int(r["ns"] or 0))
            for r in corners.join(
                F.broadcast(shell_df), "node", "left_semi"
            )
            .groupBy("node")
            .agg(
                F.sum(F.when(F.col("k") == 2, 1).otherwise(0)).alias("ni"),
                F.sum(F.when(F.col("k") == 0, 1).otherwise(0)).alias("ne"),
                F.sum(F.when(F.col("k") == 1, 1).otherwise(0)).alias("ns"),
            )
            .collect()
        }
        shell_all = sorted(int(r["node"]) for r in shell_df.collect())
        # the reference scan (LocalT.cpp:113-128), in ascending-id order
        u_max, best_score, best_ext = None, cur_score, float("inf")
        for v in shell_all:
            ni, ne, ns = stats.get(v, (0, 0, 0))
            n_in = t_in + ni
            n_ext = t_ext + ne - ns
            n_score = max(0, n_in * (n_in - n_ext))
            if n_score > best_score or (n_score == best_score and n_ext < best_ext):
                u_max, best_score, best_ext = v, n_score, n_ext
        if u_max is None:
            break
        members = sorted(members + [u_max])
    return spark.createDataFrame([(v,) for v in members], "node long")


def local_tightness_expansion(
    g: Graph, seeds: list[int], alpha: float = 1.0, max_iterations: int = 200
) -> DataFrame:
    """LocalTightnessExpansion (``scd/LocalTightnessExpansion.cpp``,
    Huang et al. structural-similarity expansion). Edge similarity
    s(u,v) = (2·w(u,v) + Σ_y w(u,y)·w(v,y)) / (wd(u)·wd(v)) with
    wd(u) = sqrt(1 + Σ w(u,·)²) — STATIC per edge, so it is computed
    once as one weighted wedge join. The shell heap pops the max
    internal-similarity node and accepts iff
    extSim/intSim − (α·ext(v) − int(v)) / (2·int(v)) > 0; a rejected
    node is discarded permanently (``extract_top``). Because a
    rejection leaves the state unchanged, the heap loop is equivalent
    to: scan the shell in descending (intSim, −id) order until the
    first acceptance, discarding everything popped before it — so the
    driver loop runs ONE aggregation job per acceptance, not per pop.
    Heap ties are unspecified in the reference; here they break by
    smaller node id (documented)."""
    import math

    spark = g.edges.sparkSession
    sym = (
        (g.symmetrized_edges() if g.directed else g.edges)
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst", F.col("weight").cast("double").alias("w"))
        .transform(pin)
    )
    wd = sym.groupBy(F.col("src").alias("id")).agg(
        F.sqrt(1.0 + F.sum(F.col("w") * F.col("w"))).alias("wd")
    )
    # common-neighbor weight products per directed edge (u, v)
    prod = (
        sym.alias("a")
        .join(
            sym.alias("b"),
            (F.col("a.dst") == F.col("b.dst")) & (F.col("a.src") != F.col("b.src")),
        )
        .select(
            F.col("a.src").alias("src"),
            F.col("b.src").alias("dst2"),
            (F.col("a.w") * F.col("b.w")).alias("p"),
        )
        .groupBy("src", F.col("dst2").alias("dst"))
        .agg(F.sum("p").alias("psum"))
    )
    scores = pin(
        sym.join(prod, ["src", "dst"], "left")
        .fillna(0.0, subset=["psum"])
        .join(wd.withColumnRenamed("id", "src").withColumnRenamed("wd", "wu"), "src")
        .join(wd.withColumnRenamed("id", "dst").withColumnRenamed("wd", "wv"), "dst")
        .select(
            "src",
            "dst",
            ((2.0 * F.col("w") + F.col("psum")) / (F.col("wu") * F.col("wv"))).alias(
                "s"
            ),
        )
    )
    tot = {
        int(r["src"]): float(r["t"])
        for r in scores.groupBy("src").agg(F.sum("s").alias("t")).collect()
    }

    members = sorted(set(int(s) for s in seeds))
    discarded: set[int] = set()
    for _ in range(max_iterations):
        cdf = spark.createDataFrame([(v,) for v in members], "node long")
        inc = scores.join(
            F.broadcast(cdf.withColumnRenamed("node", "src")), "src", "left_semi"
        )
        # intSim per neighbor v of C (rows (u in C) -> v), both shell & members
        per = {
            int(r["dst"]): float(r["i"])
            for r in inc.groupBy("dst").agg(F.sum("s").alias("i")).collect()
        }
        mset = set(members)
        internal = sum(per.get(v, 0.0) for v in members)
        external = sum(tot.get(v, 0.0) - per.get(v, 0.0) for v in members)
        shell = sorted(
            (v for v in per if v not in mset and v not in discarded),
            key=lambda v: (-per[v], v),
        )
        accepted = None
        for v in shell:
            int_v = per[v]
            ext_v = tot.get(v, 0.0) - int_v
            try:
                lhs = external / internal if internal != 0 else (
                    math.inf if external > 0 else math.nan
                )
                rhs = (
                    (alpha * ext_v - int_v) / (2.0 * int_v)
                    if int_v != 0
                    else (math.inf if alpha * ext_v - int_v > 0 else -math.inf
                          if alpha * ext_v - int_v < 0 else math.nan)
                )
                take = (lhs - rhs) > 0
            except ZeroDivisionError:  # pragma: no cover
                take = False
            if take:
                accepted = v
                break
            discarded.add(v)
        if accepted is None:
            break
        members = sorted(members + [accepted])
    return spark.createDataFrame([(v,) for v in members], "node long")
