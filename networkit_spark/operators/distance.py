"""Distance-based kernels: multi-source BFS, betweenness (Brandes),
closeness / harmonic closeness, diameter, weighted SSSP.

Reference semantics matched (all citations into /root/reference):

- BFS / SSSP distances: ``distance/BFS.cpp``, ``distance/Dijkstra.cpp:93``
  (weighted relax; we use the join-agg Bellman-Ford form — same fixed
  point, shuffle-friendly).
- Betweenness: Brandes accumulation ``centrality/Betweenness.cpp:47-91``
  (dependency[p] += (σ_p/σ_t)(1+dependency[t]); normalized divides by
  (n-1)(n-2)).
- EstimateBetweenness: ``centrality/EstimateBetweenness.cpp:44-110`` —
  sampled sources, linear-scaled dependency (× dist(p)/dist(t),
  Geisberger et al.), extrapolation × 2n/nSamples.
- Closeness: ``include/networkit/centrality/Closeness.hpp:78-93`` —
  standard variant score = 1/Σdist (0 when nothing reached), normalized
  × (n-1); generalized variant = (r-1)/Σdist/(n-1), normalized × (r-1).
- HarmonicCloseness: ``centrality/HarmonicCloseness.cpp:25-47`` —
  Σ 1/dist over reached, normalized /(n-1).
- Diameter: ``distance/Diameter.cpp`` — exact via all-pairs ecc;
  estimatedRange via the two-sweep lower bound (lb = ecc of the far
  node of a double BFS sweep, ub = 2·lb).

Spark plan notes (100 TB posture): the substrate is a batched
multi-source BFS whose frontier is keyed by (root, node) — one shuffle
per hop level for ALL roots simultaneously, so k sampled sources cost
O(diameter) rounds total, not k × diameter. Per-level states are
localCheckpointed through SuperstepRunner (lineage truncation, metrics,
resume). Exact all-sources variants are O(n·m) total work — same as the
reference — and are meant for subgraphs / sampled source sets at scale.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.edge_layout import (
    broadcast_row_limit,
    maybe_broadcast,
    partitioned_edges,
)
from networkit_spark.plans.pin import pin
from networkit_spark.plans.superstep import SuperstepRunner


@dataclass
class MSBFSResult:
    # visited: (root LONG, node LONG, dist LONG, sigma DOUBLE)
    visited: DataFrame
    # levels[d]: (root, node, sigma) at hop distance d (levels[0] = sources)
    levels: list[DataFrame]
    depth: int
    # level_rows[d]: row count of levels[d] (known from the frontier
    # counts — lets consumers pick broadcast vs shuffle plans for free)
    level_rows: list[int] | None = None


def multi_source_bfs(
    g: Graph,
    sources: DataFrame,
    runner: SuperstepRunner | None = None,
    with_sigma: bool = True,
) -> MSBFSResult:
    """Batched BFS from every row of ``sources`` (single column of ids).

    Tracks per-(root, node) hop distance and — for Brandes — σ, the
    number of distinct shortest paths from root to node. One frontier
    join + one (root, dst) aggregation per hop level, shared across all
    roots; the edge relation is cached once.
    """
    spark = g.edges.sparkSession
    runner = runner or SuperstepRunner(spark)

    # Shared memoized edge layouts (plans/edge_layout.py, guide §2.4).
    # While the frontier / visited sets are under the broadcast row
    # limit, a level runs over the dst-partitioned layout: broadcast
    # frontier join (preserves the dst hashing) -> groupBy(root, dst)
    # WITHOUT an Exchange -> broadcast anti-join against visited — a
    # zero-shuffle level. Above the limit it falls back to the pre-r8
    # plan over the src-partitioned layout (frontier shuffled by src,
    # messages shuffled by (root, dst), visited anti-join shuffled).
    bcast_rows = broadcast_row_limit()

    roots = sources.select(F.col(sources.columns[0]).cast("long").alias("root"))
    level0 = roots.select(
        "root", F.col("root").alias("node"), F.lit(1.0).alias("sigma")
    ).localCheckpoint(eager=True)
    frontier_rows = level0.count()
    visited_rows = frontier_rows

    visited = level0.select("root", "node", F.lit(0).cast("long").alias("dist"), "sigma")
    visited = visited.localCheckpoint(eager=True)
    levels = [level0]
    _level_counts = [frontier_rows]
    frontier = level0

    depth = 0
    while True:
        depth += 1
        # expand: every (root, node) in the frontier sends σ along out-edges;
        # paths to the same (root, dst) sum — that IS σ for the next level
        # when dst is newly discovered.
        fr = frontier.withColumnRenamed("node", "src")
        if frontier_rows <= bcast_rows:
            e = partitioned_edges(g.edges, "dst").select("src", "dst")
            fr = F.broadcast(fr)
        else:
            e = partitioned_edges(g.edges, "src").select("src", "dst")
            fr = fr.hint("shuffle_hash")
        msgs = (
            e.join(fr, "src")
            .groupBy("root", F.col("dst").alias("node"))
            .agg(F.sum("sigma").alias("sigma"))
        )
        nxt = msgs.join(
            maybe_broadcast(visited.select("root", "node"), visited_rows),
            ["root", "node"],
            "left_anti",
        )
        # lazy checkpoint + count = ONE job per level (the count
        # materializes the checkpoint blocks); eager + count was two
        nxt = nxt.localCheckpoint(eager=False)
        n_new = nxt.count()
        runner.record(depth, frontier=n_new)
        if n_new == 0:
            depth -= 1
            break
        levels.append(nxt)
        _level_counts.append(n_new)
        visited = visited.unionByName(
            nxt.select("root", "node", F.lit(depth).cast("long").alias("dist"), "sigma")
        )
        visited = runner.persist_step(visited, depth)
        frontier = nxt
        frontier_rows = n_new
        visited_rows += n_new
        # every (root, node) pair discovered ⇒ the next expansion is
        # provably empty — skip the final full-graph pass outright.
        # (Internal callers pass distinct sources, so level0's row count
        # is the root count.)
        if visited_rows >= _level_counts[0] * g.num_nodes():
            break

    if not with_sigma:
        visited = visited.drop("sigma")
    rows = [lvl_rows for lvl_rows in _level_counts]
    return MSBFSResult(visited=visited, levels=levels, depth=depth, level_rows=rows)


# --------------------------------------------------------------------------
# Betweenness (Brandes) — exact and sampled
# --------------------------------------------------------------------------

def _brandes(
    g: Graph,
    sources: DataFrame,
    linear_scaling: bool,
    runner: SuperstepRunner | None = None,
    edge_scores: bool = False,
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """Sum of Brandes dependencies over ``sources``: (id, score).

    Backward phase walks the BFS DAG level by level from the deepest
    frontier; δ for level d-1 is one join-agg over level-d deltas
    (predecessor p of t satisfies dist(p) = dist(t) - 1 and (p,t) ∈ E).
    With ``edge_scores`` the per-DAG-edge term σp/σt·(1+δt) — which the
    reference adds to edgeScoreData before folding it into δp
    (``Betweenness.cpp:60-70``) — is also accumulated per edge.
    """
    spark = g.edges.sparkSession
    runner = runner or SuperstepRunner(spark)
    res = multi_source_bfs(g, sources, runner=runner)
    bcast_rows = broadcast_row_limit()

    acc: DataFrame | None = None  # (node, dep) summed over roots, per level
    eacc: DataFrame | None = None  # (src, dst, es) per level, summed over roots
    delta: DataFrame | None = None  # (root, node, delta) at current level
    # acc/eacc are per-level unions; without periodic folding the plan
    # (and localCheckpoint-free lineage) grows O(depth) — fatal on deep
    # graphs (weighted chains). Every FOLD_EVERY levels, collapse the
    # union into its running aggregate and truncate lineage.
    FOLD_EVERY = 8
    levels_since_fold = 0
    for d in range(res.depth, 0, -1):
        lvl = res.levels[d]  # (root, node, sigma) at dist d
        cur = (
            lvl.join(delta, ["root", "node"], "left").select(
                "root",
                "node",
                "sigma",
                F.coalesce("delta", F.lit(0.0)).alias("delta"),
            )
            if delta is not None
            else lvl.select("root", "node", "sigma", F.lit(0.0).alias("delta"))
        )
        # score[t] += dependency[t] for t at this level (root ≠ t by construction)
        contrib = cur.groupBy(F.col("node").alias("id")).agg(
            F.sum("delta").alias("dep")
        )
        acc = contrib if acc is None else acc.unionByName(contrib)

        # push dependency to predecessors at level d-1 (guide §2.4/§3.1):
        # while the two per-level state tables fit the broadcast limit,
        # run over the src-partitioned cached edge layout with BOTH
        # state sides broadcast — the level then re-shuffles nothing
        # (the old plan re-shuffled the full edge table by dst on EVERY
        # level), and the δ groupBy(root, src) below inherits the src
        # hash partitioning, so it is exchange-free too. Above the limit:
        # dst-partitioned layout + shuffled-hash, the pre-r8 shape minus
        # its per-level edge re-shuffle.
        factor = F.lit((d - 1) / d) if linear_scaling else F.lit(1.0)
        prev = res.levels[d - 1].select(
            "root", F.col("node").alias("src"), F.col("sigma").alias("sigma_p")
        )
        lvl_rows = res.level_rows[d] if res.level_rows else None
        prev_rows = res.level_rows[d - 1] if res.level_rows else None
        small = (
            lvl_rows is not None
            and prev_rows is not None
            and lvl_rows <= bcast_rows
            and prev_rows <= bcast_rows
        )
        if small:
            e = partitioned_edges(g.edges, "src").select("src", "dst")
            cur_j = F.broadcast(cur.withColumnRenamed("node", "dst"))
            prev_j = F.broadcast(prev)
        else:
            e = partitioned_edges(g.edges, "dst").select("src", "dst")
            cur_j = cur.withColumnRenamed("node", "dst").hint("shuffle_hash")
            prev_j = prev
        terms = (
            e.join(cur_j, "dst")
            .join(prev_j, ["root", "src"])  # keeps only true DAG predecessors
            .select(
                "root",
                "src",
                "dst",
                (
                    (F.col("sigma_p") / F.col("sigma"))
                    * factor
                    * (F.lit(1.0) + F.col("delta"))
                ).alias("term"),
            )
        )
        if edge_scores:
            ec = terms.groupBy("src", "dst").agg(F.sum("term").alias("es"))
            eacc = ec if eacc is None else eacc.unionByName(ec)
        delta = (
            terms.groupBy("root", F.col("src").alias("node"))
            .agg(F.sum("term").alias("delta"))
        )
        # lazy: the plan is truncated now, execution chains into the next
        # level's (or the final aggregate's) job — one job for the whole
        # backward sweep instead of one per level
        delta = delta.localCheckpoint(eager=False)

        levels_since_fold += 1
        if levels_since_fold >= FOLD_EVERY:
            acc = (
                acc.groupBy("id")
                .agg(F.sum("dep").alias("dep"))
                .localCheckpoint(eager=True)
            )
            if eacc is not None:
                eacc = (
                    eacc.groupBy("src", "dst")
                    .agg(F.sum("es").alias("es"))
                    .localCheckpoint(eager=True)
                )
            levels_since_fold = 0

    if acc is None:
        nodes = g.nodes.select("id", F.lit(0.0).alias("score"))
        empty_e = spark.createDataFrame([], "src long, dst long, score double")
        return (nodes, empty_e) if edge_scores else nodes
    dep = acc.groupBy("id").agg(F.sum("dep").alias("score"))
    node_scores = g.nodes.join(dep, "id", "left").select(
        "id", F.coalesce("score", F.lit(0.0)).alias("score")
    )
    if not edge_scores:
        return node_scores
    es = eacc.groupBy("src", "dst").agg(F.sum("es").alias("score"))
    if not g.directed:
        # both orientations carry the same reference edge id — fold them
        es = (
            es.groupBy(
                F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
            )
            .agg(F.sum("score").alias("score"))
        )
    return node_scores, es


def betweenness(
    g: Graph,
    normalized: bool = False,
    runner: SuperstepRunner | None = None,
) -> DataFrame:
    """Exact Brandes betweenness (``centrality/Betweenness.cpp``):
    (id, score). Undirected pairs contribute twice, as in the reference
    (raw maximum is (n-1)(n-2)/2 · 2); normalized divides by (n-1)(n-2)."""
    scores = _brandes(g, g.nodes, linear_scaling=False, runner=runner)
    if normalized:
        n = g.num_nodes()
        pairs = max((n - 1) * (n - 2), 1)
        scores = scores.select("id", (F.col("score") / F.lit(float(pairs))).alias("score"))
    return scores


def estimate_betweenness(
    g: Graph,
    n_samples: int,
    seed: int = 42,
    normalized: bool = False,
    runner: SuperstepRunner | None = None,
    portable_hash: bool = False,
) -> DataFrame:
    """EstimateBetweenness (``centrality/EstimateBetweenness.cpp``):
    sampled sources, linear-scaled dependencies, extrapolated ×2n/samples.

    Sampling is a seeded hash order over the node set (deterministic at
    any parallelism) rather than the reference's RNG — same estimator,
    reproducible across cluster sizes. ``portable_hash`` orders by the
    md5-based cross-engine hash (ties by id) so a DuckDB oracle selects
    the identical source set.
    """
    from networkit_spark.functions.porthash import md5_mod

    n = g.num_nodes()
    k = min(n_samples, n)
    order = (
        [md5_mod(F.col("id"), salt=f"eb{seed}:").asc(), F.col("id").asc()]
        if portable_hash
        else [F.xxhash64("id", F.lit(seed)).asc()]
    )
    sampled = (
        g.nodes.orderBy(*order)
        .limit(k)
        .select("id")
        .localCheckpoint(eager=True)
    )
    scores = _brandes(g, sampled, linear_scaling=True, runner=runner)
    scale = 2.0 * n / k
    if normalized:
        scale /= max((n - 1) * (n - 2), 1)
    return scores.select("id", (F.col("score") * F.lit(scale)).alias("score"))


# --------------------------------------------------------------------------
# Closeness family
# --------------------------------------------------------------------------

def closeness_centrality(
    g: Graph,
    variant: str = "standard",
    normalized: bool = False,
    sources: DataFrame | None = None,
    runner: SuperstepRunner | None = None,
    check_connected: bool = True,
) -> DataFrame:
    """Closeness (``Closeness.hpp:78-93``): (id, score).

    ``sources`` restricts which nodes get scores (exact all-nodes by
    default — O(n·m); pass a sample or run on a subgraph at scale).
    Distances are measured FROM the node along out-edges, matching the
    reference's BFS direction.

    Standard closeness is undefined on disconnected graphs; the
    reference (``Closeness.cpp`` checkConnectedComponents) throws there.
    We mirror that: with ``variant="standard"`` and ``check_connected``
    (the default) a root that cannot reach all n-1 other nodes raises
    ``ValueError``. Pass ``check_connected=False`` to deviate knowingly
    (each unreachable node then simply contributes nothing — a node in a
    tiny component can outrank the giant component), or use
    ``variant="generalized"`` which is well-defined on disconnected
    input. The check is one aggregate over the already-computed BFS
    frontier table — no extra connectivity job.
    """
    n = g.num_nodes()
    src = sources if sources is not None else g.nodes
    res = multi_source_bfs(g, src, runner=runner, with_sigma=False)
    agg = (
        res.visited.filter(F.col("dist") > 0)
        .groupBy(F.col("root").alias("id"))
        .agg(F.sum("dist").alias("sum_dist"), F.count(F.lit(1)).alias("reached"))
    )
    if variant == "standard" and check_connected and n > 1:
        # n <= 1 is trivially connected: every root has zero required
        # reach, and `agg` is empty (dist > 0 filters everything), so the
        # full-count comparison below would spuriously raise.
        n_src = src.count()
        full = agg.filter(F.col("reached") == F.lit(n - 1)).count()
        if full != n_src:
            raise ValueError(
                "standard closeness is undefined on disconnected graphs "
                f"({n_src - full} of {n_src} roots do not reach all {n - 1} "
                "other nodes); use variant='generalized' or pass "
                "check_connected=False (documented deviation)"
            )
    if variant == "standard":
        score = F.when(F.col("sum_dist") > 0, 1.0 / F.col("sum_dist")).otherwise(0.0)
        if normalized:
            score = score * F.lit(float(n - 1))
    else:  # generalized (Lin/ Wasserman-Faust form used by the reference)
        score = F.when(
            F.col("sum_dist") > 0,
            F.col("reached") / F.col("sum_dist") / F.lit(float(max(n - 1, 1))),
        ).otherwise(0.0)
        if normalized:
            score = score * F.col("reached")
    out = agg.select("id", score.alias("score"))
    base = src.select(F.col(src.columns[0]).cast("long").alias("id"))
    return base.join(out, "id", "left").select(
        "id", F.coalesce("score", F.lit(0.0)).alias("score")
    )


def harmonic_closeness(
    g: Graph,
    normalized: bool = False,
    sources: DataFrame | None = None,
    runner: SuperstepRunner | None = None,
) -> DataFrame:
    """HarmonicCloseness (``HarmonicCloseness.cpp:25-47``): Σ 1/dist."""
    n = g.num_nodes()
    src = sources if sources is not None else g.nodes
    res = multi_source_bfs(g, src, runner=runner, with_sigma=False)
    agg = (
        res.visited.filter(F.col("dist") > 0)
        .groupBy(F.col("root").alias("id"))
        .agg(F.sum(F.lit(1.0) / F.col("dist")).alias("score"))
    )
    base = src.select(F.col(src.columns[0]).cast("long").alias("id"))
    out = base.join(agg, "id", "left").select(
        "id", F.coalesce("score", F.lit(0.0)).alias("score")
    )
    if normalized:
        out = out.select("id", (F.col("score") / F.lit(float(max(n - 1, 1)))).alias("score"))
    return out


# --------------------------------------------------------------------------
# Diameter
# --------------------------------------------------------------------------

def eccentricities(g: Graph, sources: DataFrame | None = None) -> DataFrame:
    """(id, ecc) — max hop distance to any reached node (``distance/Eccentricity.cpp``)."""
    src = sources if sources is not None else g.nodes
    res = multi_source_bfs(g, src, with_sigma=False)
    return res.visited.groupBy(F.col("root").alias("id")).agg(
        F.max("dist").alias("ecc")
    )


def diameter_exact(g: Graph) -> int:
    """Exact hop diameter of the (largest-reach) graph: max eccentricity.

    All-pairs BFS — O(n·m); the reference's exact mode has the same
    complexity bound (``distance/Diameter.cpp`` exact path).
    """
    row = eccentricities(g).agg(F.max("ecc")).collect()[0]
    return int(row[0] or 0)


def diameter_range(g: Graph, seed: int = 42) -> tuple[int, int]:
    """Two-sweep estimate (``distance/Diameter.cpp:330`` estimatedRange
    semantics, lb/ub pair): BFS from a max-degree node, re-BFS from the
    farthest node found; lb = that eccentricity, ub = 2·lb."""
    from networkit_spark.operators.traversal import bfs

    start = (
        g.degrees()
        .orderBy(F.desc("deg"), F.asc("id"))
        .limit(1)
        .collect()[0]["id"]
    )
    d1 = bfs(g, int(start))
    far = d1.orderBy(F.desc("dist"), F.asc("node")).limit(1).collect()[0]["node"]
    d2 = bfs(g, int(far))
    lb = int(d2.agg(F.max("dist")).collect()[0][0] or 0)
    return lb, 2 * lb


def bidirectional_bfs(g: Graph, source: int, target: int) -> float:
    """Point-to-point hop distance (``distance/BidirectionalBFS.cpp``):
    expand the SMALLER of two frontiers — forward from ``source``, and
    backward along in-edges from ``target`` — until the best meeting sum
    can no longer improve. Returns inf when unreachable.

    An s-t query touches O(b^(d/2)) nodes per side instead of a full
    SSSP's O(b^d); every expansion is the same one-hop frontier join as
    ``multi_source_bfs``, so the plan shape (and its scaling) is
    unchanged — only the touched volume shrinks.
    """
    if int(source) == int(target):
        return 0.0
    spark = g.edges.sparkSession
    fwd = (g.symmetrized_edges() if g.directed else g.edges).select("src", "dst")
    bwd = fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    fwd = fwd.transform(pin)
    bwd = bwd.transform(pin)

    def init(node: int) -> DataFrame:
        return spark.createDataFrame([(int(node), 0)], "node long, dist long")

    vis = {"a": init(source), "b": init(target)}
    frontier = {"a": vis["a"], "b": vis["b"]}
    fsize = {"a": 1, "b": 1}
    edges = {"a": fwd, "b": bwd}
    depth = {"a": 0, "b": 0}
    best = float("inf")
    while True:
        # stop: any undiscovered meeting point costs ≥ depth_a+1 + depth_b+1
        if best <= depth["a"] + depth["b"] + 1:
            return best
        if fsize["a"] == 0 or fsize["b"] == 0:
            return best
        side = "a" if fsize["a"] <= fsize["b"] else "b"
        other = "b" if side == "a" else "a"
        depth[side] += 1
        nxt = (
            edges[side]
            .join(frontier[side].withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(vis[side], "node", "left_anti")
            .select("node", F.lit(depth[side]).alias("dist"))
            .transform(pin)
        )
        fsize[side] = nxt.count()
        frontier[side] = nxt
        vis[side] = vis[side].unionByName(nxt).transform(pin)
        meet = (
            nxt.join(
                vis[other].withColumnRenamed("dist", "od"), "node"
            )
            .agg(F.min(F.col("dist") + F.col("od")))
            .collect()[0][0]
        )
        if meet is not None:
            best = min(best, float(meet))


def bidirectional_dijkstra(g: Graph, source: int, target: int) -> float:
    """Weighted point-to-point distance
    (``distance/BidirectionalDijkstra.cpp:30-150`` contract: the μ ≤
    top_f + top_b stopping rule on two alternating Dijkstra balls;
    returns inf when unreachable).

    Batch analogue: alternate one relax round on the side with the
    smaller open frontier, keep the best meeting sum μ, and prune every
    tentative label ≥ μ — with non-negative weights a pruned label can
    never improve a meeting, so the touched volume is the two balls of
    radius ≈ μ/2 instead of one full SSSP ball of radius μ. Each round
    is the same frontier⋈edges + min-agg shuffle as ``sssp``, so the
    plan scales identically; only the frontier volume shrinks.
    """
    if int(source) == int(target):
        return 0.0
    spark = g.edges.sparkSession
    fwd = (g.symmetrized_edges() if g.directed else g.edges).select(
        "src", "dst", "weight"
    )
    bwd = fwd.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
    )
    edges = {"a": fwd.transform(pin), "b": bwd.transform(pin)}

    def init(node: int) -> DataFrame:
        return spark.createDataFrame(
            [(int(node), 0.0)], "node long, dist double"
        ).localCheckpoint(eager=True)

    dist = {"a": init(source), "b": init(target)}
    frontier = dict(dist)
    fsize = {"a": 1, "b": 1}
    best = float("inf")
    cap = 2 * (g.num_nodes() + 1)
    for _ in range(cap):
        if fsize["a"] == 0 and fsize["b"] == 0:
            return best
        side = (
            "a"
            if (fsize["b"] == 0 or (fsize["a"] != 0 and fsize["a"] <= fsize["b"]))
            else "b"
        )
        other = "b" if side == "a" else "a"
        relax = (
            edges[side]
            .join(frontier[side].withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min(F.col("dist") + F.col("weight")).alias("cand"))
        )
        if best != float("inf"):
            relax = relax.filter(F.col("cand") < F.lit(best))
        merged = (
            dist[side]
            .join(relax, "node", "full")
            .select(
                "node",
                F.least(
                    F.coalesce("dist", F.lit(float("inf"))),
                    F.coalesce("cand", F.lit(float("inf"))),
                ).alias("dist"),
                (F.col("dist").isNull() | (F.col("cand") < F.col("dist"))).alias(
                    "imp"
                ),
            )
            .transform(pin)
        )
        frontier[side] = merged.filter("imp").select("node", "dist")
        fsize[side] = frontier[side].count()
        dist[side] = merged.select("node", "dist")
        if fsize[side]:
            meet = (
                frontier[side]
                .join(dist[other].withColumnRenamed("dist", "od"), "node")
                .agg(F.min(F.col("dist") + F.col("od")))
                .collect()[0][0]
            )
            if meet is not None:
                best = min(best, float(meet))
    return best


# --------------------------------------------------------------------------
# Weighted SSSP (Bellman-Ford relax loop)
# --------------------------------------------------------------------------

def sssp(
    g: Graph,
    source: int,
    max_rounds: int | None = None,
    runner: SuperstepRunner | None = None,
) -> DataFrame:
    """Weighted single-source shortest paths: (node, dist DOUBLE).

    Same fixed point as ``distance/Dijkstra.cpp:93`` for non-negative
    weights; executed as the join-agg Bellman-Ford relax loop (each round
    one frontier⋈edges shuffle + a min-agg). Only IMPROVED nodes re-relax
    — the frontier shrinks like delta-stepping's light buckets. Converges
    in ≤ hop-diameter rounds on non-negative weights; raises after
    |V| rounds otherwise (negative cycle guard). Unreachable = absent.
    """
    spark = g.edges.sparkSession
    runner = runner or SuperstepRunner(spark)
    max_rounds = max_rounds or (g.num_nodes() + 1)
    bcast_rows = broadcast_row_limit()

    dist = spark.createDataFrame(
        [(int(source), 0.0)], "node long, dist double"
    ).localCheckpoint(eager=True)
    frontier = dist
    frontier_rows = 1

    rounds = 0
    while rounds < max_rounds:
        rounds += 1
        # relax over the shared memoized layout (guide §2.4): broadcast
        # the improved-frontier while it is small — the join preserves
        # the dst partitioning, so the min-aggregate by dst needs no
        # Exchange; shuffled-hash over the src layout otherwise.
        fr = frontier.withColumnRenamed("node", "src")
        if frontier_rows <= bcast_rows:
            e = partitioned_edges(g.edges, "dst")
            fr = F.broadcast(fr)
        else:
            e = partitioned_edges(g.edges, "src")
            fr = fr.hint("shuffle_hash")
        relax = (
            e.select("src", "dst", "weight")
            .join(fr, "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min(F.col("dist") + F.col("weight")).alias("cand"))
        )
        merged = (
            dist.join(relax, "node", "full")
            .select(
                "node",
                F.least(
                    F.coalesce("dist", F.lit(float("inf"))),
                    F.coalesce("cand", F.lit(float("inf"))),
                ).alias("dist"),
                (
                    F.col("dist").isNull()
                    | (F.col("cand") < F.col("dist"))
                ).alias("improved"),
            )
        )
        merged = runner.persist_step(merged, rounds)
        n_improved = merged.filter("improved").count()
        runner.record(rounds, improved=n_improved)
        frontier = merged.filter("improved").select("node", "dist")
        frontier_rows = n_improved
        dist = merged.select("node", "dist")
        if n_improved == 0:
            return dist
    raise RuntimeError(
        f"sssp did not converge in {max_rounds} rounds (negative cycle?)"
    )


def multi_source_sssp(
    g: Graph,
    sources: DataFrame,
    runner: SuperstepRunner | None = None,
    max_rounds: int | None = None,
) -> DataFrame:
    """Weighted distances from every source at once: (root, node, dist).

    The (root, node)-keyed Bellman-Ford relax loop — the batched weighted
    analogue of ``multi_source_bfs`` (Dijkstra semantics at the fixed
    point for non-negative weights). Only improved (root, node) states
    re-relax each round.
    """
    spark = g.edges.sparkSession
    runner = runner or SuperstepRunner(spark)
    max_rounds = max_rounds or (g.num_nodes() + 1)

    bcast_rows = broadcast_row_limit()
    roots = sources.select(F.col(sources.columns[0]).cast("long").alias("root"))
    dist = roots.select(
        "root", F.col("root").alias("node"), F.lit(0.0).alias("dist")
    ).localCheckpoint(eager=True)
    frontier = dist
    frontier_rows = dist.count()

    for rnd in range(1, max_rounds + 1):
        # same adaptive layout/broadcast policy as ``sssp`` (guide §2.4)
        fr = frontier.withColumnRenamed("node", "src")
        if frontier_rows <= bcast_rows:
            e = partitioned_edges(g.edges, "dst")
            fr = F.broadcast(fr)
        else:
            e = partitioned_edges(g.edges, "src")
            fr = fr.hint("shuffle_hash")
        relax = (
            e.select("src", "dst", "weight")
            .join(fr, "src")
            .groupBy("root", F.col("dst").alias("node"))
            .agg(F.min(F.col("dist") + F.col("weight")).alias("cand"))
        )
        merged = (
            dist.join(relax, ["root", "node"], "full")
            .select(
                "root",
                "node",
                F.least(
                    F.coalesce("dist", F.lit(float("inf"))),
                    F.coalesce("cand", F.lit(float("inf"))),
                ).alias("dist"),
                (F.col("dist").isNull() | (F.col("cand") < F.col("dist"))).alias(
                    "improved"
                ),
            )
        )
        merged = runner.persist_step(merged, rnd)
        n_improved = merged.filter("improved").count()
        runner.record(rnd, improved=n_improved)
        frontier = merged.filter("improved").select("root", "node", "dist")
        frontier_rows = n_improved
        dist = merged.select("root", "node", "dist")
        if n_improved == 0:
            return dist
    raise RuntimeError(f"multi_source_sssp did not converge in {max_rounds} rounds")


def closeness_centrality_weighted(
    g: Graph,
    variant: str = "standard",
    normalized: bool = False,
    sources: DataFrame | None = None,
) -> DataFrame:
    """Weighted closeness (``Closeness.cpp`` dijkstra path, same
    updateScoreData math over weighted distances)."""
    n = g.num_nodes()
    src = sources if sources is not None else g.nodes
    vis = multi_source_sssp(g, src)
    agg = (
        vis.filter(F.col("dist") > 0)
        .groupBy(F.col("root").alias("id"))
        .agg(F.sum("dist").alias("sum_dist"), F.count(F.lit(1)).alias("reached"))
    )
    if variant == "standard":
        score = F.when(F.col("sum_dist") > 0, 1.0 / F.col("sum_dist")).otherwise(0.0)
        if normalized:
            score = score * F.lit(float(n - 1))
    else:
        score = F.when(
            F.col("sum_dist") > 0,
            F.col("reached") / F.col("sum_dist") / F.lit(float(max(n - 1, 1))),
        ).otherwise(0.0)
        if normalized:
            score = score * F.col("reached")
    base = src.select(F.col(src.columns[0]).cast("long").alias("id"))
    return base.join(agg.select("id", score.alias("score")), "id", "left").select(
        "id", F.coalesce("score", F.lit(0.0)).alias("score")
    )


def betweenness_weighted(
    g: Graph,
    sources: DataFrame | None = None,
    normalized: bool = False,
    n_samples: int | None = None,
    seed: int = 42,
    eps: float = 1e-9,
) -> DataFrame:
    """Weighted Brandes betweenness (``Betweenness.cpp`` with Dijkstra
    SSSP): multi-source Bellman-Ford distances, then σ and δ as DAG
    fixed points.

    The shortest-path DAG has edge p→t iff dist(p) + w(p,t) = dist(t)
    (tolerance ``eps``). σ propagates forward (σ_t = Σ_preds σ_p),
    δ backward (δ_p = Σ_succs (σ_p/σ_t)(1+δ_t)); both iterate to their
    fixed point in ≤ DAG-depth rounds — the weighted analogue of the
    hop-level sweep, O(depth) shuffles for ALL roots at once.
    """
    spark = g.edges.sparkSession
    n = g.num_nodes()
    if sources is None:
        if n_samples is not None:
            k = min(n_samples, n)
            sources = (
                g.nodes.orderBy(F.xxhash64("id", F.lit(seed)))
                .limit(k)
                .select("id")
                .transform(pin)
            )
        else:
            sources = g.nodes
    dist = multi_source_sssp(g, sources).transform(pin)

    # Zero-weight edges between equal-distance nodes would put BOTH
    # orientations into the "DAG", creating a cycle that the σ/δ fixed
    # points never escape (σ→inf, then inf-inf = NaN silently passes the
    # convergence test). Require strictly positive weights up front.
    min_w = g.edges.agg(F.min("weight")).collect()[0][0]
    if min_w is not None and min_w <= eps:
        raise ValueError(
            f"betweenness_weighted requires strictly positive edge weights "
            f"(> eps={eps}); found min weight {min_w}"
        )

    # shortest-path DAG edges per root
    e = g.edges.select("src", "dst", "weight")
    dag = (
        e.join(dist.select("root", F.col("node").alias("src"), F.col("dist").alias("dp")), "src")
        .join(
            dist.select("root", F.col("node").alias("dst"), F.col("dist").alias("dt")),
            ["root", "dst"],
        )
        .filter(F.abs(F.col("dp") + F.col("weight") - F.col("dt")) <= eps)
        .select("root", "src", "dst")
        .transform(pin)
    )

    # sigma forward fixed point (roots pinned at 1 via an explicit flag —
    # a value-based test would freeze any node whose sigma reaches 1)
    sigma = dist.select(
        "root",
        "node",
        (F.col("dist") == 0.0).alias("is_root"),
        F.when(F.col("dist") == 0.0, 1.0).otherwise(0.0).alias("sigma"),
    ).transform(pin)
    # DAG depth ≤ n on positive weights; a non-terminating loop here means
    # the "DAG" had a cycle — raise like sssp does instead of spinning.
    sigma_rounds = 0
    while True:
        sigma_rounds += 1
        if sigma_rounds > n + 1:
            raise RuntimeError(
                "betweenness_weighted sigma loop did not converge in "
                f"{n + 1} rounds (cycle in shortest-path DAG?)"
            )
        prop = (
            dag.join(
                sigma.select("root", F.col("node").alias("src"), "sigma").hint(
                    "shuffle_hash"
                ),
                ["root", "src"],
            )
            .groupBy("root", F.col("dst").alias("node"))
            .agg(F.sum("sigma").alias("s_in"))
        )
        new_sigma = (
            sigma.join(prop, ["root", "node"], "left")
            .select(
                "root",
                "node",
                "is_root",
                F.col("sigma").alias("old"),
                F.when(F.col("is_root"), F.lit(1.0))
                .otherwise(F.coalesce("s_in", F.lit(0.0)))
                .alias("sigma"),
            )
        )
        new_sigma = new_sigma.transform(pin)
        changed = new_sigma.filter(
            F.abs(F.col("sigma") - F.col("old")) > 1e-12
        ).count()
        sigma = new_sigma.select("root", "node", "is_root", "sigma")
        if changed == 0:
            break
    sigma = sigma.select("root", "node", "sigma")

    # delta backward fixed point
    delta = sigma.select("root", "node", F.lit(0.0).alias("delta")).localCheckpoint(
        eager=True
    )
    sig_t = sigma.select("root", F.col("node").alias("dst"), F.col("sigma").alias("st"))
    sig_p = sigma.select("root", F.col("node").alias("src"), F.col("sigma").alias("sp"))
    delta_rounds = 0
    while True:
        delta_rounds += 1
        if delta_rounds > n + 1:
            raise RuntimeError(
                "betweenness_weighted delta loop did not converge in "
                f"{n + 1} rounds (cycle in shortest-path DAG?)"
            )
        back = (
            dag.join(
                delta.withColumnRenamed("node", "dst").hint("shuffle_hash"),
                ["root", "dst"],
            )
            .join(sig_t, ["root", "dst"])
            .join(sig_p, ["root", "src"])
            .groupBy("root", F.col("src").alias("node"))
            .agg(
                F.sum(
                    (F.col("sp") / F.col("st")) * (F.lit(1.0) + F.col("delta"))
                ).alias("d_new")
            )
        )
        new_delta = (
            delta.join(back, ["root", "node"], "left")
            .select(
                "root",
                "node",
                F.col("delta").alias("old"),
                F.coalesce("d_new", F.lit(0.0)).alias("delta"),
            )
        )
        new_delta = new_delta.transform(pin)
        changed = new_delta.filter(F.abs(F.col("delta") - F.col("old")) > 1e-12).count()
        delta = new_delta.select("root", "node", "delta")
        if changed == 0:
            break

    scores = (
        delta.join(dist, ["root", "node"])
        .filter(F.col("dist") > 0)  # t != s
        .groupBy(F.col("node").alias("id"))
        .agg(F.sum("delta").alias("score"))
    )
    out = g.nodes.join(scores, "id", "left").select(
        "id", F.coalesce("score", F.lit(0.0)).alias("score")
    )
    if normalized:
        pairs = max((n - 1) * (n - 2), 1)
        out = out.select("id", (F.col("score") / F.lit(float(pairs))).alias("score"))
    if n_samples is not None and sources is not None:
        pass
    return out


def edge_betweenness(
    g: Graph,
    normalized: bool = False,
    runner: SuperstepRunner | None = None,
) -> DataFrame:
    """(src, dst, score) — exact per-edge Brandes betweenness
    (``Betweenness.cpp`` computeEdgeCentrality; normalized divides by
    n·(n−1)). Undirected edges are canonical (src < dst) with both
    orientations folded, matching the shared edge id in the reference."""
    _, es = _brandes(g, g.nodes, linear_scaling=False, runner=runner, edge_scores=True)
    if normalized:
        n = g.num_nodes()
        pairs = max(n * (n - 1), 1)
        es = es.select("src", "dst", (F.col("score") / F.lit(float(pairs))).alias("score"))
    return es


def sssp_update_additions(
    g_new: Graph,
    old_dist: DataFrame,
    added_edges: DataFrame,
    runner: SuperstepRunner | None = None,
    max_rounds: int | None = None,
) -> DataFrame:
    """DynDijkstra/DynBFS edge-ADDITION path (``distance/DynDijkstra.cpp``
    semantics): additions only ever IMPROVE distances, so instead of a
    from-scratch run the relax loop is seeded with just the endpoints
    whose distance the new edges improved — O(affected region) work,
    like the reference's priority-queue repair. Removals invalidate this
    monotonicity; recompute via ``sssp`` (the reference's removal path
    is likewise the expensive one).

    ``old_dist``: (node, dist) from the pre-update run (reached only).
    ``added_edges``: (src, dst, weight) NEW edges (one orientation for
    undirected graphs is fine — both directions are seeded).
    """
    spark = g_new.edges.sparkSession
    runner = runner or SuperstepRunner(spark)
    max_rounds = max_rounds or (g_new.num_nodes() + 1)

    add = added_edges.select("src", "dst", "weight")
    if not g_new.directed:
        add = add.unionByName(
            add.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
            )
        )
    seed_cand = (
        add.join(old_dist.withColumnRenamed("node", "src"), "src")
        .groupBy(F.col("dst").alias("node"))
        .agg(F.min(F.col("dist") + F.col("weight")).alias("cand"))
    )
    merged = (
        old_dist.join(seed_cand, "node", "full")
        .select(
            "node",
            F.least(
                F.coalesce("dist", F.lit(float("inf"))),
                F.coalesce("cand", F.lit(float("inf"))),
            ).alias("dist"),
            (F.col("dist").isNull() | (F.col("cand") < F.col("dist"))).alias("improved"),
        )
        .transform(pin)
    )
    dist = merged.select("node", "dist")
    frontier = merged.filter("improved").select("node", "dist")
    if frontier.limit(1).count() == 0:
        return dist

    edges = g_new.edges.select("src", "dst", "weight").repartition("src").cache()
    edges.count()
    for rnd in range(1, max_rounds + 1):
        relax = (
            edges.join(
                frontier.withColumnRenamed("node", "src").hint("shuffle_hash"), "src"
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min(F.col("dist") + F.col("weight")).alias("cand"))
        )
        merged = (
            dist.join(relax, "node", "full")
            .select(
                "node",
                F.least(
                    F.coalesce("dist", F.lit(float("inf"))),
                    F.coalesce("cand", F.lit(float("inf"))),
                ).alias("dist"),
                (F.col("dist").isNull() | (F.col("cand") < F.col("dist"))).alias(
                    "improved"
                ),
            )
        )
        merged = runner.persist_step(merged, rnd)
        n_improved = merged.filter("improved").count()
        runner.record(rnd, improved=n_improved)
        frontier = merged.filter("improved").select("node", "dist")
        dist = merged.select("node", "dist")
        if n_improved == 0:
            return dist
    raise RuntimeError("sssp_update_additions did not converge")


def volume(
    g: Graph,
    r: float | list[float],
    samples: int = 500,
    seed: int = 42,
    portable_hash: bool = False,
) -> float | list[float]:
    """Volume (``distance/Volume.cpp``): the expected number of nodes
    within weighted distance ``r`` of a random node, estimated from
    ``samples`` seeded sources (a list of radii reuses ONE ball
    computation at r_max, the reference's batched variant).

    All sampled balls grow together: one (root, node, dist) state table
    relaxed frontier-by-frontier with dist ≤ r_max pruning — the same
    shared-shuffle shape as multi_source_bfs, only the ball volume
    flows, never per-sample jobs."""
    from networkit_spark.functions.porthash import md5_mod
    from networkit_spark.ids import assign_dense_ids

    spark = g.edges.sparkSession
    rs = [float(x) for x in (r if isinstance(r, (list, tuple)) else [r])]
    rmax = max(rs)
    n = g.num_nodes()
    if n == 0:
        out = [0.0 for _ in rs]
        return out if isinstance(r, (list, tuple)) else out[0]
    k = min(int(samples), 10 ** 6)
    mapping = assign_dense_ids(
        g.nodes.select(F.col("id").alias("key")), ["key"]
    ).transform(pin)
    samp = spark.range(k).select(F.col("id").alias("sid"))
    if portable_hash:
        idx = F.pmod(md5_mod(F.col("sid"), salt=f"vol{seed}:"), F.lit(n))
    else:
        idx = F.pmod(F.xxhash64(F.lit(seed), F.col("sid")), F.lit(n))
    roots = samp.select(F.col("sid").alias("root"), idx.alias("idx")).join(
        F.broadcast(mapping.select(F.col("id").alias("idx"), F.col("key").alias("node"))),
        "idx",
    ).select("root", "node")
    edges = (g.symmetrized_edges() if g.directed else g.edges).select(
        "src", "dst", "weight"
    ).transform(pin)
    dist = roots.select("root", "node", F.lit(0.0).alias("dist")).transform(pin)
    frontier = dist
    while True:
        relax = (
            frontier.withColumnRenamed("node", "src")
            .join(edges, "src")
            .groupBy("root", F.col("dst").alias("node"))
            .agg(F.min(F.col("dist") + F.col("weight")).alias("cand"))
            .filter(F.col("cand") <= F.lit(rmax))
        )
        merged = (
            dist.join(relax, ["root", "node"], "full")
            .select(
                "root",
                "node",
                F.least(
                    F.coalesce("dist", F.lit(float("inf"))),
                    F.coalesce("cand", F.lit(float("inf"))),
                ).alias("dist"),
                (F.col("dist").isNull() | (F.col("cand") < F.col("dist"))).alias("imp"),
            )
            .transform(pin)
        )
        frontier = merged.filter("imp").select("root", "node", "dist")
        dist = merged.select("root", "node", "dist")
        if frontier.isEmpty():
            break
    counts = [
        float(
            dist.filter(F.col("dist") <= F.lit(rv)).count()
        ) / float(k)
        for rv in rs
    ]
    return counts if isinstance(r, (list, tuple)) else counts[0]


def k_path_centrality(
    g: Graph,
    alpha: float = 0.2,
    k: int | None = None,
    seed: int = 42,
    t: int | None = None,
    portable_hash: bool = False,
) -> DataFrame:
    """KPathCentrality (``centrality/KPathCentrality.cpp``): t =
    ⌊2k²·n^(1−2α)·ln n⌋ random SELF-AVOIDING walks, each from a random
    source with random length ℓ ∈ [1, k]; every node visited on a walk
    step earns a count, and score(v) = k·n·count(v)/t. α ∈ [−0.5, 0.5]
    trades samples for accuracy; k defaults to ⌊ln(n+m)⌋ like the
    reference.

    All t walks advance TOGETHER: the state is one (walk, cur, ℓ, path)
    table, and each of the ≤ k steps is one frontier⋈edges join with an
    `array_contains` self-avoidance filter and a seeded uniform choice
    among the surviving neighbors (reference draws from its serial RNG;
    the hash draw is the module-wide determinization — uniform over the
    same candidate set). Weighted graphs pick ∝ 1/w via the cumulative
    trick. Only O(t)-row state shuffles per step; the edge relation is
    the single O(m) side."""
    import math as _math

    from networkit_spark.functions.porthash import md5_mod
    from networkit_spark.ids import assign_dense_ids

    if not (-0.5 <= alpha <= 0.5):
        raise ValueError("alpha must lie in interval [-0.5, 0.5]")
    spark = g.edges.sparkSession
    n = g.num_nodes()
    zeros = g.nodes.select("id", F.lit(0.0).alias("score"))
    if n < 2:
        return zeros
    m = g.edges.count()
    if k is None:
        k = max(1, int(_math.log(float(n + m))))
    k = int(k)
    if t is None:
        t = int(2.0 * k * k * (float(n) ** (1 - 2 * alpha)) * _math.log(float(n)))
    t = max(1, int(t))

    mapping = assign_dense_ids(
        g.nodes.select(F.col("id").alias("key")), ["key"]
    ).transform(pin)
    walks = spark.range(t).select((F.col("id") + 1).alias("wid"))
    if portable_hash:
        sidx = F.pmod(md5_mod(F.col("wid"), salt=f"kp{seed}:s:"), F.lit(n))
        ell = F.pmod(md5_mod(F.col("wid"), salt=f"kp{seed}:l:"), F.lit(k)) + 1
    else:
        sidx = F.pmod(F.xxhash64(F.lit(seed), F.lit(0), F.col("wid")), F.lit(n))
        ell = F.pmod(F.xxhash64(F.lit(seed), F.lit(1), F.col("wid")), F.lit(k)) + 1
    state = (
        walks.select("wid", sidx.alias("sidx"), ell.alias("l"))
        .join(
            F.broadcast(
                mapping.select(F.col("id").alias("sidx"), F.col("key").alias("cur"))
            ),
            "sidx",
        )
        .select("wid", "l", "cur", F.array(F.col("cur")).alias("path"))
        .transform(pin)
    )
    edges = (g.symmetrized_edges() if g.directed else g.edges).select(
        F.col("src").alias("cur"), F.col("dst").alias("nxt"), "weight"
    )
    contribs = []
    for j in range(1, k + 1):
        active = state.filter(F.col("l") >= j)
        if active.isEmpty():
            break
        cand = active.join(edges, "cur").filter(
            ~F.array_contains(F.col("path"), F.col("nxt"))
        )
        w_ord = Window.partitionBy("wid").orderBy("nxt")
        w_all = Window.partitionBy("wid")
        if portable_hash:
            draw = md5_mod(F.col("wid"), salt=f"kp{seed}:c:{j}:")
        else:
            draw = F.pmod(
                F.xxhash64(F.lit(seed), F.lit(2), F.col("wid"), F.lit(j)),
                F.lit(1 << 31),
            )
        if g.weighted:
            M = 1_000_003
            x = F.pmod(draw, F.lit(M)) / F.lit(float(M))
            picked = (
                cand.withColumn("iw", 1.0 / F.col("weight"))
                .withColumn("cum", F.sum("iw").over(w_ord))
                .withColumn("tot", F.sum("iw").over(w_all))
                .filter(F.col("cum") / F.col("tot") > x)
                .withColumn("rn", F.row_number().over(w_ord))
                .filter(F.col("rn") == 1)
            )
        else:
            picked = (
                cand.withColumn("cnt", F.count(F.lit(1)).over(w_all))
                .withColumn("rn", F.row_number().over(w_ord))
                .filter(F.col("rn") == F.pmod(draw, F.col("cnt")) + 1)
            )
        state = picked.select(
            "wid",
            "l",
            F.col("nxt").alias("cur"),
            F.array_append("path", F.col("nxt")).alias("path"),
        ).transform(pin)
        contribs.append(state.select(F.col("cur").alias("id")))

    if not contribs:
        return zeros
    allc = contribs[0]
    for c in contribs[1:]:
        allc = allc.unionByName(c)
    counts = allc.groupBy("id").agg(F.count(F.lit(1)).alias("c"))
    # reference: scoreData[v] = k * n * (counter[v] / t)
    score = F.lit(float(k) * float(n)) * (
        F.col("c").cast("double") / F.lit(float(t))
    )
    return g.nodes.join(counts, "id", "left").select(
        "id", F.coalesce(score, F.lit(0.0)).alias("score")
    )


def approx_closeness(
    g: Graph,
    n_samples: int,
    epsilon: float = 0.0,
    seed: int = 42,
    normalized: bool = False,
    runner: SuperstepRunner | None = None,
    portable_hash: bool = False,
) -> DataFrame:
    """ApproxCloseness (``centrality/ApproxCloseness.cpp:70-160``, the
    Cohen-Kaplan pivoting estimator, undirected path): (id, score) with
    sampled nodes scored EXACTLY and every other node scored by the
    close/far hybrid estimator.

    The reference sweeps each pivot's distance order sequentially,
    deferring far nodes into per-pivot lists and threshold bins. That
    order-dependent machinery reduces to set semantics, which is what
    runs here — one batched multi-source BFS plus joins:

    - S = ``n_samples`` seeded hash-drawn nodes; D(i, u) from one
      shared-frontier BFS (k SSSPs when weighted);
    - pivot(u) = the closest sample (ties → smallest sample id — the
      reference's simultaneous-Dijkstra pop order is unspecified),
      delta(u) = that distance;
    - a (u, i) contribution is CLOSE (exact) iff
      D(i,u) ≤ delta(u)·(1/ε − 1) OR D(i, s_pivot(u)) ≤ delta(u)/ε;
      otherwise it is FAR and counted (HC) only when the pivot-sample
      comes at-or-after u in i's distance order (DP ≥ D) — far pairs
      whose pivot was swept earlier land in an already-flushed list in
      the reference and are silently dropped, which is mirrored. This is
      algebraically equivalent to the defer-and-flush branches; ε=0
      makes every reached pair CLOSE (the Eppstein-Wang estimator);
    - HSum(u)/HNum(u) = the tail Σ/# of D(p, w) over non-sample w with
      D(p, w) > D(p, u)/ε, p = pivot(u) (the reference's bin suffix
      sums, without their 1e-9 bin-merge tolerance — documented
      deviation);
    - farness(u) = HSum + HCSum + LCSum/p̂, p̂ = LCNum/LNum,
      LNum = n − 1 − HNum − k + LCNum (ApproxCloseness.cpp:92-104);
      sampled nodes use their exact BFS farness; nodes reaching no
      sample score 0 (the reference emits NaN there — documented
      deviation);
    - score = (n−1)/farness if ``normalized`` else 1/farness.

    Scale shape: the BFS levels are the only O(m) shuffles; every
    estimator table is (node)- or (node, sample)-keyed, and the tail
    suffix table is |pivots|·diameter rows. ``portable_hash`` draws the
    sample set by the md5 porthash so a SQL oracle replays it.
    """
    from networkit_spark.functions.porthash import md5_mod

    spark = g.edges.sparkSession
    n = g.num_nodes()
    zeros = g.nodes.select("id", F.lit(0.0).alias("score"))
    if n < 2:
        return zeros
    k = min(int(n_samples), n)
    order = (
        [md5_mod(F.col("id"), salt=f"ac{seed}:").asc(), F.col("id").asc()]
        if portable_hash
        else [F.xxhash64("id", F.lit(seed)).asc()]
    )
    samples = (
        g.nodes.orderBy(*order).limit(k).select("id").localCheckpoint(eager=True)
    )

    if g.weighted:
        vis = (
            multi_source_sssp(g, samples, runner=runner)
            .select("root", "node", "dist")
            .localCheckpoint(eager=True)
        )
    else:
        vis = (
            multi_source_bfs(g, samples, runner=runner, with_sigma=False)
            .visited.select("root", "node", F.col("dist").cast("double").alias("dist"))
            .localCheckpoint(eager=True)
        )

    # exact farness for the samples themselves
    exact = (
        vis.groupBy(F.col("root").alias("id"))
        .agg(F.sum("dist").alias("farness"))
    )

    # closest pivot per node (reached nodes only)
    w_piv = Window.partitionBy("node").orderBy(F.asc("dist"), F.asc("root"))
    piv = (
        vis.withColumn("rn", F.row_number().over(w_piv))
        .filter("rn = 1")
        .select("node", F.col("root").alias("pivot"), F.col("dist").alias("delta"))
        .transform(pin)
    )

    nonsample = vis.join(
        samples.withColumnRenamed("id", "node"), "node", "left_anti"
    )
    pairs = nonsample.join(piv, "node")
    if epsilon > 0:
        dp = vis.join(
            samples.withColumnRenamed("id", "node"), "node", "left_semi"
        ).select(
            F.col("root").alias("i"),
            F.col("node").alias("ps"),
            F.col("dist").alias("dp"),
        )
        pairs = pairs.join(
            dp.withColumnRenamed("i", "root").withColumnRenamed("ps", "pivot"),
            ["root", "pivot"],
            "left",
        )
        lc = (F.col("dist") <= F.col("delta") * F.lit(1.0 / epsilon - 1.0)) | (
            F.col("dp") <= F.col("delta") / F.lit(epsilon)
        )
        # far pairs whose pivot-sample was reached BEFORE them in the
        # reference's sweep (DP < D) land in an already-flushed list and
        # are silently dropped there (ApproxCloseness.cpp runOnPivot) —
        # mirrored here; the DP == D tie (sweep order unspecified)
        # determinizes to "counted" (HC)
        hc = (~lc) & (F.col("dp") >= F.col("dist"))
    else:
        lc = F.lit(True)
        hc = F.lit(False)
    cls = pairs.select("node", "pivot", "delta", "dist", lc.alias("lc"), hc.alias("hc"))
    per_node = cls.groupBy("node").agg(
        F.sum(F.when(F.col("lc"), F.col("dist")).otherwise(0.0)).alias("lcsum"),
        F.sum(F.when(F.col("lc"), 1).otherwise(0)).alias("lcnum"),
        F.sum(F.when(F.col("hc"), F.col("dist")).otherwise(0.0)).alias("hcsum"),
        F.min("delta").alias("delta"),
        F.min("pivot").alias("pivot"),
    )

    if epsilon > 0:
        # per-pivot suffix sums over the non-sample distance levels
        lev = (
            nonsample.groupBy(F.col("root").alias("pivot"), F.col("dist").alias("dval"))
            .agg(F.sum("dist").alias("dsum"), F.count(F.lit(1)).alias("dcnt"))
        )
        w_suf = (
            Window.partitionBy("pivot")
            .orderBy(F.desc("dval"))
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        suffix = lev.select(
            "pivot",
            "dval",
            F.sum("dsum").over(w_suf).alias("ssum"),
            F.sum("dcnt").over(w_suf).alias("scnt"),
        ).transform(pin)
        w_h = Window.partitionBy("node").orderBy(F.asc("dval"))
        htab = (
            per_node.select(
                "node", "pivot", (F.col("delta") / F.lit(epsilon)).alias("thr")
            )
            .join(suffix, "pivot")
            .filter(F.col("dval") > F.col("thr"))
            .withColumn("rn", F.row_number().over(w_h))
            .filter("rn = 1")
            .select("node", F.col("ssum").alias("hsum"), F.col("scnt").alias("hnum"))
        )
    else:
        htab = per_node.select(
            "node", F.lit(0.0).alias("hsum"), F.lit(0).alias("hnum")
        ).limit(0)

    lnum = (
        F.lit(float(n - 1))
        - F.coalesce("hnum", F.lit(0)).cast("double")
        - F.lit(float(k))
        + F.col("lcnum").cast("double")
    )
    est = (
        per_node.join(htab, "node", "left")
        .select(
            F.col("node").alias("id"),
            F.when(
                F.col("lcnum") > 0,
                F.coalesce("hsum", F.lit(0.0))
                + F.col("hcsum")
                + F.col("lcsum") / (F.col("lcnum").cast("double") / lnum),
            ).alias("farness"),
        )
    )
    farness = est.unionByName(exact)
    num = F.lit(float(n - 1)) if normalized else F.lit(1.0)
    out = g.nodes.join(farness, "id", "left").select(
        "id",
        F.when(
            F.col("farness").isNotNull() & (F.col("farness") > 0),
            num / F.col("farness"),
        )
        .otherwise(0.0)
        .alias("score"),
    )
    return out


def top_closeness(g: Graph, k: int = 10, harmonic: bool = False) -> DataFrame:
    """TopCloseness / TopHarmonicCloseness (``centrality/TopCloseness.cpp``
    result contract): top-k nodes by (harmonic) closeness, ties by id.
    The reference prunes BFS work with upper bounds; at DataFrame scale
    the batched multi-source BFS already shares all sources' work, so
    top-k is a sort-limit over the scores."""
    scores = (
        harmonic_closeness(g)
        if harmonic
        else closeness_centrality(g, check_connected=False)
    )
    return scores.orderBy(F.desc("score"), F.asc("id")).limit(k)


def kadabra_betweenness(
    g: Graph,
    epsilon: float = 0.1,
    delta: float = 0.1,
    seed: int = 42,
    batch_size: int | None = None,
    max_rounds: int = 64,
    runner: SuperstepRunner | None = None,
    portable_hash: bool = False,
) -> DataFrame:
    """Adaptive-sampling betweenness
    (``centrality/KadabraBetweenness.cpp:40-200`` absolute-error mode):
    (id, score) with P(∀v: |score(v) − b(v)/(n(n−1))| ≤ ε) ≥ 1 − δ.

    Where :func:`approx_betweenness` fixes the sample count from the
    worst-case VC bound up front, Kadabra draws BATCHES of sampled
    shortest paths and stops as soon as the empirical-Bernstein bound

        err(v) = √(2·σ̂²(v)·ln(4n/δ)/t) + 7·ln(4n/δ)/(3t)

    clears ε for every node — on easy instances that is a small fraction
    of the VC-bound samples. Per round: one batched multi-source BFS over
    the round's new roots + ≤ vd σ-weighted predecessor-sampling steps,
    the same O(r)-row shuffles as approx_betweenness; the adaptive state
    is a single (id, hits) table folded per round.
    """
    import math as _math

    from networkit_spark.ids import assign_dense_ids

    spark = g.edges.sparkSession
    n = g.num_nodes()
    zeros = g.nodes.select("id", F.lit(0.0).alias("score"))
    if n < 2:
        return zeros
    _, vd = diameter_range(g, seed=seed)
    if vd <= 2:
        return zeros

    log_term = _math.log(4.0 * n / delta)
    if batch_size is None:
        # ~1/10 of the RK fixed bound per round, floor 32
        rk = (1.0 / (epsilon * epsilon)) * (
            _math.floor(_math.log2(vd - 2)) + 1 + _math.log(1.0 / delta)
        )
        batch_size = max(32, int(_math.ceil(rk / 10.0)))

    mapping = assign_dense_ids(
        g.nodes.select(F.col("id").alias("key")), ["key"]
    ).transform(pin)
    edges = g.edges.select(F.col("src").alias("z"), F.col("dst").alias("cur"))

    hits = None  # (id, h) accumulated path-interior counts
    t = 0
    for rnd in range(max_rounds):
        samp = spark.range(batch_size).select(
            (F.col("id") + F.lit(rnd * batch_size)).alias("pair")
        )
        if portable_hash:
            # md5-porthash draws a DuckDB oracle can replay exactly
            # (same convention as approx_betweenness, salt tag "kb")
            from networkit_spark.functions.porthash import md5_mod

            iu = F.pmod(md5_mod(F.col("pair"), salt=f"kb{seed}:u:"), F.lit(n))
            iv0 = F.pmod(md5_mod(F.col("pair"), salt=f"kb{seed}:v:"), F.lit(n - 1))
        else:
            iu = F.pmod(F.xxhash64(F.lit(seed), F.lit(0), F.col("pair")), F.lit(n))
            iv0 = F.pmod(F.xxhash64(F.lit(seed), F.lit(1), F.col("pair")), F.lit(n - 1))
        iv = F.when(iv0 >= iu, iv0 + 1).otherwise(iv0)
        pairs = (
            samp.select("pair", iu.alias("iu"), iv.alias("iv"))
            .join(F.broadcast(mapping.select(F.col("id").alias("iu"), F.col("key").alias("u"))), "iu")
            .join(F.broadcast(mapping.select(F.col("id").alias("iv"), F.col("key").alias("v"))), "iv")
            .select("pair", "u", "v")
            .transform(pin)
        )
        res = multi_source_bfs(g, pairs.select("u").distinct(), runner=runner)
        vis = res.visited.select("root", "node", "dist", "sigma").localCheckpoint(
            eager=True
        )
        active = pairs.join(
            vis.filter(F.col("dist") > 0).select(
                F.col("root").alias("u"), F.col("node").alias("v")
            ),
            ["u", "v"],
            "left_semi",
        ).select("pair", "u", F.col("v").alias("cur")).transform(pin)

        contribs = []
        M = 1_000_003
        for step in range(1, vd + 2):
            if active.isEmpty():
                break
            cand = (
                active.join(edges, "cur")
                .join(
                    vis.select(
                        F.col("root").alias("u"),
                        F.col("node").alias("z"),
                        F.col("dist").alias("dz"),
                        F.col("sigma").alias("sz"),
                    ),
                    ["u", "z"],
                )
                .join(
                    vis.select(
                        F.col("root").alias("u"),
                        F.col("node").alias("cur"),
                        F.col("dist").alias("dc"),
                    ),
                    ["u", "cur"],
                )
                .filter(F.col("dz") == F.col("dc") - 1)
            )
            w_cum = Window.partitionBy("pair").orderBy("z")
            w_tot = Window.partitionBy("pair")
            if portable_hash:
                from networkit_spark.functions.porthash import md5_mod

                x = F.pmod(
                    md5_mod(F.col("pair"), salt=f"kb{seed}:x:{step}:"), F.lit(M)
                ) / F.lit(float(M))
            else:
                x = (
                    F.pmod(
                        F.xxhash64(F.lit(seed), F.lit(2), F.col("pair"), F.lit(step)),
                        F.lit(M),
                    )
                    / F.lit(float(M))
                )
            chosen = (
                cand.withColumn("cum", F.sum("sz").over(w_cum))
                .withColumn("tot", F.sum("sz").over(w_tot))
                .filter(F.col("cum") / F.col("tot") > x)
                .withColumn("rn", F.row_number().over(w_cum))
                .filter(F.col("rn") == 1)
                .select("pair", "u", F.col("z").alias("cur"))
                .transform(pin)
            )
            contribs.append(
                chosen.filter(F.col("cur") != F.col("u")).select(
                    F.col("cur").alias("id")
                )
            )
            active = chosen.filter(F.col("cur") != F.col("u"))

        t += batch_size
        if contribs:
            allc = contribs[0]
            for c in contribs[1:]:
                allc = allc.unionByName(c)
            batch_hits = allc.groupBy("id").agg(F.count(F.lit(1)).alias("h"))
            hits = (
                batch_hits
                if hits is None
                else hits.unionByName(batch_hits)
                .groupBy("id")
                .agg(F.sum("h").alias("h"))
            )
            hits = hits.transform(pin)

        # empirical-Bernstein stop: max over nodes of err(v) <= epsilon
        if hits is None:
            worst = 7.0 * log_term / (3.0 * t)  # all-zero counts
        else:
            b_hat = F.col("h") / F.lit(float(t))
            var = b_hat * (F.lit(1.0) - b_hat)
            err = F.sqrt(F.lit(2.0 * log_term / t) * var) + F.lit(
                7.0 * log_term / (3.0 * t)
            )
            worst = float(hits.agg(F.max(err)).collect()[0][0] or 0.0)
            worst = max(worst, 7.0 * log_term / (3.0 * t))
        if worst <= epsilon:
            break

    if hits is None:
        return zeros
    scores = hits.select("id", (F.col("h") / F.lit(float(t))).alias("s"))
    return g.nodes.join(scores, "id", "left").select(
        "id", F.coalesce("s", F.lit(0.0)).alias("score")
    )


def approx_betweenness(
    g: Graph,
    epsilon: float = 0.1,
    delta: float = 0.1,
    universal_constant: float = 1.0,
    seed: int = 42,
    runner: SuperstepRunner | None = None,
    portable_hash: bool = False,
) -> DataFrame:
    """ApproxBetweenness (``centrality/ApproxBetweenness.cpp:30-95``,
    Riondato-Kornaropoulos): (id, score) with the ε-δ guarantee
    P(|score(v) − b(v)/(n(n−1))| > ε) < δ.

    Sample size r = ⌈(c/ε²)(⌊log₂(vd−2)⌋ + 1 + ln(1/δ))⌉ from the
    VC-dimension bound, vd = estimated vertex diameter (two-sweep upper
    bound, the analogue of the reference's estimatedPedantic). r seeded
    hash-sampled (u, v) pairs; ONE batched multi-source BFS shares every
    hop-level shuffle across the distinct sources; then each sample walks
    one predecessor step per round (σ-weighted choice drawn from a seeded
    hash — deterministic at any parallelism), ≤ vd rounds over an
    ≤ r-row state. Every contribution adds 1/r to the node it lands on.

    Scale shape: the only O(m)-sized shuffles are the BFS levels (shared,
    dst-keyed); the path-sampling rounds shuffle O(r) rows. No driver
    loop over samples, no per-row Python.
    """
    from networkit_spark.ids import assign_dense_ids

    spark = g.edges.sparkSession
    n = g.num_nodes()
    out_cols = ["id", "score"]
    zeros = g.nodes.select("id", F.lit(0.0).alias("score"))
    if n < 2:
        return zeros
    _, vd = diameter_range(g, seed=seed)
    if vd <= 2:
        return zeros

    import math as _math

    r = int(
        _math.ceil(
            (universal_constant / (epsilon * epsilon))
            * (_math.floor(_math.log2(vd - 2)) + 1 + _math.log(1.0 / delta))
        )
    )

    mapping = assign_dense_ids(
        g.nodes.select(F.col("id").alias("key")), ["key"]
    ).transform(pin)  # (key=node id, id=dense rank)

    from networkit_spark.functions.porthash import md5_mod

    samp = spark.range(r).select(F.col("id").alias("pair"))
    # portable_hash: md5-porthash draws a DuckDB oracle can replay exactly
    if portable_hash:
        iu = F.pmod(md5_mod(F.col("pair"), salt=f"ab{seed}:u:"), F.lit(n))
        iv0 = F.pmod(md5_mod(F.col("pair"), salt=f"ab{seed}:v:"), F.lit(n - 1))
    else:
        iu = F.pmod(F.xxhash64(F.lit(seed), F.lit(0), F.col("pair")), F.lit(n))
        iv0 = F.pmod(F.xxhash64(F.lit(seed), F.lit(1), F.col("pair")), F.lit(n - 1))
    iv = F.when(iv0 >= iu, iv0 + 1).otherwise(iv0)
    pairs = (
        samp.select("pair", iu.alias("iu"), iv.alias("iv"))
        .join(
            F.broadcast(
                mapping.select(F.col("id").alias("iu"), F.col("key").alias("u"))
            ),
            "iu",
        )
        .join(
            F.broadcast(
                mapping.select(F.col("id").alias("iv"), F.col("key").alias("v"))
            ),
            "iv",
        )
        .select("pair", "u", "v")
        .transform(pin)
    )

    res = multi_source_bfs(g, pairs.select("u").distinct(), runner=runner)
    vis = res.visited.select("root", "node", "dist", "sigma").localCheckpoint(
        eager=True
    )

    # drop pairs with no u→v path (reference: numberOfPaths(v) == 0)
    active = pairs.join(
        vis.filter(F.col("dist") > 0).select(
            F.col("root").alias("u"), F.col("node").alias("v")
        ),
        ["u", "v"],
        "left_semi",
    ).select("pair", "u", F.col("v").alias("cur"))
    active = active.transform(pin)

    edges = g.edges.select(F.col("src").alias("z"), F.col("dst").alias("cur"))
    contribs = []
    M = 1_000_003
    for step in range(1, vd + 2):
        if active.isEmpty():
            break
        cand = (
            active.join(edges, "cur")
            .join(
                vis.select(
                    F.col("root").alias("u"),
                    F.col("node").alias("z"),
                    F.col("dist").alias("dz"),
                    F.col("sigma").alias("sz"),
                ),
                ["u", "z"],
            )
            .join(
                vis.select(
                    F.col("root").alias("u"),
                    F.col("node").alias("cur"),
                    F.col("dist").alias("dc"),
                ),
                ["u", "cur"],
            )
            .filter(F.col("dz") == F.col("dc") - 1)
        )
        w_cum = Window.partitionBy("pair").orderBy("z")
        w_tot = Window.partitionBy("pair")
        if portable_hash:
            x = F.pmod(
                md5_mod(F.col("pair"), salt=f"ab{seed}:x:{step}:"), F.lit(M)
            ) / F.lit(float(M))
        else:
            x = (
                F.pmod(
                    F.xxhash64(F.lit(seed), F.lit(2), F.col("pair"), F.lit(step)),
                    F.lit(M),
                )
                / F.lit(float(M))
            )
        chosen = (
            cand.withColumn("cum", F.sum("sz").over(w_cum))
            .withColumn("tot", F.sum("sz").over(w_tot))
            .filter(F.col("cum") / F.col("tot") > x)
            .withColumn("rn", F.row_number().over(w_cum))
            .filter(F.col("rn") == 1)
            .select("pair", "u", F.col("z").alias("cur"))
        )
        chosen = chosen.transform(pin)
        contribs.append(
            chosen.filter(F.col("cur") != F.col("u")).select(
                F.col("cur").alias("id")
            )
        )
        active = chosen.filter(F.col("cur") != F.col("u"))

    if not contribs:
        return zeros
    allc = contribs[0]
    for c in contribs[1:]:
        allc = allc.unionByName(c)
    scores = allc.groupBy("id").agg((F.count(F.lit(1)) / F.lit(float(r))).alias("s"))
    return g.nodes.join(scores, "id", "left").select(
        "id", F.coalesce("s", F.lit(0.0)).alias("score")
    )


def apsp_update_additions(
    dist: DataFrame,
    added_edges: DataFrame,
    directed: bool = False,
    max_rounds: int = 64,
) -> DataFrame:
    """DynAPSP edge-insertion update (``distance/DynAPSP.cpp``
    updateMatrix semantics, batch form): given the all-pairs hop-distance
    table ``dist`` (root, node, dist — reachable pairs only, e.g. from
    ``multi_source_bfs``) and a batch of inserted unit-weight edges,
    produce the updated distance table WITHOUT recomputing APSP:

        d'(x, y) = min(d(x, y), min_{(u,v) added} d(x, u) + 1 + d(v, y))

    iterated to a fixpoint so chains of interacting insertions compose.
    Each round is two keyed joins against the (small) added-edge batch —
    the update never touches the full edge table, which is the entire
    point of the dynamic variant at scale.
    """
    add = added_edges.select("src", "dst")
    if not directed:
        add = add.unionByName(
            add.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    add = add.transform(pin)
    cur = dist.select("root", "node", "dist").transform(pin)
    for _ in range(max_rounds):
        left = cur.select("root", F.col("node").alias("src"), F.col("dist").alias("dx"))
        right = cur.select(
            F.col("root").alias("dst"), F.col("node").alias("node"), F.col("dist").alias("dy")
        )
        via = (
            left.join(F.broadcast(add), "src")
            .join(right, "dst")
            .groupBy("root", "node")
            .agg((F.min(F.col("dx") + 1 + F.col("dy"))).alias("cand"))
        )
        merged = (
            cur.join(via, ["root", "node"], "full")
            .select(
                "root",
                "node",
                F.least(
                    F.coalesce("dist", F.col("cand")), F.coalesce("cand", F.col("dist"))
                ).alias("new_dist"),
                "dist",
            )
        )
        merged = merged.transform(pin)
        improved = merged.filter(
            F.col("dist").isNull() | (F.col("new_dist") < F.col("dist"))
        ).count()
        cur = merged.select("root", "node", F.col("new_dist").alias("dist"))
        if improved == 0:
            return cur
    raise RuntimeError("apsp_update_additions did not reach a fixpoint")


def harmonic_from_distances(dist: DataFrame, nodes: DataFrame) -> DataFrame:
    """Harmonic closeness directly from a (root, node, dist) table —
    composing this with ``apsp_update_additions`` gives the
    DynTopHarmonicCloseness update pattern
    (``centrality/DynTopHarmonicCloseness.cpp``): after an edge batch,
    refresh distances incrementally and re-derive the ranking without a
    fresh all-pairs BFS."""
    agg = (
        dist.filter(F.col("dist") > 0)
        .groupBy(F.col("root").alias("id"))
        .agg(F.sum(F.lit(1.0) / F.col("dist")).alias("score"))
    )
    base = nodes.select(F.col(nodes.columns[0]).cast("long").alias("id"))
    return base.join(agg, "id", "left").select(
        "id", F.coalesce("score", F.lit(0.0)).alias("score")
    )


def approx_group_betweenness(
    g: Graph,
    k: int = 3,
    epsilon: float = 0.1,
    delta: float = 0.1,
    universal_constant: float = 1.0,
    seed: int = 42,
    runner: SuperstepRunner | None = None,
) -> list[int]:
    """ApproxGroupBetweenness (``centrality/ApproxGroupBetweenness.cpp``
    idea): sample shortest paths with the Riondato-Kornaropoulos pair/
    path sampler (identical machinery to ``approx_betweenness``), then
    pick the k-node group greedily by MAX COVERAGE over the sampled
    paths — stochastic greedy set cover, ties by smallest id.

    The sampling phase is the shared-BFS + seeded backward walk; the
    greedy phase is k rounds of one join-agg over the (sample, node)
    membership table. Returns the group (pick order).
    """
    from networkit_spark.ids import assign_dense_ids

    import math as _math

    spark = g.edges.sparkSession
    n = g.num_nodes()
    if n < 2:
        return []
    _, vd = diameter_range(g, seed=seed)
    if vd <= 2:
        # trivial graphs: fall back to top-degree picks
        deg = (
            g.edges.groupBy(F.col("src").alias("id"))
            .agg(F.count(F.lit(1)).alias("d"))
            .orderBy(F.desc("d"), F.asc("id"))
            .limit(k)
            .collect()
        )
        return [int(r["id"]) for r in deg]
    r = int(
        _math.ceil(
            (universal_constant / (epsilon * epsilon))
            * (_math.floor(_math.log2(vd - 2)) + 1 + _math.log(1.0 / delta))
        )
    )
    mapping = assign_dense_ids(
        g.nodes.select(F.col("id").alias("key")), ["key"]
    ).transform(pin)
    samp = spark.range(r).select(F.col("id").alias("pair"))
    iu = F.pmod(F.xxhash64(F.lit(seed), F.lit(0), F.col("pair")), F.lit(n))
    iv0 = F.pmod(F.xxhash64(F.lit(seed), F.lit(1), F.col("pair")), F.lit(n - 1))
    iv = F.when(iv0 >= iu, iv0 + 1).otherwise(iv0)
    pairs = (
        samp.select("pair", iu.alias("iu"), iv.alias("iv"))
        .join(F.broadcast(mapping.select(F.col("id").alias("iu"), F.col("key").alias("u"))), "iu")
        .join(F.broadcast(mapping.select(F.col("id").alias("iv"), F.col("key").alias("v"))), "iv")
        .select("pair", "u", "v")
        .transform(pin)
    )
    res = multi_source_bfs(g, pairs.select("u").distinct(), runner=runner)
    vis = res.visited.select("root", "node", "dist", "sigma").transform(pin)
    active = pairs.join(
        vis.filter(F.col("dist") > 0).select(
            F.col("root").alias("u"), F.col("node").alias("v")
        ),
        ["u", "v"],
        "left_semi",
    ).select("pair", "u", F.col("v").alias("cur"))
    active = active.transform(pin)
    edges = g.edges.select(F.col("src").alias("z"), F.col("dst").alias("cur"))
    members = [active.select("pair", F.col("cur").alias("node"))]
    M = 1_000_003
    for step in range(1, vd + 2):
        if active.isEmpty():
            break
        cand = (
            active.join(edges, "cur")
            .join(
                vis.select(
                    F.col("root").alias("u"), F.col("node").alias("z"),
                    F.col("dist").alias("dz"), F.col("sigma").alias("sz"),
                ),
                ["u", "z"],
            )
            .join(
                vis.select(
                    F.col("root").alias("u"), F.col("node").alias("cur"),
                    F.col("dist").alias("dc"),
                ),
                ["u", "cur"],
            )
            .filter(F.col("dz") == F.col("dc") - 1)
        )
        w_cum = Window.partitionBy("pair").orderBy("z")
        x = (
            F.pmod(F.xxhash64(F.lit(seed), F.lit(2), F.col("pair"), F.lit(step)), F.lit(M))
            / F.lit(float(M))
        )
        chosen = (
            cand.withColumn("cum", F.sum("sz").over(w_cum))
            .withColumn("tot", F.sum("sz").over(Window.partitionBy("pair")))
            .filter(F.col("cum") / F.col("tot") > x)
            .withColumn("rn", F.row_number().over(w_cum))
            .filter(F.col("rn") == 1)
            .select("pair", "u", F.col("z").alias("cur"))
            .transform(pin)
        )
        members.append(chosen.select("pair", F.col("cur").alias("node")))
        active = chosen.filter(F.col("cur") != F.col("u"))
    membership = members[0]
    for m_ in members[1:]:
        membership = membership.unionByName(m_)
    # group betweenness counts INTERIOR vertices: drop each sample's own
    # endpoints from its path membership before the set-cover greedy
    membership = (
        membership.join(pairs.select("pair", "u", "v"), "pair")
        .filter((F.col("node") != F.col("u")) & (F.col("node") != F.col("v")))
        .select("pair", "node")
        .dropDuplicates(["pair", "node"])
        .transform(pin)
    )

    group: list[int] = []
    covered = spark.createDataFrame([], "pair long")
    for _ in range(k):
        gains = (
            membership.join(covered, "pair", "left_anti")
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("gain"))
        )
        if group:
            gdf = spark.createDataFrame([(i,) for i in group], "node long")
            gains = gains.join(F.broadcast(gdf), "node", "left_anti")
        best = gains.orderBy(F.desc("gain"), F.asc("node")).limit(1).collect()
        if not best:
            break
        u = int(best[0]["node"])
        group.append(u)
        covered = (
            membership.filter(F.col("node").isin(group))
            .select("pair")
            .distinct()
            .transform(pin)
        )
    return group


def betweenness_update_additions(
    g_old: Graph,
    g_new: Graph,
    added_edges: DataFrame,
    old_scores: DataFrame,
    runner: SuperstepRunner | None = None,
    old_distances: DataFrame | None = None,
) -> DataFrame:
    """DynBetweenness batch edge-insertion update
    (``centrality/DynBetweenness.cpp`` contract — exact scores after the
    batch): identify the AFFECTED sources (roots whose distance to any
    node changed), subtract their old dependency contributions and add
    their new ones:

        score' = score − Σ_{r affected} δ_old(r) + Σ_{r affected} δ_new(r)

    Both Σ terms are ONE batched-Brandes call each over just the
    affected source set — when an insertion touches a periphery, that
    set is small and the update costs a fraction of a full recompute;
    worst case (hub insertion) it degrades to the full O(n·m), same as
    the reference's worst case.

    ``old_distances``: the pre-batch all-pairs (root, node, dist) table,
    as returned by ``multi_source_bfs(...).visited`` or a previous
    ``apsp_update_additions``. Pass it to make successive update batches
    truly incremental — without it this function recomputes the full
    APSP (O(n·m)) before the incremental step, which defeats the point
    for small periphery insertions.
    """
    spark = g_old.edges.sparkSession
    d_old = (
        old_distances.select("root", "node", "dist")
        if old_distances is not None
        else multi_source_bfs(g_old, g_old.nodes, with_sigma=False).visited.select(
            "root", "node", "dist"
        )
    )
    d_new = apsp_update_additions(d_old, added_edges, directed=g_new.directed)
    # A root is affected iff some inserted edge lies on one of its NEW
    # shortest paths: |d_new(r,u) − d_new(r,w)| == 1. This catches both
    # distance changes AND σ-only changes (a new equal-length path
    # redistributes dependencies without moving any distance).
    add = added_edges.select("src", "dst")
    affected = (
        d_new.withColumnRenamed("node", "src")
        .withColumnRenamed("dist", "du")
        .join(F.broadcast(add), "src")
        .join(
            d_new.select(
                "root", F.col("node").alias("dst"), F.col("dist").alias("dw")
            ),
            ["root", "dst"],
        )
        .filter(F.abs(F.col("du") - F.col("dw")) == 1)
        .select("root")
        .distinct()
        .withColumnRenamed("root", "id")
        .transform(pin)
    )
    if affected.isEmpty():
        return old_scores
    contrib_old = _brandes(g_old, affected, linear_scaling=False, runner=runner)
    contrib_new = _brandes(g_new, affected, linear_scaling=False, runner=runner)
    return (
        old_scores.withColumnRenamed("score", "s")
        .join(contrib_old.withColumnRenamed("score", "so"), "id", "left")
        .join(contrib_new.withColumnRenamed("score", "sn"), "id", "left")
        .select(
            "id",
            (
                F.col("s")
                - F.coalesce("so", F.lit(0.0))
                + F.coalesce("sn", F.lit(0.0))
            ).alias("score"),
        )
    )


def incomplete_dijkstra(
    g: Graph,
    sources: list[int],
    explored: DataFrame | None = None,
    max_dist: float | None = None,
) -> DataFrame:
    """(node, dist) — weighted distances from a source set, never entering
    an ``explored`` node set and optionally stopping at ``max_dist``
    (``distance/IncompleteDijkstra.cpp`` semantics at the fixed point:
    the reference is a lazy heap iterator; the batch analogue returns
    every settled node at once). Explored nodes neither receive nor
    forward distances, matching the reference's skip-on-both-sides."""
    spark = g.edges.sparkSession
    edges = (g.symmetrized_edges() if g.directed else g.edges).select(
        "src", "dst", "weight"
    )
    if explored is not None:
        ex = explored.select(F.col(explored.columns[0]).cast("long").alias("id"))
        edges = edges.join(ex.withColumnRenamed("id", "src"), "src", "left_anti").join(
            ex.withColumnRenamed("id", "dst"), "dst", "left_anti"
        )
        src_rows = [
            (int(s),)
            for s in sources
            if not ex.filter(F.col("id") == int(s)).limit(1).count()
        ]
    else:
        src_rows = [(int(s),) for s in sources]
    if not src_rows:
        return spark.createDataFrame([], "node long, dist double")
    edges = edges.transform(pin)
    dist = spark.createDataFrame(src_rows, "node long").select(
        "node", F.lit(0.0).alias("dist")
    ).localCheckpoint(eager=True)
    frontier = dist
    n = g.num_nodes()
    for _ in range(n + 1):
        relax = (
            edges.join(frontier.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min(F.col("dist") + F.col("weight")).alias("cand"))
        )
        if max_dist is not None:
            relax = relax.filter(F.col("cand") <= float(max_dist))
        merged = (
            dist.join(relax, "node", "full")
            .select(
                "node",
                F.least(
                    F.coalesce("dist", F.lit(float("inf"))),
                    F.coalesce("cand", F.lit(float("inf"))),
                ).alias("dist"),
                (F.col("dist").isNull() | (F.col("cand") < F.col("dist"))).alias("imp"),
            )
            .transform(pin)
        )
        frontier = merged.filter("imp").select("node", "dist")
        dist = merged.select("node", "dist")
        if frontier.limit(1).count() == 0:
            break
    return dist
