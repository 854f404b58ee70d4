"""Link-prediction indices — common-neighbor family (module
``linkprediction/``, 1,086 LoC in the reference).

Reference semantics (each a per-node-pair score over common neighbors):

- ``CommonNeighborsIndex``: |N(u) ∩ N(v)|
  (``linkprediction/CommonNeighborsIndex.cpp``).
- ``JaccardIndex``: |N(u) ∩ N(v)| / |N(u) ∪ N(v)|
  (``linkprediction/JaccardIndex.cpp``).
- ``AdamicAdarIndex``: Σ_{z ∈ N(u)∩N(v)} 1/ln(deg z)
  (``linkprediction/AdamicAdarIndex.cpp``).
- ``ResourceAllocationIndex``: Σ_{z} 1/deg(z)
  (``linkprediction/ResourceAllocationIndex.cpp``).
- ``PreferentialAttachmentIndex``: deg(u)·deg(v).

The reference computes one pair at a time (``LinkPredictor::run(u, v)``);
a distributed engine computes ALL pairs with ≥1 common neighbor in one
shot — the classic wedge self-join (the same shuffle shape as triangle
counting, ``edgescores/TriangleEdgeScore.cpp:62-104``):

    wedges = adj ⋈ adj on the shared center z, u < v
    scores = groupBy(u, v).agg(...)      (+ degree joins for the variants)

Skew: a hub center z of degree d contributes d² wedge rows. Callers on
power-law graphs should bound the candidate space (e.g. filter centers
with deg ≤ cap) — exposed via ``max_center_degree``; NetworKit has no
such guard because it never enumerates all pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from networkit_spark.graph import Graph


def _adjacency(g: Graph) -> DataFrame:
    """Symmetric loop-free (node, nbr) relation. A ``simple``-flagged
    undirected relation already IS that — skip the defensive dedupe
    Exchange (guide §2.4)."""
    if g.simple and not g.directed:
        return g.edges.select(F.col("src").alias("node"), F.col("dst").alias("nbr"))
    sym = g.symmetrized_edges() if g.directed else g.edges
    return (
        sym.filter(F.col("src") != F.col("dst"))
        .select(F.col("src").alias("node"), F.col("dst").alias("nbr"))
        .dropDuplicates(["node", "nbr"])
    )


def common_neighbor_scores(
    g: Graph,
    include_existing_edges: bool = False,
    max_center_degree: int | None = None,
) -> DataFrame:
    """(u, v, common, jaccard, adamic_adar, resource_alloc) for every pair
    u < v with ≥1 common neighbor.

    ``include_existing_edges=False`` (link-prediction mode) drops pairs
    already connected — the reference's predictors are evaluated on
    non-edges (``linkprediction/LinkPredictor.hpp``).
    """
    # r8 (guide §2.4): the adjacency is memoized partitioned by the wedge
    # center, so the self-join below reuses one cached exchange; the
    # |V|-row degree table is broadcast below the row limit.
    from networkit_spark.plans.edge_layout import derived_layout, maybe_broadcast

    n = g.num_nodes()
    adj = derived_layout(
        g.edges, "linkpred_adj_by_nbr", lambda: _adjacency(g).repartition("nbr")
    )
    deg = adj.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))

    centers = adj.select(F.col("nbr").alias("z"), F.col("node").alias("end"))
    if max_center_degree is not None:
        ok = deg.filter(F.col("deg") <= max_center_degree).select(
            F.col("node").alias("z")
        )
        centers = centers.join(maybe_broadcast(ok, n), "z", "left_semi")
    centers = centers.join(
        maybe_broadcast(
            deg.withColumnRenamed("node", "z").withColumnRenamed("deg", "zdeg"), n
        ),
        "z",
    )

    wedges = (
        centers.alias("a")
        .join(
            centers.alias("b"),
            (F.col("a.z") == F.col("b.z")) & (F.col("a.end") < F.col("b.end")),
        )
        .select(
            F.col("a.end").alias("u"),
            F.col("b.end").alias("v"),
            F.col("a.zdeg").alias("zdeg"),
        )
    )
    scores = wedges.groupBy("u", "v").agg(
        F.count(F.lit(1)).alias("common"),
        F.sum(1.0 / F.log("zdeg")).alias("adamic_adar"),
        F.sum(1.0 / F.col("zdeg")).alias("resource_alloc"),
    )
    if not include_existing_edges:
        existing = g.canonical_undirected_edges().select(
            F.col("src").alias("u"), F.col("dst").alias("v")
        )
        scores = scores.join(existing, ["u", "v"], "left_anti")
    return (
        scores.join(
            maybe_broadcast(
                deg.withColumnRenamed("node", "u").withColumnRenamed("deg", "du"), n
            ),
            "u",
        )
        .join(
            maybe_broadcast(
                deg.withColumnRenamed("node", "v").withColumnRenamed("deg", "dv"), n
            ),
            "v",
        )
        .select(
            "u",
            "v",
            "common",
            (F.col("common") / (F.col("du") + F.col("dv") - F.col("common"))).alias(
                "jaccard"
            ),
            "adamic_adar",
            "resource_alloc",
        )
    )


def preferential_attachment(g: Graph, pairs: DataFrame) -> DataFrame:
    """(u, v, pref_attach = deg(u)·deg(v)) for the given (u, v) pairs."""
    deg = _adjacency(g).groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    return (
        pairs.join(deg.withColumnRenamed("node", "u").withColumnRenamed("deg", "du"), "u")
        .join(deg.withColumnRenamed("node", "v").withColumnRenamed("deg", "dv"), "v")
        .select("u", "v", (F.col("du") * F.col("dv")).cast("long").alias("pref_attach"))
    )


def degree_assortativity(g: Graph) -> float:
    """Pearson correlation of endpoint degrees over all (directed) edge
    slots — ``correlation/Assortativity.cpp`` semantics (undirected edges
    contribute both orientations, which is exactly our storage)."""
    sym = g.symmetrized_edges() if g.directed else g.edges
    e = sym.filter(F.col("src") != F.col("dst"))
    deg = (
        e.groupBy(F.col("src").alias("node")).agg(F.count(F.lit(1)).alias("deg"))
    )
    pairs = (
        e.join(deg.withColumnRenamed("node", "src").withColumnRenamed("deg", "dx"), "src")
        .join(deg.withColumnRenamed("node", "dst").withColumnRenamed("deg", "dy"), "dst")
    )
    row = pairs.agg(F.corr(F.col("dx").cast("double"), F.col("dy").cast("double"))).collect()[0]
    return row[0] if row[0] is not None else 0.0


def katz_index(
    g: Graph,
    pairs: DataFrame,
    max_path_length: int = 5,
    damping: float = 0.005,
) -> DataFrame:
    """KatzIndex (``linkprediction/KatzIndex.cpp:34-90``): score(u, v) =
    Σ_{l=1..L} damping^l · (#walks of length l between u and v), for each
    candidate pair (u, v).

    The reference BFS-expands per query node with an L-hop frontier; here
    ONE batched walk-count table serves every distinct source in
    ``pairs``: state (u, w, cnt) starts as u's adjacency row and each of
    the L-1 rounds is a single (w=src)-keyed join-agg — the same shared
    shuffle shape as multi-source BFS. State size is bounded by
    (reached pairs), not walks (counts aggregate per round).
    """
    adj = _adjacency(g).localCheckpoint(eager=True)
    srcs = pairs.select(F.col(pairs.columns[0]).alias("u")).distinct()
    state = adj.join(srcs.withColumnRenamed("u", "node"), "node", "left_semi").select(
        F.col("node").alias("u"), F.col("nbr").alias("w"), F.lit(1.0).alias("cnt")
    )
    state = state.localCheckpoint(eager=True)
    total = state.select(
        "u", F.col("w").alias("v"), (F.lit(damping) * F.col("cnt")).alias("s")
    )
    for l in range(2, max_path_length + 1):
        state = (
            state.join(adj.withColumnRenamed("node", "w"), "w")
            .groupBy("u", F.col("nbr").alias("w"))
            .agg(F.sum("cnt").alias("cnt"))
        ).localCheckpoint(eager=True)
        total = total.unionByName(
            state.select(
                "u",
                F.col("w").alias("v"),
                (F.lit(float(damping**l)) * F.col("cnt")).alias("s"),
            )
        )
    scores = total.groupBy("u", "v").agg(F.sum("s").alias("katz"))
    pu, pv = pairs.columns[0], pairs.columns[1]
    return (
        pairs.select(F.col(pu).alias("u"), F.col(pv).alias("v"))
        .join(scores, ["u", "v"], "left")
        .select("u", "v", F.coalesce("katz", F.lit(0.0)).alias("katz"))
    )


def roc_auc(scored: DataFrame, score_col: str = "score", label_col: str = "label") -> float:
    """Area under the ROC curve (``linkprediction/ROCMetric.cpp`` +
    ``EvaluationMetric.cpp areaUnderCurve``), ties handled by the
    standard mid-rank convention.

    Scale shape: one groupBy(score) aggregation first, so the only
    ordered window runs over DISTINCT scores (usually ≪ rows); the raw
    pair table is never globally sorted.
    """
    by_score = scored.groupBy(F.col(score_col).alias("s")).agg(
        F.sum(F.col(label_col).cast("double")).alias("p"),
        F.sum(F.lit(1.0) - F.col(label_col).cast("double")).alias("n"),
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    row = (
        by_score.withColumn("n_below", F.coalesce(F.sum("n").over(w), F.lit(0.0)))
        .agg(
            F.sum(F.col("p") * (F.col("n_below") + F.col("n") / 2)).alias("num"),
            F.sum("p").alias("P"),
            F.sum("n").alias("N"),
        )
        .collect()[0]
    )
    if not row["P"] or not row["N"]:
        raise ValueError("roc_auc needs at least one positive and one negative")
    return float(row["num"]) / (row["P"] * row["N"])


def roc_points(
    scored: DataFrame, score_col: str = "score", label_col: str = "label"
) -> DataFrame:
    """(fpr, tpr) ROC points, one per distinct score threshold
    (descending), plus the (0,0) origin implicitly at threshold=+inf."""
    by_score = scored.groupBy(F.col(score_col).alias("s")).agg(
        F.sum(F.col(label_col).cast("double")).alias("p"),
        F.sum(F.lit(1.0) - F.col(label_col).cast("double")).alias("n"),
    )
    totals = by_score.agg(F.sum("p").alias("P"), F.sum("n").alias("N")).collect()[0]
    w = Window.orderBy(F.desc("s")).rowsBetween(Window.unboundedPreceding, 0)
    return (
        by_score.withColumn("ctp", F.sum("p").over(w))
        .withColumn("cfp", F.sum("n").over(w))
        .select(
            (F.col("cfp") / F.lit(float(totals["N"] or 1))).alias("fpr"),
            (F.col("ctp") / F.lit(float(totals["P"] or 1))).alias("tpr"),
        )
    )


# --------------------------------------------------------------------------
# round-7 linkprediction utilities
# --------------------------------------------------------------------------


def _pair_neighbor_stats(g: Graph, pairs: DataFrame) -> DataFrame:
    """(u, v, common, du, dv) for arbitrary pairs: common neighbors via
    two adjacency joins aggregated per pair, degrees joined on."""
    adj = _adjacency(g)
    deg = adj.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    common = (
        pairs.join(adj.select(F.col("node").alias("u"), F.col("nbr").alias("z")), "u")
        .join(
            adj.select(F.col("node").alias("v"), F.col("nbr").alias("z")),
            ["v", "z"],
        )
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    return (
        pairs.join(common, ["u", "v"], "left")
        .fillna(0, subset=["common"])
        .join(deg.select(F.col("node").alias("u"), F.col("deg").alias("du")), "u", "left")
        .join(deg.select(F.col("node").alias("v"), F.col("deg").alias("dv")), "v", "left")
        .fillna(0, subset=["du", "dv"])
    )


def adjusted_rand_index(g: Graph, pairs: DataFrame) -> DataFrame:
    """(u, v, score) — AdjustedRandIndex
    (``linkprediction/AdjustedRandIndex.cpp:8-33``). Replicated exactly
    as the reference computes it: its ``uDifference``/``vDifference``
    are built with ``std::set_union`` (``:17-22``), so b = c = |N(u) ∪
    N(v)| — the computed (not the apparently intended) values are the
    parity target. a = |N(u) ∩ N(v)|, d = n − |union|;
    score = 2(ad − bc)/(ab + ac + 2ad + b² + bd + c² + cd), 0 on zero
    denominator."""
    n = g.num_nodes()
    st = _pair_neighbor_stats(g, pairs)
    a = F.col("common").cast("double")
    uni = (F.col("du") + F.col("dv") - F.col("common")).cast("double")
    b = uni
    c = uni
    d = F.lit(float(n)) - uni
    denom = a * b + a * c + 2 * a * d + b * b + b * d + c * c + c * d
    return st.select(
        "u",
        "v",
        F.when(denom != 0, (2 * (a * d - b * c)) / denom)
        .otherwise(F.lit(0.0))
        .alias("score"),
    )


def same_community_index(
    g: Graph, pairs: DataFrame, labels: DataFrame | None = None
) -> DataFrame:
    """(u, v, score) — 1 iff both endpoints share a community
    (``linkprediction/SameCommunityIndex.cpp:20-22``; the reference runs
    PLM at construction — pass ``labels`` to reuse a precomputed
    partition, else PLM runs here too)."""
    if labels is None:
        from networkit_spark.operators.louvain import plm

        labels = plm(g).labels
    lab = labels.select("node", "label")
    return (
        pairs.join(lab.select(F.col("node").alias("u"), F.col("label").alias("lu")), "u")
        .join(lab.select(F.col("node").alias("v"), F.col("label").alias("lv")), "v")
        .select(
            "u",
            "v",
            F.when(F.col("lu") == F.col("lv"), F.lit(1.0)).otherwise(F.lit(0.0)).alias("score"),
        )
    )


def algebraic_distance_index(
    g: Graph,
    pairs: DataFrame,
    num_systems: int = 10,
    num_iters: int = 30,
    omega: float = 0.5,
    norm: int = 2,
    seed: int = 42,
) -> DataFrame:
    """(u, v, score) — AlgebraicDistanceIndex
    (``linkprediction/AlgebraicDistanceIndex.cpp``): ``num_iters``
    Jacobi-ω smoothing sweeps of ``num_systems`` uniform(0,1) test
    vectors (portable md5 init — the reference draws
    ``Aux::Random::real()``), then the ℓ_norm distance between the two
    endpoints' load vectors (norm=0 → max norm). Unlike the graph-level
    :func:`networkit_spark.operators.algebraic.algebraic_distances`
    there is NO min-max normalization — the index scores raw loads
    (``runImpl``, ``AlgebraicDistanceIndex.cpp:37-57``); isolated nodes
    keep their initial loads (the reference divides by a zero weighted
    degree there — NaN scores; we keep the old load, documented)."""
    from networkit_spark.functions.porthash import DEFAULT_PRIME, md5_mod
    from networkit_spark.plans.pin import pin

    k = num_systems
    edges = (g.symmetrized_edges() if g.directed else g.edges).select(
        "src", "dst", "weight"
    )
    edges = pin(edges)
    loads = pin(
        g.nodes.select(
            "id",
            *[
                (
                    md5_mod(F.col("id"), salt=f"adi{seed}.{i}:").cast("double")
                    / F.lit(float(DEFAULT_PRIME))
                ).alias(f"l{i}")
                for i in range(k)
            ],
        )
    )
    for it in range(num_iters):
        gathered = (
            edges.join(loads.withColumnRenamed("id", "src").hint("shuffle_hash"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(
                F.sum("weight").alias("wdeg"),
                *[
                    F.sum(F.col("weight") * F.col(f"l{i}")).alias(f"s{i}")
                    for i in range(k)
                ],
            )
        )
        loads = loads.join(gathered.hint("shuffle_hash"), "id", "left").select(
            "id",
            *[
                F.when(
                    F.col("wdeg").isNotNull() & (F.col("wdeg") > 0),
                    (1.0 - omega) * F.col(f"l{i}")
                    + omega * F.col(f"s{i}") / F.col("wdeg"),
                )
                .otherwise(F.col(f"l{i}"))
                .alias(f"l{i}")
                for i in range(k)
            ],
        )
        if (it + 1) % 4 == 0 or it == num_iters - 1:
            loads = pin(loads)
    j = (
        pairs.join(loads.withColumnRenamed("id", "u"), "u")
        .join(
            loads.select(
                F.col("id").alias("v"),
                *[F.col(f"l{i}").alias(f"r{i}") for i in range(k)],
            ),
            "v",
        )
    )
    diffs = [F.abs(F.col(f"l{i}") - F.col(f"r{i}")) for i in range(k)]
    if norm == 0:
        score = F.greatest(*diffs) if k > 1 else diffs[0]
    else:
        score = F.pow(
            sum((F.pow(dv, float(norm)) for dv in diffs[1:]), F.pow(diffs[0], float(norm))),
            1.0 / norm,
        )
    return j.select("u", "v", F.coalesce(score, F.lit(0.0)).alias("score"))


def missing_links_finder(g: Graph, k: int) -> DataFrame:
    """All node pairs (u < v) at distance EXACTLY ``k``
    (``linkprediction/MissingLinksFinder.cpp:findAtDistance``). One
    frontier join per hop, k hops total — the output itself is the
    k-hop neighborhood table, so nothing beyond the answer
    materializes."""
    from networkit_spark.plans.pin import pin

    sym = (g.symmetrized_edges() if g.directed else g.edges).select("src", "dst")
    sym = pin(sym.filter(F.col("src") != F.col("dst")).distinct())
    dist = g.nodes.select(F.col("id").alias("root"), F.col("id").alias("node"),
                          F.lit(0).alias("dist"))
    frontier = dist
    for hop in range(1, k + 1):
        nxt = (
            frontier.join(sym.withColumnRenamed("src", "node"), "node")
            .select("root", F.col("dst").alias("node"))
            .distinct()
            .join(dist.select("root", "node").withColumn("seen", F.lit(1)),
                  ["root", "node"], "left_anti")
            .withColumn("dist", F.lit(hop))
        )
        nxt = pin(nxt)
        dist = pin(dist.unionByName(nxt))
        frontier = nxt
    return (
        frontier.filter(F.col("root") < F.col("node"))
        .select(F.col("root").alias("u"), F.col("node").alias("v"))
    )


def link_thresholder_by_score(scored: DataFrame, min_score: float) -> DataFrame:
    """Pairs with score ≥ min_score, (u, v)-sorted downstream
    (``LinkThresholder::byScore`` keeps ``!(score < minScore)``)."""
    return scored.filter(~(F.col("score") < min_score)).select("u", "v")


def link_thresholder_by_count(scored: DataFrame, num_links: int) -> DataFrame:
    """Top ``num_links`` pairs by (score desc, (u, v) asc) — the
    reference's ScoreComp ordering (``PredictionsSorter.hpp``)."""
    total = scored.count()
    if num_links > total:
        raise ValueError("num_links > predictions count")
    return (
        scored.orderBy(F.desc("score"), F.asc("u"), F.asc("v"))
        .limit(num_links)
        .select("u", "v")
    )


def link_thresholder_by_percentage(scored: DataFrame, pct: float) -> DataFrame:
    """``byCount(percentage · count)`` (``LinkThresholder.cpp:33-38``)."""
    if pct < 0 or pct > 1:
        raise ValueError("Given percentage is not in [0, 1].")
    return link_thresholder_by_count(scored, int(pct * scored.count()))


def random_link_sampler_by_count(g: Graph, num_train: int, seed: int = 42) -> Graph:
    """Training graph keeping ``num_train`` edges
    (``linkprediction/RandomLinkSampler.cpp``). The reference removes
    edges one at a time via the node-biased ``GraphTools::randomEdge``
    — a sequential chain; here the kept set is the ``num_train``
    smallest canonical edges under a seeded md5 rank (uniform sample,
    deterministic at any parallelism — documented deviation)."""
    from networkit_spark.functions.porthash import md5_mod

    can = g.canonical_undirected_edges()
    m = can.count()
    if num_train > m:
        raise ValueError("num_train > number of edges")
    keep = (
        can.withColumn(
            "h", md5_mod(F.col("src") * F.lit(1_000_003) + F.col("dst"), salt=f"rls{seed}:")
        )
        .orderBy("h", "src", "dst")
        .limit(num_train)
        .select("src", "dst")
    )
    kept = g.edges.join(
        keep.unionByName(keep.select(F.col("dst").alias("src"), F.col("src").alias("dst"))),
        ["src", "dst"],
        "left_semi",
    )
    return Graph(nodes=g.nodes, edges=kept, directed=g.directed, weighted=g.weighted)


def random_link_sampler_by_percentage(g: Graph, pct: float, seed: int = 42) -> Graph:
    if pct < 0 or pct > 1:
        raise ValueError("Given percentage is not in [0, 1].")
    m = g.canonical_undirected_edges().count()
    return random_link_sampler_by_count(g, int(pct * m), seed=seed)


def precision_recall_points(
    scored: DataFrame, score_col: str = "score", label_col: str = "label"
) -> DataFrame:
    """(recall, precision) per distinct score threshold descending
    (``linkprediction/PrecisionRecallMetric.cpp:generatePoints``): at
    each threshold t, predictions with score ≥ t are positive; when
    consecutive thresholds repeat a recall the LAST precision wins
    (the reference pops the stale point)."""
    by_score = scored.groupBy(F.col(score_col).alias("s")).agg(
        F.sum(F.col(label_col).cast("double")).alias("p"),
        F.sum(F.lit(1.0) - F.col(label_col).cast("double")).alias("n"),
    )
    totals = by_score.agg(F.sum("p").alias("P")).collect()[0]
    P = float(totals["P"] or 1.0)
    w = Window.orderBy(F.desc("s")).rowsBetween(Window.unboundedPreceding, 0)
    pts = (
        by_score.withColumn("tp", F.sum("p").over(w))
        .withColumn("pp", F.sum("p").over(w) + F.sum("n").over(w))
        .select(
            (F.col("tp") / F.lit(P)).alias("recall"),
            (F.col("tp") / F.col("pp")).alias("precision"),
            F.col("s"),
        )
    )
    # last precision per recall value = the one at the LOWEST threshold
    w2 = Window.partitionBy("recall").orderBy(F.asc("s"))
    return (
        pts.withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") == 1)
        .select("recall", "precision")
    )


def get_common_neighbors(g: Graph, u: int, v: int) -> DataFrame:
    """NeighborhoodUtility::getCommonNeighbors
    (``linkprediction/NeighborhoodUtility.cpp:26-36``): sorted common
    neighbors of u and v as a one-column (node) DataFrame."""
    for x in (u, v):
        if g.nodes.filter(F.col("id") == int(x)).limit(1).count() == 0:
            raise ValueError("Invalid node provided.")
    adj = _adjacency(g)
    return (
        adj.filter(F.col("node") == int(u))
        .select(F.col("nbr").alias("node"))
        .join(
            adj.filter(F.col("node") == int(v)).select(F.col("nbr").alias("node")),
            "node",
        )
        .orderBy("node")
    )


def get_neighbors_union(g: Graph, u: int, v: int) -> DataFrame:
    """NeighborhoodUtility::getNeighborsUnion
    (``linkprediction/NeighborhoodUtility.cpp:14-24``): sorted union of
    the two neighborhoods."""
    for x in (u, v):
        if g.nodes.filter(F.col("id") == int(x)).limit(1).count() == 0:
            raise ValueError("Invalid node provided.")
    adj = _adjacency(g)
    return (
        adj.filter(F.col("node").isin(int(u), int(v)))
        .select(F.col("nbr").alias("node"))
        .distinct()
        .orderBy("node")
    )
