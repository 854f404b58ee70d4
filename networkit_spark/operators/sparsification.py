"""Sparsification — per-edge similarity scores + global threshold filter.

Reference (module ``sparsification/``, 1,551 LoC):

- ``GlobalThresholdFilter``: keep edges with score > t (or ≥ / < variants)
  (``sparsification/GlobalThresholdFilter.cpp``).
- Jaccard-similarity edge score (the backbone of SimmelianJaccard /
  LocalSimilarity sparsifiers): for edge (u,v),
  ``|N(u) ∩ N(v)| / |N(u) ∪ N(v)|`` over neighborhoods EXCLUDING the edge
  itself — common neighbors of an edge's endpoints are exactly the
  triangles through that edge, so this reuses the degree-ordered wedge
  join (``edgescores/PrefixJaccardScore.cpp`` computes the prefix
  variant; the plain ratio is the classic backbone score).

Spark: one triangle pass + two degree joins; the filter is a plain
``filter`` over the scored edge table — Catalyst pushes it into the scan
when the scores are materialized to Parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.triangles import _simple_degrees, triangle_count_per_edge


def jaccard_similarity_scores(g: Graph) -> DataFrame:
    """(src, dst, score) per canonical undirected edge:
    tri / (deg(u) + deg(v) − 2 − tri)   (0 when the denominator is 0)."""
    tri = triangle_count_per_edge(g)
    deg = _simple_degrees(g)
    out = (
        tri.join(deg.withColumnRenamed("id", "src").withColumnRenamed("deg", "du"), "src")
        .join(deg.withColumnRenamed("id", "dst").withColumnRenamed("deg", "dv"), "dst")
    )
    denom = F.col("du") + F.col("dv") - 2 - F.col("triangles")
    return out.select(
        "src",
        "dst",
        F.when(denom > 0, F.col("triangles") / denom).otherwise(F.lit(0.0)).alias("score"),
    )


def global_threshold_filter(
    g: Graph, scores: DataFrame, threshold: float, above: bool = True
) -> Graph:
    """Keep edges whose score is > threshold (``above=True``) or
    < threshold — GlobalThresholdFilter semantics. ``scores`` is keyed by
    canonical (src, dst); node set is preserved (sparsification never
    drops nodes)."""
    keep = scores.filter(
        F.col("score") > threshold if above else F.col("score") < threshold
    ).select("src", "dst")
    kept_edges = g.canonical_undirected_edges().join(keep, ["src", "dst"], "left_semi")
    return Graph.from_edges(
        kept_edges, directed=False, weighted=False, nodes=g.nodes
    )


def _per_ego_exponent(ranked: DataFrame) -> DataFrame:
    """Shared tail of the Local* scores: e = 1 − log(rank)/log(deg)
    (1.0 when deg ≤ 1), then max over the edge's two ego views.
    ``ranked``: (ego, src, dst, deg, rank) with canonical (src, dst)."""
    e = F.when(F.col("deg") > 1, 1.0 - F.log("rank") / F.log("deg")).otherwise(
        F.lit(1.0)
    )
    return (
        ranked.select("src", "dst", e.alias("e"))
        .groupBy("src", "dst")
        .agg(F.max("e").alias("score"))
    )


def local_degree_scores(g: Graph) -> DataFrame:
    """LocalDegreeScore (``sparsification/LocalDegreeScore.cpp:33-90``):
    per node, rank neighbors by THEIR degree descending with
    competition ranking (SQL rank(): ties share the smallest rank), then
    e = 1 − log(rank)/log(deg(ego)); an edge keeps the max of its two
    endpoint exponents. Keeps hub-ward edges — the backbone that
    preserves shortest-path skeletons on power-law graphs."""
    from pyspark.sql import Window

    adj = (g.symmetrized_edges() if g.directed else g.edges).filter(
        F.col("src") != F.col("dst")
    ).select(F.col("src").alias("ego"), F.col("dst").alias("nbr"))
    deg = adj.groupBy("ego").agg(F.count(F.lit(1)).alias("deg"))
    nbr_deg = deg.select(F.col("ego").alias("nbr"), F.col("deg").alias("nbr_deg"))
    # rank on the VALUE only: adding a tie-break column to the ordering
    # would make rank() split ties, but the reference's competition
    # ranking gives every tied neighbor the same (smallest) rank
    w = Window.partitionBy("ego").orderBy(F.desc("nbr_deg"))
    ranked = (
        adj.join(nbr_deg, "nbr")
        .join(deg, "ego")
        .withColumn("rank", F.rank().over(w))
        .select(
            "ego",
            F.least("ego", "nbr").alias("src"),
            F.greatest("ego", "nbr").alias("dst"),
            "deg",
            "rank",
        )
    )
    return _per_ego_exponent(ranked)


def local_similarity_scores(g: Graph) -> DataFrame:
    """LocalSimilarityScore (``sparsification/LocalSimilarityScore.cpp:
    30-67``): per node, rank neighbors by edge Jaccard
    tri/(deg(i)+deg(j)−tri) descending (row_number — the reference
    increments rank per element), e = 1 − log(rank)/log(deg), max over
    endpoints."""
    from pyspark.sql import Window

    tri = triangle_count_per_edge(g)  # canonical (src, dst, triangles)
    deg = _simple_degrees(g)
    sim = (
        tri.join(deg.withColumnRenamed("id", "src").withColumnRenamed("deg", "du"), "src")
        .join(deg.withColumnRenamed("id", "dst").withColumnRenamed("deg", "dv"), "dst")
        .select(
            "src",
            "dst",
            (
                F.col("triangles")
                / (F.col("du") + F.col("dv") - F.col("triangles"))
            ).alias("sim"),
        )
    )
    both = sim.select(
        F.col("src").alias("ego"), F.col("dst").alias("nbr"), "src", "dst", "sim"
    ).unionByName(
        sim.select(
            F.col("dst").alias("ego"), F.col("src").alias("nbr"), "src", "dst", "sim"
        )
    )
    degs = both.groupBy("ego").agg(F.count(F.lit(1)).alias("deg"))
    w = Window.partitionBy("ego").orderBy(F.desc("sim"), F.asc("nbr"))
    ranked = (
        both.join(degs, "ego")
        .withColumn("rank", F.row_number().over(w))
        .select("ego", "src", "dst", "deg", "rank")
    )
    return _per_ego_exponent(ranked)


def simmelian_overlap_scores(g: Graph, max_rank: int = 10) -> DataFrame:
    """SimmelianOverlapScore (``sparsification/SimmelianOverlapScore.cpp``
    + ``SimmelianScore.cpp getRankedNeighborhood/getOverlap``): per
    canonical edge, the number of common neighbors among the two
    endpoints' top-``max_rank`` neighbors, ranked by edge triangle count
    (competition ranking, equal counts share a rank — exactly Spark's
    ``rank()``).

    Plan shape: one per-ego rank window (bounded by max degree, the same
    skew envelope as the Local* scores) + one common-neighbor join keyed
    on the shared neighbor — no all-pairs blowup.
    """
    from networkit_spark.operators.triangles import triangle_count_per_edge

    etri = triangle_count_per_edge(g)
    ego = etri.select(
        F.col("src").alias("ego"), F.col("dst").alias("nbr"), "triangles"
    ).unionByName(
        etri.select(F.col("dst").alias("ego"), F.col("src").alias("nbr"), "triangles")
    )
    w = Window.partitionBy("ego").orderBy(F.desc("triangles"))
    top = (
        ego.withColumn("rk", F.rank().over(w))
        .filter(F.col("rk") <= max_rank)
        .select("ego", "nbr")
    )
    e = etri.select("src", "dst")
    ov = (
        e.join(top.select(F.col("ego").alias("src"), F.col("nbr").alias("w1")), "src")
        .join(
            top.select(F.col("ego").alias("dst"), F.col("nbr").alias("w1")),
            ["dst", "w1"],
        )
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("overlap"))
    )
    return e.join(ov, ["src", "dst"], "left").select(
        "src", "dst", F.coalesce("overlap", F.lit(0)).cast("double").alias("score")
    )


def scan_structural_similarity_scores(g: Graph) -> DataFrame:
    """SCANStructuralSimilarityScore
    (``sparsification/SCANStructuralSimilarityScore.cpp:8-18``): per
    canonical edge, (triangles + 1) / sqrt((d(u)+1)(d(v)+1))."""
    tri = triangle_count_per_edge(g)
    deg = _simple_degrees(g)
    out = (
        tri.join(deg.withColumnRenamed("id", "src").withColumnRenamed("deg", "du"), "src")
        .join(deg.withColumnRenamed("id", "dst").withColumnRenamed("deg", "dv"), "dst")
    )
    return out.select(
        "src",
        "dst",
        (
            (F.col("triangles") + 1)
            / F.sqrt((F.col("du") + 1) * (F.col("dv") + 1))
        ).alias("score"),
    )


def forest_fire_scores(
    g: Graph,
    pf: float = 0.6,
    n_fires: int = 32,
    max_rounds: int = 16,
    seed: int = 42,
) -> DataFrame:
    """ForestFireScore (``sparsification/ForestFireScore.cpp``
    semantics): burn fires from random sources, score = how often each
    edge burns.

    DEVIATION (documented): the reference burns a geometric number of
    unvisited neighbors sequentially per node; the columnar analogue
    burns each unvisited neighbor independently with probability ``pf``
    per frontier round — same expected forward-burning behaviour, fully
    seeded (every draw is a hash of (fire, edge, round)), no sequential
    queue. All fires advance in the SAME frontier join, so the cost is
    max_rounds × one edge join regardless of n_fires.
    """
    spark = g.edges.sparkSession
    sym = (
        (g.symmetrized_edges() if g.directed else g.edges)
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .dropDuplicates(["src", "dst"])
        .localCheckpoint(eager=True)
    )
    n = g.num_nodes()
    # seeded fire sources: fire i starts at the node ranked i-th by hash
    sources = (
        g.nodes.orderBy(F.xxhash64("id", F.lit(seed)))
        .limit(n_fires)
        .select(F.monotonically_increasing_id().alias("fire"), F.col("id").alias("node"))
        .localCheckpoint(eager=True)
    )
    visited = sources
    frontier = sources
    burnt = []
    M = 1_000_003
    for rnd in range(1, max_rounds + 1):
        if frontier.isEmpty():
            break
        draws = (
            sym.join(frontier.withColumnRenamed("node", "src"), "src")
            .join(
                visited.withColumnRenamed("node", "dst"), ["fire", "dst"], "left_anti"
            )
            .filter(
                F.pmod(
                    F.xxhash64("fire", "src", "dst", F.lit(seed), F.lit(rnd)),
                    F.lit(M),
                )
                / F.lit(float(M))
                < F.lit(pf)
            )
        )
        burnt.append(
            draws.select(
                F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
            )
        )
        nxt = draws.select("fire", F.col("dst").alias("node")).dropDuplicates(
            ["fire", "node"]
        ).localCheckpoint(eager=True)
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    e = g.canonical_undirected_edges().select("src", "dst")
    if not burnt:
        return e.withColumn("score", F.lit(0.0))
    allb = burnt[0]
    for b in burnt[1:]:
        allb = allb.unionByName(b)
    counts = allb.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("c"))
    return e.join(counts, ["src", "dst"], "left").select(
        "src", "dst", F.coalesce("c", F.lit(0)).cast("double").alias("score")
    )


def prefix_jaccard_scores(g: Graph, attribute: DataFrame | None = None) -> DataFrame:
    """PrefixJaccardScore (``edgescores/PrefixJaccardScore.cpp:20-140``):
    per canonical edge (u, v), the MAX over rank thresholds r of the
    Jaccard similarity of the endpoints' rank-≤-r neighbor prefixes,
    where each node's neighbors are ranked by ``attribute`` descending
    (0-based competition rank — equal attributes share a rank) and the
    partner endpoint is excluded from both prefixes.

    ``attribute``: (src, dst, score-like column) per canonical edge;
    defaults to the edge triangle count — the standard input when the
    score feeds Simmelian backbones.

    Plan shape: one per-ego rank window + a per-edge full-outer neighbor
    merge + an (edge × present-rank) aggregation — per-edge work is
    O(deg(u)+deg(v)) rows times the number of distinct ranks, with no
    all-pairs blowup and no Python row path.
    """
    from networkit_spark.operators.triangles import triangle_count_per_edge

    if attribute is None:
        attribute = triangle_count_per_edge(g)
    att_col = attribute.columns[2]
    e = attribute.select("src", "dst")
    ego = attribute.select(
        F.col("src").alias("ego"), F.col("dst").alias("nbr"), F.col(att_col).alias("att")
    ).unionByName(
        attribute.select(
            F.col("dst").alias("ego"), F.col("src").alias("nbr"), F.col(att_col).alias("att")
        )
    )
    w = Window.partitionBy("ego").orderBy(F.desc("att"))
    ranked = ego.withColumn("rk", F.rank().over(w) - 1).select("ego", "nbr", "rk")

    mu = e.join(
        ranked.select(F.col("ego").alias("src"), F.col("nbr").alias("w1"), F.col("rk").alias("ru")),
        "src",
    ).filter(F.col("w1") != F.col("dst"))
    mv = e.join(
        ranked.select(F.col("ego").alias("dst"), F.col("nbr").alias("w1"), F.col("rk").alias("rv")),
        "dst",
    ).filter(F.col("w1") != F.col("src"))
    m = mu.join(mv, ["src", "dst", "w1"], "full")

    ranks = (
        m.select("src", "dst", F.col("ru").alias("r"))
        .unionByName(m.select("src", "dst", F.col("rv").alias("r")))
        .filter(F.col("r").isNotNull())
        .distinct()
    )
    per_rank = (
        m.join(ranks, ["src", "dst"])
        .groupBy("src", "dst", "r")
        .agg(
            F.sum(
                F.when(
                    (F.col("ru") <= F.col("r")) & (F.col("rv") <= F.col("r")), 1
                ).otherwise(0)
            ).alias("common"),
            F.sum(
                F.when(
                    (F.col("ru") <= F.col("r")) | (F.col("rv") <= F.col("r")), 1
                ).otherwise(0)
            ).alias("total"),
        )
        .select(
            "src",
            "dst",
            F.when(F.col("total") > 0, F.col("common") / F.col("total"))
            .otherwise(F.lit(0.0))
            .alias("jacc"),
        )
        .groupBy("src", "dst")
        .agg(F.max("jacc").alias("score"))
    )
    return e.join(per_rank, ["src", "dst"], "left").select(
        "src", "dst", F.coalesce("score", F.lit(0.0)).alias("score")
    )
