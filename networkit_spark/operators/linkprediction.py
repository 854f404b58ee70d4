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
    """Symmetric loop-free (node, nbr) relation."""
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
    adj = _adjacency(g).cache()
    deg = adj.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))

    centers = adj.select(F.col("nbr").alias("z"), F.col("node").alias("end"))
    if max_center_degree is not None:
        ok = deg.filter(F.col("deg") <= max_center_degree).select(
            F.col("node").alias("z")
        )
        centers = centers.join(ok, "z", "left_semi")
    centers = centers.join(
        deg.withColumnRenamed("node", "z").withColumnRenamed("deg", "zdeg"), "z"
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
        scores.join(deg.withColumnRenamed("node", "u").withColumnRenamed("deg", "du"), "u")
        .join(deg.withColumnRenamed("node", "v").withColumnRenamed("deg", "dv"), "v")
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
