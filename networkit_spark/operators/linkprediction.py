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

from pyspark.sql import DataFrame
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
