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

from pyspark.sql import DataFrame
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
