"""Katz and eigenvector centrality — power-iteration kernels.

Reference semantics:

- ``KatzCentrality`` (``centrality/KatzCentrality.cpp:28-75``): init
  score=1; per iteration ``x'[u] = β + α·Σ_{(u,v)∈E_out} w(u,v)·(1 + x[v])``
  over UNNORMALIZED previous values; converge when the L2 length of the
  vector changes by ≤ tol between iterations; final scores divided by the
  last length. Default ``α = 1/(1+maxDegree)`` (``:15-17``).
- ``EigenvectorCentrality`` (``centrality/EigenvectorCentrality.cpp:21-67``):
  init 1; ``x'[u] = Σ_{(v,u)∈E_in} w(v,u)·x[v]``; L2-normalize EVERY
  iteration; converge on |len−oldLen| ≤ tol; if score[0] < 0 flip signs.

Both are the same distributed SpMV superstep as PageRank: one shuffle of
the |V|-sized vector into a hash join against the cached edge relation,
one aggregation, one driver-side norm. Skew and scale behavior are
identical to the PageRank kernel (see operators/pagerank.py).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.superstep import SuperstepRunner


@dataclass
class SpectralResult:
    scores: DataFrame  # (id LONG, score DOUBLE) — normalized
    iterations: int
    converged: bool
    # unnormalized fixpoint values — feed back as initial_scores for the
    # DynKatz warm-start pattern; None for kernels that don't expose it
    raw_scores: DataFrame | None = None


def _l2(df: DataFrame, col: str = "score") -> float:
    return math.sqrt(df.agg(F.sum(F.pow(F.col(col), 2))).collect()[0][0] or 0.0)


def katz_centrality(
    g: Graph,
    alpha: float | None = None,
    beta: float = 0.1,
    tol: float = 1e-8,
    max_iterations: int | None = None,
    runner: SuperstepRunner | None = None,
    initial_scores: "DataFrame | None" = None,
) -> SpectralResult:
    """NetworKit-semantics Katz centrality (module docstring).

    ``initial_scores`` (id, score — UNNORMALIZED fixpoint values from a
    previous run's ``raw_scores``) warm-starts the iteration: the
    dynamic-update pattern of ``centrality/DynKatzCentrality.cpp`` —
    after an edge batch, re-converging from the old fixpoint takes the
    few iterations the perturbation actually needs instead of a cold
    start from 1⃗ (see test: 1-2 vs ~15 iterations)."""
    spark = g.edges.sparkSession
    runner = runner or SuperstepRunner(spark)
    max_iterations = max_iterations if max_iterations is not None else 1 << 30

    if alpha is None:
        # defaultAlpha = 1/(1+maxDegree)   (KatzCentrality.cpp:15-17)
        max_deg = (
            g.edges.groupBy("src").count().agg(F.max("count")).collect()[0][0] or 0
        )
        alpha = 1.0 / (1.0 + max_deg)

    # gather over OUT-edges: contributions arrive at src from dst's score.
    # r8 (guide §2.4): shared src-partitioned layout + broadcast score
    # vector below the row limit — the groupBy(src) gather then needs no
    # Exchange; shuffled-hash fallback above it.
    from networkit_spark.plans.edge_layout import broadcast_row_limit, partitioned_edges

    small = g.num_nodes() <= broadcast_row_limit()
    edges = partitioned_edges(g.edges, "src").select("src", "dst", "weight")
    if initial_scores is not None:
        scores = g.nodes.join(
            initial_scores.select("id", "score"), "id", "left"
        ).select("id", F.coalesce("score", F.lit(1.0)).alias("score"))
        scores = scores.localCheckpoint(eager=True)
    else:
        scores = g.nodes.select("id", F.lit(1.0).alias("score")).localCheckpoint(
            eager=True
        )

    length = 0.0
    iterations = 0
    converged = False
    while iterations < max_iterations:
        sc = scores.withColumnRenamed("id", "dst")
        sc = F.broadcast(sc) if small else sc.hint("shuffle_hash")
        gathered = (
            edges.join(sc, "dst")
            .groupBy("src")
            .agg(
                F.sum(F.col("weight") * F.lit(alpha) * (1.0 + F.col("score"))).alias(
                    "gather"
                )
            )
        )
        gj = gathered.withColumnRenamed("src", "id")
        gj = F.broadcast(gj) if small else gj.hint("shuffle_hash")
        new_scores = (
            scores.select("id")
            .join(gj, "id", "left")
            .select(
                "id",
                (F.lit(beta) + F.coalesce(F.col("gather"), F.lit(0.0))).alias("score"),
            )
        )
        iterations += 1
        new_scores = runner.persist_step(new_scores, iterations)
        new_length = _l2(new_scores)
        scores = new_scores
        runner.record(iterations, length=new_length)
        if abs(new_length - length) <= tol:
            length = new_length
            converged = True
            break
        length = new_length

    out = scores.select("id", (F.col("score") / F.lit(length)).alias("score"))
    return SpectralResult(
        scores=out, iterations=iterations, converged=converged, raw_scores=scores
    )


def eigenvector_centrality(
    g: Graph,
    tol: float = 1e-9,
    max_iterations: int | None = None,
    runner: SuperstepRunner | None = None,
) -> SpectralResult:
    """NetworKit-semantics eigenvector centrality (module docstring)."""
    spark = g.edges.sparkSession
    runner = runner or SuperstepRunner(spark)
    max_iterations = max_iterations if max_iterations is not None else 1 << 30

    # r8 (guide §2.4): dst layout + broadcast scores, same policy as Katz
    from networkit_spark.plans.edge_layout import broadcast_row_limit, partitioned_edges

    small = g.num_nodes() <= broadcast_row_limit()
    edges = partitioned_edges(g.edges, "dst").select("src", "dst", "weight")
    scores = g.nodes.select("id", F.lit(1.0).alias("score")).localCheckpoint(
        eager=True
    )

    length = 0.0
    iterations = 0
    converged = False
    while iterations < max_iterations:
        # gather over IN-edges: x'[u] = Σ_{(v,u)} w·x[v]
        sc = scores.withColumnRenamed("id", "src")
        sc = F.broadcast(sc) if small else sc.hint("shuffle_hash")
        gathered = (
            edges.join(sc, "src")
            .groupBy("dst")
            .agg(F.sum(F.col("weight") * F.col("score")).alias("gather"))
        )
        gj = gathered.withColumnRenamed("dst", "id")
        gj = F.broadcast(gj) if small else gj.hint("shuffle_hash")
        raw = (
            scores.select("id")
            .join(gj, "id", "left")
            .select("id", F.coalesce(F.col("gather"), F.lit(0.0)).alias("score"))
        )
        iterations += 1
        raw = runner.persist_step(raw, iterations)
        new_length = _l2(raw)
        if new_length == 0.0:
            scores = raw
            break
        scores = raw.select("id", (F.col("score") / F.lit(new_length)).alias("score"))
        runner.record(iterations, length=new_length)
        if abs(new_length - length) <= tol:
            converged = True
            break
        length = new_length

    # sign convention: if score of node 0 (min id) is negative, flip
    # (EigenvectorCentrality.cpp:59-64)
    first = scores.orderBy("id").limit(1).collect()
    if first and first[0]["score"] < 0:
        # negate the WHOLE vector (not element-wise abs — wrong for
        # mixed-sign vectors), matching the reference exactly
        scores = scores.select("id", (-F.col("score")).alias("score"))
    return SpectralResult(scores=scores, iterations=iterations, converged=converged)


def laplacian_centrality(g, normalized: bool = False):
    """LaplacianCentrality (``centrality/LaplacianCentrality.cpp:15-44``):
    drop in Laplacian energy when removing the node —
    LC(u) = wdeg(u)² + Σ_{v∈N(u)} w·(w + 2·wdeg(v)); ``normalized``
    divides by the total energy Σ wdeg² + Σ w². One degree join-agg —
    verified against the reference gtest goldens in pytest."""
    sym = (g.symmetrized_edges() if g.directed else g.edges).filter(
        F.col("src") != F.col("dst")
    )
    wdeg = sym.groupBy(F.col("src").alias("id")).agg(F.sum("weight").alias("wdeg"))
    nbr_term = (
        sym.join(
            wdeg.select(F.col("id").alias("dst"), F.col("wdeg").alias("wd_v")), "dst"
        )
        .groupBy(F.col("src").alias("id"))
        .agg(
            F.sum(F.col("weight") * (F.col("weight") + 2 * F.col("wd_v"))).alias("nt"),
            F.sum(F.col("weight") * F.col("weight")).alias("w2"),
        )
    )
    scores = g.nodes.join(wdeg, "id", "left").join(nbr_term, "id", "left").select(
        "id",
        (
            F.coalesce("wdeg", F.lit(0.0)) * F.coalesce("wdeg", F.lit(0.0))
            + F.coalesce("nt", F.lit(0.0))
        ).alias("score"),
        F.coalesce("wdeg", F.lit(0.0)).alias("_wd"),
        F.coalesce("w2", F.lit(0.0)).alias("_w2"),
    )
    if normalized:
        tot = scores.agg(
            F.sum(F.col("_wd") * F.col("_wd") + F.col("_w2"))
        ).collect()[0][0]
        return scores.select(
            "id", (F.col("score") / F.lit(float(tot))).alias("score")
        )
    return scores.select("id", "score")
