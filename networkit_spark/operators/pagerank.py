"""PageRank — parity target #1.

Matches NetworKit ``centrality/PageRank.cpp:20-104`` exactly:

- init ``score[u] = 1/n``; divisor is the weighted OUT-degree
  (``PageRank.cpp:26-30``);
- superstep: ``pr[u] = (1-damp)/n + damp * Σ_{(v,u)∈E} score[v]·w(v,u)/wdeg(v)``
  — a gather over IN-edges (``PageRank.cpp:56-66``);
- NO per-step dangling-mass redistribution: mass leaks each superstep and
  is fixed only by the final normalization (``PageRank.cpp:75-80``);
- convergence on PRE-normalization values: ``‖new−old‖ ≤ tol`` in L2
  (default) or L1 (``PageRank.cpp:41-51,68-71``; defaults
  ``PageRank.hpp:40,64-67``: damp=0.85, tol=1e-8, maxIterations=∞);
- ``normalized=True`` divides by ``(1/n)·((1-damp) + damp·Σ_{wdeg(u)=0} score[u])``
  instead of by the sum (``PageRank.cpp:82-91``).

Spark plan per superstep (pure pyspark.sql — distributed SpMV):
    contribs = edges_with_deg ⋈ scores on src      (big ⋈ small)
    gathered = contribs.groupBy(dst).sum            (map-side partial agg
                                                     absorbs hub-dst skew)
    new      = nodes left⋈ gathered → teleport + damp·sum
    delta    = new ⋈ old → agg(Σ|diff|ᵖ)            (one collect per step)

Scale notes: ``edges_with_deg`` is materialized ONCE (edge table joined to
the out-degree vector, repartitioned by src, cached) — supersteps then
shuffle only |V|-sized score vectors, and AQE skew-join splitting covers
power-law src hubs. Lineage is truncated per superstep via SuperstepRunner
(checkpoint + resume, metrics per superstep).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.edge_layout import (
    broadcast_row_limit,
    derived_layout,
    maybe_broadcast,
    partitioned_edges,
)
from networkit_spark.plans.superstep import SuperstepRunner


@dataclass
class PageRankResult:
    scores: DataFrame  # (id LONG, score DOUBLE)
    iterations: int
    converged: bool


def pagerank(
    g: Graph,
    damp: float = 0.85,
    tol: float = 1e-8,
    normalized: bool = False,
    norm: str = "l2",
    max_iterations: int | None = None,
    runner: SuperstepRunner | None = None,
    initial_scores: DataFrame | None = None,
) -> PageRankResult:
    """Run NetworKit-semantics PageRank over ``g``; see module docstring."""
    spark = g.edges.sparkSession
    runner = runner or SuperstepRunner(spark)
    n = g.num_nodes()
    if n == 0:
        return PageRankResult(g.nodes.withColumn("score", F.lit(0.0)), 0, True)
    teleport = (1.0 - damp) / n
    max_iterations = max_iterations if max_iterations is not None else 1 << 30

    # gather relation: IN-edge list with the sender's weighted out-degree
    # attached once up front. For undirected graphs g.edges already holds
    # both orientations, so "incoming" == rows grouped by dst.
    #
    # r8 layout (guide §2.4): the relation is built ON the shared
    # dst-partitioned cached layout (src-out-degree attached via a
    # broadcast when |V| is small, shuffled-hash otherwise) and memoized,
    # so (a) reps/co-resident queries share one build, and (b) each
    # superstep's groupBy(dst) gather runs WITHOUT an Exchange — the
    # broadcast score join preserves the dst hash partitioning. Above the
    # broadcast row limit the superstep falls back to the pre-r8
    # shuffled-hash plan (score vector shuffled by src, gather shuffled
    # by dst with map-side partial aggregation).
    small = n <= broadcast_row_limit()

    def _build_edges_deg() -> DataFrame:
        if small:
            # share the dst layout with the other kernels; the broadcast
            # degree join preserves its partitioning
            e = partitioned_edges(g.edges, "dst")
            out_deg = e.groupBy("src").agg(F.sum("weight").alias("wdeg"))
            return e.join(F.broadcast(out_deg), "src").select(
                "src", "dst", (F.col("weight") / F.col("wdeg")).alias("frac")
            )
        # large graphs: build straight from the base relation so only the
        # gather relation itself is cached (not an intermediate layout
        # too) — the r7 memory footprint, src-partitioned by the join
        out_deg = g.edges.groupBy("src").agg(F.sum("weight").alias("wdeg"))
        return g.edges.join(out_deg.hint("shuffle_hash"), "src").select(
            "src", "dst", (F.col("weight") / F.col("wdeg")).alias("frac")
        )

    edges_deg = derived_layout(g.edges, "pagerank_frac", _build_edges_deg)
    out_deg = g.edges.groupBy("src").agg(F.sum("weight").alias("wdeg"))

    nodes = g.nodes.cache()

    # resume support: pick up the latest durably-checkpointed superstep.
    # initial_scores is the DYNAMIC warm start (DynPageRank-style
    # recompute-after-events): seed with the previous run's vector — new
    # nodes fall back to 1/n — and convergence takes O(change) supersteps
    # instead of from-scratch.
    start = 0
    resumed = runner.latest_complete()
    if resumed is not None:
        start, scores = resumed
        scores = scores.select("id", "score")
    elif initial_scores is not None:
        scores = nodes.join(
            initial_scores.select("id", F.col("score").alias("warm")), "id", "left"
        ).select("id", F.coalesce("warm", F.lit(1.0 / n)).alias("score"))
    else:
        scores = nodes.withColumn("score", F.lit(1.0 / n))
    scores = scores.localCheckpoint(eager=True)

    iterations = start
    converged = False
    import time

    while iterations < max_iterations:
        t0 = time.monotonic()
        # gather: below the broadcast limit the |V|-sized score vector is
        # broadcast (the join then preserves the cached dst layout and the
        # groupBy(dst) needs NO exchange — a zero-shuffle superstep);
        # above it, shuffled-hash join as before (broadcast would be a
        # single-threaded driver build per superstep, sort-merge would
        # re-sort the cached edge relation every step).
        sc = scores.withColumnRenamed("id", "src")
        sc = F.broadcast(sc) if small else sc.hint("shuffle_hash")
        gathered = (
            edges_deg.join(sc, "src")
            .groupBy("dst")
            .agg(F.sum(F.col("frac") * F.col("score")).alias("gather"))
        )
        # update: join the gather result back onto the score vector itself,
        # carrying the previous value in the same row — the convergence norm
        # then needs no second |V| ⋈ |V| join. Nodes with no in-edges get
        # teleport only (left join ⇒ null gather ⇒ 0), covering dangling
        # targets exactly as PageRank.cpp:56-66.
        gj = gathered.withColumnRenamed("dst", "id")
        gj = F.broadcast(gj) if small else gj.hint("shuffle_hash")
        new_scores = (
            scores.withColumnRenamed("score", "old")
            .join(gj, "id", "left")
            .select(
                "id",
                (
                    F.lit(teleport)
                    + F.lit(damp) * F.coalesce(F.col("gather"), F.lit(0.0))
                ).alias("score"),
                "old",
            )
        )
        iterations += 1
        new_scores = runner.persist_step(new_scores, iterations)

        # convergence on pre-normalization values (PageRank.cpp:68-71) —
        # one cheap scan of the just-materialized step output
        if norm == "l1":
            delta = new_scores.agg(
                F.sum(F.abs(F.col("score") - F.col("old")))
            ).collect()[0][0]
        else:
            delta = math.sqrt(
                new_scores.agg(
                    F.sum(F.pow(F.col("score") - F.col("old"), 2))
                ).collect()[0][0]
            )
        scores = new_scores.select("id", "score")
        runner.record(iterations, delta=delta, step_s=round(time.monotonic() - t0, 4))
        if delta <= tol:
            converged = True
            break

    # end-only normalization (PageRank.cpp:75-91)
    if normalized:
        dangling_sum = (
            scores.join(out_deg.withColumnRenamed("src", "id"), "id", "left")
            .filter(F.coalesce(F.col("wdeg"), F.lit(0.0)) == 0.0)
            .agg(F.sum("score"))
            .collect()[0][0]
            or 0.0
        )
        factor = (1.0 / n) * ((1.0 - damp) + damp * dangling_sum)
    else:
        factor = scores.agg(F.sum("score")).collect()[0][0] or 1.0
    out = scores.select("id", (F.col("score") / F.lit(factor)).alias("score"))
    return PageRankResult(scores=out, iterations=iterations, converged=converged)
