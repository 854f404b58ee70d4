"""Algebraic distance — Jacobi-smoothed random test vectors.

Reference: ``distance/AlgebraicDistance.cpp`` (Chen/Safro algebraic
distance): k random "load" systems, ``numIters`` rounds of
``load ← (1−ω)·load + ω·(weighted neighbor mean)``, per-system min-max
normalization, distance(u,v) = Lp (or max) norm of the load differences.

Spark plan: loads are k DOUBLE columns on one |V|-row DataFrame; a round
is ONE edges⋈loads shuffle + a groupBy(dst) computing all k weighted
means at once (column-parallel — k does not add shuffles). The init is a
portable salted-md5 uniform (``functions/porthash.py``) instead of the
reference's RNG, so results are deterministic at any parallelism AND
reproducible in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.functions.porthash import DEFAULT_PRIME, md5_mod
from networkit_spark.graph import Graph
from networkit_spark.plans.superstep import SuperstepRunner


def _init_loads(nodes: DataFrame, k: int) -> DataFrame:
    cols = [
        (md5_mod(F.col("id").cast("string"), salt=f"ad{i}:") / F.lit(float(DEFAULT_PRIME))).alias(f"l{i}")
        for i in range(k)
    ]
    return nodes.select("id", *cols)


def algebraic_distances(
    g: Graph,
    num_systems: int = 10,
    num_iters: int = 30,
    omega: float = 0.5,
    norm: int = 2,
    runner: SuperstepRunner | None = None,
) -> DataFrame:
    """(src, dst, score) per canonical undirected edge — the reference's
    ``withEdgeScores`` output. ``norm=0`` means max-norm."""
    from networkit_spark.plans.edge_layout import broadcast_row_limit, partitioned_edges

    spark = g.edges.sparkSession
    runner = runner or SuperstepRunner(spark)
    k = num_systems
    # r8 (guide §2.4): shared dst-partitioned layout + broadcast load
    # vector below the row limit — the Jacobi gather then aggregates by
    # dst without an Exchange (the old plan shuffled the load vector and
    # the gathered relation every one of the 30 iterations).
    small = g.num_nodes() <= broadcast_row_limit()
    edges = partitioned_edges(
        g.symmetrized_edges() if g.directed else g.edges, "dst"
    ).select("src", "dst", "weight")

    loads = _init_loads(g.nodes, k).localCheckpoint(eager=True)
    for it in range(1, num_iters + 1):
        lj = loads.withColumnRenamed("id", "src")
        lj = F.broadcast(lj) if small else lj.hint("shuffle_hash")
        gathered = (
            edges.join(lj, "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(
                F.sum("weight").alias("wdeg"),
                *[F.sum(F.col("weight") * F.col(f"l{i}")).alias(f"s{i}") for i in range(k)],
            )
        )
        gj = F.broadcast(gathered) if small else gathered.hint("shuffle_hash")
        loads = (
            loads.join(gj, "id", "left")
            .select(
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
        )
        loads = runner.persist_step(loads, it)
    loads.count()

    # per-system min-max normalization: new = (min − old) / (min − max)
    mm = loads.agg(
        *[F.min(f"l{i}").alias(f"mn{i}") for i in range(k)],
        *[F.max(f"l{i}").alias(f"mx{i}") for i in range(k)],
    ).collect()[0]
    normed = loads.select(
        "id",
        *[
            (
                (F.lit(mm[f"mn{i}"]) - F.col(f"l{i}"))
                / F.lit(mm[f"mn{i}"] - mm[f"mx{i}"])
            ).alias(f"l{i}")
            for i in range(k)
        ],
    )

    e = g.canonical_undirected_edges()
    j = (
        e.join(normed.withColumnRenamed("id", "src"), "src")
        .join(
            normed.select(
                F.col("id").alias("dst"), *[F.col(f"l{i}").alias(f"r{i}") for i in range(k)]
            ),
            "dst",
        )
    )
    diffs = [F.abs(F.col(f"l{i}") - F.col(f"r{i}")) for i in range(k)]
    if norm == 0:  # MAX_NORM
        score = F.greatest(*diffs) if k > 1 else diffs[0]
    else:
        acc = None
        for d in diffs:
            term = F.pow(d, float(norm))
            acc = term if acc is None else acc + term
        score = F.pow(acc, 1.0 / norm)
    return j.select("src", "dst", score.alias("score"))
