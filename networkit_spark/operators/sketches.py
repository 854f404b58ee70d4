"""Neighborhood-function sketches — ANF / effective diameter.

Reference: ``distance/EffectiveDiameterApproximation.cpp:19-80`` —
Flajolet-Martin ANF: every node holds k bitmasks; bit i of a fresh mask
is set with probability 2^-(i+1); per hop every node ORs in its
neighbors' masks; the neighborhood-size estimate at hop h is
``2^b / 0.77351`` with b = mean index of the lowest zero bit; the
effective diameter is the first hop where ≥ ratio (default 0.9) of the
final reachable-pairs mass is covered.

Spark mapping: masks are LONG columns; the per-hop step is
``edges ⋈ masks`` → ``groupBy(node).agg(bit_or(mask_j)…)`` — the same
shuffle shape as every other superstep in this engine (this sketch
family is also what backs Spark's own ``approx_count_distinct``). Bits
are seeded deterministically from ``xxhash64(node, trial, seed)``: one
geometric draw per (node, trial) — equivalent to the reference's
bit-by-bit coin flips (``EffectiveDiameterApproximation.cpp:52-62``) —
so results are identical at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph

_PHI = 0.77351  # Flajolet-Martin bias correction


def _init_masks(
    g: Graph, k: int, bits: int, seed: int, portable_hash: bool = False
) -> DataFrame:
    """(id, m0..m{k-1}): one geometric bit set per trial mask.

    ``portable_hash`` draws the geometric index as the trailing-zero
    count of the cross-engine md5 hash (``functions/porthash.py``) —
    pure integer arithmetic both engines compute bit-for-bit, so a
    DuckDB oracle can replay the sketch exactly. The default draws
    ``floor(-log2(1-u))`` from an ``xxhash64`` uniform (cheaper; the
    internal path)."""
    if portable_hash:
        from networkit_spark.functions.porthash import md5_mod

        cols = []
        for t in range(k):
            h = md5_mod(F.col("id"), salt=f"anf{seed}:{t}:")
            # trailing zeros of h (h=0 → cap): P(idx=i) ≈ 2^-(i+1)
            tz = F.bit_count(h.bitwiseAND(-h) - F.lit(1))
            idx = F.when(h == 0, F.lit(bits - 1)).otherwise(
                F.least(tz, F.lit(bits - 1))
            )
            cols.append(idx.alias(f"idx{t}"))
        staged = g.nodes.select("id", *cols)
        return staged.selectExpr(
            "id",
            *[f"shiftleft(CAST(1 AS BIGINT), idx{t}) AS m{t}" for t in range(k)],
        )
    u = lambda t: (  # noqa: E731 — uniform(0,1) from a seeded hash
        f"(CAST(xxhash64(id, {t}, {seed}) AS DOUBLE) / {float(1 << 64)} + 0.5)"
    )
    idx = [
        f"CAST(least(CAST(floor(-log2(1.0 - {u(t)})) AS INT), {bits - 1}) AS INT)"
        for t in range(k)
    ]
    return g.nodes.selectExpr(
        "id",
        *[f"shiftleft(CAST(1 AS BIGINT), {idx[t]}) AS m{t}" for t in range(k)],
    )


def _estimate_total(masks: DataFrame, k: int) -> float:
    """Σ over nodes of 2^(mean lowest-zero-bit index)/φ."""
    # lowest zero bit of m: r = (~m) & (m+1) is a power of two; its index
    # is bit_count(r-1) — exact integer arithmetic, no float log rounding
    lz = [f"CAST(bit_count(((~m{t}) & (m{t} + 1)) - 1) AS DOUBLE)" for t in range(k)]
    b = "(" + " + ".join(lz) + f") / {float(k)}"
    row = masks.selectExpr(f"pow(2.0, {b}) / {_PHI} AS est").agg(
        F.sum("est")
    ).collect()[0]
    return float(row[0] or 0.0)


def neighborhood_function(
    g: Graph,
    k: int = 64,
    bits: int = 48,
    max_hops: int = 32,
    seed: int = 42,
    portable_hash: bool = False,
) -> list[float]:
    """Estimated #(node, reachable-node) pairs at hops 1..H; stops once the
    estimate is stable (all sketches saturated ⇒ all nodes reached)."""
    # r8 (guide §2.3/§2.4): the k mask columns make this the widest
    # gather in the engine (k longs per node) — broadcasting the |V|-row
    # mask table over the shared dst layout removes the per-hop exchange
    # of the edge-scale OR-aggregation entirely (the old plan shuffled
    # ~partitions×|V|×k longs per hop even after partial aggregation).
    from networkit_spark.plans.edge_layout import broadcast_row_limit, partitioned_edges

    small = g.num_nodes() <= broadcast_row_limit()
    edges = partitioned_edges(
        g.symmetrized_edges() if g.directed else g.edges, "dst"
    ).select("src", "dst")
    masks = _init_masks(g, k, bits, seed, portable_hash).localCheckpoint(eager=True)
    mask_cols = [f"m{t}" for t in range(k)]

    estimates: list[float] = []
    prev_total = None
    for _hop in range(max_hops):
        mj = masks.withColumnRenamed("id", "src")
        mj = F.broadcast(mj) if small else mj.hint("shuffle_hash")
        nbr = (
            edges.join(mj, "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(*[F.bit_or(F.col(c)).alias(c) for c in mask_cols])
        )
        masks = (
            masks.alias("m")
            .join(nbr.alias("n"), "id", "left")
            .select(
                "id",
                *[
                    # SQL `|` = bitwise OR on BIGINT (python `|` on Columns
                    # is logical OR and rejects integral types)
                    F.expr(f"m.{c} | coalesce(n.{c}, CAST(0 AS BIGINT))").alias(c)
                    for c in mask_cols
                ],
            )
            .localCheckpoint(eager=True)
        )
        total = _estimate_total(masks, k)
        estimates.append(total)
        if prev_total is not None and total <= prev_total:
            break
        prev_total = total
    return estimates


def effective_diameter_approx(
    g: Graph,
    ratio: float = 0.9,
    k: int = 64,
    bits: int = 48,
    seed: int = 42,
    portable_hash: bool = False,
) -> float:
    """First hop h where the neighborhood function reaches ``ratio`` of its
    final value (``distance/EffectiveDiameterApproximation.cpp:64-80``)."""
    nf = neighborhood_function(g, k=k, bits=bits, seed=seed, portable_hash=portable_hash)
    if not nf:
        return 0.0
    final = nf[-1]
    for h, val in enumerate(nf, start=1):
        if val >= ratio * final:
            return float(h)
    return float(len(nf))


def neighborhood_function_heuristic(
    g: Graph,
    n_samples: int | None = None,
    seed: int = 42,
    portable_hash: bool = False,
) -> list[int]:
    """NeighborhoodFunctionHeuristic
    (``distance/NeighborhoodFunctionHeuristic.cpp``, RANDOM strategy):
    sampled cumulative neighborhood function N(d) for d = 1..diameter on
    an undirected connected graph, with the reference's exact endpoint
    corrections — N(1) = 2m and N(diameter) = n(n−1) — and the interior
    scaled by n/samples then rounded and accumulated. Default samples =
    ⌈max(0.15·n, √m)⌉ like the reference.

    One batched multi-source BFS shared across all sampled roots; the
    per-distance histogram is a two-column aggregation. (The reference's
    SPLIT strategy is a sequential balanced re-ordering — RANDOM is the
    documented surface here.)"""
    from networkit_spark.functions.porthash import md5_mod
    from networkit_spark.operators.components import connected_components
    from networkit_spark.operators.distance import diameter_exact, multi_source_bfs

    if g.directed:
        raise ValueError("undirected graphs only (reference contract)")
    n = g.num_nodes()
    m = g.canonical_undirected_edges().count()
    ncomp = connected_components(g).select("label").distinct().count()
    if ncomp > 1:
        raise ValueError("connected graphs only (reference contract)")
    if not n_samples:
        import math as _math

        n_samples = int(_math.ceil(max(0.15 * n, _math.sqrt(m))))
    k = min(int(n_samples), n)
    dia = int(diameter_exact(g))
    if dia == 0:
        return []
    order = (
        [md5_mod(F.col("id"), salt=f"nfh{seed}:").asc(), F.col("id").asc()]
        if portable_hash
        else [F.xxhash64("id", F.lit(seed)).asc()]
    )
    sampled = g.nodes.orderBy(*order).limit(k).select("id")
    vis = multi_source_bfs(g, sampled, with_sigma=False).visited
    hist = {
        int(r["dist"]): int(r["c"])
        for r in vis.filter(F.col("dist") > 0)
        .groupBy("dist")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    result = [0] * dia
    result[0] = 2 * m
    result[dia - 1] = n * (n - 1)
    norm = n / float(k)
    # interior distances 2..dia-1 (both endpoints pinned), cumulative
    for dist in range(2, dia):
        result[dist - 1] = int(round(hist.get(dist, 0) * norm))
        if dist > 1:
            result[dist - 1] += result[dist - 2]
    return result
