"""Edge-score utilities — the reference's ``edgescores/`` module plus
the remaining ``sparsification/`` score classes.

All score tables follow the house convention: (src, dst, score) keyed by
canonical undirected edge (src < dst), the shape every producer in
:mod:`networkit_spark.operators.sparsification` emits. Everything here
is a pure column expression or a single join-agg — no iteration:

- ``edge_score_as_weight`` — ``edgescores/EdgeScoreAsWeight.cpp``
- ``edge_score_blender`` — ``edgescores/EdgeScoreBlender.cpp``
- ``edge_score_linearizer`` — ``edgescores/EdgeScoreLinearizer.cpp``
- ``edge_score_normalizer`` — ``edgescores/EdgeScoreNormalizer.cpp``
- ``geometric_mean_score`` — ``edgescores/GeometricMeanScore.cpp``
- ``random_edge_score`` — ``sparsification/RandomEdgeScore.cpp``
- ``multiscale_score`` — ``sparsification/MultiscaleScore.cpp``
- ``chance_corrected_triangle_score`` —
  ``sparsification/ChanceCorrectedTriangleScore.cpp``
- ``random_node_edge_score`` — ``sparsification/RandomNodeEdgeScore.cpp``
  (inherently sequential removal process — driver-sequential behind the
  house ``max_edges`` guard, like PathGrowingMatcher)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from networkit_spark.functions.porthash import DEFAULT_PRIME, md5_mod
from networkit_spark.graph import Graph


def _canonical_scored(g: Graph, scores: DataFrame) -> DataFrame:
    return g.canonical_undirected_edges().join(
        scores.select("src", "dst", "score"), ["src", "dst"], "left"
    ).fillna(0.0, subset=["score"])


def edge_score_as_weight(
    g: Graph,
    scores: DataFrame,
    squared: bool = False,
    offset: float = 1.0,
    factor: float = 1.0,
) -> Graph:
    """Weighted copy of g with w(u,v) = offset + factor·score (or
    ·score², ``EdgeScoreAsWeight.cpp:10-27``, defaults offset=factor=1
    per the header)."""
    s = F.col("score") * F.col("score") if squared else F.col("score")
    can = _canonical_scored(g, scores).select(
        "src", "dst", (F.lit(offset) + F.lit(factor) * s).alias("weight")
    )
    return Graph.from_edges(can, directed=False, weighted=True, nodes=g.nodes)


def edge_score_blender(
    scores0: DataFrame, scores1: DataFrame, selection: DataFrame
) -> DataFrame:
    """Per-edge pick: score1 where ``selection.sel`` else score0
    (``EdgeScoreBlender.cpp:8-18``). ``selection``: (src, dst, sel)."""
    return (
        scores0.withColumnRenamed("score", "s0")
        .join(scores1.select("src", "dst", F.col("score").alias("s1")), ["src", "dst"])
        .join(selection.select("src", "dst", "sel"), ["src", "dst"])
        .select(
            "src", "dst", F.when(F.col("sel"), F.col("s1")).otherwise(F.col("s0")).alias("score")
        )
    )


def edge_score_linearizer(
    g: Graph, scores: DataFrame, inverse: bool = False
) -> DataFrame:
    """Replace scores by their rank position / (m−1) in ascending
    (descending when ``inverse``) score order; a single edge scores 0.5
    (``EdgeScoreLinearizer.cpp:9-43``). The reference breaks ties with
    ``Aux::Random::integer()`` — unspecified order; here ties break by
    canonical (src, dst), deterministic at any parallelism. The global
    rank is a window over ONE ordering — for huge m switch to the
    bucketed two-phase rank of ``compact_labels``; linearization is a
    preprocessing step on already-driver-visible score tables in the
    reference, so the plain window matches its scale envelope."""
    m = scores.count()
    if m == 1:
        return scores.select("src", "dst", F.lit(0.5).alias("score"))
    order = (
        [F.desc("score"), F.asc("src"), F.asc("dst")]
        if inverse
        else [F.asc("score"), F.asc("src"), F.asc("dst")]
    )
    w = Window.orderBy(*order)
    return scores.select(
        "src",
        "dst",
        ((F.row_number().over(w) - 1) / F.lit(float(m - 1))).alias("score"),
    )


def edge_score_normalizer(
    scores: DataFrame,
    invert: bool = False,
    lower: float = 0.0,
    upper: float = 1.0,
) -> DataFrame:
    """Affine-map scores onto [lower, upper]
    (``EdgeScoreNormalizer.cpp:9-32``): factor = (upper−lower)/(max−min),
    offset = lower − min·factor; ``invert`` flips the direction."""
    ext = scores.agg(F.min("score").alias("lo"), F.max("score").alias("hi"))
    out = scores.crossJoin(F.broadcast(ext))
    factor = (F.lit(upper) - F.lit(lower)) / (F.col("hi") - F.col("lo"))
    if invert:
        factor = -factor
        offset = F.lit(upper) - F.col("lo") * factor
    else:
        offset = F.lit(lower) - F.col("lo") * factor
    return out.select(
        "src", "dst", (factor * F.col("score") + offset).alias("score")
    )


def geometric_mean_score(g: Graph, scores: DataFrame) -> DataFrame:
    """score / sqrt(Σ_u · Σ_v) with Σ_u the sum of the attribute over
    u's incident edges; non-positive attributes keep score 0
    (``GeometricMeanScore.cpp:9-29``)."""
    can = _canonical_scored(g, scores)
    sums = (
        can.select(F.col("src").alias("id"), "score")
        .unionByName(can.select(F.col("dst").alias("id"), "score"))
        .groupBy("id")
        .agg(F.sum("score").alias("ssum"))
    )
    return (
        can.join(sums.select(F.col("id").alias("src"), F.col("ssum").alias("su")), "src")
        .join(sums.select(F.col("id").alias("dst"), F.col("ssum").alias("sv")), "dst")
        .select(
            "src",
            "dst",
            F.when(
                F.col("score") > 0,
                F.col("score") / F.sqrt(F.col("su") * F.col("sv")),
            )
            .otherwise(F.lit(0.0))
            .alias("score"),
        )
    )


def random_edge_score(g: Graph, seed: int = 42) -> DataFrame:
    """Uniform(0,1) score per canonical edge
    (``RandomEdgeScore.cpp:6-15``) — portable md5 draws, so the same
    scores at any parallelism and in the SQL oracle."""
    return g.canonical_undirected_edges().select(
        "src",
        "dst",
        (
            md5_mod(
                F.col("src") * F.lit(1_000_003) + F.col("dst"), salt=f"res{seed}:"
            ).cast("double")
            / F.lit(float(DEFAULT_PRIME))
        ).alias("score"),
    )


def multiscale_score(g: Graph, scores: DataFrame) -> DataFrame:
    """Multiscale backbone probability (``MultiscaleScore.cpp:10-40``):
    per endpoint u, p = attr/Σ_u attr and prob = 1 − (1−p)^(deg(u)−1);
    the edge keeps the max over its two endpoints."""
    can = _canonical_scored(g, scores)
    inc = can.select(F.col("src").alias("id"), "src", "dst", "score").unionByName(
        can.select(F.col("dst").alias("id"), "src", "dst", "score")
    )
    per = inc.groupBy("id").agg(
        F.sum("score").alias("ssum"), F.count(F.lit(1)).alias("deg")
    )
    prob = (
        inc.join(per, "id")
        .withColumn(
            "p",
            1.0
            - F.pow(
                1.0 - F.col("score") / F.col("ssum"), F.col("deg").cast("double") - 1.0
            ),
        )
        .groupBy("src", "dst")
        .agg(F.max("p").alias("score"))
    )
    return prob


def chance_corrected_triangle_score(g: Graph) -> DataFrame:
    """tri·(n−2) / ((deg(u)−1)(deg(v)−1)); 1 when tri = 0 and either
    endpoint has degree 1, else 0
    (``ChanceCorrectedTriangleScore.cpp:9-21``)."""
    from networkit_spark.operators.triangles import (
        _simple_degrees,
        triangle_count_per_edge,
    )

    n = g.num_nodes()
    tri = triangle_count_per_edge(g)
    deg = _simple_degrees(g)
    out = (
        g.canonical_undirected_edges()
        .join(tri, ["src", "dst"], "left")
        .fillna(0, subset=["triangles"])
        .join(deg.select(F.col("id").alias("src"), F.col("deg").alias("du")), "src")
        .join(deg.select(F.col("id").alias("dst"), F.col("deg").alias("dv")), "dst")
    )
    return out.select(
        "src",
        "dst",
        F.when(
            F.col("triangles") > 0,
            F.col("triangles").cast("double")
            * F.lit(float(n - 2))
            / ((F.col("du") - 1) * (F.col("dv") - 1)),
        )
        .when((F.col("du") == 1) | (F.col("dv") == 1), F.lit(1.0))
        .otherwise(F.lit(0.0))
        .alias("score"),
    )


def random_node_edge_score(
    g: Graph,
    rne_ratio: float = 1.0,
    seed: int = 42,
    max_edges: int | None = 500_000,
) -> DataFrame:
    """Removal-ordinal scores from the random node-edge sparsification
    process (``RandomNodeEdgeScore.cpp:9-45``): repeatedly remove a
    random edge — with probability ``rne_ratio`` a node-biased draw
    (random node, then random incident edge), else uniform — and score
    it removed_count/m. The process is inherently sequential (every
    draw depends on the surviving graph), so it runs driver-side with a
    seeded generator behind the house ``max_edges`` guard
    (cut_clustering / path_growing_matcher convention); pass
    ``max_edges=None`` to opt in above it. Scale alternative:
    :func:`random_edge_score` (one pass, same filtering use)."""
    import numpy as np

    can = g.canonical_undirected_edges()
    if max_edges is not None:
        m_total = can.count()
        if m_total > max_edges:
            raise ValueError(
                f"random_node_edge_score is driver-sequential: {m_total} edges "
                f"exceeds max_edges={max_edges}; pass max_edges=None to opt in, "
                "or use random_edge_score at scale"
            )
    edges = [(int(r["src"]), int(r["dst"])) for r in can.collect()]
    rng = np.random.default_rng(seed)
    m = len(edges)
    alive = dict.fromkeys(edges, True)
    inc: dict[int, set] = {}
    for u, v in edges:
        inc.setdefault(u, set()).add((u, v))
        inc.setdefault(v, set()).add((u, v))
    live_nodes = [u for u in inc]
    out = []
    removed = 0
    live = set(edges)
    while live:
        if rng.random() < rne_ratio:
            # node-biased: random node with a live incident edge, then
            # a random incident live edge (GraphTools::randomEdge shape)
            while True:
                u = live_nodes[int(rng.integers(0, len(live_nodes)))]
                cand = [e for e in inc[u] if e in live]
                if cand:
                    e = cand[int(rng.integers(0, len(cand)))]
                    break
        else:
            idx = int(rng.integers(0, len(edges)))
            while edges[idx] not in live:
                idx = int(rng.integers(0, len(edges)))
            e = edges[idx]
        live.remove(e)
        out.append((e[0], e[1], removed / m))
        removed += 1
    spark = g.edges.sparkSession
    return spark.createDataFrame(out, "src long, dst long, score double")
