"""Graph layout — PivotMDS and layout metrics.

Reference: ``viz/PivotMDS.cpp`` (Brandes/Pich pivot MDS) and
``viz/GraphLayoutAlgorithm.hpp`` (``numEdgeCrossings``).

Spark plan (PivotMDS): the only O(n·k) state is the pivot-distance
table from ONE batched multi-source BFS/SSSP (k = numPivots roots share
every level's shuffle). Double-centering is two groupBy aggregates plus
a broadcast of the k column means; the k×k Gram matrix C^T·C is
accumulated per-partition with an Arrow ``mapInPandas`` (each partition
emits one k²-float partial — the driver only ever holds k×k). The
power iteration with deflation runs driver-side on the k×k matrix
(``PivotMDS.cpp:powerMethod`` — tol 1e-6, ≤1500 iters), and each
eigenvector is projected back through C as one JVM-side array dot per
node. Nothing driver-sized scales with n.

Reference quirks mirrored on purpose:

* ``PivotMDS.cpp:48`` says "double center the squared distance matrix"
  but the code centers the RAW distances (``triplet.value`` is never
  squared). We center raw distances too.
* Row/column means divide by numPivots / n over the PRESENT (reached)
  entries only; (pivot, node) pairs the pivot cannot reach stay exactly
  0 in C (missing CSR triplets), not "0 centered". Identical here.
* The start vector of each power iteration is random in the reference;
  we use a seeded portable uniform so the layout is deterministic at
  any parallelism.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.superstep import SuperstepRunner


def _pivot_table(g: Graph, k: int, seed: int) -> DataFrame:
    """(root, j) — k seeded pivots with dense pivot index j in 0..k-1.

    Same seeded-hash order as ``graphtools.random_nodes`` so the draw is
    parallelism-invariant; the row_number over that total order assigns
    the CSR column index the reference assigns by loop position.
    """
    w = Window.orderBy(F.xxhash64("id", F.lit(seed)), F.asc("id"))
    return (
        g.nodes.select("id", F.xxhash64("id", F.lit(seed)).alias("h"))
        .withColumn("j", F.row_number().over(w) - F.lit(1))
        .filter(F.col("j") < k)
        .select(F.col("id").alias("root"), "j")
    )


def centered_pivot_distances(
    g: Graph,
    pivots: DataFrame,
    runner: SuperstepRunner | None = None,
) -> DataFrame:
    """(node, j, b) — the present-entry double-centered pivot-distance
    matrix C that PivotMDS eigen-decomposes (``viz/PivotMDS.cpp:44-76``;
    the distributed half of the kernel). ``pivots`` is (root, j) with
    dense column index j; absent (unreached) entries are the exact CSR
    zeros and are NOT emitted. Exposed so deterministic pivot sets can
    be replayed externally (the correctness gate feeds explicit pivots
    a SQL oracle can reproduce; ``pivot_mds`` feeds the seeded draw)."""
    from networkit_spark.operators.distance import (
        multi_source_bfs,
        multi_source_sssp,
    )

    n = g.num_nodes()
    k = pivots.count()
    if g.weighted:
        dists = multi_source_sssp(g, pivots.select("root"), runner=runner)
    else:
        dists = multi_source_bfs(
            g, pivots.select("root"), runner=runner, with_sigma=False
        ).visited
    trip = (
        dists.join(F.broadcast(pivots), "root")
        .select(F.col("node"), F.col("j"), F.col("dist").cast("double").alias("d"))
    )

    # double centering over PRESENT entries (see module quirk notes):
    # b = d - rowMean(node) - colMean(j) + grandMean, with
    # rowMean = sum_present(d)/k, colMean = sum_present(d)/n,
    # grandMean = sum_all(d)/(n·k) (both half-sums collapse to this).
    col_means = trip.groupBy("j").agg((F.sum("d") / F.lit(float(n))).alias("cm"))
    grand = trip.agg((F.sum("d") / F.lit(float(n) * k)).alias("g"))
    row_means = trip.groupBy("node").agg(
        (F.sum("d") / F.lit(float(k))).alias("rm")
    )
    return (
        trip.join(F.broadcast(col_means), "j")
        .join(row_means, "node")
        .crossJoin(F.broadcast(grand))
        .select(
            "node",
            "j",
            (F.col("d") - F.col("rm") - F.col("cm") + F.col("g")).alias("b"),
        )
    )


def pivot_mds(
    g: Graph,
    dim: int = 2,
    num_pivots: int = 250,
    seed: int = 42,
    runner: SuperstepRunner | None = None,
) -> DataFrame:
    """(id, pos) — pos is an array<double> of length ``dim``
    (``PivotMDS::run``, ``viz/PivotMDS.cpp:20-107``).

    ``num_pivots`` is clamped to n like the reference's WARN branch.
    """
    from networkit_spark.plans.pin import pin

    n = g.num_nodes()
    if n == 0:
        raise ValueError("pivot_mds on an empty graph")
    k = min(num_pivots, n)

    pivots = _pivot_table(g, k, seed)
    centered = centered_pivot_distances(g, pivots, runner=runner)

    # densify to one k-vector per node (missing pivot entries stay 0.0,
    # mirroring the CSR zeros) — one groupBy, all JVM-side expressions
    idx = F.sequence(F.lit(0), F.lit(k - 1))
    vec_df = (
        centered.groupBy("node")
        .agg(F.map_from_entries(F.collect_list(F.struct("j", "b"))).alias("m"))
        .select(
            "node",
            F.transform(
                idx, lambda i: F.coalesce(F.try_element_at("m", i), F.lit(0.0))
            ).alias("vec"),
        )
        .transform(pin)
    )

    # Gram matrix C^T·C: per-partition partial outer-product sums —
    # each Arrow batch folds into ONE running k×k accumulator, one
    # k²-float row per partition reaches the driver
    def _gram(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = np.zeros((k, k), dtype=np.float64)
        seen = False
        for b in batches:
            if len(b):
                m = np.stack(b["vec"].to_numpy())
                acc += m.T @ m
                seen = True
        if seen:
            yield pd.DataFrame({"g": [acc.ravel().tolist()]})

    parts = vec_df.select("vec").mapInPandas(_gram, "g array<double>").collect()
    cc = np.zeros((k, k), dtype=np.float64)
    for r in parts:
        cc += np.asarray(r["g"], dtype=np.float64).reshape(k, k)

    # power iteration + deflation on the k×k matrix (driver-side,
    # PivotMDS.cpp:powerMethod) — seeded start instead of Aux::Random
    eigvecs: list[np.ndarray] = []
    for d in range(dim):
        rng = np.random.default_rng(seed * 1009 + d)
        x = 2.0 * rng.random(k) - 1.0
        for _ in range(1500):
            old = x
            x = cc @ old
            norm = np.linalg.norm(x)
            if norm == 0.0:
                x = old  # degenerate (zero matrix) — keep the start vec
                break
            x = x / norm
            if np.linalg.norm(x - old) <= 1e-6:
                break
        denom = float(x @ x)
        lam = float(x @ (cc @ x)) / denom if denom else 0.0
        eigvecs.append(x)
        cc = cc - (lam / (denom if denom else 1.0)) * np.outer(x, x)

    # pos[d] = C · e_d: one zip_with/aggregate dot per dimension, all
    # JVM-side; nodes with no reached pivot project to the origin like
    # the reference's all-zero CSR rows
    zero_vec = F.array([F.lit(0.0)] * k)
    out = g.nodes.join(
        vec_df.withColumnRenamed("node", "id"), "id", "left"
    ).select("id", F.coalesce("vec", zero_vec).alias("vec"))
    coords = [
        F.aggregate(
            F.zip_with(
                "vec",
                F.array([F.lit(float(v)) for v in e]),
                lambda a, b: a * b,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias(f"c{d}")
        for d, e in enumerate(eigvecs)
    ]
    return out.select("id", *coords).select(
        "id", F.array(*[f"c{d}" for d in range(dim)]).alias("pos")
    )


def num_edge_crossings(
    g: Graph, coords: DataFrame, max_edges: int = 20_000
) -> int:
    """Count pairwise edge crossings of a 2-D layout
    (``GraphLayoutAlgorithm.hpp:numEdgeCrossings``).

    ``coords`` is (id, pos array<double>) as returned by ``pivot_mds``.
    Inherently O(m²) pairs — the edges×edges self-join shuffles on
    nothing and explodes quadratically, so it raises above ``max_edges``
    (pass a larger value to opt in knowingly; at scale, crossing counts
    belong on a subgraph sample).

    Reference quirks mirrored on purpose: the intercept of the SECOND
    segment is computed with the FIRST segment's slope
    (``b2 = y_p - m1·x_p``, GraphLayoutAlgorithm.hpp:46), the overlap
    test checks the intersection x only against each segment's min/max
    x, vertical segments flow through IEEE ±inf/NaN arithmetic, and the
    ordered double-count is halved at the end.
    """
    m = g.num_edges()
    if max_edges is not None and m > max_edges:
        raise ValueError(
            f"num_edge_crossings is O(m^2) pairs; graph has {m} edges > "
            f"max_edges={max_edges}. Pass max_edges=None (or higher) to "
            "opt in, or count on a sampled subgraph."
        )
    e = (g.edges if g.directed else g.canonical_undirected_edges()).select(
        "src", "dst"
    )
    pos = coords.select(
        "id",
        F.element_at("pos", 1).alias("x"),
        F.element_at("pos", 2).alias("y"),
    )
    seg = (
        e.join(pos.withColumnRenamed("id", "src"), "src")
        .withColumnsRenamed({"x": "x1", "y": "y1"})
        .join(pos.withColumnRenamed("id", "dst"), "dst")
        .withColumnsRenamed({"x": "x2", "y": "y2"})
        .select("src", "dst", "x1", "y1", "x2", "y2")
    )
    a = seg.select(
        F.col("src").alias("u"), F.col("dst").alias("v"),
        F.col("x1").alias("ux"), F.col("y1").alias("uy"),
        F.col("x2").alias("vx"), F.col("y2").alias("vy"),
    )
    b = seg.select(
        F.col("src").alias("p"), F.col("dst").alias("q"),
        F.col("x1").alias("px"), F.col("y1").alias("py"),
        F.col("x2").alias("qx"), F.col("y2").alias("qy"),
    )
    pairs = a.crossJoin(b).filter(
        ~(
            ((F.col("p") == F.col("u")) & (F.col("q") == F.col("v")))
            | ((F.col("p") == F.col("v")) & (F.col("q") == F.col("u")))
        )
    )
    # try_divide (NULL on zero divisor) instead of IEEE inf: vertical
    # segments then flow NULL→uncounted, the same outcome the reference
    # reaches through inf/NaN comparison propagation (ANSI mode would
    # otherwise throw DIVIDE_BY_ZERO on doubles)
    m1 = F.try_divide(F.col("vy") - F.col("uy"), F.col("vx") - F.col("ux"))
    m2 = F.try_divide(F.col("qy") - F.col("py"), F.col("qx") - F.col("px"))
    b1 = F.col("uy") - m1 * F.col("ux")
    b2 = F.col("py") - m1 * F.col("px")  # reference uses m1 here
    xi = F.try_divide(b2 - b1, m1 - m2)
    crossing = F.when(
        m1 != m2,
        (F.least("ux", "vx") <= xi)
        & (F.least("px", "qx") <= xi)
        & (xi <= F.greatest("ux", "vx"))
        & (xi <= F.greatest("px", "qx")),
    ).otherwise(b1 == b2)
    total = pairs.select(
        F.sum(crossing.cast("long")).alias("c")
    ).collect()[0]["c"]
    return int(total or 0) // 2
