"""Deterministic seeded graph generators (reference module ``generators/``).

All generators are pure column expressions over ``spark.range`` — no
driver-side loops, no Python RNG — so they scale linearly with
parallelism and produce IDENTICAL graphs at any cluster size (the seed
feeds ``xxhash64``, which is deterministic and partition-independent).

- ``erdos_renyi``: G(n, p) (``ErdosRenyiGenerator.hpp:44``) — per-pair
  Bernoulli via hash-to-uniform. O(n²) candidate space is enumerated
  lazily only for small n (tests); for scale graphs use ``rmat``.
- ``clustered_random``: planted partition (n, k, p_in, p_out)
  (``ClusteredRandomGraphGenerator.hpp:36``) — the primary PLP fixture.
- ``rmat``: R-MAT power-law generator (``RmatGenerator.hpp:44``) — the
  primary skew/bench fixture; per-edge recursive quadrant choice unrolled
  as ``scale`` rounds of column ops.
- ``chain`` / ``star`` / ``complete``: worst-case fixtures (long paths for
  min-label rounds, hubs for skew handling).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from networkit_spark.graph import Graph


def _uniform(col, seed: int):
    """Deterministic uniform(0,1) from a column + seed (xxhash64-based)."""
    h = F.xxhash64(col, F.lit(seed))
    # map signed 64-bit to [0,1)
    return (h.cast("double") / F.lit(float(1 << 64))) + F.lit(0.5)


def erdos_renyi(
    spark: SparkSession, n: int, p: float, seed: int = 42, directed: bool = False
) -> Graph:
    """G(n, p): every (unordered) pair kept with probability p."""
    pairs = (
        spark.range(n)
        .alias("a")
        .crossJoin(spark.range(n).alias("b"))
        .select(F.col("a.id").alias("src"), F.col("b.id").alias("dst"))
    )
    pairs = pairs.filter(
        F.col("src") != F.col("dst")
        if directed
        else F.col("src") < F.col("dst")
    )
    key = F.col("src") * F.lit(n) + F.col("dst")
    edges = pairs.filter(_uniform(key, seed) < F.lit(p))
    nodes = spark.range(n).select("id")
    return Graph.from_edges(edges, directed=directed, nodes=nodes)


def clustered_random(
    spark: SparkSession,
    n: int,
    k: int,
    p_intra: float,
    p_inter: float,
    seed: int = 42,
) -> tuple[Graph, DataFrame]:
    """Planted-partition graph + ground-truth labels (node, label).

    Cluster of node i = i % k (balanced, deterministic). Pair (u,v) kept
    with p_intra if same cluster else p_inter.
    """
    pairs = (
        spark.range(n)
        .alias("a")
        .crossJoin(spark.range(n).alias("b"))
        .select(F.col("a.id").alias("src"), F.col("b.id").alias("dst"))
        .filter(F.col("src") < F.col("dst"))
    )
    same = (F.col("src") % k) == (F.col("dst") % k)
    key = F.col("src") * F.lit(n) + F.col("dst")
    u = _uniform(key, seed)
    edges = pairs.filter(
        F.when(same, u < F.lit(p_intra)).otherwise(u < F.lit(p_inter))
    )
    nodes = spark.range(n).select("id")
    truth = spark.range(n).select(
        F.col("id").alias("node"), (F.col("id") % k).alias("label")
    )
    return Graph.from_edges(edges, nodes=nodes), truth


def rmat(
    spark: SparkSession,
    scale: int,
    edge_factor: int = 8,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    d: float = 0.05,
    seed: int = 42,
    directed: bool = True,
) -> Graph:
    """R-MAT: 2^scale nodes, edge_factor·2^scale edges, power-law skew.

    Each edge picks a quadrant per bit level; the recursion is unrolled as
    ``scale`` column expressions (one uniform draw per level per endpoint
    bit), all JVM-side.
    """
    n = 1 << scale
    m = edge_factor * n
    e = spark.range(m).select(F.col("id").alias("eid"))
    src = F.lit(0).cast("long")
    dst = F.lit(0).cast("long")
    for level in range(scale):
        u = _uniform(F.col("eid"), seed * 1_000_003 + level)
        # quadrant thresholds: a | b | c | d
        src = src + F.when(u >= F.lit(a + b), F.lit(1 << level)).otherwise(0).cast("long")
        dst = dst + (
            F.when((u >= F.lit(a)) & (u < F.lit(a + b)), F.lit(1 << level))
            .when(u >= F.lit(a + b + c), F.lit(1 << level))
            .otherwise(0)
            .cast("long")
        )
    edges = e.select(src.alias("src"), dst.alias("dst"))
    nodes = spark.range(n).select("id")
    return Graph.from_edges(edges, directed=directed, nodes=nodes, dedupe=True)


def chain(spark: SparkSession, n: int) -> Graph:
    """Path graph 0-1-2-…-(n-1): worst case for naive min-label rounds."""
    edges = spark.range(n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    return Graph.from_edges(edges, nodes=spark.range(n).select("id"))


def star(spark: SparkSession, n_leaves: int, center: int = 0) -> Graph:
    """Star graph: one hub, n_leaves leaves — the salting/skew fixture."""
    edges = spark.range(1, n_leaves + 1).select(
        F.lit(center).cast("long").alias("src"), F.col("id").alias("dst")
    )
    return Graph.from_edges(edges, nodes=spark.range(n_leaves + 1).select("id"))


def complete(spark: SparkSession, n: int) -> Graph:
    pairs = (
        spark.range(n)
        .alias("a")
        .crossJoin(spark.range(n).alias("b"))
        .select(F.col("a.id").alias("src"), F.col("b.id").alias("dst"))
        .filter(F.col("src") < F.col("dst"))
    )
    return Graph.from_edges(pairs, nodes=spark.range(n).select("id"))
