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


def lfr_style(
    spark: SparkSession,
    n: int,
    k: int,
    mu: float = 0.1,
    avg_degree: int = 10,
    max_degree: int | None = None,
    tau_degree: float = 2.5,
    tau_comm: float = 1.5,
    seed: int = 42,
) -> tuple[Graph, DataFrame]:
    """LFR-style benchmark graph + ground truth (``generators/LFRGenerator.hpp:35``
    semantics, re-derived for columnar generation — NOT a port of the
    reference's sequential configuration-model rewiring):

    - node degrees ~ truncated power-law(τ₁) via inverse-CDF of a seeded
      hash-uniform (deterministic at any parallelism);
    - community of node i ~ power-law-skewed over k communities (so
      community sizes follow a power-law, the LFR property);
    - each node emits ``deg`` stubs; a stub is intra-community with
      probability 1−μ, else global. Targets are sampled by indexing into
      a per-community member table (join on (community, index)) — no
      driver-side state, every step a hash or a keyed join.

    Returns (graph, truth) with truth = (node, label). The realized
    degree sequence approximates the drawn one (collisions/self-pairs
    dropped), same as LFR's rewiring tolerance.
    """
    max_degree = max_degree or max(int(n ** 0.5), avg_degree * 4)
    nodes = spark.range(n).select("id")

    # power-law degree draw: dmin·(1-u)^(-1/(τ-1)), capped
    u_deg = _uniform(F.col("id"), seed * 7 + 1)
    dmin = max(1, int(avg_degree * (tau_degree - 2) / (tau_degree - 1)))
    raw_deg = F.lit(float(dmin)) * F.pow(
        F.lit(1.0) - u_deg, F.lit(-1.0 / (tau_degree - 1.0))
    )
    deg = F.least(F.round(raw_deg).cast("long"), F.lit(max_degree))

    # power-law community assignment: comm = floor(k · u^τ₂) skews sizes
    u_comm = _uniform(F.col("id"), seed * 7 + 2)
    comm = F.least(
        (F.lit(float(k)) * F.pow(u_comm, F.lit(tau_comm))).cast("long"),
        F.lit(k - 1),
    )

    prof = nodes.select("id", deg.alias("deg"), comm.alias("comm")).cache()
    truth = prof.select(F.col("id").alias("node"), F.col("comm").alias("label"))

    # per-community member index + sizes (window bounded by community size)
    from pyspark.sql import Window

    w = Window.partitionBy("comm").orderBy("id")
    members = prof.select(
        "comm", "id", (F.row_number().over(w) - 1).alias("idx")
    )
    csizes = members.groupBy("comm").agg(F.count(F.lit(1)).alias("csize"))

    stubs = (
        prof.select("id", "deg", "comm")
        .join(csizes, "comm")
        .select(
            "id",
            "comm",
            "csize",
            F.explode(F.sequence(F.lit(0), F.col("deg") - 1)).alias("stub"),
        )
    )
    h = F.xxhash64("id", "stub", F.lit(seed * 7 + 3))
    is_intra = _uniform(F.xxhash64("id", "stub", F.lit(seed * 7 + 4)), seed) < F.lit(
        1.0 - mu
    )
    stubs = stubs.select(
        "id",
        "comm",
        "stub",
        is_intra.alias("intra"),
        F.pmod(h, F.col("csize")).alias("tgt_idx"),
        F.pmod(h, F.lit(n)).alias("tgt_global"),
    )
    intra_e = (
        stubs.filter("intra")
        .join(members.withColumnRenamed("id", "dst").withColumnRenamed("idx", "tgt_idx"),
              ["comm", "tgt_idx"])
        .select(F.col("id").alias("src"), "dst")
    )
    inter_e = stubs.filter(~F.col("intra")).select(
        F.col("id").alias("src"), F.col("tgt_global").alias("dst")
    )
    edges = (
        intra_e.unionByName(inter_e)
        .filter(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst"))
        .dropDuplicates(["src", "dst"])
    )
    return Graph.from_edges(edges, nodes=nodes), truth


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
