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


def lfr(
    spark: SparkSession,
    degree_sequence: list[int],
    community_size_sequence: list[int],
    mu: float = 0.1,
    seed: int = 42,
    rewiring_rounds: int = 4,
) -> tuple[Graph, DataFrame]:
    """Sequence-conditioned LFR benchmark
    (``generators/LFRGenerator.cpp`` setDegreeSequence /
    setCommunitySizeSequence / setMu / assignNodesToCommunities /
    generateIntra-/generateInterClusterGraph): explicit degree AND
    community-size sequences — the standard community benchmark —
    with the reference's realizability contract and rewiring
    tolerance. Returns (graph, truth) with truth = (node, label);
    realized community sizes equal the given sequence EXACTLY.

    Faithful driver-side model steps (the sequences are O(n) ints —
    model parameters like :func:`powerlaw_degree_sequence` /
    :func:`havel_hakimi` take, not data): internal degrees from μ with
    the reference's probabilistic rounding and minimum of 1
    (``setMu``); realizability checks verbatim (max/min internal
    degree vs community sizes plus the sorted greedy fit,
    ``run():375-407``); node→community assignment by the reference's
    algorithm — shuffled size-multiset first pass under the strict
    ``intdeg < size`` feasibility, then random feasible placement with
    eviction (``assignNodesToCommunities``).

    Distributed edge realization (the O(m) part): per-community intra
    stubs and global inter stubs are paired by seeded-hash order —
    the configuration model — and invalid pairs (self-pairs,
    duplicates, intra-community pairs in the inter graph) return
    their stubs to the pool for up to ``rewiring_rounds`` re-pairings
    with fresh salts, after which leftovers are dropped: the same
    tolerance as the reference's edge-switching chain, which disables
    the realizability check ("some edges might not be created") and
    drops inter-graph intra-community edges it fails to rewire after
    10·|E| attempts. Odd per-community stub sums lose one stub (the
    reference instead bumps a random node ±1)."""
    import random as _random

    from pyspark.sql import Window

    n = len(degree_sequence)
    sizes = list(int(s) for s in community_size_sequence)
    if n == 0 or not sizes:
        raise ValueError("both sequences must be non-empty")
    if sum(sizes) != n:
        raise ValueError(
            "community sizes must sum to the node count (the reference's "
            "generatePowerlawCommunitySizeSequence grows the smallest "
            "community to absorb the gap before generation)"
        )
    if max(degree_sequence) >= n:
        raise ValueError(
            "the maximum degree must be smaller than the number of nodes"
        )
    rng = _random.Random(seed)

    # ---- internal degrees (setMu): (1-mu)·deg, probabilistic rounding,
    # minimum internal degree of 1 for any non-isolated node
    intd: list[int] = []
    for d in degree_sequence:
        d = int(d)
        if d == 0:
            intd.append(0)
            continue
        x = (1.0 - mu) * d
        if x < 1.0:
            intd.append(1)
        else:
            fl = int(x)
            intd.append(fl + (1 if rng.random() < (x - fl) else 0))

    # ---- realizability (run():375-407, same error wording intent)
    pos_intd = [v for v in intd]
    max_int, min_int = max(pos_intd), min(pos_intd)
    max_size, min_size = max(sizes), min(sizes)
    if max_int >= max_size:
        raise ValueError(
            "graph not realizable: the maximum internal degree is greater "
            "than the largest possible internal degree"
        )
    if min_int >= min_size:
        raise ValueError(
            "graph not realizable: no node can be placed in the smallest "
            "community"
        )
    sorted_int = sorted(pos_intd)
    sorted_sizes = sorted(sizes)
    it = 0
    in_comm = 0
    for deg in sorted_int:
        if in_comm == sorted_sizes[it]:
            it += 1
            in_comm = 0
        if deg >= sorted_sizes[it]:
            raise ValueError(
                "graph not realizable: community sizes too small or "
                "internal degrees too large"
            )
        in_comm += 1

    # ---- node → community (assignNodesToCommunities): shuffled
    # size-multiset first pass, then random feasible placement with
    # eviction; sizes are realized exactly
    selection = [c for c, s in enumerate(sizes) for _ in range(s)]
    rng.shuffle(selection)
    assign: list[int | None] = [None] * n
    remaining = list(sizes)
    filled = [0] * len(sizes)
    to_assign: list[int] = []
    for u in range(n):
        c = selection[u]
        if sizes[c] > intd[u]:
            assign[u] = c
            remaining[c] -= 1
            filled[c] += 1
        else:
            to_assign.append(u)
    members: list[list[int]] = [[] for _ in sizes]
    for u in range(n):
        if assign[u] is not None:
            members[assign[u]].append(u)
    attempts = 0
    while to_assign:
        i = rng.randrange(len(to_assign))
        u = to_assign[i]
        to_assign[i] = to_assign[-1]
        to_assign.pop()
        c = rng.choice(selection)
        while intd[u] >= sizes[c]:
            c = rng.choice(selection)
        members[c].append(u)
        if remaining[c] > 0:
            remaining[c] -= 1
            attempts = 0
        else:
            r = rng.randrange(len(members[c]))
            to_assign.append(members[c][r])
            members[c][r] = members[c][-1]
            members[c].pop()
            attempts += 1
        if attempts > 3 * n:
            raise ValueError(
                "could not assign nodes to communities (too many "
                "high-degree nodes or communities too small) — the "
                "reference would merge the two smallest communities and "
                "retry; pass a coarser community_size_sequence"
            )
    comm_of = [0] * n
    for c, ms in enumerate(members):
        for u in ms:
            comm_of[u] = c

    # ---- distributed edge realization -------------------------------
    prof = spark.createDataFrame(
        [(u, comm_of[u], intd[u], int(degree_sequence[u]) - intd[u])
         for u in range(n)],
        "id long, comm long, intd long, extd long",
    )
    nodes = spark.range(n).select(F.col("id").cast("long"))
    truth = prof.select(F.col("id").alias("node"), F.col("comm").alias("label"))

    # inter pairing buckets: random pools bound each pairing window (a
    # single global window would serialize the shuffle at scale); odd
    # per-pool stubs just re-pair next round under a fresh bucketing
    n_buckets = max(1, min(1024, n // 64))

    def realize(stubs: DataFrame, same_comm_ok: bool, salt: int) -> DataFrame:
        """Pair stubs within their per-round `pool` by seeded-hash
        order; invalid pairs return their stubs for re-pairing;
        leftovers drop. Intra pools are the community (pairing must
        stay inside it); inter pools are random hash buckets."""
        accepted = spark.createDataFrame([], "src long, dst long")
        for rnd in range(rewiring_rounds):
            if stubs.limit(1).count() == 0:
                break
            h = F.xxhash64("id", "stub", F.lit(salt * 1031 + rnd))
            pool = (
                F.col("comm")
                if same_comm_ok
                else F.pmod(
                    F.xxhash64("id", "stub", F.lit(salt * 7919 + rnd)),
                    F.lit(n_buckets),
                )
            )
            w = Window.partitionBy("pool").orderBy(h, "id", "stub")
            ranked = stubs.withColumn("pool", pool).withColumn(
                "rn", F.row_number().over(w) - 1
            )
            a = ranked.filter(F.col("rn") % 2 == 0).select(
                "pool",
                (F.col("rn") / 2).cast("long").alias("pair"),
                F.col("id").alias("a_id"),
                F.col("comm").alias("a_comm"),
                F.col("stub").alias("a_stub"),
            )
            b = ranked.filter(F.col("rn") % 2 == 1).select(
                "pool",
                (F.col("rn") / 2).cast("long").alias("pair"),
                F.col("id").alias("b_id"),
                F.col("comm").alias("b_comm"),
                F.col("stub").alias("b_stub"),
            )
            pairs = a.join(b, ["pool", "pair"])
            valid = pairs.filter(F.col("a_id") != F.col("b_id"))
            if not same_comm_ok:
                valid = valid.filter(F.col("a_comm") != F.col("b_comm"))
            valid = valid.select(
                F.least("a_id", "b_id").alias("src"),
                F.greatest("a_id", "b_id").alias("dst"),
                "a_id", "a_stub", "b_id", "b_stub",
            )
            # one winner per (src, dst) this round; no duplicates of
            # already-accepted edges either
            dw = Window.partitionBy("src", "dst").orderBy("a_id", "a_stub")
            winners = (
                valid.withColumn("dup", F.row_number().over(dw))
                .filter(F.col("dup") == 1)
                .drop("dup")
                .join(accepted, ["src", "dst"], "left_anti")
                .localCheckpoint(eager=True)
            )
            accepted = accepted.unionByName(
                winners.select("src", "dst")
            ).localCheckpoint(eager=True)
            used = winners.select(
                F.col("a_id").alias("id"), F.col("a_stub").alias("stub")
            ).unionByName(
                winners.select(
                    F.col("b_id").alias("id"), F.col("b_stub").alias("stub")
                )
            )
            stubs = stubs.join(used, ["id", "stub"], "left_anti").localCheckpoint(
                eager=True
            )
        return accepted

    intra_stubs = prof.filter(F.col("intd") > 0).select(
        "id",
        "comm",
        F.explode(F.sequence(F.lit(0), F.col("intd") - 1)).alias("stub"),
    )
    inter_stubs = prof.filter(F.col("extd") > 0).select(
        "id",
        "comm",
        F.explode(
            F.sequence(F.lit(1_000_000), F.col("extd") + F.lit(999_999))
        ).alias("stub"),
    )
    intra_e = realize(intra_stubs, same_comm_ok=True, salt=seed * 7 + 11)
    inter_e = realize(inter_stubs, same_comm_ok=False, salt=seed * 7 + 23)
    edges = intra_e.unionByName(inter_e).dropDuplicates(["src", "dst"])
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


def watts_strogatz(
    spark: SparkSession, n: int, k: int, beta: float, seed: int = 42
) -> Graph:
    """WattsStrogatzGenerator (``generators/WattsStrogatzGenerator.cpp``):
    ring lattice (each node linked to its k clockwise neighbors) with
    per-edge rewiring probability beta.

    Deviation (documented): the reference redraws on self-loop/duplicate
    collisions; a seeded columnar pipeline cannot loop per edge, so a
    colliding rewire keeps the original lattice edge instead (collision
    probability ≈ (2k+1)/n — vanishing at scale). Everything is
    ``spark.range`` + hash expressions: deterministic at any parallelism.
    """
    lattice = (
        spark.range(n)
        .crossJoin(spark.range(1, k + 1).withColumnRenamed("id", "j"))
        .select(F.col("id").alias("src"), F.pmod(F.col("id") + F.col("j"), F.lit(n)).alias("dst"), "j")
    )
    key = F.col("src") * F.lit(n) + F.col("j")
    rewire = _uniform(key, seed) < F.lit(beta)
    new_dst = F.pmod(F.xxhash64(key, F.lit(seed + 1)), F.lit(n))
    edges = (
        lattice.select(
            "src",
            F.when(rewire & (new_dst != F.col("src")), new_dst)
            .otherwise(F.col("dst"))
            .alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst"))
        .dropDuplicates(["src", "dst"])
    )
    return Graph.from_edges(edges, nodes=spark.range(n).select("id"))


def barabasi_albert(
    spark: SparkSession, n: int, k: int, seed: int = 42, max_rounds: int = 64
) -> Graph:
    """BarabasiAlbertGenerator, Batagelj-Brandes construction
    (``generators/BarabasiAlbertGenerator.cpp`` batagelj=true): node v
    attaches k edges; writing the edge list as the array M with
    M[2i] = source(i) and M[2i+1] = M[r_i] for a uniform r_i ∈ [0, 2i],
    preferential attachment emerges because array positions are visited
    proportionally to degree.

    The pointer chase M[2i+1] = M[r] is resolved COLUMN-WISE: r is a pure
    hash function of the edge index, so an odd pointer p rewrites to
    r[(p-1)/2] with one expression — no join, no driver loop. Expected
    chase depth is O(log i); we iterate until no pointer is odd. Leading
    self-loops from the first node's edges are dropped (documented
    deviation from the reference's explicit seed circle).
    """
    m = n * k

    def r_of(idx):  # uniform in [0, 2*idx] as a pure column expression
        return F.pmod(F.xxhash64(idx, F.lit(seed)), 2 * idx + 1)

    e = spark.range(m).select(F.col("id").alias("i"))
    e = e.select("i", (F.col("i") / k).cast("long").alias("src"), r_of(F.col("i")).alias("p"))
    for _ in range(max_rounds):
        # odd pointer p refers to target of edge (p-1)/2 — rewrite through
        # its own draw; even pointer p resolves to source of edge p/2
        unresolved = e.filter(F.pmod("p", F.lit(2)) == 1)
        if unresolved.isEmpty():
            break
        nxt = F.when(
            F.pmod("p", F.lit(2)) == 1,
            r_of(((F.col("p") - 1) / 2).cast("long")),
        ).otherwise(F.col("p"))
        e = e.select("i", "src", nxt.alias("p")).localCheckpoint(eager=True)
    edges = (
        e.select("src", ((F.col("p") / 2).cast("long") / k).cast("long").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst"))
        .dropDuplicates(["src", "dst"])
    )
    return Graph.from_edges(edges, nodes=spark.range(n).select("id"))


def chung_lu(
    spark: SparkSession, weights: list[float] | DataFrame, seed: int = 42
) -> Graph:
    """ChungLuGenerator (``generators/ChungLuGenerator.cpp`` model): edge
    (i, j) present independently with probability min(1, w_i·w_j / Σw).

    This is the exact-model O(n²) pair-Bernoulli tier (CI / fixture
    scale, like ``erdos_renyi``); at 100 TB generate via ``rmat`` or a
    stub-sampling pass — the reference's O(n+m) skip-sampling is a
    sequential scan per weight class and does not shard.
    """
    if isinstance(weights, DataFrame):
        w = weights.select(F.col(weights.columns[0]).cast("long").alias("id"),
                           F.col(weights.columns[1]).cast("double").alias("w"))
    else:
        w = spark.createDataFrame(
            [(i, float(x)) for i, x in enumerate(weights)], "id long, w double"
        )
    total = w.agg(F.sum("w")).collect()[0][0] or 1.0
    a = w.select(F.col("id").alias("src"), F.col("w").alias("wu"))
    b = w.select(F.col("id").alias("dst"), F.col("w").alias("wv"))
    pairs = a.crossJoin(b).filter(F.col("src") < F.col("dst"))
    key = F.col("src") * F.lit(1 << 31) + F.col("dst")
    p = F.least(F.col("wu") * F.col("wv") / F.lit(float(total)), F.lit(1.0))
    edges = pairs.filter(_uniform(key, seed) < p).select("src", "dst")
    return Graph.from_edges(edges, nodes=w.select("id"))


def havel_hakimi(spark: SparkSession, degrees: list[int]) -> Graph:
    """Havel-Hakimi realization of a degree sequence
    (``generators/HavelHakimiGenerator.cpp``): repeatedly connect the
    highest-residual node to the next-highest ones. Raises ValueError if
    the sequence is not graphical (Erdős–Gallai violated mid-run).

    The algorithm is inherently sequential (each step depends on all
    prior residuals), so like the reference it runs single-threaded —
    here on the driver with a bucketed priority structure, O(m) total —
    and only the RESULT is distributed. For scale-out generation use
    :func:`rmat` / :func:`chung_lu`, which target the same degree
    shapes; this generator's value is exact-sequence realization for
    fixtures and conformance tests.
    """
    n = len(degrees)
    residual = [(int(d), i) for i, d in enumerate(degrees)]
    if any(d < 0 or d >= n for d, _ in residual):
        raise ValueError("degree out of range for a simple graph")
    edges: list[tuple[int, int]] = []
    import heapq

    heap = [(-d, i) for d, i in residual if d > 0]
    heapq.heapify(heap)
    cur = {i: d for d, i in residual}
    while heap:
        nd, u = heapq.heappop(heap)
        d = -nd
        if cur[u] != d:
            continue  # stale entry
        if d == 0:
            continue
        # take the d highest-residual partners
        partners = []
        stash = []
        while len(partners) < d and heap:
            ndv, v = heapq.heappop(heap)
            if cur[v] != -ndv or cur[v] == 0:
                continue
            partners.append(v)
            stash.append(v)
        if len(partners) < d:
            raise ValueError("degree sequence is not graphical")
        for v in partners:
            edges.append((min(u, v), max(u, v)))
            cur[v] -= 1
        cur[u] = 0
        for v in stash:
            if cur[v] > 0:
                heapq.heappush(heap, (-cur[v], v))
    e = spark.createDataFrame(
        [(a, b, 1.0) for a, b in edges] or [],
        "src long, dst long, weight double",
    )
    nodes = spark.range(n).select(F.col("id").cast("long"))
    return Graph.from_edges(e, directed=False, nodes=nodes)


def hyperbolic(
    spark: SparkSession,
    n: int,
    avg_degree: float = 6.0,
    alpha: float = 1.0,
    seed: int = 42,
    radius: float | None = None,
    bands: int = 16,
    buckets: int | None = None,
) -> Graph:
    """Hyperbolic random graph, threshold model
    (``generators/HyperbolicGenerator.cpp`` with T=0): node i gets polar
    coordinates (r_i, θ_i) — θ uniform, r from the quasi-uniform
    hyperbolic density acosh(1 + u·(cosh(αR)−1))/α — and an edge joins
    every pair at hyperbolic distance ≤ R. Degrees follow a power law
    with exponent 2α+1.

    Scale shape (the reference uses in-memory band data structures;
    this is the join rephrasing): nodes land in (radial band, angular
    bucket) cells; a BROADCAST band-pair table precomputes the maximal
    angular separation at which two nodes of those bands can still be
    within R, so candidate pairs come from one bucket-offset join and
    only candidates pay the exact cosh-distance test — no all-pairs
    blowup (periphery bands, which hold nearly all nodes, admit only a
    handful of adjacent buckets).

    ``radius``: override R (default: the standard R = 2·ln(8n/(π·k̄))
    approximation for α=1-ish regimes).
    """
    import math

    if radius is None:
        radius = 2.0 * math.log(8.0 * n / (math.pi * avg_degree))
    R = float(radius)
    if buckets is None:
        buckets = max(8, int(math.sqrt(n)))
    K, B = int(buckets), int(bands)

    nodes = spark.range(n).select(F.col("id").cast("long"))
    u_t = _uniform(F.col("id"), seed * 7 + 1)
    u_r = _uniform(F.col("id"), seed * 7 + 2)
    cosh_aR = math.cosh(alpha * R)
    coords = nodes.select(
        "id",
        (u_t * F.lit(2.0 * math.pi)).alias("theta"),
        (F.acosh(F.lit(1.0) + u_r * F.lit(cosh_aR - 1.0)) / F.lit(alpha)).alias("r"),
    ).localCheckpoint(eager=True)

    edges = _hyperbolic_threshold_edges(spark, coords, R, B, K)
    return Graph.from_edges(edges, directed=False, nodes=nodes)


def _hyperbolic_threshold_edges(
    spark: SparkSession, coords: DataFrame, R: float, B: int, K: int
) -> DataFrame:
    """Canonical (src < dst) threshold edges (hyperbolic distance ≤ R)
    of a (id, theta, r) point table — the band/bucket candidate join
    shared by the static generator and the dynamic movement model."""
    import math

    cells = coords.select(
        "id",
        "theta",
        "r",
        F.least(
            F.lit(B - 1), F.floor(F.col("r") / F.lit(R / B)).cast("int")
        ).alias("band"),
        F.floor(F.col("theta") / F.lit(2.0 * math.pi / K)).cast("int").alias("bucket"),
    )

    # band-pair → max bucket offset (inclusive), from the bands' MIN radii
    # (the most permissive members); +1 bucket of slack for the floor
    pair_rows = []
    for b1 in range(B):
        for b2 in range(B):  # ORDERED pairs: a's band vs b's band
            r1, r2 = b1 * R / B, b2 * R / B
            if r1 <= 0 or r2 <= 0:
                dmax = K // 2
            else:
                c = (math.cosh(r1) * math.cosh(r2) - math.cosh(R)) / (
                    math.sinh(r1) * math.sinh(r2)
                )
                if c <= -1.0:
                    dmax = K // 2
                elif c >= 1.0:
                    dmax = 0
                else:
                    dmax = int(math.acos(c) / (2.0 * math.pi / K)) + 1
            dmax = min(dmax, K // 2)
            for off in range(-dmax, dmax + 1):
                pair_rows.append((b1, b2, off))
    offsets = spark.createDataFrame(pair_rows, "b1 int, b2 int, off int")

    a = cells.select(
        F.col("id").alias("ida"), F.col("theta").alias("ta"), F.col("r").alias("ra"),
        F.col("band").alias("b1"), F.col("bucket").alias("ka"),
    )
    b = cells.select(
        F.col("id").alias("idb"), F.col("theta").alias("tb"), F.col("r").alias("rb"),
        F.col("band").alias("b2"), F.col("bucket").alias("kb"),
    )
    cand = (
        a.join(F.broadcast(offsets), "b1")
        .withColumn("kb", F.pmod(F.col("ka") + F.col("off"), F.lit(K)))
        .join(b, ["b2", "kb"])
        .filter(F.col("ida") < F.col("idb"))
    )
    dtheta = F.abs(F.col("ta") - F.col("tb"))
    dtheta = F.least(dtheta, F.lit(2.0 * math.pi) - dtheta)
    cosh_d = (
        F.cosh("ra") * F.cosh("rb") - F.sinh("ra") * F.sinh("rb") * F.cos(dtheta)
    )
    return (
        cand.filter(cosh_d <= F.lit(math.cosh(R)))
        .select(F.col("ida").alias("src"), F.col("idb").alias("dst"))
        .dropDuplicates(["src", "dst"])
        .withColumn("weight", F.lit(1.0))
    )


def mocnik(
    spark: SparkSession,
    n: int,
    dim: int = 2,
    k: float = 2.0,
    seed: int = 42,
) -> Graph:
    """Mocnik random spatial graph (``generators/MocnikGenerator.cpp``,
    base layer): n nodes uniform in [0,1]^dim; node i points a DIRECTED
    edge at every j with dist(i,j) ≤ k · d_min(i), where d_min(i) is
    i's nearest-neighbor distance.

    Exact distributed evaluation via a cell grid: nearest-neighbor
    distances come from an expanding-ring cell search (a node resolves
    once its best-found distance ≤ searched-radius × cell-size, the
    ring guarantee — unresolved stragglers re-search with a doubled
    ring, a handful of rounds); edge candidates are generated per
    ring-radius class so an isolated node's big radius never inflates
    everyone else's candidate set. Only candidates pay the exact
    distance test — no all-pairs scan.
    """
    import itertools
    import math

    cells_per_axis = max(1, int(math.ceil(n ** (1.0 / dim) / 2.0)))
    s = 1.0 / cells_per_axis

    axes = [f"x{a}" for a in range(dim)]
    pos = spark.range(n).select(
        F.col("id").cast("long"),
        *[
            _uniform(F.col("id"), seed * 31 + 7 * a + 1).alias(f"x{a}")
            for a in range(dim)
        ],
    )
    cellcols = [
        F.least(F.lit(cells_per_axis - 1), F.floor(F.col(ax) / F.lit(s)).cast("int")).alias(f"c{a}")
        for a, ax in enumerate(axes)
    ]
    pts = pos.select("id", *axes, *cellcols).localCheckpoint(eager=True)

    def offsets_df(q: int, ring_only: bool = False):
        rows = [
            tuple(off)
            for off in itertools.product(range(-q, q + 1), repeat=dim)
            if (max(abs(o) for o in off) == q if ring_only and q > 0 else True)
        ]
        return spark.createDataFrame(
            rows, ", ".join(f"o{a} int" for a in range(dim))
        )

    def candidates(points_a, q: int):
        """Pairs (a-node, b-node) with b in any cell within Chebyshev
        cell-radius q of a's cell."""
        a = points_a.select(
            F.col("id").alias("ia"),
            *[F.col(ax).alias(f"a{i}") for i, ax in enumerate(axes)],
            *[F.col(f"c{i}").alias(f"ca{i}") for i in range(dim)],
        )
        b = pts.select(
            F.col("id").alias("ib"),
            *[F.col(ax).alias(f"b{i}") for i, ax in enumerate(axes)],
            *[F.col(f"c{i}").alias(f"cb{i}") for i in range(dim)],
        )
        off = offsets_df(q)
        j = a.join(F.broadcast(off))
        for i in range(dim):
            j = j.withColumn(f"cb{i}", F.col(f"ca{i}") + F.col(f"o{i}"))
        j = j.join(b, [f"cb{i}" for i in range(dim)])
        return j.filter(F.col("ia") != F.col("ib"))

    def with_dist(cand):
        d2 = None
        for i in range(dim):
            t = (F.col(f"a{i}") - F.col(f"b{i}")) ** 2
            d2 = t if d2 is None else d2 + t
        return cand.withColumn("d", F.sqrt(d2))

    # nearest-neighbor distances with the ring guarantee
    unresolved = pts
    dm = None
    q = 1
    while True:
        cand = with_dist(candidates(unresolved, q))
        found = cand.groupBy(F.col("ia").alias("id")).agg(F.min("d").alias("m"))
        joined = unresolved.join(found, "id", "left")
        ok = joined.filter(F.col("m").isNotNull() & (F.col("m") <= q * s)).select(
            "id", F.col("m").alias("dm")
        ).localCheckpoint(eager=True)
        dm = ok if dm is None else dm.unionByName(ok)
        unresolved = joined.join(ok, "id", "left_anti").select(pts.columns).localCheckpoint(
            eager=True
        )
        if unresolved.limit(1).count() == 0:
            break
        q *= 2
        if q > 2 * cells_per_axis:
            # everything within one full-grid search is exact
            cand = with_dist(candidates(unresolved, cells_per_axis))
            found = cand.groupBy(F.col("ia").alias("id")).agg(F.min("d").alias("dm"))
            dm = dm.unionByName(unresolved.select("id").join(found, "id"))
            break

    # per-node edge radius R = k*dm; candidate rings per radius class
    radii = pts.join(dm, "id").withColumn("R", F.lit(float(k)) * F.col("dm"))
    radii = radii.withColumn(
        "q", F.least(F.lit(cells_per_axis), F.ceil(F.col("R") / F.lit(s)).cast("int") + 1)
    ).localCheckpoint(eager=True)
    classes = [int(r["q"]) for r in radii.select("q").distinct().collect()]
    parts = []
    for qc in classes:
        pts_q = radii.filter(F.col("q") == qc)
        cand = with_dist(candidates(pts_q.select(pts.columns + ["R"]), qc))
        parts.append(
            cand.join(radii.select(F.col("id").alias("ia"), "R"), "ia")
            .filter(F.col("d") <= F.col("R"))
            .select(F.col("ia").alias("src"), F.col("ib").alias("dst"))
        )
    edges = parts[0]
    for p in parts[1:]:
        edges = edges.unionByName(p)
    edges = edges.withColumn("weight", F.lit(1.0))
    nodes = spark.range(n).select(F.col("id").cast("long"))
    return Graph(
        nodes=nodes,
        edges=edges.localCheckpoint(eager=True),
        directed=True,
        weighted=False,
    )


def _pubweb_areas(n: int, num_dense_areas: int, seed: int):
    """Driver-side PubWeb dense areas: centers, anti-quadratic radii,
    and per-area node counts (rad^1.5 mass, k/(k+2) clustered share)."""
    import hashlib as _h

    MAX_R, FACT = 0.2, 5.0

    def _du(tag: str) -> float:  # deterministic uniform from the seed
        d = _h.md5(f"pw{seed}:{tag}".encode()).digest()
        return int.from_bytes(d[:8], "big") / float(1 << 64)

    areas = []
    for a in range(num_dense_areas):
        f = _du(f"rad{a}") * FACT + 1.0
        rad = (MAX_R * f * f) / (FACT * FACT)
        areas.append({"x": _du(f"cx{a}"), "y": _du(f"cy{a}"), "rad": rad})
    mass = sum(c["rad"] ** 1.5 for c in areas)
    scale = (n * (num_dense_areas / (num_dense_areas + 2.0))) / mass if mass else 0.0
    counts = [int(round(c["rad"] ** 1.5 * scale)) for c in areas]
    while sum(counts) > n:
        counts[counts.index(max(counts))] -= 1
    return areas, counts


def pubweb(
    spark: SparkSession,
    n: int,
    num_dense_areas: int = 10,
    neighborhood_radius: float = 0.1,
    max_neighbors: int = 4,
    seed: int = 42,
) -> Graph:
    """PubWeb peer-to-peer generator
    (``generators/PubWebGenerator.cpp``): nodes on the UNIT TORUS —
    most clustered inside dense areas (anti-quadratic radius
    distribution, per-area counts ∝ rad^1.5, the remaining ~2/(k+2)
    share uniform background) — and an undirected edge joins u and v
    iff EACH is among the other's ``max_neighbors`` nearest in-range
    neighbors (the reference's eligible-edge two-pass = mutual kNN
    within ``neighborhood_radius``); weight = 0.01 / d² like the
    reference's BASE_WEIGHT rule. Seeded hash draws replace the
    reference's sequential RNG (model-level parity, like our
    WattsStrogatz/ChungLu).

    Scale shape: torus grid cells of side ≥ radius, one 3×3-cell
    candidate join, one per-node rank window bounded by the in-range
    neighborhood — the quadratic loop the reference's own TODO wants
    removed."""
    import math

    from pyspark.sql import Window

    areas, counts = _pubweb_areas(n, num_dense_areas, seed)
    nodes = spark.range(n).select(F.col("id").cast("long"))
    pos = _pubweb_positions(spark, n, areas, counts, seed)
    edges = _pubweb_mutual_knn(spark, pos, neighborhood_radius, max_neighbors)
    return Graph.from_edges(edges, directed=False, nodes=nodes)


def _pubweb_positions(
    spark: SparkSession, n: int, areas, counts, seed: int
) -> DataFrame:
    """The seeded PubWeb coordinate layout (id, x, y), shared by the
    static generator and :func:`dynamic_pubweb_events`'s initial block
    so the two can never silently desynchronize: per-area polar draws
    for the clustered ids (prefix ranges from ``counts``), uniform
    background for the rest, wrapped onto the unit torus."""
    import math

    bounds, acc = [], 0
    for c in counts:
        acc += c
        bounds.append(acc)
    area_rows = []
    for a, c in enumerate(areas):
        lo = bounds[a - 1] if a else 0
        area_rows.append((lo, bounds[a], c["x"], c["y"], c["rad"]))
    area_df = spark.createDataFrame(
        area_rows, "lo long, hi long, ax double, ay double, rad double"
    )
    assigned = spark.range(n).select(F.col("id").cast("long")).join(
        F.broadcast(area_df),
        (F.col("id") >= F.col("lo")) & (F.col("id") < F.col("hi")),
        "left",
    )
    ang = _uniform(F.col("id"), seed * 13 + 1) * (2.0 * math.pi)
    dst = _uniform(F.col("id"), seed * 13 + 2) * F.col("rad")
    ux = _uniform(F.col("id"), seed * 13 + 3)
    uy = _uniform(F.col("id"), seed * 13 + 4)
    wrap = lambda c: F.pmod(c, F.lit(1.0))  # noqa: E731 — torus
    return assigned.select(
        "id",
        wrap(
            F.when(F.col("rad").isNotNull(), F.col("ax") + F.cos(ang) * dst).otherwise(ux)
        ).alias("x"),
        wrap(
            F.when(F.col("rad").isNotNull(), F.col("ay") + F.sin(ang) * dst).otherwise(uy)
        ).alias("y"),
    ).localCheckpoint(eager=True)


def _pubweb_mutual_knn(
    spark: SparkSession,
    pos: DataFrame,
    neighborhood_radius: float,
    max_neighbors: int,
) -> DataFrame:
    """Canonical (src < dst) PubWeb edges of a (id, x, y) unit-torus
    point table: u ~ v iff each lists the other among its
    ``max_neighbors`` nearest within ``neighborhood_radius``; weight =
    BASE_WEIGHT/d². One 3×3 torus-cell join + one bounded rank window —
    shared by the static generator and the dynamic movement model."""
    import math

    from pyspark.sql import Window

    BASE_W = 0.01
    cells = max(1, int(math.floor(1.0 / neighborhood_radius)))
    s = 1.0 / cells
    pts = pos.select(
        "id", "x", "y",
        F.least(F.lit(cells - 1), F.floor(F.col("x") / F.lit(s)).cast("int")).alias("cx"),
        F.least(F.lit(cells - 1), F.floor(F.col("y") / F.lit(s)).cast("int")).alias("cy"),
    )
    offs = spark.createDataFrame(
        [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)], "ox int, oy int"
    )
    a = pts.select(
        F.col("id").alias("ia"), F.col("x").alias("xa"), F.col("y").alias("ya"),
        "cx", "cy",
    )
    b = pts.select(
        F.col("id").alias("ib"), F.col("x").alias("xb"), F.col("y").alias("yb"),
        F.col("cx").alias("bx"), F.col("cy").alias("by"),
    )
    cand = (
        a.join(F.broadcast(offs))
        .select(
            "ia", "xa", "ya",
            F.pmod(F.col("cx") + F.col("ox"), F.lit(cells)).alias("bx"),
            F.pmod(F.col("cy") + F.col("oy"), F.lit(cells)).alias("by"),
        )
        .join(b, ["bx", "by"])
        .filter(F.col("ia") != F.col("ib"))
        .dropDuplicates(["ia", "ib"])
    )
    dx = F.abs(F.col("xa") - F.col("xb"))
    dx = F.least(dx, F.lit(1.0) - dx)
    dy = F.abs(F.col("ya") - F.col("yb"))
    dy = F.least(dy, F.lit(1.0) - dy)
    ranged = cand.withColumn("d2", dx * dx + dy * dy).filter(
        F.col("d2") <= F.lit(neighborhood_radius**2)
    )
    w = Window.partitionBy("ia").orderBy(
        "d2", F.least("ia", "ib"), F.greatest("ia", "ib")
    )
    topk = ranged.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= max_neighbors
    )
    # mutual: both endpoints keep the canonical pair in their top-k
    ce = topk.select(
        F.least("ia", "ib").alias("src"), F.greatest("ia", "ib").alias("dst"), "d2"
    )
    return (
        ce.groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("c"), F.min("d2").alias("d2"))
        .filter(F.col("c") >= 2)
        .select("src", "dst", (F.lit(BASE_W) / F.col("d2")).alias("weight"))
    )


def stochastic_blockmodel(
    spark: SparkSession,
    n: int,
    affinity: list[list[float]],
    membership: "list[int] | DataFrame | None" = None,
    seed: int = 42,
    portable_hash: bool = False,
) -> tuple[Graph, DataFrame]:
    """StochasticBlockmodel (``generators/StochasticBlockmodel.cpp``):
    every unordered pair (u, v) kept with probability
    affinity[block(u)][block(v)]. Returns (graph, (node, block) truth).

    ``membership`` may be a per-node block list (the reference's
    signature), a (node, block) DataFrame (the at-scale form — nothing
    node-sized touches the driver), or None for balanced ``id % k``
    blocks. The affinity matrix is k×k and broadcast; the pair relation
    is the same hash-thinned cross join as :func:`erdos_renyi`, so the
    plan is one broadcast join + a filter — no driver loop. The
    reference draws from its serial RNG; draws here are the seeded
    xxhash uniform keyed by the pair, deterministic at any parallelism
    (documented determinization, same policy as every generator in this
    module). ``portable_hash`` swaps the draw for the md5 porthash so a
    SQL oracle can replay the edge set bit-for-bit.
    """
    k = len(affinity)
    if any(len(row) != k for row in affinity):
        raise ValueError("affinity matrix must be square (nBlocks x nBlocks)")
    if membership is None:
        mem = spark.range(n).select("id", (F.col("id") % k).alias("block"))
    elif isinstance(membership, list):
        if len(membership) != n:
            raise ValueError("membership list must be of size n")
        mem = spark.createDataFrame(
            [(i, int(b)) for i, b in enumerate(membership)], "id long, block long"
        )
    else:
        mem = membership.select(
            F.col(membership.columns[0]).cast("long").alias("id"),
            F.col(membership.columns[1]).cast("long").alias("block"),
        )
    aff = spark.createDataFrame(
        [(i, j, float(affinity[i][j])) for i in range(k) for j in range(k)],
        "bu long, bv long, p double",
    )
    pairs = (
        spark.range(n)
        .alias("a")
        .crossJoin(spark.range(n).alias("b"))
        .select(F.col("a.id").alias("src"), F.col("b.id").alias("dst"))
        .filter(F.col("src") < F.col("dst"))
    )
    key = F.col("src") * F.lit(n) + F.col("dst")
    if portable_hash:
        from networkit_spark.functions.porthash import DEFAULT_PRIME, md5_mod

        draw = md5_mod(key, salt=f"sbm{seed}:") / F.lit(float(DEFAULT_PRIME))
    else:
        draw = _uniform(key, seed)
    edges = (
        pairs.join(mem.select(F.col("id").alias("src"), F.col("block").alias("bu")), "src")
        .join(mem.select(F.col("id").alias("dst"), F.col("block").alias("bv")), "dst")
        .join(F.broadcast(aff), ["bu", "bv"])
        # reference keeps the pair when r <= p (Random::real inclusive)
        .filter(draw <= F.col("p"))
        .select("src", "dst")
    )
    nodes = spark.range(n).select("id")
    return Graph.from_edges(edges, directed=False, nodes=nodes), mem.select(
        F.col("id").alias("node"), F.col("block").alias("label")
    )


def regular_ring_lattice(spark: SparkSession, n: int, k: int) -> Graph:
    """RegularRingLattice (``generators/RegularRingLatticeGenerator.cpp``):
    node i connects to (i+1..i+k) mod n; k clamped to n/2 − 1 like the
    reference. Pure column expressions — one range cross a k-literal
    explode, no driver loop."""
    nn = max(1, int(n))
    kk = min(int(k), max(nn // 2 - 1, 0))
    base = spark.range(nn).select(F.col("id").alias("src"))
    edges = base.select(
        "src", F.explode(F.array(*[F.lit(j) for j in range(1, kk + 1)])).alias("j")
    ).select("src", ((F.col("src") + F.col("j")) % nn).alias("dst"))
    nodes = spark.range(nn).select("id")
    return Graph.from_edges(edges, directed=False, nodes=nodes)


def dorogovtsev_mendes(spark: SparkSession, n: int, seed: int = 42) -> Graph:
    """DorogovtsevMendes (``generators/DorogovtsevMendesGenerator.cpp``):
    start from a triangle; each new node attaches to BOTH endpoints of a
    uniformly random existing edge. Growth is inherently sequential
    (every step conditions on the full current edge list), so like
    HavelHakimi it builds on the driver with seeded draws and only the
    RESULT is distributed — its value is exact fixtures; use
    :func:`barabasi_albert`/:func:`rmat` for scale-out shapes."""
    import random as _random

    if n < 3:
        raise ValueError("DorogovtsevMendes needs n >= 3")
    rng = _random.Random(seed)
    edges = [(0, 1), (1, 2), (2, 0)]
    for w in range(3, int(n)):
        u, v = edges[rng.randrange(len(edges))]
        edges.append((w, u))
        edges.append((w, v))
    return Graph.of(spark, edges, n=int(n))


def powerlaw_degree_sequence(
    n: int,
    min_deg: int,
    max_deg: int,
    gamma: float = -2.0,
    seed: int = 42,
) -> list[int]:
    """PowerlawDegreeSequence (``generators/PowerlawDegreeSequence.cpp``
    run/getDegreeSequence): seeded draws from the truncated power law
    P(d) ∝ d^gamma on [min_deg, max_deg]; if the sum lands odd, the
    largest entry is decremented (the reference's evenness fix), so the
    output feeds :func:`havel_hakimi` / :func:`chung_lu` directly.
    Driver-side by design — the sequence is O(n) integers, a model
    parameter, not data."""
    import random as _random

    if min_deg > max_deg:
        raise ValueError("min_deg must not exceed max_deg")
    if gamma > -1:
        raise ValueError("gamma must be lower than -1")
    degs = list(range(max_deg, min_deg - 1, -1))
    weights = [float(d) ** gamma for d in degs]
    total = sum(weights)
    cum = []
    s = 0.0
    for w in weights:
        s += w
        cum.append(s / total)
    cum[-1] = 1.0
    rng = _random.Random(seed)
    seq = []
    for _ in range(int(n)):
        x = rng.random()
        # first cumulative ≥ x (reference lower_bound over the cum table)
        lo, hi = 0, len(cum) - 1
        while lo < hi:
            mid = (lo + hi) // 2
            if cum[mid] < x:
                lo = mid + 1
            else:
                hi = mid
        seq.append(degs[lo])
    if sum(seq) % 2 != 0:
        seq[seq.index(max(seq))] -= 1
    return seq


# ---------------------------------------------------------------------------
# Dynamic generators: reference-shaped GraphEvent streams
# (generators/Dynamic*Generator.cpp). Growth processes are inherently
# sequential — each event conditions on the graph so far — so like the
# reference they build the stream driver-side with seeded draws; the
# OUTPUT is an event DataFrame that feeds the distributed replay /
# streaming kernels (streaming/dynamics.py apply_events / replay_at /
# run_event_stream). TIME_STEP markers delimit generator steps exactly
# as the reference emits them.
# ---------------------------------------------------------------------------


def _events_df(spark: SparkSession, rows: list[tuple]) -> DataFrame:
    from networkit_spark.streaming.dynamics import EVENT_SCHEMA

    return spark.createDataFrame(rows, EVENT_SCHEMA)


def dynamic_path_events(spark: SparkSession, n_steps: int) -> DataFrame:
    """DynamicPathGenerator (``generators/DynamicPathGenerator.cpp``):
    a growing path — one NODE_ADDITION + EDGE_ADDITION + TIME_STEP per
    step after the initial node."""
    from networkit_spark.streaming.dynamics import (
        EDGE_ADDITION,
        NODE_ADDITION,
        TIME_STEP,
    )

    rows: list[tuple] = [(0, NODE_ADDITION, 0, None, None)]
    seq = 1
    u = 0
    for _ in range(int(n_steps)):
        v = u + 1
        rows.append((seq, NODE_ADDITION, v, None, None)); seq += 1
        rows.append((seq, EDGE_ADDITION, u, v, 1.0)); seq += 1
        rows.append((seq, TIME_STEP, None, None, None)); seq += 1
        u = v
    return _events_df(spark, rows)


def dynamic_dorogovtsev_mendes_events(
    spark: SparkSession, n_steps: int, seed: int = 42,
    portable_hash: bool = False,
) -> DataFrame:
    """DynamicDorogovtsevMendesGenerator
    (``generators/DynamicDorogovtsevMendesGenerator.cpp``): the initial
    triangle, then per step a new node wired to both endpoints of a
    uniformly random existing edge. Draw order matches the static
    :func:`dorogovtsev_mendes`, so replaying the full stream onto an
    empty graph reproduces it exactly at the same seed.
    ``portable_hash`` draws the edge index with the md5 porthash keyed
    by the new node id, so a SQL oracle can replay the growth chain
    CTE-for-CTE."""
    import random as _random

    from networkit_spark.functions.porthash import md5_mod_py

    from networkit_spark.streaming.dynamics import (
        EDGE_ADDITION,
        NODE_ADDITION,
        TIME_STEP,
    )

    rng = _random.Random(seed)
    rows: list[tuple] = []
    seq = 0

    def emit(t, u=None, v=None, w=None):
        nonlocal seq
        rows.append((seq, t, u, v, w))
        seq += 1

    for s in (0, 1, 2):
        emit(NODE_ADDITION, s)
    edges = [(0, 1), (1, 2), (2, 0)]
    for a, b in edges:
        emit(EDGE_ADDITION, a, b, 1.0)
    emit(TIME_STEP)
    for w in range(3, 3 + int(n_steps)):
        if portable_hash:
            u, v = edges[md5_mod_py(w, salt=f"dm{seed}:") % len(edges)]
        else:
            u, v = edges[rng.randrange(len(edges))]
        emit(NODE_ADDITION, w)
        edges.append((w, u))
        edges.append((w, v))
        emit(EDGE_ADDITION, w, u, 1.0)
        emit(EDGE_ADDITION, w, v, 1.0)
        emit(TIME_STEP)
    return _events_df(spark, rows)


def dynamic_forest_fire_events(
    spark: SparkSession,
    n_steps: int,
    p: float = 0.3,
    seed: int = 42,
    portable_hash: bool = False,
) -> DataFrame:
    """DynamicForestFireGenerator
    (``generators/DynamicForestFireGenerator.cpp``, undirected form):
    each step adds a node, picks a uniformly random ambassador, burns a
    geometric(p) number of unvisited neighbors breadth-first, and wires
    the new node to every burned node. Seeded draws in the reference's
    order (continue-probability then victim index).

    ``portable_hash=True`` replaces the RNG with portable md5 draws —
    ambassador = md5 % v, continue iff md5 % PRIME < ⌊p·PRIME⌋ (an
    exact integer compare, no float), victim index = md5 % |valid| —
    keyed by (step, burning node, draw counter), which makes the whole
    burning process SQL-replayable as a recursive-CTE state machine
    (the dyn_replay 'ff' oracle replays it draw-for-draw)."""
    import random as _random

    from networkit_spark.functions.porthash import DEFAULT_PRIME, md5_mod_py
    from networkit_spark.streaming.dynamics import (
        EDGE_ADDITION,
        NODE_ADDITION,
        TIME_STEP,
    )

    rng = _random.Random(seed)
    thresh = int(p * DEFAULT_PRIME)
    rows: list[tuple] = []
    seq = 0

    def emit(t, u=None, v=None, w=None):
        nonlocal seq
        rows.append((seq, t, u, v, w))
        seq += 1

    nbrs: dict[int, set[int]] = {0: set()}
    emit(NODE_ADDITION, 0)
    emit(TIME_STEP)
    for v in range(1, 1 + int(n_steps)):
        if portable_hash:
            a = md5_mod_py(f"a:{v}", salt=f"ff{seed}:") % v
        else:
            a = rng.choice(sorted(nbrs))
        emit(NODE_ADDITION, v)
        visited = {a}
        frontier = [a]
        burned = [a]
        while frontier:
            x = frontier.pop(0)
            valid = sorted(w for w in nbrs[x] if w not in visited)
            chosen = []
            t = 0
            while valid:
                if portable_hash:
                    if md5_mod_py(f"c:{v}:{x}:{t}", salt=f"ff{seed}:") >= thresh:
                        break
                    i = md5_mod_py(f"i:{v}:{x}:{t}", salt=f"ff{seed}:") % len(valid)
                    t += 1
                else:
                    if rng.random() > p:
                        break
                    i = rng.randrange(len(valid))
                chosen.append(valid.pop(i))
            for w in chosen:
                visited.add(w)
                frontier.append(w)
                burned.append(w)
        nbrs[v] = set()
        for w in burned:
            emit(EDGE_ADDITION, v, w, 1.0)
            nbrs[v].add(w)
            nbrs[w].add(v)
        emit(TIME_STEP)
    return _events_df(spark, rows)


BA_PORTABLE_ATTEMPTS = 16  # bounded duplicate-rejection budget (portable mode)


def dynamic_barabasi_albert_events(
    spark: SparkSession,
    n_steps: int,
    k: int = 2,
    seed: int = 42,
    portable_hash: bool = False,
) -> DataFrame:
    """DynamicBarabasiAlbertGenerator
    (``generators/DynamicBarabasiAlbertGenerator.cpp``): start from a
    k-node path, then per step add one node wired to k distinct targets
    drawn ∝ degree (degree-weighted roulette with duplicate-rejection,
    the reference's loop). Seeded driver-side stream like the rest of
    the Dynamic* family.

    ``portable_hash=True`` switches the roulette to the exactly-
    equivalent uniform-endpoint-of-a-uniform-edge draw (an endpoint is
    sampled ∝ its degree) with portable md5 indices over the
    ordinal-numbered edge list and a BOUNDED duplicate-rejection budget
    of ``BA_PORTABLE_ATTEMPTS`` per node — the first k distinct picks
    in attempt order win (a step that exhausts the budget attaches
    fewer edges; probability ≈ 2^-(budget-1), and the draw is
    deterministic either way). Bounding the rejection is what makes
    the stream SQL-replayable CTE-for-CTE (the dyn_replay 'ba' oracle),
    the same trade the portable DorogovtsevMendes mode makes."""
    import random as _random

    from networkit_spark.functions.porthash import md5_mod_py
    from networkit_spark.streaming.dynamics import (
        EDGE_ADDITION,
        NODE_ADDITION,
        TIME_STEP,
    )

    if k < 1:
        raise ValueError("k must be at least 1")
    rng = _random.Random(seed)
    rows: list[tuple] = []
    seq = 0

    def emit(t, u=None, v=None, w=None):
        nonlocal seq
        rows.append((seq, t, u, v, w))
        seq += 1

    deg: dict[int, int] = {}
    edge_list: list[tuple[int, int]] = []  # ordinal order (portable draws)
    emit(NODE_ADDITION, 0)
    deg[0] = 0
    for i in range(1, k):
        emit(NODE_ADDITION, i)
        emit(EDGE_ADDITION, i, i - 1, 1.0)
        deg[i] = deg.get(i, 0) + 1
        deg[i - 1] += 1
        edge_list.append((i, i - 1))
    emit(TIME_STEP)
    deg_sum = sum(deg.values())
    for u in range(k, k + int(n_steps)):
        emit(NODE_ADDITION, u)
        targets: set[int] = set()
        if portable_hash:
            # uniform endpoint of a uniform edge = degree-proportional;
            # first k distinct picks within the bounded attempt budget
            m2 = 2 * len(edge_list)
            for a in range(BA_PORTABLE_ATTEMPTS):
                if len(targets) >= min(k, len(deg)) or m2 == 0:
                    break
                idx = md5_mod_py(f"{u}:{a}", salt=f"ba{seed}:") % m2
                e = edge_list[idx // 2]
                targets.add(e[idx % 2])
        else:
            # degree-weighted roulette over existing nodes, reject dups
            while len(targets) < min(k, len(deg)):
                x = rng.randint(0, max(deg_sum, 1))
                acc = 0
                pick = None
                for v in sorted(deg):
                    acc += deg[v]
                    if x <= acc:
                        pick = v
                        break
                if pick is None:
                    pick = max(deg)
                targets.add(pick)
        deg[u] = 0
        for v in sorted(targets):
            emit(EDGE_ADDITION, u, v, 1.0)
            deg[u] += 1
            deg[v] += 1
            deg_sum += 2
            edge_list.append((u, v))
        emit(TIME_STEP)
    return _events_df(spark, rows)


def dynamic_hyperbolic_events(
    spark: SparkSession,
    n: int,
    n_steps: int,
    avg_degree: float = 6.0,
    alpha: float = 1.0,
    move_prob: float = 0.5,
    move_distance: float = 0.02,
    seed: int = 42,
    radius: float | None = None,
    bands: int = 16,
    buckets: int | None = None,
    write_initial: bool = True,
    return_state: bool = False,
):
    """DynamicHyperbolicGenerator, threshold model T=0
    (``generators/DynamicHyperbolicGenerator.cpp``): points move on the
    hyperbolic disk with FIXED per-node movement vectors — radial steps
    in cosh-CDF space that bounce off the boundary and cross the center
    (``moveNode:168-210``, sign-flipping the radial component), angular
    steps of amove/r — each node moving independently with probability
    ``move_prob`` per step (``getEventsFromNodeMovement:262-275``);
    edge events are the diff of the distance-≤R neighborhoods before
    and after (``:300-331``), canonicalized u < v and deduplicated like
    the reference's sort+unique pass (``:335-341``; additions emitted
    before removals — the reference sorts by GraphEvent::compare).

    Initial coordinates reuse :func:`hyperbolic`'s seeded draws, so
    ``write_initial=True`` (the reference's writeInitialGraphToStream,
    here the initial NODE/EDGE_ADDITION block + TIME_STEP) replays to
    exactly ``hyperbolic(spark, n, ..., seed)``. The per-step edge sets
    come from the shared band/bucket threshold join — positions and
    movement state stay columnar; only the (small, inherently ordered)
    event log is collected. ``return_state`` additionally returns the
    final (id, theta, r) table so tests can pin the replayed graph
    against an independent threshold join of the final positions.
    """
    import math

    from networkit_spark.streaming.dynamics import (
        EDGE_ADDITION,
        EDGE_REMOVAL,
        NODE_ADDITION,
        TIME_STEP,
    )

    if radius is None:
        radius = 2.0 * math.log(8.0 * n / (math.pi * avg_degree))
    R = float(radius)
    if buckets is None:
        buckets = max(8, int(math.sqrt(n)))
    K, B = int(buckets), int(bands)
    two_pi = 2.0 * math.pi
    max_cdf = math.cosh(alpha * R)

    nodes = spark.range(n).select(F.col("id").cast("long"))
    u_t = _uniform(F.col("id"), seed * 7 + 1)
    u_r = _uniform(F.col("id"), seed * 7 + 2)
    u_a = _uniform(F.col("id"), seed * 7 + 3)
    u_m = _uniform(F.col("id"), seed * 7 + 4)
    state = nodes.select(
        "id",
        (u_t * F.lit(two_pi)).alias("theta"),
        (F.acosh(F.lit(1.0) + u_r * F.lit(max_cdf - 1.0)) / F.lit(alpha)).alias("r"),
        ((u_a * 2.0 - 1.0) * F.lit(float(move_distance))).alias("amove"),
        ((u_m * 2.0 - 1.0) * F.lit(10.0 * float(move_distance))).alias("rmove"),
    ).localCheckpoint(eager=True)

    def edge_df(st: DataFrame) -> DataFrame:
        return (
            _hyperbolic_threshold_edges(
                spark, st.select("id", "theta", "r"), R, B, K
            )
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )

    def pairs(df: DataFrame) -> list[tuple[int, int]]:
        return sorted((int(r["src"]), int(r["dst"])) for r in df.collect())

    rows: list[tuple] = []
    seq = 0

    def emit(t, u=None, v=None, w=None):
        nonlocal seq
        rows.append((seq, t, u, v, w))
        seq += 1

    cur = edge_df(state)
    if write_initial:
        for i in range(n):
            emit(NODE_ADDITION, i)
        for a, b in pairs(cur):
            emit(EDGE_ADDITION, a, b, 1.0)
        emit(TIME_STEP)

    for step in range(1, int(n_steps) + 1):
        moved = _uniform(F.col("id"), seed * 7 + 100 + step) < F.lit(
            float(move_prob)
        )
        cur_cosh = F.cosh(F.lit(alpha) * F.col("r"))
        cosh0 = cur_cosh + F.lit(alpha) * F.col("rmove")
        hi = cosh0 > F.lit(max_cdf)
        cosh1 = F.when(hi, F.lit(2.0 * max_cdf) - cosh0).otherwise(cosh0)
        lo = cosh1 < F.lit(1.0)
        cosh2 = F.when(lo, F.lit(2.0) - cosh1).otherwise(cosh1)
        new_r = F.least(
            F.acosh(F.greatest(cosh2, F.lit(1.0))) / F.lit(alpha),
            F.lit(R * (1.0 - 1e-12)),
        )
        phi0 = F.when(
            lo,
            F.when(F.col("theta") > F.lit(math.pi), F.col("theta") - F.lit(math.pi))
            .otherwise(F.col("theta") + F.lit(math.pi)),
        ).otherwise(F.col("theta"))
        new_theta = F.pmod(phi0 + F.col("amove") / new_r, F.lit(two_pi))
        state = state.select(
            "id",
            F.when(moved, new_theta).otherwise(F.col("theta")).alias("theta"),
            F.when(moved, new_r).otherwise(F.col("r")).alias("r"),
            "amove",
            F.when(moved & (hi | lo), -F.col("rmove"))
            .otherwise(F.col("rmove"))
            .alias("rmove"),
        ).localCheckpoint(eager=True)
        # distributed per-step diff: two anti-joins, only the (small)
        # delta is collected — the full edge set never leaves the
        # executors after the initial block
        new = edge_df(state)
        for a, b in pairs(new.join(cur, ["src", "dst"], "left_anti")):
            emit(EDGE_ADDITION, a, b, 1.0)
        for a, b in pairs(cur.join(new, ["src", "dst"], "left_anti")):
            emit(EDGE_REMOVAL, a, b, None)
        cur = new
        emit(TIME_STEP)

    events = _events_df(spark, rows)
    if return_state:
        return events, state.select("id", "theta", "r")
    return events


def dynamic_pubweb_events(
    spark: SparkSession,
    n: int,
    n_steps: int,
    num_dense_areas: int = 10,
    neighborhood_radius: float = 0.125,
    max_neighbors: int = 4,
    seed: int = 42,
    write_initial: bool = True,
    return_state: bool = False,
):
    """DynamicPubWebGenerator
    (``generators/DynamicPubWebGenerator.cpp``): per step, delete
    ⌊0.05·n⌋ uniformly drawn existing nodes (incident EDGE_REMOVALs
    first, then NODE_REMOVAL, ``generate:46-70``), insert as many fresh
    nodes with coordinates drawn from a uniformly chosen dense area (or
    background noise, ``:76-101``), then recompute the mutual-kNN edge
    structure: surviving eligible edges get EDGE_WEIGHT_UPDATE with the
    refreshed 0.01/d² weight, no-longer-eligible edges EDGE_REMOVAL,
    newly eligible pairs EDGE_ADDITION (``:108-175``), then TIME_STEP.
    Deletion/insertion counts are fixed from the INITIAL node count
    like the reference (``:24-25``), so |V| is invariant across steps.

    Node churn is inherently sequential (the reference redraws until it
    hits a live id) and runs driver-side with a seeded RNG, matching
    the other Dynamic* streams; each step's edge structure is the
    shared 3×3 torus-cell mutual-kNN JOIN over the live position table.
    ``return_state`` additionally returns the final (id, x, y) table.
    """
    import math
    import random as _random

    from networkit_spark.streaming.dynamics import (
        EDGE_ADDITION,
        EDGE_REMOVAL,
        EDGE_WEIGHT_UPDATE,
        NODE_ADDITION,
        NODE_REMOVAL,
        TIME_STEP,
    )

    rng = _random.Random(seed)
    areas, _counts = _pubweb_areas(n, num_dense_areas, seed)

    # initial layout: the SAME seeded position helper the static
    # generator uses (a change to pubweb's drawing cannot desynchronize
    # this stream's write_initial block), collected once — the churn
    # loop needs a mutable id → coordinate map, and the per-step event
    # contract below (weight updates on every surviving eligible edge)
    # makes the event log itself O(|E|) per step, so the driver-side
    # edge map is the same order as the required output
    pos0 = _pubweb_positions(spark, n, areas, _counts, seed)
    coords: dict[int, tuple[float, float]] = {
        int(r["id"]): (float(r["x"]), float(r["y"])) for r in pos0.collect()
    }
    edges: dict[tuple[int, int], float] = {
        (int(r["src"]), int(r["dst"])): float(r["weight"])
        for r in _pubweb_mutual_knn(
            spark, pos0, neighborhood_radius, max_neighbors
        ).collect()
    }
    next_id = n
    num_churn = int(n * 0.05)

    rows: list[tuple] = []
    seq = 0

    def emit(t, u=None, v=None, w=None):
        nonlocal seq
        rows.append((seq, t, u, v, w))
        seq += 1

    if write_initial:
        for i in sorted(coords):
            emit(NODE_ADDITION, i)
        for (a, b), w in sorted(edges.items()):
            emit(EDGE_ADDITION, a, b, w)
        emit(TIME_STEP)

    for _step in range(int(n_steps)):
        # ---- delete nodes (draw until a live id, reference :50-54)
        for _ in range(num_churn):
            while True:
                cand = rng.randrange(next_id)
                if cand in coords:
                    break
            for (a, b) in sorted(k for k in edges if cand in k):
                emit(EDGE_REMOVAL, a, b, None)
                del edges[(a, b)]
            del coords[cand]
            emit(NODE_REMOVAL, cand)
        # ---- insert nodes (cluster-or-noise coordinate, :76-101)
        for _ in range(num_churn):
            c = rng.randrange(num_dense_areas + 1)
            if c < num_dense_areas:
                angle = rng.random() * 2.0 * math.pi
                d = rng.random() * areas[c]["rad"]
                x = (areas[c]["x"] + math.cos(angle) * d) % 1.0
                y = (areas[c]["y"] + math.sin(angle) * d) % 1.0
            else:
                x, y = rng.random(), rng.random()
            coords[next_id] = (x, y)
            emit(NODE_ADDITION, next_id)
            next_id += 1
        # ---- recompute eligible structure on the live positions
        pos = spark.createDataFrame(
            [(i, x, y) for i, (x, y) in sorted(coords.items())],
            "id long, x double, y double",
        )
        new_edges = {
            (int(r["src"]), int(r["dst"])): float(r["weight"])
            for r in _pubweb_mutual_knn(
                spark, pos, neighborhood_radius, max_neighbors
            ).collect()
        }
        for (a, b), w in sorted(new_edges.items()):
            if (a, b) in edges:
                emit(EDGE_WEIGHT_UPDATE, a, b, w)
        for (a, b) in sorted(set(edges) - set(new_edges)):
            emit(EDGE_REMOVAL, a, b, None)
        for (a, b), w in sorted(new_edges.items()):
            if (a, b) not in edges:
                emit(EDGE_ADDITION, a, b, w)
        edges = new_edges
        emit(TIME_STEP)

    events = _events_df(spark, rows)
    if return_state:
        pos = spark.createDataFrame(
            [(i, x, y) for i, (x, y) in sorted(coords.items())],
            "id long, x double, y double",
        )
        return events, pos
    return events
