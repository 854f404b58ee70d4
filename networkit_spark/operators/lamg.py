"""LAMG — Lean Algebraic Multigrid Laplacian solver, distributed.

Reference: ``numerics/LAMG/`` (Livne & Brandt, "Lean Algebraic
Multigrid (LAMG): fast graph Laplacian linear solver", SISC 2012;
NetworKit implementation ``MultiLevelSetup.hpp`` / ``SolverLamg.hpp`` /
``LAMGSettings.hpp``). The hierarchy alternates the reference's two
level types:

- **Elimination levels** (``coarseningElimination``,
  ``MultiLevelSetup.hpp:261-343``): an independent set of low-degree
  nodes (structural degree ≤ 3 at stage 0, ≤ 4 later — the reference's
  ``nnzInRow − degreeOffset ≤ 4`` with the diagonal counted at stage 0)
  is eliminated EXACTLY by its Schur complement. Because the f set is
  independent, A_ff is diagonal and the Schur complement of a Laplacian
  is again a Laplacian over the c nodes, so the whole stage is an
  edge-list rewrite: fill edge (j,k) += w_ju·w_uk/d_u for every
  eliminated u adjacent to both; rhs restriction b_j += w_ju·b_u/d_u;
  back-substitution x_u = (b_u + Σ_v w_uv·x_v)/d_u
  (``eliminationOperators``, ``MultiLevelSetup.hpp:345-358``).
  Stages repeat while they eliminate > 1% of the level
  (``SETUP_ELIMINATION_MIN_ELIM_FRACTION``).
- **Aggregation levels** (``coarseningAggregation``,
  ``MultiLevelSetup.hpp:360-455``): seeded test vectors smoothed on
  L·x = 0 (``generateTVs``: TV_NUM = 4 vectors, 4 sweeps), the strong
  adjacency filter |w_uv| ≥ 0.1·min(max_u, max_v)
  (``computeStrongAdjacencyMatrix``), pairwise affinities
  c_uv = (Σ_k t_ku·t_kv)² / (Σ t_ku²)(Σ t_kv²)
  (``computeAffinityMatrix``), locally-high-degree seeds
  (deg_u ≥ 8·Σ w_uv·deg_v / d_u, ``addHighDegreeSeedNodes``), loose
  nodes folded into one aggregate (``aggregateLooseNodes``), then
  matching of undecided nodes to their best-affinity seed/undecided
  neighbor, and the piecewise-constant Galerkin product
  PᵀLP — in edge-list form one join-map + groupBy-sum per side.

Documented deviations (the sequential parts re-expressed as
deterministic parallel rules — this is a re-architecture, not a port):

- The reference's low-degree sweep is a sequential greedy scan
  (``lowDegreeSweep``); here a node is eliminated iff it is low-degree
  and its seeded hash precedes every low-degree neighbor's
  (hash-local-minimum rule) — the same independence guarantee, one
  round per stage, deterministic at any parallelism. More stages may
  run; the stop rule is shared.
- The reference's aggregation stage walks affinity bins sequentially
  with energy-corrected seed selection and in-loop test-vector updates
  (``aggregationStage`` / ``findBestSeedEnergyCorrected``); here each
  round every undecided node proposes to its best-affinity
  seed-or-undecided strong neighbor (ties → smaller id): proposals to
  seeds join immediately, mutual undecided proposals promote the
  smaller id to seed, and a node proposed-to by its own best choice
  wins promotion. Affinities stay fixed within a level. The coarsening
  work guard (nc ≤ 0.7/1.5 · n, ``SETUP_COARSENING_WORK_GUARD`` /
  ``SETUP_CYCLE_INDEX``) ends the rounds like the reference's stage
  loop.
- The solve smoother is weighted Jacobi (ω = 2/3) instead of
  Gauss-Seidel (``GaussSeidelRelaxation`` is inherently sequential);
  pre/post sweep counts keep the reference's (1, 2)
  (``SolverLamg.hpp:29-30``). Cycles are V-cycles driven by flexible
  PCG instead of the reference's 1.5-index adaptive cycles with
  iterate recombination (``MAX_COMBINED_ITERATES``) — acceleration is
  outer-loop CG either way.
- The coarsest level (≤ ``MAX_DIRECT_SOLVE_SIZE`` = 200 nodes) is a
  dense driver-side pseudoinverse, standing in for the reference's
  400-sweep coarsest relaxation — the only driver-sized state in the
  solver.

Scale posture: every level transform is an edge join-agg (the PageRank
shuffle shape); level sizes shrink geometrically, so the whole
hierarchy costs O(|E|) shuffled rows and the driver holds only level
metadata plus one ≤200² dense matrix.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.pin import pin

MAX_DIRECT_SOLVE_SIZE = 200
ELIMINATION_MAX_DEGREE = 4
ELIMINATION_MIN_FRACTION = 0.01
STRONG_EDGE_THRESHOLD = 0.1
HIGH_DEGREE_THRESHOLD = 8.0
TV_NUM = 4
TV_SWEEPS = 4
WORK_GUARD = 0.7 / 1.5  # SETUP_COARSENING_WORK_GUARD / SETUP_CYCLE_INDEX
JACOBI_OMEGA = 2.0 / 3.0


def _u01(col, salt: int, porthash: bool = False):
    """Deterministic uniform(0,1). ``porthash`` swaps xxhash64 for the
    md5 porthash so a DuckDB replay reproduces the draw bit-for-bit
    (functions/porthash.py — the house cross-engine convention)."""
    if porthash:
        from networkit_spark.functions.porthash import DEFAULT_PRIME, md5_mod

        return md5_mod(col, salt=f"lamg{salt}:").cast("double") / F.lit(
            float(DEFAULT_PRIME)
        )
    h = F.xxhash64(col, F.lit(salt))
    return (h.cast("double") / F.lit(float(1 << 64))) + F.lit(0.5)


@dataclass
class _ElimStage:
    # f-node elimination data: f (id, d); fe (src=f id, dst=c id, w)
    f: DataFrame
    fe: DataFrame


@dataclass
class _Level:
    kind: str  # "elim" | "agg"
    edges: DataFrame  # coarse adjacency AFTER this level (both orientations)
    nodes: DataFrame  # coarse node ids (id)
    n: int
    stages: list[_ElimStage] = field(default_factory=list)  # elim
    mapping: DataFrame | None = None  # (id, agg) for agg levels


@dataclass
class LamgHierarchy:
    fine_edges: DataFrame
    fine_nodes: DataFrame
    fine_n: int
    levels: list[_Level]
    coarse_ids: list[int]  # ordered node ids of the coarsest level
    coarse_pinv: np.ndarray  # pseudoinverse of the coarsest Laplacian


def _wdeg(edges: DataFrame) -> DataFrame:
    return edges.groupBy(F.col("src").alias("id")).agg(
        F.sum("w").alias("d"), F.count(F.lit(1)).alias("deg")
    )


def _elimination_stage(
    edges: DataFrame, nodes: DataFrame, n: int, stage: int, porthash: bool = False
) -> tuple[_ElimStage | None, DataFrame, DataFrame, int]:
    """One low-degree elimination stage. Returns (stage, coarse_edges,
    coarse_nodes, coarse_n) or (None, ...) when fewer than 1% of nodes
    eliminate (``SETUP_ELIMINATION_MIN_ELIM_FRACTION``)."""
    deg = _wdeg(edges)
    # stage 0 counts the diagonal (reference nnzInRow): degree <= 3
    max_deg = ELIMINATION_MAX_DEGREE - (1 if stage == 0 else 0)
    cand = (
        nodes.join(deg, "id", "left")
        .select(
            "id",
            F.coalesce("d", F.lit(0.0)).alias("d"),
            F.coalesce("deg", F.lit(0)).alias("deg"),
        )
        .filter((F.col("deg") <= max_deg) & (F.col("deg") > 0))
    )
    # hash-local-minimum independent set: u eliminated iff its seeded
    # hash precedes every low-degree neighbor's (ties by id) — the
    # deterministic parallel substitute for the sequential greedy sweep
    # (same independence guarantee; id-order local minima would
    # degenerate on id-ordered structures like paths/grids)
    cand_ids = cand.select("id")
    if porthash:
        from networkit_spark.functions.porthash import md5_mod

        hs = md5_mod(F.col("src"), salt=f"le{stage}:")
        hd = md5_mod(F.col("dst"), salt=f"le{stage}:")
    else:
        hs = F.xxhash64(F.col("src"), F.lit(9176 + stage))
        hd = F.xxhash64(F.col("dst"), F.lit(9176 + stage))
    bad = (
        edges.join(cand_ids.withColumnRenamed("id", "src"), "src", "left_semi")
        .join(cand_ids.withColumnRenamed("id", "dst"), "dst", "left_semi")
        .filter((hd < hs) | ((hd == hs) & (F.col("dst") < F.col("src"))))
        .select(F.col("src").alias("id"))
        .distinct()
    )
    f = cand.join(bad, "id", "left_anti").transform(pin)
    nf = f.count()
    if nf <= ELIMINATION_MIN_FRACTION * n:
        return None, edges, nodes, n
    if nf >= n:  # keep at least one coarse node (reference nc==0 branch)
        keep = f.orderBy(F.desc("id")).limit(1)
        f = f.join(keep, "id", "left_anti").transform(pin)
        nf = n - 1

    f_ids = f.select("id")
    fe = (
        edges.join(f.select(F.col("id").alias("src"), "d"), "src")
        .select("src", "dst", "w", "d")
        .transform(pin)
    )
    # fill edges between the c-neighbors of each eliminated u (the f set
    # is independent, so every neighbor is a c node); ordered pairs give
    # both orientations
    a = fe.select(F.col("src").alias("u"), F.col("dst").alias("j"), F.col("w").alias("wj"), "d")
    b = fe.select(F.col("src").alias("u"), F.col("dst").alias("k"), F.col("w").alias("wk"))
    fill = (
        a.join(b, "u")
        .filter(F.col("j") != F.col("k"))
        .select(
            F.col("j").alias("src"),
            F.col("k").alias("dst"),
            (F.col("wj") * F.col("wk") / F.col("d")).alias("w"),
        )
    )
    kept = edges.join(f_ids.withColumnRenamed("id", "src"), "src", "left_anti").join(
        f_ids.withColumnRenamed("id", "dst"), "dst", "left_anti"
    )
    coarse = (
        kept.unionByName(fill)
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
        .transform(pin)
    )
    coarse_nodes = nodes.join(f_ids, "id", "left_anti").transform(pin)
    return _ElimStage(f=f, fe=fe.select("src", "dst", "w")), coarse, coarse_nodes, n - nf


def _smooth_tvs(
    edges: DataFrame,
    nodes: DataFrame,
    num_tvs: int,
    sweeps: int,
    seed: int,
    porthash: bool = False,
) -> DataFrame:
    """Seeded uniform(-1,1) test vectors smoothed by ``sweeps`` weighted
    -Jacobi sweeps on L·t = 0 (``generateTVs``; GS→Jacobi documented).
    Returns (id, t0..t{num_tvs-1}). The reference keeps testVectors[0]
    equal to the incoming tv (ones on the finest level — constant
    vectors are Jacobi fixed points, so t0 is seeded here too)."""
    tcols = [f"t{k}" for k in range(num_tvs)]
    tvs = nodes.select(
        "id",
        *[
            (2.0 * _u01(F.col("id"), seed * 1009 + k, porthash) - 1.0).alias(c)
            for k, c in enumerate(tcols)
        ],
    ).transform(pin)
    deg = _wdeg(edges).select("id", "d")
    for _ in range(sweeps):
        gathered = (
            edges.join(
                tvs.select(
                    F.col("id").alias("dst"),
                    *[F.col(c).alias(f"g{k}") for k, c in enumerate(tcols)],
                ),
                "dst",
            )
            .groupBy(F.col("src").alias("id"))
            .agg(
                *[
                    F.sum(F.col("w") * F.col(f"g{k}")).alias(f"g{k}")
                    for k in range(num_tvs)
                ]
            )
        )
        tvs = (
            tvs.join(deg, "id", "left")
            .join(gathered, "id", "left")
            .select(
                "id",
                *[
                    (
                        (1.0 - JACOBI_OMEGA) * F.col(c)
                        + F.lit(JACOBI_OMEGA)
                        * F.coalesce(f"g{k}", F.lit(0.0))
                        / F.greatest(F.coalesce("d", F.lit(0.0)), F.lit(1e-300))
                    ).alias(c)
                    for k, c in enumerate(tcols)
                ],
            )
            .transform(pin)
        )
    return tvs


def _strong_edges(edges: DataFrame) -> DataFrame:
    """|w_uv| ≥ 0.1·min(max_u, max_v) (``computeStrongAdjacencyMatrix``,
    ``MultiLevelSetup.hpp:531-571``)."""
    mx = edges.groupBy(F.col("src").alias("id")).agg(F.max("w").alias("mx"))
    return (
        edges.join(mx.select(F.col("id").alias("src"), F.col("mx").alias("mxs")), "src")
        .join(mx.select(F.col("id").alias("dst"), F.col("mx").alias("mxd")), "dst")
        .filter(F.col("w") >= STRONG_EDGE_THRESHOLD * F.least("mxs", "mxd"))
        .select("src", "dst", "w")
    )


def _affinities(strong: DataFrame, tvs: DataFrame, num_tvs: int) -> DataFrame:
    """(src, dst, aff) on strong edges (``computeAffinityMatrix``)."""
    tcols = [f"t{k}" for k in range(num_tvs)]
    ns = tvs.select(
        "id", sum(F.col(c) * F.col(c) for c in tcols).alias("ns")
    )
    a = tvs.select(F.col("id").alias("src"), *[F.col(c).alias(f"a{k}") for k, c in enumerate(tcols)]).join(
        ns.select(F.col("id").alias("src"), F.col("ns").alias("nsa")), "src"
    )
    b = tvs.select(F.col("id").alias("dst"), *[F.col(c).alias(f"b{k}") for k, c in enumerate(tcols)]).join(
        ns.select(F.col("id").alias("dst"), F.col("ns").alias("nsb")), "dst"
    )
    ij = sum(F.col(f"a{k}") * F.col(f"b{k}") for k in range(num_tvs))
    return (
        strong.join(a, "src")
        .join(b, "dst")
        .select(
            "src",
            "dst",
            (
                (ij * ij)
                / F.greatest(F.col("nsa") * F.col("nsb"), F.lit(1e-300))
            ).alias("aff"),
        )
    )


def _aggregation_level(
    edges: DataFrame,
    nodes: DataFrame,
    n: int,
    num_tvs: int,
    seed: int,
    porthash: bool = False,
) -> tuple[DataFrame, DataFrame, DataFrame, int]:
    """One aggregation coarsening. Returns (mapping, coarse_edges,
    coarse_nodes, coarse_n)."""
    spark = edges.sparkSession
    tvs = _smooth_tvs(edges, nodes, num_tvs, TV_SWEEPS, seed, porthash)
    strong = _strong_edges(edges).transform(pin)
    aff = _affinities(strong, tvs, num_tvs).transform(pin)

    deg = _wdeg(edges)
    # high-degree seeds: deg_u >= 8 * (Σ w_uv deg_v) / d_u
    hd = (
        edges.join(deg.select(F.col("id").alias("dst"), F.col("deg").alias("degv")), "dst")
        .groupBy(F.col("src").alias("id"))
        .agg(F.sum(F.col("w") * F.col("degv")).alias("num"))
        .join(deg, "id")
        .filter(
            F.col("deg")
            >= HIGH_DEGREE_THRESHOLD * F.col("num") / F.greatest("d", F.lit(1e-300))
        )
        .select("id")
    )
    # loose nodes: no strong neighbor -> all join the min-id loose node
    loose = nodes.join(
        strong.select(F.col("src").alias("id")).distinct(), "id", "left_anti"
    ).transform(pin)
    loose_rows = loose.collect() if loose.limit(1).count() > 0 else []
    loose_ids = sorted(int(r["id"]) for r in loose_rows)

    # status: (id, s) where s = seed id; absent = undecided
    status = hd.select("id", F.col("id").alias("s"))
    if loose_ids:
        head = loose_ids[0]
        status = status.unionByName(
            spark.createDataFrame([(i, head) for i in loose_ids], "id long, s long")
        ).dropDuplicates(["id"])
    status = status.transform(pin)
    nc = n - max(len(loose_ids) - 1, 0)

    for _round in range(2):  # SETUP_MAX_AGGREGATION_STAGES
        if nc <= WORK_GUARD * n:
            break
        und = nodes.join(status, "id", "left_anti")
        # best-affinity neighbor among seeds (s == id) and undecided
        seeds = status.filter(F.col("s") == F.col("id")).select("id")
        elig = (
            aff.join(und.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(
                seeds.withColumnRenamed("id", "dst")
                .unionByName(und.withColumnRenamed("id", "dst"))
                .distinct(),
                "dst",
                "left_semi",
            )
        )
        best = elig.groupBy(F.col("src").alias("id")).agg(
            F.max(F.struct(F.col("aff"), (-F.col("dst")).alias("nd"))).alias("m")
        ).select("id", (-F.col("m")["nd"]).alias("tgt")).transform(pin)
        if best.limit(1).count() == 0:
            break
        to_seed = best.join(
            seeds.withColumnRenamed("id", "tgt"), "tgt", "left_semi"
        ).select("id", F.col("tgt").alias("s"))
        to_und = best.join(
            seeds.withColumnRenamed("id", "tgt"), "tgt", "left_anti"
        )
        # an undecided target promotes iff its own best proposes back
        # (mutual, smaller id seeds) or it is anyone's chosen target and
        # itself proposed to a now-consumed target; deterministic rule:
        # promote tgt, but a node that both proposes and is proposed-to
        # resolves by id — it becomes a seed only if it is smaller than
        # its own target, otherwise it joins its target next round
        proposed = to_und.select(F.col("tgt").alias("id")).distinct()
        promote = proposed.join(
            best.withColumnRenamed("id", "pid").withColumnRenamed("tgt", "ptgt"),
            proposed["id"] == F.col("pid"),
            "left",
        ).filter(
            F.col("ptgt").isNull() | (F.col("id") < F.col("ptgt"))
        ).select("id")
        # a node that itself joined a seed this round is consumed and
        # cannot promote (reference: aggregated nodes stop being seeds)
        promote = promote.join(to_seed.select("id"), "id", "left_anti")
        new_seeds = promote.select("id", F.col("id").alias("s"))
        joins = to_und.join(
            promote.withColumnRenamed("id", "tgt"), "tgt", "left_semi"
        ).join(promote, "id", "left_anti").select("id", F.col("tgt").alias("s"))
        add = to_seed.unionByName(new_seeds).unionByName(joins).dropDuplicates(["id"])
        added = add.count()
        if added == 0:
            break
        status = status.unionByName(add).dropDuplicates(["id"]).transform(pin)
        # nc drops by the number of non-seed assignments
        nc = n - status.filter(F.col("s") != F.col("id")).count()

    mapping = (
        nodes.join(status, "id", "left")
        .select("id", F.coalesce("s", F.col("id")).alias("agg"))
        .transform(pin)
    )
    coarse = (
        edges.join(mapping.withColumnRenamed("id", "src"), "src")
        .withColumnRenamed("agg", "ca")
        .join(mapping.withColumnRenamed("id", "dst"), "dst")
        .withColumnRenamed("agg", "cb")
        .filter(F.col("ca") != F.col("cb"))
        .groupBy(F.col("ca").alias("src"), F.col("cb").alias("dst"))
        .agg(F.sum("w").alias("w"))
        .transform(pin)
    )
    coarse_nodes = mapping.select(F.col("agg").alias("id")).distinct().transform(pin)
    return mapping, coarse, coarse_nodes, coarse_nodes.count()


def lamg_hierarchy(
    g: Graph,
    seed: int = 42,
    max_levels: int = 20,
    coarsest_size: int = MAX_DIRECT_SOLVE_SIZE,
    porthash: bool = False,
) -> LamgHierarchy:
    """Build the LAMG level hierarchy for ``g``'s Laplacian
    (``MultiLevelSetup::setup``). Elimination stages fold into one
    elimination level per round like the reference; aggregation levels
    add one TV per level up to TV_MAX (``TV_INC``)."""
    edges = (
        (g.symmetrized_edges() if g.directed else g.edges)
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.sum(F.col("weight").cast("double")).alias("w"))
        .transform(pin)
    )
    nodes = g.nodes.select("id").transform(pin)
    n = nodes.count()

    levels: list[_Level] = []
    cur_edges, cur_nodes, cur_n = edges, nodes, n
    num_tvs = TV_NUM
    lvl_seed = seed
    while cur_n > coarsest_size and len(levels) < max_levels:
        # ELIMINATION (repeat stages while productive)
        stages: list[_ElimStage] = []
        st = 0
        while cur_n > coarsest_size:
            stage, e2, n2, c2 = _elimination_stage(
                cur_edges, cur_nodes, cur_n, st, porthash
            )
            if stage is None:
                break
            stages.append(stage)
            cur_edges, cur_nodes, cur_n = e2, n2, c2
            st += 1
        if stages:
            levels.append(
                _Level(kind="elim", edges=cur_edges, nodes=cur_nodes, n=cur_n, stages=stages)
            )
            continue
        if cur_n <= coarsest_size:
            break
        # AGGREGATION
        prev_n = cur_n
        mapping, e2, n2, c2 = _aggregation_level(
            cur_edges, cur_nodes, cur_n, num_tvs, lvl_seed, porthash
        )
        lvl_seed += 7919
        if c2 >= prev_n:  # no progress — stop coarsening
            break
        levels.append(
            _Level(kind="agg", edges=e2, nodes=n2, n=c2, mapping=mapping)
        )
        cur_edges, cur_nodes, cur_n = e2, n2, c2
        if num_tvs < 10:  # TV_MAX / TV_INC
            num_tvs += 1

    # coarsest: dense pseudoinverse on the driver
    ids = sorted(int(r["id"]) for r in cur_nodes.collect())
    idx = {v: i for i, v in enumerate(ids)}
    m = len(ids)
    lap = np.zeros((m, m))
    for r in cur_edges.collect():
        i, j, w = idx[int(r["src"])], idx[int(r["dst"])], float(r["w"])
        lap[i, j] -= w
        lap[i, i] += w
    pinv = np.linalg.pinv(lap) if m else np.zeros((0, 0))
    return LamgHierarchy(
        fine_edges=edges,
        fine_nodes=nodes,
        fine_n=n,
        levels=levels,
        coarse_ids=ids,
        coarse_pinv=pinv,
    )


# ------------------------------------------------------------------ solve
def _lap_matvec(edges: DataFrame, deg: DataFrame, x: DataFrame) -> DataFrame:
    gathered = (
        edges.join(x.select(F.col("id").alias("dst"), F.col("v").alias("xv")), "dst")
        .groupBy(F.col("src").alias("id"))
        .agg(F.sum(F.col("w") * F.col("xv")).alias("ax"))
    )
    return (
        x.join(deg, "id", "left")
        .join(gathered, "id", "left")
        .select(
            "id",
            (
                F.coalesce("d", F.lit(0.0)) * F.col("v")
                - F.coalesce("ax", F.lit(0.0))
            ).alias("v"),
        )
    )


def _jacobi(
    edges: DataFrame, deg: DataFrame, b: DataFrame, x: DataFrame | None, sweeps: int
) -> DataFrame:
    """Weighted-Jacobi relaxation on L x = b:
    x ← (1−ω)x + ω·D⁻¹(b + W·x)."""
    if x is None:
        x = b.select("id", F.lit(0.0).alias("v"))
    for _ in range(sweeps):
        gathered = (
            edges.join(
                x.select(F.col("id").alias("dst"), F.col("v").alias("xv")), "dst"
            )
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum(F.col("w") * F.col("xv")).alias("wx"))
        )
        x = (
            b.select("id", F.col("v").alias("bv"))
            .join(x.select("id", F.col("v").alias("xv")), "id", "left")
            .join(deg, "id", "left")
            .join(gathered, "id", "left")
            .select(
                "id",
                (
                    (1.0 - JACOBI_OMEGA) * F.coalesce("xv", F.lit(0.0))
                    + F.lit(JACOBI_OMEGA)
                    * (F.col("bv") + F.coalesce("wx", F.lit(0.0)))
                    / F.greatest(F.coalesce("d", F.lit(0.0)), F.lit(1e-300))
                ).alias("v"),
            )
        )
    return x


class _Solver:
    def __init__(self, h: LamgHierarchy):
        self.h = h
        self.spark = h.fine_edges.sparkSession
        # per-level edge/deg relations, finest first (levels[i].edges is
        # the operator BELOW level i's transform; the operator AT depth
        # i is the previous level's coarse result)
        self.ops: list[tuple[DataFrame, DataFrame]] = []
        cur = h.fine_edges
        self.ops.append((cur, _wdeg(cur).select("id", "d").transform(pin)))
        for lvl in h.levels:
            self.ops.append(
                (lvl.edges, _wdeg(lvl.edges).select("id", "d").transform(pin))
            )

    def _coarsest(self, b: DataFrame) -> DataFrame:
        rows = {int(r["id"]): float(r["v"]) for r in b.collect()}
        vec = np.array([rows.get(i, 0.0) for i in self.h.coarse_ids])
        sol = self.h.coarse_pinv @ vec
        return self.spark.createDataFrame(
            [(i, float(sol[k])) for k, i in enumerate(self.h.coarse_ids)],
            "id long, v double",
        )

    def vcycle(self, depth: int, b: DataFrame) -> DataFrame:
        if depth == len(self.h.levels):
            return self._coarsest(b)
        lvl = self.h.levels[depth]
        edges, deg = self.ops[depth]
        if lvl.kind == "elim":
            # exact transfer through the elimination stages
            bs = [b]
            for st in lvl.stages:
                # b_c_j = b_j + Σ_u w_ju·b_u/d_u over eliminated u
                bu = st.f.select("id", "d").join(
                    bs[-1].select("id", F.col("v").alias("bu")), "id"
                )
                contrib = (
                    st.fe.join(
                        bu.select(
                            F.col("id").alias("src"),
                            (F.col("bu") / F.col("d")).alias("r"),
                        ),
                        "src",
                    )
                    .groupBy(F.col("dst").alias("id"))
                    .agg(F.sum(F.col("w") * F.col("r")).alias("add"))
                )
                nxt = (
                    bs[-1]
                    .join(st.f.select("id"), "id", "left_anti")
                    .join(contrib, "id", "left")
                    .select(
                        "id",
                        (F.col("v") + F.coalesce("add", F.lit(0.0))).alias("v"),
                    )
                    .transform(pin)
                )
                bs.append(nxt)
            x = self.vcycle(depth + 1, bs[-1])
            for st, bf in zip(reversed(lvl.stages), reversed(bs[:-1])):
                # x_u = (b_u + Σ_v w_uv x_v)/d_u
                gathered = (
                    st.fe.join(
                        x.select(F.col("id").alias("dst"), F.col("v").alias("xv")),
                        "dst",
                    )
                    .groupBy(F.col("src").alias("id"))
                    .agg(F.sum(F.col("w") * F.col("xv")).alias("wx"))
                )
                xf = (
                    st.f.select("id", "d")
                    .join(bf.select("id", F.col("v").alias("bu")), "id")
                    .join(gathered, "id", "left")
                    .select(
                        "id",
                        (
                            (F.col("bu") + F.coalesce("wx", F.lit(0.0)))
                            / F.col("d")
                        ).alias("v"),
                    )
                )
                x = x.unionByName(xf).transform(pin)
            return x
        # aggregation level: smooth, restrict residual, correct, smooth
        x = _jacobi(edges, deg, b, None, sweeps=1)
        r = (
            b.join(
                _lap_matvec(edges, deg, x).select("id", F.col("v").alias("lx")),
                "id",
                "left",
            )
            .select("id", (F.col("v") - F.coalesce("lx", F.lit(0.0))).alias("v"))
            .transform(pin)
        )
        rc = (
            r.join(lvl.mapping, "id")
            .groupBy(F.col("agg").alias("id"))
            .agg(F.sum("v").alias("v"))
            .transform(pin)
        )
        ec = self.vcycle(depth + 1, rc)
        x = (
            x.join(lvl.mapping, "id")
            .join(
                ec.select(F.col("id").alias("agg"), F.col("v").alias("e")), "agg", "left"
            )
            .select("id", (F.col("v") + F.coalesce("e", F.lit(0.0))).alias("v"))
        )
        return _jacobi(edges, deg, b, x, sweeps=2).transform(pin)


def lamg_solve(
    g: Graph,
    b: DataFrame,
    tol: float = 1e-8,
    max_cycles: int = 100,
    hierarchy: LamgHierarchy | None = None,
    seed: int = 42,
) -> DataFrame:
    """Solve L x = b (``b``: (id, value-like second column), must be
    mean-free per connected component) with V-cycle-preconditioned
    flexible CG. Returns the mean-free solution (id, value) — the same
    contract as :func:`networkit_spark.operators.numerics.
    laplacian_solve`. Pass a prebuilt ``hierarchy`` to amortize setup
    across solves (``Lamg::parallelSolve`` reuses its setup likewise).
    """
    h = hierarchy or lamg_hierarchy(g, seed=seed)
    sv = _Solver(h)
    edges, deg = sv.ops[0]
    n = h.fine_n

    def dot(a: DataFrame, c: DataFrame) -> float:
        row = (
            a.join(c.select("id", F.col("v").alias("cv")), "id")
            .agg(F.sum(F.col("v") * F.col("cv")))
            .collect()[0][0]
        )
        return float(row or 0.0)

    def demean(x: DataFrame) -> DataFrame:
        mean = float(x.agg(F.sum("v")).collect()[0][0] or 0.0) / max(n, 1)
        return x.select("id", (F.col("v") - F.lit(mean)).alias("v"))

    b = h.fine_nodes.join(
        b.select(F.col(b.columns[0]).alias("id"), F.col(b.columns[1]).alias("v")),
        "id",
        "left",
    ).select("id", F.coalesce("v", F.lit(0.0)).alias("v"))
    b = demean(b).transform(pin)
    bnorm = max(dot(b, b), 1e-300)

    x = h.fine_nodes.select("id", F.lit(0.0).alias("v")).transform(pin)
    r = b
    z = demean(sv.vcycle(0, r)).transform(pin)
    p = z
    rz = dot(r, z)
    for it in range(1, max_cycles + 1):
        if dot(r, r) / bnorm <= tol * tol:
            break
        ap = _lap_matvec(edges, deg, p).transform(pin)
        den = dot(p, ap)
        if den <= 0:
            break
        alpha = rz / den
        x = x.join(p.select("id", F.col("v").alias("pv")), "id").select(
            "id", (F.col("v") + F.lit(alpha) * F.col("pv")).alias("v")
        )
        r = r.join(ap.select("id", F.col("v").alias("av")), "id").select(
            "id", (F.col("v") - F.lit(alpha) * F.col("av")).alias("v")
        )
        if it % 2 == 0:
            x = x.transform(pin)
            r = demean(r).transform(pin)
        z = demean(sv.vcycle(0, r)).transform(pin)
        rz_new = dot(r, z)
        beta = rz_new / rz if rz != 0 else 0.0
        p = z.join(p.select("id", F.col("v").alias("pv")), "id", "left").select(
            "id",
            (F.col("v") + F.lit(beta) * F.coalesce("pv", F.lit(0.0))).alias("v"),
        ).transform(pin)
        rz = rz_new
    return demean(x).transform(pin)
