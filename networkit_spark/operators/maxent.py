"""MaxentStress graph layout.

Reference: ``viz/MaxentStress.cpp`` / ``include/networkit/viz/
MaxentStress.hpp`` (Meyerhenke/Wegner implementation of Gansner, Hu,
North, "A maxent-stress model for graph layout", TVCG 2013): minimize
stress over the known-distance set S with a maximum-entropy repulsion
term on the complement, by repeatedly solving the weighted-Laplacian
system L_w x = rhs(x_old) while cooling the entropy weight α.

Spark plan:

- **S (known distances)** is built ONCE (``maxent_known_distances``):
  k = 1 is the plain symmetric edge view (``computeKnownDistances``,
  ``MaxentStress.cpp:455-470``); k > 1 adds the hop-(2..k) ball of every
  node via a depth-capped multi-source BFS whose output row count IS
  |S| — nothing larger materializes. On weighted graphs the reference's
  truncated Dijkstra (``addKNeighborhoodOfVertex``,
  ``MaxentStress.cpp:499-540``) extracts TRUE shortest-path distances
  for hop-ball members; we reproduce that with the batched
  ``multi_source_sssp`` semi-joined on the hop ball, behind the house
  ``max_nodes`` guard (all-source SSSP is O(n·reached)).
- **The Laplacian never materializes.** L_w·x = wdeg·x − Σ_S w·x is one
  edge join-agg — the PageRank superstep shuffle shape.
- **Block CG** (``_block_cg``): all ``dim`` axes are solved together —
  one matvec join-agg plus two dot aggregations per iteration, with
  per-axis α/β scalars read from a single dim-wide aggregate row. The
  reference's ``solver.parallelSolve`` (LAMG/CG per dimension) becomes
  one shuffle per CG step regardless of dim.
- **Repulsion** (``_grid_repulsion``): the reference approximates the
  entropy gradient with a Barnes-Hut octree at θ = 0.6
  (``approxRepulsiveForces``, ``MaxentStress.cpp:430-453``). Here the
  octree becomes a single-level grid: cells beyond the adjacent
  3^dim neighborhood contribute (count, center-of-mass) through a
  broadcast of the ≤ grid^dim cell table; adjacent cells contribute
  exact pairs through a cell-key join. Same far-field/near-field split,
  O(n·cells + near pairs) rows, no n² — a documented deviation from the
  adaptive octree. Like the reference's approximation (and unlike its
  exact ``computeRepulsiveForces``) S pairs are NOT excluded from the
  repulsion. Forces are recomputed on the reference's
  ``floor(5·ln(numSolves))`` schedule (``MaxentStress.cpp:110-117``).

Reference quirks mirrored / documented deviations:

- ``numSolves = 0`` evaluates ``floor(5·log(0))`` in C++ — casting -inf
  to an unsigned is UB; every sane outcome recomputes forces at solves
  0 and 1, which is what we pin.
- rhs uses w·d/||x_i−x_j|| — the reference notes Gansner et al.'s paper
  multiplies where it should divide (``MaxentStress.cpp:398``); we
  follow the reference (divide), with the same 1e-5 distance floor.
- The first ⌊maxSolvesPerAlpha/5⌋ solves of every α round normalize the
  attractive rhs to unit length per axis (``MaxentStress.cpp:129-131``).
- Directed input is treated as undirected (symmetrized, self-loops
  dropped): the reference builds a symmetric CSR Laplacian and its
  solver requires it; iterating out-neighbors of a digraph would not.
- The random sphere init (``randomSphereCoordinates``,
  ``MaxentStress.cpp:646-698``) walks a BFS tree from the max-degree
  node placing each child at its parent plus a random direction scaled
  to the tree-edge weight. The C++ draws from one global RNG (iteration
  -order dependent); we draw per-(node, axis) seeded xxhash64 uniforms
  on the min-parent-id BFS tree — parallelism-invariant, same geometry.
- ``q`` auto-raises to 0.8 when >30% of nodes have degree 1
  (``MaxentStress.cpp:487-495``), measured on the undirected view.
- Raises on disconnected input, like ``MaxentStress::run``'s
  ConnectedComponents check (``MaxentStress.cpp:66-71``).
"""

from __future__ import annotations

import math
from itertools import product

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.pin import pin

_EPS_DIST = 1e-5


def _u(col, salt: int):
    """Deterministic uniform(0,1) from a column + salt (xxhash64)."""
    h = F.xxhash64(col, F.lit(salt))
    return (h.cast("double") / F.lit(float(1 << 64))) + F.lit(0.5)


def _sym_edges(g: Graph) -> DataFrame:
    e = g.symmetrized_edges() if g.directed else g.edges
    return (
        e.filter(F.col("src") != F.col("dst"))
        .select("src", "dst", F.col("weight").cast("double").alias("weight"))
        .dropDuplicates(["src", "dst"])
    )


def _guard(n: int, max_nodes: int | None, what: str) -> None:
    if max_nodes is not None and n > max_nodes:
        raise ValueError(
            f"{what} materializes O(n^2)-bounded state and n={n} exceeds "
            f"max_nodes={max_nodes}; pass max_nodes=None to opt in"
        )


def maxent_known_distances(
    g: Graph, k: int = 1, max_nodes: int | None = 20_000
) -> DataFrame:
    """The known-distance set S as a symmetric (src, dst, d) table
    (``computeKnownDistances`` + ``addKNeighborhoodOfVertex``,
    ``MaxentStress.cpp:455-540``).

    Direct neighbors carry the EDGE weight; hop-(2..k) ball members
    carry the hop depth (unweighted) or the true shortest-path distance
    (weighted — the reference's truncated Dijkstra extracts exact
    distances, so the batched SSSP reproduces it; guarded by
    ``max_nodes`` because all-source SSSP state is O(n·reached)).
    """
    sym = _sym_edges(g).transform(pin)
    d1 = sym.select("src", "dst", F.col("weight").alias("d"))
    if k <= 1:
        return d1

    edges = sym.select("src", "dst")
    placed = edges.select("src", F.col("src").alias("dst")).distinct().transform(pin)
    frontier = placed
    deep = None
    for depth in range(1, k + 1):
        nxt = (
            frontier.join(
                edges.select(
                    F.col("src").alias("dst"), F.col("dst").alias("nxt")
                ),
                "dst",
            )
            .select("src", F.col("nxt").alias("dst"))
            .distinct()
            .join(placed, ["src", "dst"], "left_anti")
            .transform(pin)
        )
        placed = placed.unionByName(nxt).transform(pin)
        if depth > 1:
            lvl = nxt.withColumn("depth", F.lit(depth))
            deep = lvl if deep is None else deep.unionByName(lvl)
        frontier = nxt
    if deep is None:
        return d1

    if not g.weighted:
        return d1.unionByName(
            deep.select("src", "dst", F.col("depth").cast("double").alias("d"))
        )

    from networkit_spark.operators.distance import multi_source_sssp

    _guard(g.num_nodes(), max_nodes, "maxent_known_distances(k>1, weighted)")
    und = Graph(nodes=g.nodes, edges=sym, directed=False, weighted=True)
    roots = deep.select(F.col("src").alias("id")).distinct()
    dist = multi_source_sssp(und, roots).select(
        F.col("root").alias("src"), F.col("node").alias("dst"), "dist"
    )
    got = deep.select("src", "dst").join(dist, ["src", "dst"]).select(
        "src", "dst", F.col("dist").alias("d")
    )
    return d1.unionByName(got)


# --------------------------------------------------------------- init
def _sphere_init(g: Graph, sym: DataFrame, dim: int, seed: int) -> DataFrame:
    """Seeded random-sphere start coordinates on the BFS tree from the
    max-degree node (``randomSphereCoordinates``,
    ``MaxentStress.cpp:646-698``); raises if the graph is disconnected
    (``MaxentStress.cpp:66-71``). Returns (id, c0..c{dim-1})."""
    deg = sym.groupBy("src").count()
    top = deg.orderBy(F.desc("count"), F.asc("src")).limit(1).collect()
    n = g.num_nodes()
    if not top:
        if n > 1:
            raise ValueError(
                "MaxentStress requires a connected graph (edgeless input)"
            )
        return g.nodes.select(
            "id", *[F.lit(0.0).alias(f"c{d}") for d in range(dim)]
        )
    root = int(top[0]["src"])

    ccols = [f"c{d}" for d in range(dim)]
    placed = (
        g.nodes.sparkSession.createDataFrame([(root,)], "id long")
        .select("id", *[F.lit(0.0).alias(c) for c in ccols])
        .transform(pin)
    )
    placed_ids = placed.select("id")
    frontier = placed
    while True:
        cand = (
            sym.join(
                frontier.select(F.col("id").alias("src"), *ccols), "src"
            )
            .join(placed_ids.withColumnRenamed("id", "dst"), "dst", "left_anti")
        )
        # min-parent-id tie-break: the struct min carries the parent's
        # weight and coordinates along with it
        win = cand.groupBy(F.col("dst").alias("id")).agg(
            F.min(F.struct("src", "weight", *ccols)).alias("p")
        )
        raw = [2.0 * _u(F.col("id"), seed * 131 + d) - 1.0 for d in range(dim)]
        ln = F.greatest(
            F.sqrt(sum(r * r for r in raw)), F.lit(1e-12)
        )
        nxt = win.select(
            "id",
            *[
                (F.col("p")[c] + raw[d] * F.col("p")["weight"] / ln).alias(c)
                for d, c in enumerate(ccols)
            ],
        ).transform(pin)
        if nxt.limit(1).count() == 0:
            break
        placed = placed.unionByName(nxt).transform(pin)
        placed_ids = placed.select("id")
        frontier = nxt
    if placed.count() < n:
        raise ValueError(
            "MaxentStress requires a connected graph "
            "(BFS from the max-degree node did not reach every node)"
        )
    return placed


# ---------------------------------------------------------------- rhs
def _attractive_rhs(s: DataFrame, coords: DataFrame, dim: int) -> DataFrame:
    """rhs_i = Σ_{j∈S(i)} w_ij · d_ij/max(||x_i−x_j||, 1e-5) · (x_i − x_j)
    with w_ij = 1/d_ij² (``computeCoordinateLaplacianTerm``,
    ``MaxentStress.cpp:383-404``; ``weightingFactor``,
    ``MaxentStress.hpp:305``)."""
    ccols = [f"c{d}" for d in range(dim)]
    a = coords.select(F.col("id").alias("src"), *[F.col(c).alias(f"p{d}") for d, c in enumerate(ccols)])
    b = coords.select(F.col("id").alias("dst"), *[F.col(c).alias(f"q{d}") for d, c in enumerate(ccols)])
    j = s.join(a, "src").join(b, "dst")
    dist = F.sqrt(sum((F.col(f"p{d}") - F.col(f"q{d}")) ** 2 for d in range(dim)))
    w = (F.lit(1.0) / (F.col("d") * F.col("d"))) * F.col("d") / F.greatest(
        dist, F.lit(_EPS_DIST)
    )
    return j.groupBy(F.col("src").alias("id")).agg(
        *[
            F.sum(w * (F.col(f"p{d}") - F.col(f"q{d}"))).alias(f"c{d}")
            for d in range(dim)
        ]
    )


# ---------------------------------------------------------- repulsion
def _grid_repulsion(
    coords: DataFrame, dim: int, q: float, grid: int = 8
) -> DataFrame:
    """Single-level Barnes-Hut grid approximation of the entropy
    gradient (``approxRepulsiveForces``, ``MaxentStress.cpp:430-453``):
    far cells (Chebyshev cell distance > 1) contribute count × center-of
    -mass, the 3^dim adjacent cells contribute exact pairs; coincident
    points (squared distance < 1e-5) contribute nothing, matching the
    reference's skip. The result is normalized to unit length per axis
    like the reference's ``b[d] /= b[d].length()``."""
    ccols = [f"c{d}" for d in range(dim)]
    qsign = 1.0 if q >= 0.0 else -1.0
    q2 = (q + 2.0) / 2.0

    stats = coords.agg(
        *[F.min(c).alias(f"mn{d}") for d, c in enumerate(ccols)],
        *[F.max(c).alias(f"mx{d}") for d, c in enumerate(ccols)],
    ).collect()[0]
    widths = []
    for d in range(dim):
        w = (float(stats[f"mx{d}"]) - float(stats[f"mn{d}"])) / grid
        widths.append(w if w > 0.0 else 1.0)

    def cell(d):
        return F.least(
            F.floor((F.col(ccols[d]) - F.lit(float(stats[f"mn{d}"]))) / F.lit(widths[d])),
            F.lit(grid - 1),
        ).cast("int")

    def key_of(cs):
        k = F.lit(0)
        for c in cs:
            k = k * F.lit(grid + 2) + (c + F.lit(1))
        return k

    pts = coords.select(
        "id", *ccols, *[cell(d).alias(f"g{d}") for d in range(dim)]
    ).transform(pin)
    cells = pts.groupBy(*[f"g{d}" for d in range(dim)]).agg(
        F.count(F.lit(1)).alias("cnt"),
        *[F.avg(c).alias(f"m{d}") for d, c in enumerate(ccols)],
    )

    # far field: every (node, non-adjacent cell) via a broadcast of the
    # <= grid^dim cell table
    far = pts.crossJoin(
        F.broadcast(
            cells.select(
                *[F.col(f"g{d}").alias(f"h{d}") for d in range(dim)], "cnt",
                *[f"m{d}" for d in range(dim)],
            )
        )
    ).filter(
        F.greatest(
            *[F.abs(F.col(f"g{d}") - F.col(f"h{d}")) for d in range(dim)]
        )
        > 1
    )
    sqd_far = sum((F.col(ccols[d]) - F.col(f"m{d}")) ** 2 for d in range(dim))
    fac_far = F.when(sqd_far < _EPS_DIST, F.lit(0.0)).otherwise(
        F.lit(qsign) * F.col("cnt") / F.pow(sqd_far, F.lit(q2))
    )
    far_rows = far.select(
        "id",
        *[
            (fac_far * (F.col(ccols[d]) - F.col(f"m{d}"))).alias(f"b{d}")
            for d in range(dim)
        ],
    )

    # near field: exact pairs within the 3^dim adjacent cells, each pair
    # matched exactly once (a explodes its neighbor keys, b keeps its own)
    offsets = list(product((-1, 0, 1), repeat=dim))
    nb_keys = F.array(
        *[
            key_of([F.col(f"g{d}") + F.lit(o[d]) for d in range(dim)])
            for o in offsets
        ]
    )
    a_side = pts.select(
        "id", *ccols, F.explode(nb_keys).alias("k")
    )
    b_side = pts.select(
        F.col("id").alias("jd"),
        *[F.col(c).alias(f"q{d}") for d, c in enumerate(ccols)],
        key_of([F.col(f"g{d}") for d in range(dim)]).alias("k"),
    )
    near = a_side.join(b_side, "k").filter(F.col("id") != F.col("jd"))
    sqd_near = sum((F.col(ccols[d]) - F.col(f"q{d}")) ** 2 for d in range(dim))
    fac_near = F.when(sqd_near < _EPS_DIST, F.lit(0.0)).otherwise(
        F.lit(qsign) / F.pow(sqd_near, F.lit(q2))
    )
    near_rows = near.select(
        "id",
        *[
            (fac_near * (F.col(ccols[d]) - F.col(f"q{d}"))).alias(f"b{d}")
            for d in range(dim)
        ],
    )

    rep = (
        far_rows.unionByName(near_rows)
        .groupBy("id")
        .agg(*[F.sum(f"b{d}").alias(f"b{d}") for d in range(dim)])
    )
    rep = coords.select("id").join(rep, "id", "left").select(
        "id",
        *[F.coalesce(f"b{d}", F.lit(0.0)).alias(f"b{d}") for d in range(dim)],
    ).transform(pin)
    norms = rep.agg(
        *[F.sqrt(F.sum(F.col(f"b{d}") ** 2)).alias(f"n{d}") for d in range(dim)]
    ).collect()[0]
    return rep.select(
        "id",
        *[
            (F.col(f"b{d}") / F.lit(max(float(norms[f"n{d}"] or 0.0), 1e-12))).alias(
                f"c{d}"
            )
            for d in range(dim)
        ],
    )


# ------------------------------------------------------------ block CG
def _block_cg(
    s_w: DataFrame,
    wdeg: DataFrame,
    x0: DataFrame,
    b: DataFrame,
    dim: int,
    tol: float,
    max_iters: int,
) -> DataFrame:
    """Solve L_w x_d = b_d for every axis d at once by conjugate
    gradient: one matvec join-agg + two dim-wide dot aggregations per
    iteration; per-axis α/β are driver scalars (CG is a scalar
    recurrence). ``b`` must be zero-sum per axis; the iterate keeps
    ``x0``'s per-axis mean (the layout is translation-invariant, like
    the reference's warm-started ``parallelSolve``)."""
    ccols = [f"c{d}" for d in range(dim)]

    def matvec(x: DataFrame) -> DataFrame:
        gathered = (
            s_w.join(
                x.select(F.col("id").alias("dst"), *[F.col(c).alias(f"x{d}") for d, c in enumerate(ccols)]),
                "dst",
            )
            .groupBy(F.col("src").alias("id"))
            .agg(*[F.sum(F.col("w") * F.col(f"x{d}")).alias(f"a{d}") for d in range(dim)])
        )
        return (
            x.join(wdeg, "id", "left")
            .join(gathered, "id", "left")
            .select(
                "id",
                *[
                    (
                        F.coalesce("wd", F.lit(0.0)) * F.col(c)
                        - F.coalesce(f"a{d}", F.lit(0.0))
                    ).alias(c)
                    for d, c in enumerate(ccols)
                ],
            )
        )

    def dots(u: DataFrame, v: DataFrame) -> list[float]:
        row = (
            u.join(
                v.select(F.col("id"), *[F.col(c).alias(f"v{d}") for d, c in enumerate(ccols)]),
                "id",
            )
            .agg(*[F.sum(F.col(c) * F.col(f"v{d}")).alias(f"s{d}") for d, c in enumerate(ccols)])
            .collect()[0]
        )
        return [float(row[f"s{d}"] or 0.0) for d in range(dim)]

    def combine(u: DataFrame, coef: list[float], v: DataFrame) -> DataFrame:
        """u + coef⊙v per axis."""
        return (
            u.join(
                v.select("id", *[F.col(c).alias(f"v{d}") for d, c in enumerate(ccols)]),
                "id",
                "left",
            )
            .select(
                "id",
                *[
                    (
                        F.col(c)
                        + F.lit(coef[d]) * F.coalesce(f"v{d}", F.lit(0.0))
                    ).alias(c)
                    for d, c in enumerate(ccols)
                ],
            )
        )

    x = x0.transform(pin)
    r = combine(b, [-1.0] * dim, matvec(x)).transform(pin)
    p = r
    rs = dots(r, r)
    bnorm = [max(v, 1e-300) for v in dots(b, b)]
    for it in range(1, max_iters + 1):
        if all(rs[d] / bnorm[d] <= tol * tol for d in range(dim)):
            break
        ap = matvec(p).transform(pin)
        den = dots(p, ap)
        alpha = [
            (rs[d] / den[d]) if den[d] > 0 and rs[d] / bnorm[d] > tol * tol else 0.0
            for d in range(dim)
        ]
        if all(a == 0.0 for a in alpha):
            break
        x = combine(x, alpha, p)
        r = combine(r, [-a for a in alpha], ap)
        if it % 4 == 0:
            x = x.transform(pin)
            r = r.transform(pin)
        rs_new = dots(r, r)
        beta = [rs_new[d] / rs[d] if rs[d] > 0 else 0.0 for d in range(dim)]
        p = (
            r.join(
                p.select("id", *[F.col(c).alias(f"p{d}") for d, c in enumerate(ccols)]),
                "id",
                "left",
            )
            .select(
                "id",
                *[
                    (F.col(c) + F.lit(beta[d]) * F.coalesce(f"p{d}", F.lit(0.0))).alias(c)
                    for d, c in enumerate(ccols)
                ],
            )
        )
        if it % 4 == 0:
            p = p.transform(pin)
        rs = rs_new
    return x.transform(pin)


# ------------------------------------------------------------ main run
def maxent_stress(
    g: Graph,
    dim: int = 2,
    k: int = 1,
    coordinates: DataFrame | None = None,
    q: float = 0.0,
    alpha: float = 1.0,
    alpha_reduction: float = 0.3,
    final_alpha: float = 0.008,
    conv_threshold: float = 1e-6,
    max_solves_per_alpha: int = 50,
    fast_computation: bool = False,
    solver_tol: float = 1e-6,
    cg_max_iters: int | None = None,
    grid: int = 8,
    seed: int = 42,
    max_nodes: int | None = 20_000,
) -> DataFrame:
    """(id, pos array<double>) — the maxent-stress layout
    (``MaxentStress::run``, ``MaxentStress.cpp:64-190``). Defaults
    mirror the reference ctor (``MaxentStress.cpp:28``): α = 1, α-decay
    0.3 to finalAlpha 0.008, ≤ 50 solves per α, convergence at relative
    coordinate change < 0.001² . ``coordinates`` (id, pos) warm-starts
    like the coordinate ctor; otherwise the seeded sphere init runs.
    ``max_nodes`` only gates the weighted k>1 distance build."""
    n = g.num_nodes()
    if n == 0:
        raise ValueError("maxent_stress on an empty graph")
    ccols = [f"c{d}" for d in range(dim)]

    sym = _sym_edges(g).transform(pin)
    s = maxent_known_distances(g, k, max_nodes=max_nodes).transform(pin)

    # q auto-adjust: >30% degree-1 nodes => q = 0.8 (MaxentStress.cpp:487-495)
    deg1 = sym.groupBy("src").count().filter(F.col("count") == 1).count()
    q_eff = 0.8 if n > 0 and deg1 / n > 0.3 else q

    s_w = s.select(
        "src", "dst", (F.lit(1.0) / (F.col("d") * F.col("d"))).alias("w")
    ).transform(pin)
    wdeg = s_w.groupBy(F.col("src").alias("id")).agg(
        F.sum("w").alias("wd")
    ).transform(pin)

    if coordinates is not None:
        coords = coordinates.select(
            "id", *[F.col("pos")[d].alias(c) for d, c in enumerate(ccols)]
        ).transform(pin)
        if coords.count() < n:
            raise ValueError("coordinates must cover every node")
    else:
        coords = _sphere_init(g, sym, dim, seed)

    cg_max_iters = cg_max_iters or max(50, int(10 * math.sqrt(n)))
    cur_alpha = alpha
    converged = False
    rep: DataFrame | None = None
    current_lb: float | None = None
    while not converged:
        inner_done = False
        for num_solves in range(max_solves_per_alpha):
            old = coords
            # floor(5 ln numSolves) recompute schedule; numSolves = 0 is
            # UB in the C++ (cast of -inf) — pinned to "recompute"
            new_lb = -1.0 if num_solves == 0 else float(
                math.floor(5.0 * math.log(num_solves))
            )
            if new_lb != current_lb:
                rep = _grid_repulsion(old, dim, q_eff, grid)
                current_lb = new_lb
            rhs = _attractive_rhs(s, old, dim)
            if num_solves < max_solves_per_alpha // 5:
                norms = rhs.agg(
                    *[
                        F.sqrt(F.sum(F.col(c) ** 2)).alias(f"n{d}")
                        for d, c in enumerate(ccols)
                    ]
                ).collect()[0]
                rhs = rhs.select(
                    "id",
                    *[
                        (
                            F.col(c)
                            / F.lit(max(float(norms[f"n{d}"] or 0.0), 1e-12))
                        ).alias(c)
                        for d, c in enumerate(ccols)
                    ],
                )
            rhs = (
                rhs.join(
                    rep.select(
                        "id", *[F.col(c).alias(f"r{d}") for d, c in enumerate(ccols)]
                    ),
                    "id",
                    "left",
                )
                .select(
                    "id",
                    *[
                        (
                            F.col(c)
                            + F.lit(cur_alpha) * F.coalesce(f"r{d}", F.lit(0.0))
                        ).alias(c)
                        for d, c in enumerate(ccols)
                    ],
                )
                .transform(pin)
            )
            means = rhs.agg(
                *[F.avg(c).alias(f"m{d}") for d, c in enumerate(ccols)]
            ).collect()[0]
            rhs = rhs.select(
                "id",
                *[
                    (F.col(c) - F.lit(float(means[f"m{d}"] or 0.0))).alias(c)
                    for d, c in enumerate(ccols)
                ],
            )
            coords = _block_cg(
                s_w, wdeg, old, rhs, dim, solver_tol, cg_max_iters
            )
            num_rel = (
                coords.join(
                    old.select(
                        "id", *[F.col(c).alias(f"o{d}") for d, c in enumerate(ccols)]
                    ),
                    "id",
                )
                .agg(
                    F.sum(
                        sum(
                            (F.col(c) - F.col(f"o{d}")) ** 2
                            for d, c in enumerate(ccols)
                        )
                    ).alias("chg"),
                    F.sum(
                        sum(F.col(f"o{d}") ** 2 for d in range(dim))
                    ).alias("len"),
                )
                .collect()[0]
            )
            rel = float(num_rel["chg"] or 0.0) / max(float(num_rel["len"] or 0.0), 1e-300)
            if rel < conv_threshold:
                if fast_computation:
                    converged = True
                    inner_done = True
                    break
        cur_alpha *= alpha_reduction
        converged = converged or cur_alpha < final_alpha
        if inner_done:
            break

    return coords.select("id", F.array(*ccols).cast("array<double>").alias("pos"))


# -------------------------------------------------------------- measures
def _aug_apsp(s: DataFrame, nodes: DataFrame) -> DataFrame:
    """All-pairs distances over the augmented graph whose edges are S
    (the reference's ``augmentedGraph`` in ``computeScalingFactor`` /
    ``fullStressMeasure``): BFS when every d == 1, Dijkstra otherwise,
    batched from every node. Returns (src, dst, dist), dist as double."""
    from networkit_spark.operators.distance import (
        multi_source_bfs,
        multi_source_sssp,
    )

    weighted = s.filter(F.col("d") != 1.0).limit(1).count() > 0
    aug = Graph(
        nodes=nodes,
        edges=s.select("src", "dst", F.col("d").alias("weight")),
        directed=False,
        weighted=weighted,
    )
    roots = nodes.select("id")
    if weighted:
        return multi_source_sssp(aug, roots).select(
            F.col("root").alias("src"), F.col("node").alias("dst"), "dist"
        )
    return multi_source_bfs(aug, roots, with_sigma=False).visited.select(
        F.col("root").alias("src"),
        F.col("node").alias("dst"),
        F.col("dist").cast("double").alias("dist"),
    )


def _geo(coords: DataFrame, dim: int, src: str = "src", dst: str = "dst"):
    a = coords.select(
        F.col("id").alias(src),
        *[F.col("pos")[d].alias(f"p{d}") for d in range(dim)],
    )
    b = coords.select(
        F.col("id").alias(dst),
        *[F.col("pos")[d].alias(f"q{d}") for d in range(dim)],
    )
    geo = F.sqrt(sum((F.col(f"p{d}") - F.col(f"q{d}")) ** 2 for d in range(dim)))
    return a, b, geo


def maxent_scaling_factor(
    s: DataFrame, coords: DataFrame, dim: int = 2, max_nodes: int | None = 20_000
) -> float:
    """s* = Σ geo/d ÷ Σ geo²/d² over all reachable pairs of the
    augmented graph (``computeScalingFactor``, ``MaxentStress.cpp:
    192-226``) — the minimizer of Σ (s·geo − d)²/d². Guarded: APSP."""
    nodes = coords.select("id")
    _guard(nodes.count(), max_nodes, "maxent_scaling_factor (APSP)")
    apsp = _aug_apsp(s, nodes).filter(F.col("dist") >= _EPS_DIST)
    a, b, geo = _geo(coords, dim)
    j = apsp.join(a, "src").join(b, "dst")
    row = j.agg(
        F.sum(geo / F.col("dist")).alias("top"),
        F.sum((geo * geo) / (F.col("dist") * F.col("dist"))).alias("bot"),
    ).collect()[0]
    return float(row["top"] or 0.0) / max(float(row["bot"] or 0.0), 1e-300)


def maxent_scale_layout(
    s: DataFrame, coords: DataFrame, dim: int = 2, max_nodes: int | None = 20_000
) -> DataFrame:
    """Coordinates scaled by ``maxent_scaling_factor`` (``scaleLayout``,
    ``MaxentStress.cpp:228-238``)."""
    sc = maxent_scaling_factor(s, coords, dim, max_nodes)
    return coords.select(
        "id", F.transform("pos", lambda x: x * F.lit(sc)).alias("pos")
    )


def maxent_full_stress(
    s: DataFrame, coords: DataFrame, dim: int = 2, max_nodes: int | None = 20_000
) -> float:
    """½ Σ (geo − d)²/d² over all reachable augmented-graph pairs
    (``fullStressMeasure``, ``MaxentStress.cpp:240-266``). Guarded:
    APSP."""
    nodes = coords.select("id")
    _guard(nodes.count(), max_nodes, "maxent_full_stress (APSP)")
    apsp = _aug_apsp(s, nodes).filter(F.col("dist") >= _EPS_DIST)
    a, b, geo = _geo(coords, dim)
    j = apsp.join(a, "src").join(b, "dst")
    row = j.agg(
        F.sum(((geo - F.col("dist")) ** 2) / (F.col("dist") ** 2)).alias("e")
    ).collect()[0]
    return float(row["e"] or 0.0) / 2.0


def maxent_measure(
    s: DataFrame,
    coords: DataFrame,
    dim: int = 2,
    q: float = 0.0,
    final_alpha: float = 0.008,
    max_nodes: int | None = 20_000,
) -> float:
    """The maxent-stress objective (``maxentMeasure``,
    ``MaxentStress.cpp:268-303``): stress over S minus finalAlpha times
    the entropy over the remaining pairs — entropy first accumulates
    over ALL ordered node pairs then subtracts the S pairs, with the
    reference's 1e-5 distance floor, ln for |q| < 0.001 and the −sign(q)
    flip otherwise. Guarded: the all-pairs term is n²."""
    nodes = coords.select("id")
    _guard(nodes.count(), max_nodes, "maxent_measure (all-pairs entropy)")
    a, b, geo = _geo(coords, dim)
    dist = F.greatest(geo, F.lit(_EPS_DIST))
    ent_term = (
        F.log(dist) if abs(q) < 0.001 else F.pow(dist, F.lit(-q))
    )
    allp = (
        nodes.select(F.col("id").alias("src"))
        .crossJoin(nodes.select(F.col("id").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .join(a, "src")
        .join(b, "dst")
    )
    entropy = float(allp.agg(F.sum(ent_term)).collect()[0][0] or 0.0)
    sj = s.join(a, "src").join(b, "dst")
    row = sj.agg(
        F.sum(((dist - F.col("d")) ** 2) / (F.col("d") ** 2)).alias("e"),
        F.sum(ent_term).alias("h"),
    ).collect()[0]
    energy = float(row["e"] or 0.0)
    entropy -= float(row["h"] or 0.0)
    if abs(q) > 0.001:
        entropy *= -(1.0 if q >= 0.0 else -1.0)
    energy -= final_alpha * entropy
    return energy / 2.0


def maxent_ldme(s: DataFrame, coords: DataFrame, dim: int = 2) -> float:
    """sqrt(Σ_S (d − geo)² / |S|) (``ldme``, ``MaxentStress.cpp:
    318-330``)."""
    a, b, geo = _geo(coords, dim)
    row = (
        s.join(a, "src")
        .join(b, "dst")
        .agg(
            F.sum((F.col("d") - geo) ** 2).alias("t"),
            F.count(F.lit(1)).alias("m"),
        )
        .collect()[0]
    )
    m = int(row["m"] or 0)
    return math.sqrt(float(row["t"] or 0.0) / m) if m else 0.0


def maxent_mean_distance_error(
    s: DataFrame, coords: DataFrame, dim: int = 2
) -> float:
    """Σ_S |geo − d|/d ÷ |S| (``meanDistanceError``,
    ``MaxentStress.cpp:305-316``)."""
    a, b, geo = _geo(coords, dim)
    row = (
        s.join(a, "src")
        .join(b, "dst")
        .agg(
            F.sum(F.abs(geo - F.col("d")) / F.col("d")).alias("t"),
            F.count(F.lit(1)).alias("m"),
        )
        .collect()[0]
    )
    m = int(row["m"] or 0)
    return float(row["t"] or 0.0) / m if m else 0.0
