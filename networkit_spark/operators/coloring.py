"""Spectral graph coloring and BFS sampling — the reference's pure-Python
surface (``networkit/coloring.py``, ``networkit/sampling.py``).

``SpectralColoring`` (``coloring.py:6-57``) recursively bisects color
classes by the sign of successive adjacency eigenvectors (ascending
algebraic eigenvalue — ``algebraic.py:symmetricEigenvectors`` computes
mode 'LA' then sorts ascending, so index 0 is the most negative, the
classic bipartition indicator) until every class is independent.

Documented deviations (re-architecture, not a port):

- The reference eigensolves the FULL spectrum up front with scipy
  (``cutoff = n − 2``); here the bottom ``max_depth`` eigenvectors are
  computed by shifted, deflated power iteration — each iteration is one
  edge join-agg plus a 1-row crossJoin (norms and deflation dots stay
  lazy), the PageRank shuffle shape, so nothing driver-sized exists at
  any n. Eigenvector signs are fixed deterministically (first nonzero
  component by node id made positive); scipy's signs are arbitrary, so
  exact class-membership parity with the reference is not defined —
  the contract is the reference's invariants (valid coloring, binary
  recursive structure), pinned in tests.
- A class an eigenvector fails to split (one side empty) retries deeper
  vectors and finally falls back to a seeded hash-parity split, which
  guarantees termination; the reference would recurse unboundedly on
  such (degenerate) inputs.

``bfs_sample`` (``sampling.py:5-27``): the reference keeps the first k
nodes in FIFO discovery order, which depends on adjacency-list order;
here the k kept nodes are the smallest (dist, id) — the same
level-by-level growth, deterministic at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.functions.porthash import DEFAULT_PRIME, md5_mod
from networkit_spark.graph import Graph
from networkit_spark.plans.pin import pin


def adjacency_eigenvectors(
    g: Graph,
    k: int,
    iters: int = 200,
    tol: float = 1e-10,
    seed: int = 42,
    pin_every: int = 2,
) -> tuple[list[float], DataFrame]:
    """Bottom-k algebraic eigenpairs of the (symmetric) adjacency matrix
    (``algebraic.py:adjacencyEigenvectors`` ascending order). Returns
    ``(eigenvalues, DataFrame (id, v0..v{k-1}))``.

    Power iteration on the shifted operator B = cI − A (c = maxDegree+1
    ≥ ρ(A), so B ⪰ 0 and B's dominant eigenvector is A's most negative),
    deflated against the already-found columns. All per-iteration
    scalars (deflation dots, norm) ride along as a 1-row crossJoin —
    the loop body is pure DataFrame ops. Each scalar crossJoin
    references the running plan twice, so the logical plan grows 4× per
    iteration: ``pin_every`` MUST stay small (2 → ≤16 plan copies per
    segment; 8 would be 65k — the Spark-4 planning blowup). At each pin
    the iterate delta is checked and the loop exits below ``tol``.
    """
    basis = _EigBasis(g, iters=iters, tol=tol, seed=seed, pin_every=pin_every)
    basis.extend_to(k)
    order = sorted(range(k), key=lambda i: basis.eigenvalues[i])
    out = basis.state.select(
        "id", *[F.col(f"v{i}").alias(f"v{rank}") for rank, i in enumerate(order)]
    )
    return [basis.eigenvalues[i] for i in order], pin(out)


class _EigBasis:
    """Lazily-extended bottom-of-spectrum eigenbasis (see
    :func:`adjacency_eigenvectors`). ``state`` holds (id, v0..v{j-1});
    ``extend_to(k)`` appends vectors as needed — spectral_coloring asks
    for depth d only when the recursion actually reaches it, so shallow
    colorings pay for one or two eigensolves, not ``max_depth``."""

    def __init__(self, g: Graph, iters: int, tol: float, seed: int, pin_every: int):
        if g.directed:
            raise ValueError("adjacency_eigenvectors: undirected graphs only")
        self.iters, self.tol, self.seed, self.pin_every = iters, tol, seed, pin_every
        self.edges = pin(
            g.edges.select("src", "dst", F.col("weight").cast("double").alias("w"))
        )
        row = self.edges.groupBy("src").agg(F.sum("w").alias("d")).agg(
            F.max("d")
        ).collect()[0]
        self.c = float(row[0] or 0.0) + 1.0
        self.state = g.nodes.select("id")
        self.eigenvalues: list[float] = []

    def extend_to(self, k: int) -> None:
        for j in range(len(self.eigenvalues), k):
            self._append(j)

    def _append(self, j: int) -> None:
        edges, c, state = self.edges, self.c, self.state
        iters, tol, seed, pin_every = self.iters, self.tol, self.seed, self.pin_every
        x = (
            2.0
            * md5_mod(F.col("id"), salt=f"sc{seed}.{j}:").cast("double")
            / F.lit(float(DEFAULT_PRIME))
            - 1.0
        )
        cur = pin(state.withColumn("x", x))
        prev = cur
        prior = [f"v{i}" for i in range(j)]
        for it in range(iters):
            ax = (
                edges.join(
                    cur.select(F.col("id").alias("src"), "x").hint("shuffle_hash"),
                    "src",
                )
                .groupBy(F.col("dst").alias("id"))
                .agg(F.sum(F.col("w") * F.col("x")).alias("ax"))
            )
            y = (
                cur.join(ax.hint("shuffle_hash"), "id", "left")
                .withColumn(
                    "y", F.lit(c) * F.col("x") - F.coalesce("ax", F.lit(0.0))
                )
                .drop("ax")
            )
            if prior:
                dots = y.agg(
                    *[F.sum(F.col(v) * F.col("y")).alias(f"dot_{v}") for v in prior]
                )
                y = y.crossJoin(F.broadcast(dots)).withColumn(
                    "y",
                    F.col("y")
                    - sum(
                        (F.col(f"dot_{v}") * F.col(v) for v in prior[1:]),
                        F.col(f"dot_{prior[0]}") * F.col(prior[0]),
                    ),
                ).drop(*[f"dot_{v}" for v in prior])
            norm = y.agg(F.sqrt(F.sum(F.col("y") * F.col("y"))).alias("nrm"))
            cur = (
                y.crossJoin(F.broadcast(norm))
                .withColumn(
                    "x", F.col("y") / F.greatest(F.col("nrm"), F.lit(1e-300))
                )
                .drop("y", "nrm")
            )
            if (it + 1) % pin_every == 0 or it == iters - 1:
                cur = pin(cur.withColumnRenamed("x", "xn").join(
                    prev.select("id", F.col("x").alias("xp")), "id", "left"
                ).withColumn("x", F.col("xn")).drop("xn"))
                delta = cur.agg(
                    F.max(F.abs(F.col("x") - F.coalesce("xp", F.lit(0.0))))
                ).collect()[0][0]
                cur = cur.drop("xp")
                prev = cur
                if delta is not None and float(delta) < tol:
                    break
        # Rayleigh quotient in A-terms and deterministic sign fix
        ax = (
            edges.join(cur.select(F.col("id").alias("src"), "x"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("w") * F.col("x")).alias("ax"))
        )
        lam_row = (
            cur.join(ax, "id", "left")
            .agg(F.sum(F.col("x") * F.coalesce("ax", F.lit(0.0))))
            .collect()[0]
        )
        self.eigenvalues.append(float(lam_row[0] or 0.0))
        lead = (
            cur.filter(F.abs(F.col("x")) > 1e-9)
            .orderBy("id")
            .select("x")
            .limit(1)
            .collect()
        )
        if lead and float(lead[0][0]) < 0.0:
            cur = cur.withColumn("x", -F.col("x"))
        self.state = pin(cur.withColumnRenamed("x", f"v{j}"))


def spectral_coloring(
    g: Graph,
    max_depth: int = 6,
    iters: int = 80,
    seed: int = 42,
) -> DataFrame:
    """SpectralColoring (``coloring.py:6-57``): recursively split every
    non-independent color class by the sign of the next adjacency
    eigenvector (``split``: the ≥ 0 side keeps the class id,
    ``coloring.py:26-38``). Returns (id, color) with colors 0..k−1 in
    creation order like the reference's ``nextColor`` counter.
    """
    basis = _EigBasis(g, iters=iters, tol=1e-10, seed=seed, pin_every=2)
    edges = pin(g.canonical_undirected_edges())
    colors = pin(g.nodes.select("id", F.lit(0).cast("long").alias("color")))
    depth_of = {0: 0}
    next_color = 1
    while True:
        invalid = sorted(
            int(r[0])
            for r in edges.join(
                colors.select(F.col("id").alias("src"), F.col("color").alias("cu")),
                "src",
            )
            .join(
                colors.select(F.col("id").alias("dst"), F.col("color").alias("cv")),
                "dst",
            )
            .filter(F.col("cu") == F.col("cv"))
            .select("cu")
            .distinct()
            .collect()
        )
        if not invalid:
            break
        # eigenvectors are solved lazily: only the depths this round's
        # splits actually reach (most colorings stop at 1-3)
        need = min(max_depth, max(depth_of[c] for c in invalid) + 1)
        basis.extend_to(need)
        col = F.col("color")
        for cid in invalid:
            d = depth_of[cid]
            if d < max_depth:
                neg = F.col(f"v{d}") < 0
            else:
                # hash-parity fallback (documented deviation): guarantees
                # progress when the computed spectrum is exhausted
                neg = md5_mod(F.col("id"), salt=f"scfb{seed}.{cid}.{d}:") % 2 == 0
            col = F.when((F.col("color") == cid) & neg, F.lit(next_color)).otherwise(
                col
            )
            depth_of[cid] = d + 1
            depth_of[next_color] = d + 1
            next_color += 1
        colors = pin(
            colors.join(basis.state, "id").withColumn("color", col.cast("long"))
        ).select("id", "color")
    return colors


def bfs_sample(g: Graph, source: int, k: int = 50) -> Graph:
    """``sampling.bfsSample`` (``sampling.py:5-27``): BFS from ``source``
    and return the node-induced subgraph of {source} ∪ the first ``k``
    discovered nodes — here the k smallest (dist, id), see the module
    docstring for the determinism deviation."""
    from networkit_spark.operators.traversal import bfs

    reached = bfs(g, source)
    keep = (
        reached.filter(F.col("node") != source)
        .orderBy("dist", "node")
        .limit(k)
        .select(F.col("node").alias("id"))
        .unionByName(
            g.edges.sparkSession.createDataFrame([(int(source),)], "id long")
        )
    )
    return g.subgraph_from_nodes(keep)
