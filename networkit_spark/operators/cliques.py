"""MaximalCliques — ego-net Bron-Kerbosch.

Reference: ``clique/MaximalCliques.cpp`` (degeneracy-ordered
Bron-Kerbosch with pivoting). A global BK recursion doesn't distribute,
but the standard decomposition does: every maximal clique C is
enumerated exactly once at its MINIMUM member v by running BK with

    R = {v},  P = N⁺(v) (neighbors > v),  X = N⁻(v) (neighbors < v)

inside v's ego-net. Seeding X with the smaller neighbors makes the
enumeration both duplicate-free and globally maximal (a clique
extendable by some w < v is rejected because w sits in X).

Spark plan:
1. ego-net edges = closed wedges (v; a, b adjacent neighbors of v) —
   one triangle-style join, the same shape as triangle counting;
2. ``groupBy(ego).applyInPandas`` runs plain-Python BK with pivoting per
   ego-net — Arrow-batched, bounded by the ego size (Σ work = Σ_v
   tri(v), the reference's bound too). Hub egos are the skew point,
   exactly as hub adjacency lists are for the reference.

Output: one row per maximal clique of size ≥ ``min_size``, members
sorted ascending.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph


def maximal_cliques(g: Graph, min_size: int = 1) -> DataFrame:
    """(clique ARRAY<LONG>, size INT) — every maximal clique once."""
    adj = g.canonical_undirected_edges()  # (src < dst), simple
    # both directions for neighbor sets
    nbrs = adj.unionByName(
        adj.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # closed wedges around v: neighbors a, b of v with (a, b) an edge
    wedge = (
        nbrs.select(F.col("src").alias("ego"), F.col("dst").alias("a"))
        .join(
            nbrs.select(F.col("src").alias("ego"), F.col("dst").alias("b")),
            "ego",
        )
        .filter(F.col("a") < F.col("b"))
        .join(
            adj.select(F.col("src").alias("a"), F.col("dst").alias("b")),
            ["a", "b"],
            "left_semi",
        )
    )
    # every neighbor also appears as a degenerate pair so isolated-edge
    # egos still reach the UDF
    pairs = wedge.unionByName(
        nbrs.select(F.col("src").alias("ego"), F.col("dst").alias("a"), F.col("dst").alias("b"))
    )

    def bk(key, pdf: pd.DataFrame) -> pd.DataFrame:
        v = int(key[0])
        neigh: dict[int, set[int]] = {}
        members: set[int] = set()
        for a, b in zip(pdf["a"], pdf["b"]):
            a, b = int(a), int(b)
            members.add(a)
            members.add(b)
            if a != b:
                neigh.setdefault(a, set()).add(b)
                neigh.setdefault(b, set()).add(a)
        for u in members:
            neigh.setdefault(u, set())
        out: list[list[int]] = []

        def expand(r: set[int], p: set[int], x: set[int]) -> None:
            if not p and not x:
                out.append(sorted(r))
                return
            pivot_pool = p | x
            pivot = max(pivot_pool, key=lambda u: len(neigh[u] & p))
            for u in sorted(p - neigh[pivot]):
                expand(r | {u}, p & neigh[u], x & neigh[u])
                p = p - {u}
                x = x | {u}

        p0 = {u for u in members if u > v}
        x0 = {u for u in members if u < v}
        expand({v}, p0, x0)
        # dtype=object keeps Arrow from treating same-length cliques as a
        # 2-D ndarray (NumPyConverter can't convert those to list<long>)
        return pd.DataFrame({"clique": pd.Series(out, dtype=object)})

    schema = "clique array<long>"
    cliques = pairs.groupBy("ego").applyInPandas(bk, schema)
    out = cliques.select("clique", F.size("clique").alias("size")).filter(
        F.col("size") >= min_size
    )
    # isolated edges produce 2-cliques from both endpoints' egos? No —
    # enumeration is anchored at the minimum member, so each clique
    # appears once. Isolated NODES have no pairs and no cliques here;
    # NetworKit likewise reports only cliques over edges (size >= 2)
    # unless min_size == 1, where singletons are added:
    if min_size <= 1:
        in_clique = out.select(F.explode("clique").alias("id")).distinct()
        singles = g.nodes.join(in_clique, "id", "left_anti").select(
            F.array("id").alias("clique"), F.lit(1).alias("size")
        )
        out = out.unionByName(singles)
    return out
