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
1. rank nodes in a degeneracy-style order (core asc, degree asc, id
   asc) — the reference's degeneracy ordering, computed from the
   existing k-core kernel. Anchoring each clique at its MIN-RANK member
   bounds every ego task by the FORWARD neighborhood (≈ core number),
   so a million-degree hub anchors almost nothing instead of owning a
   single giant Python task;
2. ego-net edges = closed wedges among a node's FORWARD neighbors plus
   its backward set for the X seed — one triangle-style join;
3. ``groupBy(ego).applyInPandas`` runs plain-Python BK with pivoting per
   ego-net — Arrow-batched, bounded by the forward-ego size.
``max_ego`` guards the residual skew: egos whose forward set exceeds it
are dropped with a logged count (the explicit-opt-in pattern of
pipeline/dedup.py's ``max_df``).

Output: one row per maximal clique of size ≥ ``min_size``, members
sorted ascending.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph


def maximal_cliques(
    g: Graph, min_size: int = 1, max_ego: int | None = None
) -> DataFrame:
    """(clique ARRAY<LONG>, size INT) — every maximal clique once.

    ``max_ego``: optional bound on the forward-ego size a single BK task
    may process; larger egos are DROPPED (their anchored cliques are not
    enumerated) and the drop count is logged — set it only when bounded
    latency matters more than completeness."""
    from networkit_spark.operators.kcore import core_decomposition
    from networkit_spark.plans.pin import pin

    adj = g.canonical_undirected_edges()  # (src < dst), simple
    # both directions for neighbor sets
    nbrs = adj.unionByName(
        adj.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # degeneracy-style rank: (core asc, deg asc, id asc) — forward
    # neighborhoods are core-number-sized, the reference's BK bound
    # (clique/MaximalCliques.cpp degeneracy ordering)
    deg = nbrs.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("deg"))
    core = core_decomposition(g)
    # dense ranks via the range-partitioned id assigner — no global
    # single-task window (the (core, deg, id) triple is unique per node)
    from networkit_spark.ids import assign_dense_ids

    triples = core.join(deg, "id", "left").select(
        "core",
        F.coalesce("deg", F.lit(0)).alias("deg"),
        F.col("id").alias("nid"),
    )
    rank = assign_dense_ids(triples, ["core", "deg", "nid"]).select(
        F.col("nid").alias("id"), F.col("id").alias("rk")
    ).transform(pin)
    rn = nbrs.join(rank.withColumnRenamed("id", "src").withColumnRenamed("rk", "rs"), "src").join(
        rank.withColumnRenamed("id", "dst").withColumnRenamed("rk", "rd"), "dst"
    )
    if max_ego is not None:
        import logging

        fwd = (
            rn.filter(F.col("rd") > F.col("rs"))
            .groupBy("src")
            .agg(F.count(F.lit(1)).alias("f"))
        )
        oversized = fwd.filter(F.col("f") > max_ego).select(F.col("src").alias("ego"))
        n_drop = oversized.count()
        if n_drop:
            logging.getLogger(__name__).warning(
                "maximal_cliques: dropping %d ego(s) with forward size > %d "
                "— their anchored cliques are NOT enumerated",
                n_drop,
                max_ego,
            )
        oversized = oversized.transform(pin)
    else:
        oversized = None
    # wedge pairs around each ego over its FULL neighbor set (forward
    # members feed P, backward members feed X); the BK task partitions
    # them by rank
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
    if oversized is not None:
        pairs = pairs.join(oversized, "ego", "left_anti")
    # attach ranks: the ego's own rank plus each member's rank
    pairs = (
        pairs.join(rank.withColumnRenamed("id", "ego").withColumnRenamed("rk", "rego"), "ego")
        .join(rank.withColumnRenamed("id", "a").withColumnRenamed("rk", "ra"), "a")
        .join(rank.withColumnRenamed("id", "b").withColumnRenamed("rk", "rb"), "b")
    )

    def bk(key, pdf: pd.DataFrame) -> pd.DataFrame:
        v = int(key[0])
        rv = int(pdf["rego"].iloc[0])
        rank_of: dict[int, int] = {}
        neigh: dict[int, set[int]] = {}
        members: set[int] = set()
        for a, b, ra, rb in zip(pdf["a"], pdf["b"], pdf["ra"], pdf["rb"]):
            a, b = int(a), int(b)
            members.add(a)
            members.add(b)
            rank_of[a] = int(ra)
            rank_of[b] = int(rb)
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

        p0 = {u for u in members if rank_of[u] > rv}
        x0 = {u for u in members if rank_of[u] < rv}
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
