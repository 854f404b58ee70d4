"""Strongly connected components (directed graphs).

Reference: ``components/StronglyConnectedComponents.cpp:34-101`` (iterative
Tarjan). A stack-based DFS does not distribute; we use the standard
coloring / forward-backward decomposition for Pregel-class systems
(Orzan's coloring + FW-BW peeling — public algorithm):

  repeat on the remaining vertex set:
    1. trim: vertices with in-degree 0 or out-degree 0 within the
       remainder are singleton SCCs — peel them without any propagation
       (kills the long tail of DAG-ish link graphs cheaply);
    2. color: propagate min vertex id along FORWARD edges to fixpoint
       → color(v) = min id that reaches v;
    3. backward sweep: from each color root r (color(r) == r), walk
       REVERSE edges restricted to vertices of the same color; everything
       reached is mutually reachable with r ⇒ SCC id = r;
    4. peel those vertices and repeat.

Each inner propagation is one frontier⋈edges shuffle per hop; the outer
loop peels ≥1 SCC per color per round. Output labels are canonical
(min member id), so results are deterministic at any parallelism.

At 100 TB: state is one (node, color) vector; edges are re-filtered by
the shrinking remainder with semi-joins (no edge mutation/copy). The
worst case (a chain of n tiny SCCs) degrades to O(n) outer rounds like
every label-propagation SCC; trim + min-id coloring cover the common
web/link-graph shape (few giant SCCs + DAG periphery) in O(log n)-ish
rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.edge_layout import (
    broadcast_row_limit,
    derived_layout,
    maybe_broadcast,
)
from networkit_spark.plans.superstep import SuperstepRunner


def _min_label_fixpoint(
    nodes: DataFrame,
    edges: DataFrame,
    runner: SuperstepRunner,
    tag: int,
    n_rows: int | None = None,
) -> DataFrame:
    """Propagate min id along edges to fixpoint: (node, color).

    The frontier is |remaining|-bounded — broadcast it below the row
    limit (guide §3.1) so the per-round edge relation is never shuffled;
    shuffled-hash fallback above it."""
    labels = nodes.select("id", F.col("id").alias("color")).localCheckpoint(eager=True)
    frontier = labels
    frontier_rows = n_rows
    step = 0
    while True:
        step += 1
        fr = frontier.withColumnRenamed("id", "src")
        fr = (
            F.broadcast(fr)
            if frontier_rows is not None and frontier_rows <= broadcast_row_limit()
            else fr.hint("shuffle_hash")
        )
        msgs = (
            edges.join(fr, "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("color").alias("cand"))
        )
        merged = labels.join(msgs, "id", "left").select(
            "id",
            F.least("color", F.coalesce("cand", F.col("color"))).alias("color"),
            (F.coalesce("cand", F.col("color")) < F.col("color")).alias("chg"),
        )
        merged = runner.persist_step(merged, tag * 1000 + step)
        n_chg = merged.filter("chg").count()
        runner.record(tag * 1000 + step, changed=n_chg)
        frontier = merged.filter("chg").select("id", "color")
        frontier_rows = n_chg
        labels = merged.select("id", "color")
        if n_chg == 0:
            return labels


def strongly_connected_components(
    g: Graph,
    runner: SuperstepRunner | None = None,
    max_outer: int = 64,
) -> DataFrame:
    """(node LONG, label LONG) — label = min node id of the SCC."""
    spark = g.edges.sparkSession
    runner = runner or SuperstepRunner(spark)
    if not g.directed:
        from networkit_spark.operators.components import connected_components

        return connected_components(g)

    remaining = g.nodes.select("id").localCheckpoint(eager=True)
    # memoized layout (guide §2.4) — shared with any other kernel keyed
    # on this edge relation; the simple-graph filter/dedupe runs
    # exchange-free on the src hashing
    edges_all = derived_layout(
        g.edges,
        "scc_simple_src",
        lambda: g.edges.filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .dropDuplicates(["src", "dst"])
        .repartition("src"),
    )
    done: DataFrame | None = None  # (node, label)

    for outer in range(max_outer):
        n_left = remaining.count()
        if n_left == 0:
            break

        # node-set semi-joins broadcast while |remaining| is small — the
        # edge relation is then filtered without any shuffle (guide §3.1)
        rem_b = maybe_broadcast(remaining, n_left)
        edges = (
            edges_all.join(rem_b.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(rem_b.withColumnRenamed("id", "dst"), "dst", "left_semi")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )

        # 1. trim TO FIXPOINT: a node with no in-edges or no out-edges in
        #    the remainder is a singleton SCC; peeling it can expose more
        #    (a DAG periphery unravels completely here, so the expensive
        #    coloring only ever sees the cyclic core).
        empty_remainder = False
        while True:
            has_out = edges.select(F.col("src").alias("id")).distinct()
            has_in = edges.select(F.col("dst").alias("id")).distinct()
            core = remaining.join(has_out, "id", "left_semi").join(
                has_in, "id", "left_semi"
            )
            trimmed = remaining.join(core, "id", "left_anti").select(
                F.col("id").alias("node"), F.col("id").alias("label")
            )
            trimmed = trimmed.localCheckpoint(eager=True)
            if trimmed.count() == 0:
                break
            done = trimmed if done is None else done.unionByName(trimmed)
            remaining = core.localCheckpoint(eager=True)
            if remaining.count() == 0:
                empty_remainder = True
                break
            core_b = maybe_broadcast(core, n_left)  # |core| <= n_left
            edges = (
                edges.join(core_b.withColumnRenamed("id", "src"), "src", "left_semi")
                .join(core_b.withColumnRenamed("id", "dst"), "dst", "left_semi")
                .localCheckpoint(eager=True)
            )
        if empty_remainder:
            break

        # 2. forward min-id coloring to fixpoint
        colors = _min_label_fixpoint(
            remaining, edges, runner, tag=outer * 2 + 1, n_rows=n_left
        )

        # 3. backward reachability from each color root within its color:
        #    SCC(root) = {v : color(v)=root and v reaches root} — walk
        #    reverse edges whose endpoints share a color.
        colors_b = maybe_broadcast(colors, n_left)  # |colors| <= n_left
        rev = (
            edges.join(
                colors_b.withColumnRenamed("id", "src").withColumnRenamed("color", "c_src"),
                "src",
            )
            .join(
                colors_b.withColumnRenamed("id", "dst").withColumnRenamed("color", "c_dst"),
                "dst",
            )
            .filter(F.col("c_src") == F.col("c_dst"))
            .select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), F.col("c_src").alias("color")
            )
            .localCheckpoint(eager=True)
        )
        reached = colors.filter(F.col("id") == F.col("color")).select(
            "id", "color"
        ).localCheckpoint(eager=True)
        frontier = reached
        step = 0
        while True:
            step += 1
            nxt = (
                rev.join(
                    maybe_broadcast(
                        frontier.withColumnRenamed("id", "src"), n_left
                    ),
                    ["src", "color"],
                )
                .select(F.col("dst").alias("id"), "color")
                .distinct()
                .join(maybe_broadcast(reached, n_left), ["id", "color"], "left_anti")
                .localCheckpoint(eager=False)  # count materializes: 1 job
            )
            if nxt.count() == 0:
                break
            reached = reached.unionByName(nxt)
            reached = runner.persist_step(reached, (outer * 2 + 2) * 1000 + step)
            frontier = nxt

        scc = reached.select(F.col("id").alias("node"), F.col("color").alias("label"))
        scc = scc.localCheckpoint(eager=True)
        done = scc if done is None else done.unionByName(scc)
        remaining = (
            remaining.join(scc.select(F.col("node").alias("id")), "id", "left_anti")
            .localCheckpoint(eager=True)
        )
    else:
        raise RuntimeError(f"SCC did not finish in {max_outer} outer rounds")

    assert done is not None or g.nodes.count() == 0
    if done is None:
        return g.nodes.select(F.col("id").alias("node"), F.col("id").alias("label"))
    return done.localCheckpoint(eager=True)
