"""PLP — parallel label propagation community detection (parity target #3).

Reference: ``community/PLP.cpp:23-115``; ctor defaults
``include/networkit/community/PLP.hpp:43``. Semantics matched:

- init: every node its own label (``PLP.cpp:29-33``);
- update threshold: ``theta`` or ``n/1e5`` when unset (``PLP.cpp:39-41``);
- per node with degree>0: neighbor labels weighted by edge weight
  (``PLP.cpp:78-84``); adopt the heaviest label, ties to the SMALLEST
  label id (``std::max_element`` over an ordered map — ``PLP.cpp:87-90``);
- isolated nodes stay singletons (``PLP.cpp:48-59``);
- stop when ``nUpdated ≤ threshold`` or ``iterations ≥ maxIterations``
  (``PLP.cpp:67``).

The reference loop is asynchronous/in-place and therefore nondeterministic
(its own tests assert only structural properties). Our kernel is a
SYNCHRONOUS superstep — deterministic and identical at every cluster size:

    votes = edges ⋈ labels on src → groupBy(dst, label).sum(weight)
    winner = row_number over (partitionBy dst, orderBy sum desc, label asc) = 1
    labels' = nodes left⋈ winner → coalesce(winner, old)

Active-set optimization (``PLP.cpp:61-99`` activeNodes): when
``active_set=True``, only nodes adjacent to a changed node are re-voted
each superstep; unchanged nodes keep their label without touching their
edges — at 100 TB this is the difference between scanning the full edge
table every round and scanning a shrinking frontier.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.edge_layout import maybe_broadcast, partitioned_edges
from networkit_spark.plans.pin import pin
from networkit_spark.plans.superstep import SuperstepRunner


@dataclass
class PLPResult:
    labels: DataFrame  # (node LONG, label LONG)
    iterations: int


def _vote(
    edges: DataFrame,
    labels: DataFrame,
    target: DataFrame | None,
    n: int | None = None,
) -> DataFrame:
    """Weighted-majority vote for every dst in ``edges`` (optionally only
    for dst ∈ target). Tie-break: weight desc, label asc (PLP.cpp:87-90).

    Plan (guide §2.4): ``edges`` arrives hash-partitioned by ``dst`` and
    cached; the label vector (|V| rows) is broadcast below the row limit,
    so the join preserves the dst partitioning and BOTH aggregation
    levels — sum per (dst, label), then argmax per dst — run without any
    Exchange. The argmax is ``max(struct(w, -label))``, identical to the
    old ``row_number over (orderBy w desc, label asc) = 1`` window but a
    hash aggregate instead of a shuffle + sort. Above the broadcast
    limit the join falls back to a shuffled hash join (the pre-r8 plan).
    """
    e = edges
    if target is not None:
        e = e.join(
            maybe_broadcast(target.withColumnRenamed("node", "dst"), n),
            "dst",
            "left_semi",
        )
    lbl = labels.withColumnRenamed("node", "src")
    lbl = (
        F.broadcast(lbl)
        if n is not None and n <= _bcast_limit()
        else lbl.hint("shuffle_hash")
    )
    votes = e.join(lbl, "src").groupBy("dst", "label").agg(F.sum("weight").alias("w"))
    return (
        votes.groupBy("dst")
        .agg(
            F.max(
                F.struct(F.col("w").alias("w"), (-F.col("label")).alias("nl"))
            ).alias("m")
        )
        .select(F.col("dst").alias("node"), (-F.col("m.nl")).alias("new_label"))
    )


def _bcast_limit() -> int:
    from networkit_spark.plans.edge_layout import broadcast_row_limit

    return broadcast_row_limit()


def plp(
    g: Graph,
    theta: int | None = None,
    max_iterations: int | None = None,
    active_set: bool = True,
    runner: SuperstepRunner | None = None,
    initial_labels: DataFrame | None = None,
) -> PLPResult:
    """Synchronous PLP over ``g``. Returns (node, label) + iteration count."""
    spark = g.edges.sparkSession
    runner = runner or SuperstepRunner(spark)
    n = g.num_nodes()
    threshold = theta if theta is not None else n / 1e5
    max_iterations = max_iterations if max_iterations is not None else 1 << 30

    # gather relation: undirected semantics — both orientations present.
    # The dst-partitioned cached layout is memoized per edge relation
    # (plans/edge_layout.py): reps and co-resident queries share one
    # exchange + one cache instead of paying both per call.
    edges = partitioned_edges(
        g.symmetrized_edges() if g.directed else g.edges, "dst"
    ).select("src", "dst", "weight")

    labels = (
        initial_labels
        if initial_labels is not None
        else g.nodes.select(F.col("id").alias("node"), F.col("id").alias("label"))
    )
    labels = labels.localCheckpoint(eager=True)
    changed: DataFrame | None = None  # None ⇒ everyone votes (first round)
    last_updated = n  # everyone "changed" before round 1

    iterations = 0
    import time

    while iterations < max_iterations:
        t0 = time.monotonic()
        target = None
        # The changed-adjacency semi-join is an EXTRA shuffle of the edge
        # table; while most nodes are still flipping (early rounds) it
        # filters almost nothing and costs more than it saves. Engage the
        # active set only once the frontier has shrunk below 40% of |V| —
        # before that a full vote is the cheaper plan.
        if active_set and changed is not None and last_updated < 0.4 * n:
            # nodes adjacent to a changed node (PLP.cpp:92-100 reactivation).
            # ``changed`` has last_updated rows (just counted) — broadcast
            # it so the semi-join keeps the dst layout, and the distinct
            # on dst is then exchange-free.
            target = (
                edges.join(
                    maybe_broadcast(
                        changed.withColumnRenamed("node", "src"), last_updated
                    ),
                    "src",
                    "left_semi",
                )
                .select(F.col("dst").alias("node"))
                .distinct()
            )
        winners = _vote(edges, labels, target, n=n)
        new_labels = (
            labels.join(maybe_broadcast(winners, n), "node", "left")
            .select(
                "node",
                F.coalesce("new_label", F.col("label")).alias("label"),
                (F.col("new_label").isNotNull() & (F.col("new_label") != F.col("label"))).alias(
                    "chg"
                ),
            )
        )
        iterations += 1
        new_labels = runner.persist_step(new_labels, iterations)
        n_updated = new_labels.filter("chg").count()
        last_updated = n_updated
        changed = new_labels.filter("chg").select("node")
        labels = new_labels.select("node", "label")
        runner.record(
            iterations, updated=n_updated, step_s=round(time.monotonic() - t0, 4)
        )
        if n_updated <= threshold:
            break

    return PLPResult(labels=labels, iterations=iterations)


def lp_degree_ordered(
    g: Graph, max_sweeps: int = 32, degree_buckets: str = "log2"
) -> DataFrame:
    """LPDegreeOrdered (``community/LPDegreeOrdered.cpp``): label
    propagation where lower-degree nodes move BEFORE higher-degree ones
    inside each sweep, so hubs see their periphery's fresh labels.

    The reference's sweep is sequential over a degree-sorted node list;
    the distributed analogue serializes between DEGREE CLASSES and
    parallelizes within one (same-degree nodes read the pre-class
    labels) — the degree ordering that names the algorithm is preserved
    across classes. ``degree_buckets`` picks the class granularity:

    - ``"log2"`` (default): classes are ⌊log2(deg)⌋ buckets, so one
      sweep launches O(log maxdeg) Spark jobs — ~40 at any real scale.
      On a power-law graph at 100× this is the only shape that
      survives; the reference's own tie behavior inside a class is
      unspecified, so coarsening the order to bucket granularity is a
      documented determinization, not a semantics change.
    - ``"exact"``: one class per distinct degree (the reference's exact
      order) — sweeps × |distinct degrees| driver-launched jobs; for
      small graphs and conformance tests.

    Dominant-label ties break to the SMALLEST label (the reference's
    unordered_map makes its tie pick unspecified — documented
    determinization). Sweeps repeat until no node moves (theta = n/1e5
    rounds to 0 at any tested scale). Returns (node, label)."""
    if degree_buckets not in ("log2", "exact"):
        raise ValueError("degree_buckets must be 'log2' or 'exact'")
    spark = g.edges.sparkSession
    edges = (g.symmetrized_edges() if g.directed else g.edges).select(
        "src", "dst"
    ).filter(F.col("src") != F.col("dst")).transform(pin)
    deg = edges.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("deg"))
    if degree_buckets == "log2":
        # exact integer bucket via binary length (FP log2 can land a hair
        # under an integer at exact powers of two)
        deg = deg.select("id", (F.length(F.bin("deg")) - 1).alias("deg"))
    degree_classes = sorted(
        int(r["deg"]) for r in deg.select("deg").distinct().collect()
    )
    nodes_deg = g.nodes.join(deg, "id", "left").select(
        "id", F.coalesce("deg", F.lit(0)).alias("deg")
    ).transform(pin)
    labels = g.nodes.select(F.col("id").alias("node"), F.col("id").alias("label"))
    labels = labels.localCheckpoint(eager=True)
    n = g.num_nodes()
    theta = n // 100_000
    for _ in range(max_sweeps):
        sweep_updates = 0
        for d in degree_classes:
            cls = nodes_deg.filter(F.col("deg") == d).select(F.col("id").alias("node"))
            counts = (
                edges.join(cls.withColumnRenamed("node", "dst"), "dst", "left_semi")
                .join(
                    labels.select(
                        F.col("node").alias("src"), F.col("label").alias("nl")
                    ),
                    "src",
                )
                .groupBy(F.col("dst").alias("node"), "nl")
                .agg(F.count(F.lit(1)).alias("c"))
            )
            w = Window.partitionBy("node").orderBy(F.desc("c"), F.asc("nl"))
            dominant = (
                counts.withColumn("rn", F.row_number().over(w))
                .filter("rn = 1")
                .select("node", F.col("nl").alias("dom"))
            )
            new_labels = (
                labels.join(dominant, "node", "left")
                .select(
                    "node",
                    F.coalesce("dom", F.col("label")).alias("label"),
                    (F.col("dom").isNotNull() & (F.col("dom") != F.col("label"))).alias(
                        "chg"
                    ),
                )
                .transform(pin)
            )
            sweep_updates += new_labels.filter("chg").count()
            labels = new_labels.select("node", "label")
        if sweep_updates <= theta:
            break
    return labels
