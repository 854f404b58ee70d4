"""Max-flow (reference module ``flow/``).

The reference ships EdmondsKarp (``flow/EdmondsKarp.cpp:133`` —
sequential augmenting paths; VERDICT r2 called it "low distributed
value"). Augmenting paths are inherently one-at-a-time, so the
Spark-native engine implements the classic PARALLEL max-flow instead:
synchronous push-relabel (Goldberg-Tarjan, the lock-free round variant):

- state: residual arcs (u, v, res), heights (id, h), excess (id, e);
- per round every active node (excess > 0) pushes min(excess, res) along
  ONE admissible arc (res > 0 and h(u) = h(v) + 1; deterministic pick =
  lowest (h(v), v)), or relabels to 1 + min height over its residual
  arcs. Simultaneous pushes are conflict-free: each arc is owned by its
  tail, and opposing pushes on (u,v)/(v,u) are impossible because the
  height condition cannot hold both ways.

Every round is two keyed joins + two aggregations over the residual arc
table — no per-row Python, no driver loop over paths. Same max-flow
value as EdmondsKarp by max-flow/min-cut uniqueness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.pin import pin


def max_flow(
    g: Graph,
    source: int,
    sink: int,
    cap_col: str = "weight",
    max_rounds: int | None = None,
) -> float:
    """Maximum s-t flow value (``flow/EdmondsKarp.cpp`` contract).

    Undirected graphs get capacity in both directions, as in the
    reference's undirected EdmondsKarp.
    """
    _, excess, t = _push_relabel(g, source, sink, cap_col, max_rounds)
    val = excess.filter(F.col("id") == t).collect()
    return float(val[0]["e"]) if val else 0.0


def min_cut_source_side(
    g: Graph,
    source: int,
    sink: int,
    cap_col: str = "weight",
    max_rounds: int | None = None,
) -> tuple[float, DataFrame]:
    """(flow value, source-side node set) of a minimum s-t cut
    (``flow/EdmondsKarp.cpp`` getSourceSet): after the push-relabel
    fixed point, the source side is everything reachable from s over
    residual arcs with res > 0 — one BFS over the residual relation."""
    arcs, excess, t = _push_relabel(g, source, sink, cap_col, max_rounds)
    val = excess.filter(F.col("id") == t).collect()
    value = float(val[0]["e"]) if val else 0.0
    spark = g.edges.sparkSession
    res = arcs.filter(F.col("res") > 1e-12).select("src", "dst").transform(pin)
    reach = spark.createDataFrame([(int(source),)], "id long").transform(pin)
    while True:
        nxt = (
            res.join(reach.withColumnRenamed("id", "src"), "src", "left_semi")
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(reach, "id", "left_anti")
            .transform(pin)
        )
        if nxt.limit(1).count() == 0:
            break
        reach = reach.unionByName(nxt).transform(pin)
    return value, reach


def _push_relabel(
    g: Graph,
    source: int,
    sink: int,
    cap_col: str = "weight",
    max_rounds: int | None = None,
):
    """Shared push-relabel engine: returns (residual arcs, excess, sink id)
    at the max-flow fixed point."""
    spark = g.edges.sparkSession
    n = g.num_nodes()
    s, t = int(source), int(sink)
    max_rounds = max_rounds or max(64, 4 * n * n)

    base = (g.symmetrized_edges() if not g.directed else g.edges).filter(
        F.col("src") != F.col("dst")
    )
    fwd = base.select("src", "dst", F.col(cap_col).cast("double").alias("res"))
    rev = base.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), F.lit(0.0).alias("res")
    )
    arcs = pin(
        fwd.unionByName(rev).groupBy("src", "dst").agg(F.sum("res").alias("res"))
    )

    # saturate the source's out-arcs
    s_out = arcs.filter((F.col("src") == s) & (F.col("res") > 0)).select(
        "src", "dst", "res"
    )
    pushes0 = s_out.select("src", "dst", F.col("res").alias("x"))
    arcs = _apply_pushes(arcs, pushes0)
    excess = pin(
        g.nodes.join(
            pushes0.groupBy(F.col("dst").alias("id")).agg(F.sum("x").alias("inn")),
            "id",
            "left",
        ).select("id", F.coalesce("inn", F.lit(0.0)).alias("e"))
    )
    heights = pin(
        g.nodes.select(
            "id", F.when(F.col("id") == s, F.lit(n)).otherwise(F.lit(0)).alias("h")
        )
    )

    for _ in range(max_rounds):
        active = excess.filter(
            (F.col("e") > 1e-12) & (F.col("id") != s) & (F.col("id") != t)
        )
        if active.isEmpty():
            break
        live = (
            arcs.filter(F.col("res") > 1e-12)
            .join(active.withColumnRenamed("id", "src"), "src")
            .join(
                heights.select(F.col("id").alias("src"), F.col("h").alias("hu")), "src"
            )
            .join(
                heights.select(F.col("id").alias("dst"), F.col("h").alias("hv")), "dst"
            )
        )
        adm = live.filter(F.col("hu") == F.col("hv") + 1)
        w = Window.partitionBy("src").orderBy("hv", "dst")
        pushes = pin(
            adm.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("src", "dst", F.least("e", "res").alias("x"))
        )
        # nodes with no admissible arc relabel to 1 + min residual height
        relabel = (
            live.join(pushes.select("src"), "src", "left_anti")
            .groupBy(F.col("src").alias("id"))
            .agg((F.min("hv") + 1).alias("new_h"))
        )
        if pushes.isEmpty() and relabel.isEmpty():
            break  # stuck excess with no residual arcs (disconnected)
        arcs = _apply_pushes(arcs, pushes)
        delta_out = pushes.groupBy(F.col("src").alias("id")).agg(
            F.sum("x").alias("out")
        )
        delta_in = pushes.groupBy(F.col("dst").alias("id")).agg(
            F.sum("x").alias("inn")
        )
        excess = pin(
            excess.join(delta_out, "id", "left")
            .join(delta_in, "id", "left")
            .select(
                "id",
                (
                    F.col("e")
                    - F.coalesce("out", F.lit(0.0))
                    + F.coalesce("inn", F.lit(0.0))
                ).alias("e"),
            )
        )
        heights = pin(
            heights.join(relabel, "id", "left")
            .select("id", F.coalesce("new_h", F.col("h")).alias("h"))
        )
    else:
        raise RuntimeError(f"max_flow did not terminate in {max_rounds} rounds")

    return arcs, excess, t


def _apply_pushes(arcs: DataFrame, pushes: DataFrame) -> DataFrame:
    both = pushes.select("src", "dst", (-F.col("x")).alias("d")).unionByName(
        pushes.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), F.col("x").alias("d")
        )
    )
    delta = both.groupBy("src", "dst").agg(F.sum("d").alias("d"))
    return pin(
        arcs.join(delta, ["src", "dst"], "full").select(
            "src",
            "dst",
            (F.coalesce("res", F.lit(0.0)) + F.coalesce("d", F.lit(0.0))).alias("res"),
        )
    )


def cut_clustering(
    g: Graph, alpha: float, max_nodes: int | None = 100_000
) -> DataFrame:
    """CutClustering (``community/CutClustering.cpp``, Flake-Tarjan-
    Tsioutsiouliklis): augment the graph with a sink t connected to every
    node by weight ``alpha``; process nodes in degree-descending order;
    for each still-unlabeled node u, the source side of a minimum u-t cut
    becomes u's cluster (source sides are nested, so later cuts never
    split earlier clusters). Returns (node, label) with label = the
    cluster's defining node.

    Like the reference, this runs one max-flow per cluster discovered —
    each flow is the distributed push-relabel kernel; the driver loop is
    over clusters, not nodes (labeled nodes are skipped). The algorithm
    is INHERENTLY driver-sequential (later cuts depend on earlier
    labels), so the node order and each cut's source side pass through
    the driver: ``max_nodes`` (default 100k) caps that driver state and
    raises on larger graphs — pass ``max_nodes=None`` to opt into the
    unbounded driver loop explicitly (the ``all_pairs=True`` pattern
    from the dedup kernels). For scale-out community detection use
    :func:`~networkit_spark.operators.louvain.plm` / PLP; this
    operator's value is exact Flake-Tarjan-Tsioutsiouliklis semantics
    on dimension-sized graphs."""
    spark = g.edges.sparkSession
    n = g.num_nodes()
    if n == 0:
        return spark.createDataFrame([], "node long, label long")
    if max_nodes is not None and n > max_nodes:
        raise ValueError(
            f"cut_clustering is driver-sequential: {n} nodes exceeds "
            f"max_nodes={max_nodes}; raise the cap or pass max_nodes=None "
            "to opt in explicitly"
        )
    t = int(g.nodes.agg(F.max("id")).collect()[0][0]) + 1
    base = (g.symmetrized_edges() if g.directed else g.edges).filter(
        F.col("src") != F.col("dst")
    ).select("src", "dst", F.col("weight").cast("double").alias("weight"))
    sink_edges = g.nodes.select(
        F.col("id").alias("src"), F.lit(t).alias("dst"), F.lit(float(alpha)).alias("weight")
    )
    aug = Graph(
        nodes=g.nodes.unionByName(spark.createDataFrame([(t,)], "id long")),
        edges=base.unionByName(sink_edges).unionByName(
            sink_edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
        ),
        directed=False,
        weighted=True,
    )
    # one bounded collect for the degree order (replaces the old
    # collect-everything + collect-degrees pair)
    order = [
        int(r["id"])
        for r in g.nodes.join(
            base.groupBy(F.col("src").alias("id")).agg(
                F.count(F.lit(1)).alias("d")
            ),
            "id",
            "left",
        )
        .select("id", F.coalesce("d", F.lit(0)).alias("d"))
        .orderBy(F.desc("d"), F.asc("id"))
        .collect()
    ]
    labels: dict[int, int] = {}
    for u in order:
        if u in labels:
            continue
        _, side = min_cut_source_side(aug, u, t)
        members = [int(r["id"]) for r in side.collect()]
        for v in members:
            if v != t:
                labels[v] = u
    return spark.createDataFrame(
        sorted(labels.items()), "node long, label long"
    )
