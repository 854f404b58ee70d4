"""Dynamic graphs — typed edit events, batch replay, incremental kernels.

Reference semantics:

- ``GraphEvent`` record: ``{type, u, v, w}`` with types NODE_ADDITION,
  NODE_REMOVAL, NODE_RESTORATION, EDGE_ADDITION, EDGE_REMOVAL,
  EDGE_WEIGHT_UPDATE, EDGE_WEIGHT_INCREMENT, TIME_STEP
  (``dynamics/GraphEvent.hpp:22-37``).
- ``GraphUpdater.update(batch)`` applies an ordered batch
  (``dynamics/GraphUpdater.cpp``).
- ``DGSStreamParser`` reads an event log (``dynamics/DGSStreamParser.cpp``).
- ``DynConnectedComponents.update/updateBatch`` maintains components
  incrementally (``components/DynConnectedComponents.cpp``; test usage
  ``components/test/ConnectedComponentsGTest.cpp:288-316``).

Spark mapping: events are an append-only DataFrame
``(seq LONG, type STRING, u LONG, v LONG, w DOUBLE)``. Batch replay folds
each edge's event list IN SEQ ORDER with a pure column expression
(``F.aggregate`` over ``sort_array(collect_list(...))`` — no per-row
Python), because EDGE_WEIGHT_INCREMENT makes the fold order-dependent:
last-writer-wins is not enough. Node events fold the same way.
``replay_at(g, events, t)`` = ``filter(seq <= t)`` + fold — time travel.

``DynConnectedComponents`` warm-starts from the previous labels: edge
ADDITIONS only merge components, so seeding min-label propagation with
the old labels converges in O(rounds-to-merge) instead of from scratch;
any REMOVAL falls back to full recompute (the reference's removal path is
likewise the expensive one). Structured Streaming: feed micro-batches
into ``update_batch`` from ``foreachBatch`` — each batch's labels are
durably checkpointed by the SuperstepRunner, which is what makes the
stream resumable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.superstep import SuperstepRunner

EVENT_SCHEMA = "seq long, type string, u long, v long, w double"

NODE_ADDITION = "NODE_ADDITION"
NODE_REMOVAL = "NODE_REMOVAL"
NODE_RESTORATION = "NODE_RESTORATION"
EDGE_ADDITION = "EDGE_ADDITION"
EDGE_REMOVAL = "EDGE_REMOVAL"
EDGE_WEIGHT_UPDATE = "EDGE_WEIGHT_UPDATE"
EDGE_WEIGHT_INCREMENT = "EDGE_WEIGHT_INCREMENT"
TIME_STEP = "TIME_STEP"


def events_of(spark: SparkSession, rows: list[tuple]) -> DataFrame:
    """Tiny-batch constructor: list of (seq, type, u, v, w) tuples."""
    return spark.createDataFrame(
        [
            (int(s), str(t), None if u is None else int(u),
             None if v is None else int(v), None if w is None else float(w))
            for (s, t, u, v, w) in rows
        ],
        EVENT_SCHEMA,
    )


def _fold_edge_events(initial_exists, initial_w, events_col):
    """Column fold of ordered edge events onto (exists, weight) state."""
    init = F.struct(
        initial_exists.alias("exists"), initial_w.alias("w")
    )
    return F.aggregate(
        events_col,
        init,
        lambda acc, e: F.struct(
            F.when(e["type"] == EDGE_ADDITION, F.lit(True))
            .when(e["type"] == EDGE_REMOVAL, F.lit(False))
            .otherwise(acc["exists"])
            .alias("exists"),
            F.when(e["type"] == EDGE_ADDITION, F.coalesce(e["w"], F.lit(1.0)))
            .when(e["type"] == EDGE_WEIGHT_UPDATE, e["w"])
            .when(e["type"] == EDGE_WEIGHT_INCREMENT, acc["w"] + F.coalesce(e["w"], F.lit(0.0)))
            .otherwise(acc["w"])
            .alias("w"),
        ),
    )


def apply_events(g: Graph, events: DataFrame) -> Graph:
    """Replay an ordered event batch onto ``g`` (GraphUpdater semantics).

    Undirected graphs key edge events canonically (min, max); the result
    re-symmetrizes. Node removals drop incident edges AT THE REMOVAL'S
    SEQUENCE POSITION (NetworKit's removeNode drops incident edges,
    ``graph.pyx:233``): a later NODE_RESTORATION restores the id but NOT
    its edges (``Graph.hpp restoreNode`` — "previously deleted" edges
    stay deleted), while an EDGE_ADDITION after the restoration re-adds
    normally. Implemented by lifting each NODE_REMOVAL to per-edge
    removal events on the node's candidate incident edges and folding
    them into the same seq-ordered per-edge event list.
    """
    # ---------------------------------------------------------------- nodes
    nev = events.filter(
        F.col("type").isin(NODE_ADDITION, NODE_REMOVAL, NODE_RESTORATION)
    )
    node_state = (
        nev.groupBy(F.col("u").alias("id"))
        .agg(F.sort_array(F.collect_list(F.struct("seq", "type"))).alias("evs"))
        .select(
            "id",
            F.aggregate(
                "evs",
                F.lit(None).cast("boolean"),
                lambda acc, e: F.when(e["type"] == NODE_REMOVAL, F.lit(False)).otherwise(
                    F.lit(True)
                ),
            ).alias("exists"),
        )
    )
    nodes = (
        g.nodes.join(node_state, "id", "full")
        .select("id", F.coalesce("exists", F.lit(True)).alias("exists"))
        .filter("exists")
        .select("id")
    )

    # ---------------------------------------------------------------- edges
    eev = events.filter(
        F.col("type").isin(EDGE_ADDITION, EDGE_REMOVAL, EDGE_WEIGHT_UPDATE, EDGE_WEIGHT_INCREMENT)
    )
    if not g.directed:
        key = [
            F.least("u", "v").alias("src"),
            F.greatest("u", "v").alias("dst"),
        ]
        base = (
            g.edges.filter(F.col("src") <= F.col("dst"))  # one orientation (+loops)
        )
    else:
        key = [F.col("u").alias("src"), F.col("v").alias("dst")]
        base = g.edges
    edge_events = eev.select(*key, F.struct("seq", "type", "w").alias("e"))
    # lift node removals onto candidate incident edges (base ∪ edge-event
    # keys) so the removal lands at its true position in each edge's fold
    removals = nev.filter(F.col("type") == NODE_REMOVAL).select(
        F.col("u").alias("nid"), "seq"
    )
    if not removals.isEmpty():
        cand = (
            base.select("src", "dst")
            .unionByName(edge_events.select("src", "dst"))
            .distinct()
        )
        lifted = None
        for side in ("src", "dst"):
            hit = cand.join(
                F.broadcast(removals.withColumnRenamed("nid", side)), side
            ).select(
                "src",
                "dst",
                F.struct(
                    "seq",
                    F.lit(EDGE_REMOVAL).alias("type"),
                    F.lit(None).cast("double").alias("w"),
                ).alias("e"),
            )
            lifted = hit if lifted is None else lifted.unionByName(hit)
        edge_events = edge_events.unionByName(lifted)
    folded = (
        edge_events
        .groupBy("src", "dst")
        .agg(F.sort_array(F.collect_list("e")).alias("evs"))
    )
    merged = (
        base.join(folded, ["src", "dst"], "full")
        .select(
            "src",
            "dst",
            _fold_edge_events(
                F.col("weight").isNotNull(),
                F.coalesce("weight", F.lit(0.0)),
                F.coalesce("evs", F.array()),
            ).alias("st"),
        )
        .filter(F.col("st.exists"))
        .select("src", "dst", F.col("st.w").alias("weight"))
    )
    # drop edges incident to removed nodes
    merged = merged.join(
        nodes.withColumnRenamed("id", "src"), "src", "left_semi"
    ).join(nodes.withColumnRenamed("id", "dst"), "dst", "left_semi").select(
        "src", "dst", "weight"
    )
    return Graph.from_edges(
        merged, directed=g.directed, weighted=g.weighted, nodes=nodes
    )


def replay_at(g: Graph, events: DataFrame, t: int) -> Graph:
    """Graph state after all events with seq ≤ t (time travel)."""
    return apply_events(g, events.filter(F.col("seq") <= t))


def parse_dgs_lines(lines: DataFrame) -> DataFrame:
    """Parse a DGS-style event log (``dynamics/DGSStreamParser.cpp``):
    ``an <u>`` / ``dn <u>`` / ``ae <u> <v> [w]`` / ``de <u> <v>`` /
    ``ce <u> <v> <w>`` / ``st`` — one event per text line, seq = line order
    (requires a ``value`` string column; use ``spark.read.text``)."""
    p = F.split(F.trim(F.col("value")), r"\s+")
    typed = lines.select(
        F.monotonically_increasing_id().alias("seq"),
        F.try_element_at(p, F.lit(1)).alias("op"),
        F.try_element_at(p, F.lit(2)).cast("long").alias("u"),
        F.try_element_at(p, F.lit(3)).cast("long").alias("v"),
        F.try_element_at(p, F.lit(4)).cast("double").alias("w"),
    )
    return typed.select(
        "seq",
        F.when(F.col("op") == "an", NODE_ADDITION)
        .when(F.col("op") == "dn", NODE_REMOVAL)
        .when(F.col("op") == "rn", NODE_RESTORATION)
        .when(F.col("op") == "ae", EDGE_ADDITION)
        .when(F.col("op") == "de", EDGE_REMOVAL)
        .when(F.col("op") == "ce", EDGE_WEIGHT_UPDATE)
        .when(F.col("op") == "ie", EDGE_WEIGHT_INCREMENT)
        .when(F.col("op") == "st", TIME_STEP)
        .alias("type"),
        "u",
        "v",
        # DGS 'ae u v' without weight ⇒ weight 1.0 on fold
        "w",
    ).filter(F.col("type").isNotNull())


class DynConnectedComponents:
    """Incrementally-maintained connected components
    (``components/DynConnectedComponents.cpp`` semantics: additions are
    cheap merges; removals are handled with component-local work).

    ``labels`` always holds (node, label) with label = min node id of the
    component — the same canonical labeling as the static kernel, so
    ``update_batch`` output is directly comparable with a fresh run.

    Removal path (r7): a removal can only split the component(s) the
    removed edges/nodes lived in, so CC is recomputed ONLY on the
    induced subgraph of those affected components (the distributed
    analogue of the reference's BFS-from-the-severed-edge reachability
    probe). Because both the static kernel and this class label with
    the component's min node id, the scoped labels stitch verbatim onto
    the untouched components' old labels. The stitched seed then runs
    through the same warm-start min-label merge loop as the additions
    path, which (a) applies any additions in the same batch, including
    merges between affected and untouched components, and (b) is a
    provably-correct finisher: from any seed where each label class is
    a subset of a true component labeled by its own min member, min
    propagation converges to the per-component min. Worst case (severing
    the giant component) degrades to the static kernel's cost; removals
    in small components touch only those components' edges.
    """

    def __init__(self, g: Graph, runner: SuperstepRunner | None = None) -> None:
        from networkit_spark.operators.components import connected_components

        self.graph = g
        self.runner = runner or SuperstepRunner(g.edges.sparkSession)
        self.labels = connected_components(g, runner=self.runner)

    def update_batch(self, events: DataFrame) -> DataFrame:
        from networkit_spark.operators.components import connected_components

        rm = events.filter(F.col("type").isin(EDGE_REMOVAL, NODE_REMOVAL))
        has_removal = not rm.isEmpty()
        old = self.labels
        self.graph = apply_events(self.graph, events)
        memb = self.graph.nodes.join(
            old.withColumnRenamed("node", "id"), "id", "left"
        )  # (id, label) — label null for nodes added this batch
        if has_removal:
            # scope: components containing an endpoint of a removal
            touched = (
                rm.select(F.col("u").alias("node"))
                .unionByName(
                    rm.filter(F.col("v").isNotNull()).select(
                        F.col("v").alias("node")
                    )
                )
                .distinct()
            )
            affected = old.join(touched, "node").select("label").distinct()
            aff_nodes = memb.join(F.broadcast(affected), "label", "left_semi")
            sub_labels = connected_components(
                self.graph.subgraph_from_nodes(aff_nodes.select("id")),
                runner=self.runner,
            )
            # untouched components (and brand-new nodes) keep old/own labels
            seed = (
                memb.join(F.broadcast(affected), "label", "left_anti")
                .select(
                    F.col("id").alias("node"),
                    F.coalesce("label", F.col("id")).alias("label"),
                )
                .unionByName(sub_labels)
            )
            if events.filter(
                F.col("type").isin(EDGE_ADDITION, NODE_ADDITION)
            ).isEmpty():
                # pure-removal batch: the stitched seed IS the exact
                # labeling — no full-graph merge pass needed
                self.labels = seed.localCheckpoint(eager=True)
                return self.labels
        else:
            # additions only merge: warm-start from the previous labels;
            # new nodes seed with their own id
            seed = memb.select(
                F.col("id").alias("node"),
                F.coalesce("label", F.col("id")).alias("label"),
            )
        labels = seed.localCheckpoint(eager=True)
        edges = (
            self.graph.symmetrized_edges()
            if self.graph.directed
            else self.graph.edges
        ).select("src", "dst")
        step = 0
        while True:
            step += 1
            nbr_min = (
                edges.join(
                    labels.withColumnRenamed("node", "src").hint("shuffle_hash"),
                    "src",
                )
                .groupBy(F.col("dst").alias("node"))
                .agg(F.min("label").alias("nbr_label"))
            )
            new_labels = (
                labels.join(nbr_min.hint("shuffle_hash"), "node", "left")
                .select(
                    "node",
                    F.least(
                        F.col("label"), F.coalesce("nbr_label", F.col("label"))
                    ).alias("label"),
                    (F.coalesce("nbr_label", F.col("label")) < F.col("label")).alias(
                        "chg"
                    ),
                )
            )
            new_labels = self.runner.persist_step(new_labels, step)
            changed = new_labels.filter("chg").count()
            labels = new_labels.select("node", "label")
            self.runner.record(step, changed=changed)
            if changed == 0:
                break
        self.labels = labels
        return self.labels


class DynKatzCentrality:
    """Incrementally-maintained Katz centrality
    (``centrality/DynKatzCentrality.cpp`` semantics at the fixed point).

    The reference maintains per-hop walk-count upper/lower bounds and
    tightens them after each edge event; the distributed analogue keeps
    the UNNORMALIZED Katz fixpoint vector and, after an event batch,
    re-converges the power iteration warm-started from it — the
    perturbation of a small batch needs only the few iterations its
    influence radius spans (1-3 in the tests) instead of a cold start's
    ~15. α is pinned at construction (the reference keeps its α across
    updates; recomputing 1/(1+maxDegree) on the updated graph would
    silently change the operator being maintained). Additions and
    removals both re-converge from the warm vector — Katz is a global
    contraction, so the warm start is valid in both directions (unlike
    the distance kernels, no removal recompute path is needed).

    ``scores`` always holds the current normalized (id, score) table,
    comparable with a fresh :func:`katz_centrality` run.
    """

    def __init__(
        self,
        g: Graph,
        alpha: float | None = None,
        beta: float = 0.1,
        tol: float = 1e-8,
        max_iterations: int | None = None,
        runner: SuperstepRunner | None = None,
    ) -> None:
        from networkit_spark.operators.spectral import katz_centrality

        if alpha is None:
            max_deg = (
                g.edges.groupBy("src").count().agg(F.max("count")).collect()[0][0]
                or 0
            )
            alpha = 1.0 / (1.0 + max_deg)
        self.alpha = float(alpha)
        self.beta = beta
        self.tol = tol
        # fixed-budget mode (tol=0 + max_iterations) makes the whole
        # init→update trajectory a deterministic recurrence that a SQL
        # replay oracle can chain round by round
        self.max_iterations = max_iterations
        self.graph = g
        self.runner = runner or SuperstepRunner(g.edges.sparkSession)
        res = katz_centrality(
            g,
            alpha=self.alpha,
            beta=beta,
            tol=tol,
            max_iterations=max_iterations,
            runner=self.runner,
        )
        self.scores = res.scores
        self._raw = res.raw_scores.localCheckpoint(eager=True)
        self.iterations = res.iterations

    def update_batch(
        self, events: DataFrame, max_iterations: int | None = None
    ) -> DataFrame:
        from networkit_spark.operators.spectral import katz_centrality

        self.graph = apply_events(self.graph, events)
        res = katz_centrality(
            self.graph,
            alpha=self.alpha,
            beta=self.beta,
            tol=self.tol,
            max_iterations=(
                max_iterations if max_iterations is not None else self.max_iterations
            ),
            runner=self.runner,
            initial_scores=self._raw,
        )
        self.scores = res.scores
        self._raw = res.raw_scores.localCheckpoint(eager=True)
        self.iterations = res.iterations
        return self.scores


class DynBetweennessOneNode:
    """Betweenness of ONE node x, maintained under edge additions
    (``centrality/DynBetweennessOneNode.cpp``): bcx = Σ over ordered
    pairs (s, t), s ≠ x ≠ t, σ(s,t) > 0 of σ_x(s,t)/σ(s,t).

    The reference keeps per-pair (dist, σ, σx, Pred) matrices and walks
    affected pairs after each insertion. The distributed shape keeps ONE
    (root, node, dist, σ) table (the same batched multi-source BFS state
    every kernel here shares) and derives σx by the exact identity
    σ_x(s,t) = σ(s,x)·σ(x,t) iff d(s,x) + d(x,t) = d(s,t) — two keyed
    joins instead of per-pair bookkeeping. Updates are incremental the
    same way the reference's are: an added edge (u, v) can only change
    sources s with d(s,u)+1 ≤ d(s,v) (or the mirror), so only those
    roots re-run BFS (one shared-frontier pass over the affected set);
    every other row is kept verbatim. Unweighted semantics (the
    reference's BFS path); removals raise like the reference.

    The state is INHERENTLY O(n²) — a (root, node) row for every
    reachable pair, exactly like the reference's per-pair dist/σ
    matrices — so ``max_nodes`` (default 20k ⇒ ≤4·10⁸ state rows) caps
    it and raises on larger graphs; pass ``max_nodes=None`` to opt into
    the unbounded state explicitly (the ``cut_clustering`` convention).
    For betweenness at scale use
    :func:`~networkit_spark.operators.distance.estimate_betweenness` or
    :func:`~networkit_spark.operators.distance.kadabra_betweenness`.
    """

    def __init__(
        self,
        g: Graph,
        x: int,
        runner: SuperstepRunner | None = None,
        max_nodes: int | None = 20_000,
    ):
        n = g.num_nodes()
        if max_nodes is not None and n > max_nodes:
            raise ValueError(
                f"DynBetweennessOneNode keeps O(n²) (root, node) state and "
                f"runs all-source BFS at construction: {n} nodes exceeds "
                f"max_nodes={max_nodes}; raise the cap or pass "
                "max_nodes=None to opt in explicitly (use "
                "estimate_betweenness/kadabra_betweenness for scale)"
            )
        self.graph = g
        self.x = int(x)
        self.runner = runner or SuperstepRunner(g.edges.sparkSession)
        self.vis = self._bfs(g.nodes.select("id"))
        self._rescore()

    def _bfs(self, sources: DataFrame) -> DataFrame:
        from networkit_spark.operators.distance import multi_source_bfs

        return (
            multi_source_bfs(self.graph, sources, runner=self.runner)
            .visited.select("root", "node", "dist", "sigma")
            .localCheckpoint(eager=True)
        )

    def _rescore(self) -> None:
        x = self.x
        to_x = self.vis.filter(F.col("node") == x).select(
            F.col("root").alias("s"), F.col("dist").alias("dsx"),
            F.col("sigma").alias("ssx"),
        )
        from_x = self.vis.filter(F.col("root") == x).select(
            F.col("node").alias("t"), F.col("dist").alias("dxt"),
            F.col("sigma").alias("sxt"),
        )
        pairs = (
            self.vis.filter((F.col("root") != x) & (F.col("node") != x))
            .select(F.col("root").alias("s"), F.col("node").alias("t"),
                    "dist", "sigma")
            .join(to_x, "s")
            .join(from_x, "t")
            .filter(F.col("dsx") + F.col("dxt") == F.col("dist"))
        )
        val = pairs.agg(
            F.sum(F.col("ssx") * F.col("sxt") / F.col("sigma"))
        ).collect()[0][0]
        self.score = float(val or 0.0)

    def update_batch(self, events: DataFrame) -> float:
        """Apply additions; re-run BFS only for affected sources.
        Returns the updated score. Raises on removals (reference:
        'edge insertions and edge weight decreases only')."""
        bad = events.filter(
            F.col("type").isin(EDGE_REMOVAL, NODE_REMOVAL)
        ).limit(1).count()
        if bad:
            raise ValueError(
                "DynBetweennessOneNode handles edge insertions only "
                "(DynBetweennessOneNode.cpp update contract)"
            )
        added = events.filter(F.col("type") == EDGE_ADDITION).select(
            F.col("u"), F.col("v")
        )
        self.graph = apply_events(self.graph, events)
        # affected roots: d(s,u)+1 <= d(s,v) or d(s,v)+1 <= d(s,u),
        # unreachable endpoints counting as infinity
        du = self.vis.join(
            added.select(F.col("u").alias("node")).distinct(), "node"
        ).select(F.col("root"), F.col("node").alias("u"), F.col("dist").alias("du"))
        dv = self.vis.join(
            added.select(F.col("v").alias("node")).distinct(), "node"
        ).select(F.col("root"), F.col("node").alias("v"), F.col("dist").alias("dv"))
        roots = self.vis.select("root").distinct()
        inf = F.lit(float("inf"))
        aff = (
            added.crossJoin(roots)
            .join(du, ["root", "u"], "left")
            .join(dv, ["root", "v"], "left")
            .filter(
                (F.coalesce("du", inf) + 1 <= F.coalesce("dv", inf))
                | (F.coalesce("dv", inf) + 1 <= F.coalesce("du", inf))
            )
            .select("root")
            .distinct()
            .localCheckpoint(eager=True)
        )
        # new nodes (never seen as roots) are affected too
        new_roots = self.graph.nodes.join(
            roots.withColumnRenamed("root", "id"), "id", "left_anti"
        ).select(F.col("id").alias("root"))
        aff = aff.unionByName(new_roots).distinct().localCheckpoint(eager=True)
        if not aff.isEmpty():
            fresh = self._bfs(aff.select(F.col("root").alias("id")))
            kept = self.vis.join(aff, "root", "left_anti").select(
                "root", "node", "dist", "sigma"
            )
            self.vis = kept.unionByName(fresh).localCheckpoint(eager=True)
        self._rescore()
        return self.score


class DynApproxBetweenness:
    """Sample-maintaining ε-δ betweenness
    (``centrality/DynApproxBetweenness.cpp:118-175``): the RK pair
    sample is drawn ONCE; after an event batch, only the samples whose
    source SSSP actually changed (any (dist, σ) difference — the
    reference's ``sssp[i]->modified()``) have their old path
    contributions subtracted and a fresh σ-weighted path resampled;
    every other sampled path is kept verbatim.

    Distributed shape: distances + σ for the ≤ r distinct sources are
    recomputed in ONE batched multi-source BFS (the per-level shuffles
    are shared — this is the init cost, not r× it); the modified-source
    detection is a keyed anti-diff of the old and new (root, node,
    dist, σ) tables; resampling walks only the affected pairs, O(r')
    rows per step. Path draws are salted with an update epoch so each
    resample uses fresh deterministic randomness (the reference draws
    from its live RNG). Removals take the same path — the full BFS
    recompute makes them no harder than additions.

    ``scores`` is always the current (id, score) estimate, comparable
    with a fresh :func:`~networkit_spark.operators.distance.
    approx_betweenness` run at the same sample size.
    """

    def __init__(
        self,
        g: Graph,
        epsilon: float = 0.2,
        delta: float = 0.1,
        universal_constant: float = 1.0,
        seed: int = 42,
        runner: SuperstepRunner | None = None,
        portable_hash: bool = False,
        vd: int | None = None,
    ) -> None:
        import math as _math

        from networkit_spark.ids import assign_dense_ids
        from networkit_spark.operators.distance import diameter_range
        from networkit_spark.plans.pin import pin

        self.graph = g
        self.seed = int(seed)
        self.portable_hash = portable_hash
        self.epoch = 0
        self.runner = runner or SuperstepRunner(g.edges.sparkSession)
        spark = g.edges.sparkSession
        self._spark = spark

        n = g.num_nodes()
        self.n = n
        if n < 2:
            self.r = 0
            self.pairs = spark.createDataFrame([], "pair long, u long, v long")
            self.contribs = spark.createDataFrame([], "pair long, u long, id long")
            self.vis = spark.createDataFrame(
                [], "root long, node long, dist long, sigma double"
            )
            return
        # ``vd`` pins the vertex-diameter bound (and with it the sample
        # count r) so a SQL oracle can embed the same constants; None =
        # the reference's two-sweep estimate
        if vd is None:
            _, vd = diameter_range(g, seed=seed)
        self.vd = max(int(vd), 2)
        self.r = int(
            _math.ceil(
                (universal_constant / (epsilon * epsilon))
                * (_math.floor(_math.log2(max(self.vd - 2, 1))) + 1
                   + _math.log(1.0 / delta))
            )
        )
        mapping = assign_dense_ids(
            g.nodes.select(F.col("id").alias("key")), ["key"]
        ).transform(pin)
        samp = spark.range(self.r).select(F.col("id").alias("pair"))
        if portable_hash:
            from networkit_spark.functions.porthash import md5_mod

            iu = F.pmod(md5_mod(F.col("pair"), salt=f"dab{seed}:u:"), F.lit(n))
            iv0 = F.pmod(md5_mod(F.col("pair"), salt=f"dab{seed}:v:"), F.lit(n - 1))
        else:
            iu = F.pmod(F.xxhash64(F.lit(seed), F.lit(0), F.col("pair")), F.lit(n))
            iv0 = F.pmod(F.xxhash64(F.lit(seed), F.lit(1), F.col("pair")), F.lit(n - 1))
        iv = F.when(iv0 >= iu, iv0 + 1).otherwise(iv0)
        self.pairs = (
            samp.select("pair", iu.alias("iu"), iv.alias("iv"))
            .join(F.broadcast(mapping.select(F.col("id").alias("iu"),
                                             F.col("key").alias("u"))), "iu")
            .join(F.broadcast(mapping.select(F.col("id").alias("iv"),
                                             F.col("key").alias("v"))), "iv")
            .select("pair", "u", "v")
            .localCheckpoint(eager=True)
        )
        self.vis = self._bfs(g)
        self.contribs = self._sample(self.pairs, self.vis).localCheckpoint(
            eager=True
        )

    # ------------------------------------------------------------------
    def _bfs(self, g: Graph) -> DataFrame:
        from networkit_spark.operators.distance import multi_source_bfs

        return (
            multi_source_bfs(g, self.pairs.select("u").distinct(),
                             runner=self.runner)
            .visited.select("root", "node", "dist", "sigma")
            .localCheckpoint(eager=True)
        )

    def _sample(self, pairs: DataFrame, vis: DataFrame) -> DataFrame:
        """σ-weighted path walk for ``pairs`` over ``vis`` — the
        approx_betweenness predecessor-sampling loop, with draws salted
        by the current update epoch. Returns (pair, u, id) interiors."""
        from networkit_spark.plans.pin import pin

        spark = self._spark
        g = self.graph
        active = pairs.join(
            vis.filter(F.col("dist") > 0).select(
                F.col("root").alias("u"), F.col("node").alias("v")
            ),
            ["u", "v"],
            "left_semi",
        ).select("pair", "u", F.col("v").alias("cur")).transform(pin)
        edges = g.edges.select(F.col("src").alias("z"), F.col("dst").alias("cur"))
        contribs = []
        M = 1_000_003
        for step in range(1, self.vd + 2):
            if active.isEmpty():
                break
            cand = (
                active.join(edges, "cur")
                .join(
                    vis.select(
                        F.col("root").alias("u"),
                        F.col("node").alias("z"),
                        F.col("dist").alias("dz"),
                        F.col("sigma").alias("sz"),
                    ),
                    ["u", "z"],
                )
                .join(
                    vis.select(
                        F.col("root").alias("u"),
                        F.col("node").alias("cur"),
                        F.col("dist").alias("dc"),
                    ),
                    ["u", "cur"],
                )
                .filter(F.col("dz") == F.col("dc") - 1)
            )
            w_cum = Window.partitionBy("pair").orderBy("z")
            w_tot = Window.partitionBy("pair")
            if self.portable_hash:
                from networkit_spark.functions.porthash import md5_mod

                x = F.pmod(
                    md5_mod(F.col("pair"),
                            salt=f"dab{self.seed}:{self.epoch}:x:{step}:"),
                    F.lit(M),
                ) / F.lit(float(M))
            else:
                x = (
                    F.pmod(
                        F.xxhash64(F.lit(self.seed), F.lit(self.epoch),
                                   F.col("pair"), F.lit(step)),
                        F.lit(M),
                    )
                    / F.lit(float(M))
                )
            chosen = (
                cand.withColumn("cum", F.sum("sz").over(w_cum))
                .withColumn("tot", F.sum("sz").over(w_tot))
                .filter(F.col("cum") / F.col("tot") > x)
                .withColumn("rn", F.row_number().over(w_cum))
                .filter(F.col("rn") == 1)
                .select("pair", "u", F.col("z").alias("cur"))
                .transform(pin)
            )
            contribs.append(
                chosen.filter(F.col("cur") != F.col("u")).select(
                    "pair", "u", F.col("cur").alias("id")
                )
            )
            active = chosen.filter(F.col("cur") != F.col("u"))
        if not contribs:
            return self._spark.createDataFrame([], "pair long, u long, id long")
        out = contribs[0]
        for c in contribs[1:]:
            out = out.unionByName(c)
        return out

    # ------------------------------------------------------------------
    @property
    def scores(self) -> DataFrame:
        if self.r == 0:
            return self.graph.nodes.select("id", F.lit(0.0).alias("score"))
        counts = self.contribs.groupBy("id").agg(
            (F.count(F.lit(1)) / F.lit(float(self.r))).alias("s")
        )
        return self.graph.nodes.join(counts, "id", "left").select(
            "id", F.coalesce("s", F.lit(0.0)).alias("score")
        )

    def update_batch(self, events: DataFrame) -> DataFrame:
        """Apply an event batch; resample only the pairs whose source
        SSSP changed. Returns the updated ``scores``."""
        self.graph = apply_events(self.graph, events)
        if self.r == 0:
            return self.scores
        old_vis = self.vis
        new_vis = self._bfs(self.graph)
        # modified roots: any (root, node) whose (dist, σ) differs,
        # appeared, or disappeared (reference: sssp[i]->modified())
        o = old_vis.select("root", "node",
                           F.col("dist").alias("od"), F.col("sigma").alias("os"))
        nw = new_vis.select("root", "node",
                            F.col("dist").alias("nd"), F.col("sigma").alias("ns"))
        modified = (
            o.join(nw, ["root", "node"], "full_outer")
            .filter(
                F.col("od").isNull()
                | F.col("nd").isNull()
                | (F.col("od") != F.col("nd"))
                | (F.col("os") != F.col("ns"))
            )
            .select("root")
            .distinct()
            .localCheckpoint(eager=True)
        )
        self.vis = new_vis
        self.epoch += 1
        # USING joins hoist the key column first — re-select to keep the
        # state schema order stable across updates
        touched = self.pairs.join(
            modified.withColumnRenamed("root", "u"), "u", "left_semi"
        ).select("pair", "u", "v")
        kept = self.contribs.join(
            modified.withColumnRenamed("root", "u"), "u", "left_anti"
        ).select("pair", "u", "id")
        fresh = self._sample(touched, new_vis)
        self.contribs = kept.unionByName(fresh).localCheckpoint(eager=True)
        return self.scores


class DynTopHarmonicCloseness:
    """Top-k harmonic closeness maintained under graph events
    (``centrality/DynTopHarmonicCloseness.cpp``, Bisenius et al. —
    the reference prunes per-event BFS work with affected-node bounds
    and per-level cutoffs).

    The distributed shape: each event batch folds into the graph via
    :func:`apply_events` (last-writer-wins MERGE semantics) and the
    top-k is recomputed from the ONE batched multi-source BFS that
    every closeness kernel here shares — at DataFrame scale the shared
    frontier already amortizes the per-source work the reference's
    pruning exists to avoid, so the pruned-update machinery reduces to
    a recompute over the shared table. Contract parity is the result
    surface: ``ranking()`` returns the top-k (id, score) rows ordered
    by harmonic closeness descending, ties by smallest id
    (``DynTopHarmonicCloseness.cpp`` ranking()/topkNodesList()).
    """

    def __init__(self, g: Graph, k: int = 10) -> None:
        from networkit_spark.operators.distance import top_closeness

        if k <= 0:
            raise ValueError("k must be positive")
        self.graph = g
        self.k = int(k)
        self._top = top_closeness(g, k=self.k, harmonic=True).localCheckpoint(
            eager=True
        )

    def ranking(self) -> DataFrame:
        """Current top-k (id, score), ordered."""
        return self._top

    def update_batch(self, events: DataFrame) -> DataFrame:
        """Fold an event batch (EVENT_SCHEMA) and refresh the top-k."""
        from networkit_spark.operators.distance import top_closeness

        self.graph = apply_events(self.graph, events)
        self._top = top_closeness(
            self.graph, k=self.k, harmonic=True
        ).localCheckpoint(eager=True)
        return self._top


def run_event_stream(
    stream_events: DataFrame,
    base: Graph,
    checkpoint_dir: str,
    query_name: str = "graph-event-stream",
) -> Graph:
    """Consume a STREAMING event DataFrame (schema = EVENT_SCHEMA, any
    streaming source: files, Kafka, rate) through ``foreachBatch``,
    folding each micro-batch into the graph with ``apply_events`` in
    micro-batch order — the Structured Streaming face of GraphUpdater.

    Each batch's resulting edge/node state is eagerly materialized
    (localCheckpoint) so the fold never re-reads consumed micro-batches;
    Structured Streaming's own checkpoint (``checkpoint_dir``) makes the
    source offsets resumable, which together give exactly-once folding
    for replayable sources. Runs with ``trigger(availableNow=True)`` and
    blocks until the backlog is drained; returns the final Graph.

    At scale the same function runs unbounded (drop availableNow): state
    lives in executor storage, micro-batch cost is O(batch + touched
    edges), and a durable SuperstepRunner checkpoint of ``g.edges`` per N
    batches bounds replay on driver failover.
    """
    holder = {"g": base}

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        # order within the batch is the event seq; order across batches
        # is guaranteed by micro-batch serialization
        g2 = apply_events(holder["g"], batch_df)
        holder["g"] = Graph(
            nodes=g2.nodes.localCheckpoint(eager=True),
            edges=g2.edges.localCheckpoint(eager=True),
            directed=g2.directed,
            weighted=g2.weighted,
        )

    q = (
        stream_events.writeStream.queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .foreachBatch(fold)
        .start()
    )
    q.awaitTermination()
    return holder["g"]


def graph_difference(g1: Graph, g2: Graph) -> dict:
    """GraphDifference (``dynamics/GraphDifference.cpp:12-100``): the
    edit script turning g1 into g2. Returns {'edits': DataFrame
    (seq, type, u, v, w), 'num_edge_additions', 'num_edge_removals',
    'num_weight_updates', 'num_node_additions', 'num_node_removals',
    'num_node_restorations', 'num_edits'} — replaying ``edits`` through
    :func:`apply_events` on g1 yields g2's structure.

    Everything is anti-joins on canonical keys. Edit order follows the
    reference's final concatenation (``:86-89``): edge removals, node
    events, then edge additions/weight updates; WITHIN a block the
    reference iterates adjacency order — unspecified — so rows order by
    (u, v) (documented). Node ids beyond g1's max id become
    NODE_ADDITION, below it NODE_RESTORATION (the reference's dense-id
    filler dance does not map to an explicit node-set model).

    Scale note: the classification joins are fully distributed; only
    the ``seq`` assignment funnels each block through one ranking task
    (the reference returns the script as a driver vector, so an edit
    script is a replay log, not a big-data artifact — if two snapshots
    ever diverge by billions of edits, replace the per-block window
    with the bucketed two-phase rank of ``compact_labels``)."""
    if g1.directed != g2.directed:
        raise ValueError("Error, either both or none of the graphs must be directed.")
    if g1.weighted != g2.weighted:
        raise ValueError("Error, either both or none of the graphs must be weighted.")

    def canon(g: Graph) -> DataFrame:
        if g.directed:
            return g.edges.select("src", "dst", "weight")
        return g.edges.filter(F.col("src") <= F.col("dst")).select(
            "src", "dst", "weight"
        )

    e1, e2 = canon(g1), canon(g2)
    removals = e1.join(e2.select("src", "dst"), ["src", "dst"], "left_anti").select(
        F.lit(EDGE_REMOVAL).alias("type"),
        F.col("src").alias("u"),
        F.col("dst").alias("v"),
        F.lit(None).cast("double").alias("w"),
    )
    additions = e2.join(e1.select("src", "dst"), ["src", "dst"], "left_anti").select(
        F.lit(EDGE_ADDITION).alias("type"),
        F.col("src").alias("u"),
        F.col("dst").alias("v"),
        F.col("weight").alias("w"),
    )
    updates = (
        e1.withColumnRenamed("weight", "w1")
        .join(e2.withColumnRenamed("weight", "w2"), ["src", "dst"])
        .filter(F.col("w1") != F.col("w2"))
        .select(
            F.lit(EDGE_WEIGHT_UPDATE).alias("type"),
            F.col("src").alias("u"),
            F.col("dst").alias("v"),
            F.col("w2").alias("w"),
        )
    )
    bound_row = g1.nodes.agg(F.max("id")).collect()[0][0]
    g1_bound = int(bound_row) + 1 if bound_row is not None else 0
    gone = g1.nodes.join(g2.nodes, "id", "left_anti").select(
        F.lit(NODE_REMOVAL).alias("type"),
        F.col("id").alias("u"),
        F.lit(None).cast("long").alias("v"),
        F.lit(None).cast("double").alias("w"),
    )
    new = g2.nodes.join(g1.nodes, "id", "left_anti").select(
        F.when(F.col("id") < g1_bound, F.lit(NODE_RESTORATION))
        .otherwise(F.lit(NODE_ADDITION))
        .alias("type"),
        F.col("id").alias("u"),
        F.lit(None).cast("long").alias("v"),
        F.lit(None).cast("double").alias("w"),
    )
    blocks = [removals, gone.unionByName(new), updates.unionByName(additions)]
    counts = {}
    for name, df in (
        ("num_edge_removals", removals),
        ("num_node_removals", gone),
        ("num_edge_additions", additions),
        ("num_weight_updates", updates),
    ):
        counts[name] = df.count()
    nn = {
        r["type"]: int(r["n"])
        for r in new.groupBy("type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    counts["num_node_additions"] = nn.get(NODE_ADDITION, 0)
    counts["num_node_restorations"] = nn.get(NODE_RESTORATION, 0)
    counts["num_edits"] = sum(counts.values())
    # per-block windows + exclusive offsets from the already-computed
    # counts — no single global sort over the whole edit script
    offsets = [
        0,
        counts["num_edge_removals"],
        counts["num_edge_removals"]
        + counts["num_node_removals"]
        + counts["num_node_additions"]
        + counts["num_node_restorations"],
    ]
    w = Window.partitionBy("blk").orderBy("u", "v")
    edits = None
    for i, df in enumerate(blocks):
        part = df.withColumn("blk", F.lit(i)).withColumn("off", F.lit(offsets[i]))
        edits = part if edits is None else edits.unionByName(part)
    edits = edits.withColumn(
        "seq", (F.col("off") + F.row_number().over(w)).cast("long")
    ).select("seq", "type", "u", "v", "w")
    counts["edits"] = edits
    return counts
