"""The Graph data model: a pair of DataFrames.

Reference semantics being matched (NetworKit ``Graph``,
``include/networkit/graph/Graph.hpp:97``):

- nodes are dense integer ids; deleted/isolated nodes exist independently
  of edges (PLP keeps isolated nodes as singletons, ``community/PLP.cpp:48-59``)
  → we carry an explicit ``nodes(id LONG)`` DataFrame.
- an undirected graph stores each edge in both orientations
  (``Graph.hpp:134-136``) → our ``edges`` DataFrame for an undirected graph
  holds BOTH (u,v) and (v,u) rows (self-loops stored once), so every
  per-node gather is a single ``groupBy`` over one column.
- ``degree(v)`` = out-adjacency size; a self-loop contributes 1 by default
  (``Graph.hpp:1207``, ``Graph.cpp:427-453``).
- ``weightedDegree(u)`` = weighted OUT-degree (``Graph.cpp:540-544``).

Scale notes (100 TB / 1000 executors):
- ``edges`` is the big fact table; every kernel joins it against a small
  per-node vector (scores/labels/degrees). We repartition edges once by
  ``src`` and cache; all superstep joins then reuse that partitioning and
  only the per-node vector shuffles.
- Degree tables are tiny relative to edges (|V| ≪ |E| on link graphs) and
  broadcast under the AQE threshold; beyond it Catalyst falls back to
  shuffled hash join — no code change needed.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EDGE_COLS = ("src", "dst", "weight")


@dataclass(frozen=True)
class Graph:
    """An immutable graph view over two DataFrames.

    ``edges``: (src LONG, dst LONG, weight DOUBLE). For ``directed=False``
    the DataFrame contains both orientations of every edge (self-loops once).
    ``nodes``: (id LONG) — the authoritative vertex set (may include
    isolated ids absent from ``edges``).
    """

    nodes: DataFrame
    edges: DataFrame
    directed: bool = False
    weighted: bool = False
    # set by loaders that GUARANTEE the stored edge relation is already
    # simple: no duplicate (src, dst) rows, no self-loops, and (for
    # undirected graphs) both orientations present. Lets canonical /
    # adjacency derivations skip their defensive dedupe pass (guide
    # §2.4: a dropDuplicates over an unpartitioned relation is a full
    # edge-scale Exchange). False (defensive) everywhere it is not
    # provably true.
    simple: bool = False

    # ---------------------------------------------------------------- build
    @staticmethod
    def from_edges(
        edges: DataFrame,
        directed: bool = False,
        weighted: bool = False,
        nodes: DataFrame | None = None,
        dedupe: bool = False,
    ) -> "Graph":
        """Build a Graph from an edge DataFrame with columns (src, dst[, weight]).

        For undirected graphs the input lists each edge ONCE (either
        orientation); we symmetrize here, mirroring NetworKit's double
        storage (``Graph.hpp:134-136``).
        """
        if "weight" not in edges.columns:
            edges = edges.withColumn("weight", F.lit(1.0))
        edges = edges.select(
            F.col("src").cast("long"),
            F.col("dst").cast("long"),
            F.col("weight").cast("double"),
        )
        if dedupe:
            # SNAP reader semantics: drop duplicate (src, dst) pairs
            # (io/SNAPGraphReader.cpp:43-50)
            edges = edges.dropDuplicates(["src", "dst"])
        if not directed:
            rev = edges.filter(F.col("src") != F.col("dst")).select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
            )
            edges = edges.unionByName(rev)
        if nodes is None:
            nodes = (
                edges.select(F.col("src").alias("id"))
                .unionByName(edges.select(F.col("dst").alias("id")))
                .distinct()
            )
        else:
            nodes = nodes.select(F.col("id").cast("long"))
        return Graph(nodes=nodes, edges=edges, directed=directed, weighted=weighted)

    @staticmethod
    def of(
        spark: SparkSession,
        edge_list: list[tuple],
        n: int | None = None,
        directed: bool = False,
        weighted: bool = False,
    ) -> "Graph":
        """Tiny-graph constructor for tests: list of (u, v[, w]) tuples."""
        rows = [
            (int(e[0]), int(e[1]), float(e[2]) if len(e) > 2 else 1.0)
            for e in edge_list
        ]
        edges = spark.createDataFrame(rows, "src long, dst long, weight double")
        nodes = None
        if n is not None:
            nodes = spark.range(n).select(F.col("id"))
        return Graph.from_edges(edges, directed=directed, weighted=weighted, nodes=nodes)

    # ------------------------------------------------------------ accessors
    def num_nodes(self) -> int:
        return self.nodes.count()

    def num_edges(self) -> int:
        """Edge count in NetworKit convention: undirected edges counted once."""
        if self.directed:
            return self.edges.count()
        m2 = self.edges.count()
        loops = self.num_self_loops()
        return (m2 - loops) // 2 + loops

    def num_self_loops(self) -> int:
        return self.edges.filter(F.col("src") == F.col("dst")).count()

    def degrees(self) -> DataFrame:
        """(id, deg, wdeg) per node — deg = out-adjacency size, self-loop
        counted ONCE (``Graph.hpp:1207``); wdeg = weighted out-degree
        (``Graph.cpp:427-453``). Nodes without out-edges get 0."""
        d = self.edges.groupBy(F.col("src").alias("id")).agg(
            F.count(F.lit(1)).alias("deg"), F.sum("weight").alias("wdeg")
        )
        return (
            self.nodes.join(d, "id", "left")
            .select(
                "id",
                F.coalesce("deg", F.lit(0)).cast("long").alias("deg"),
                F.coalesce("wdeg", F.lit(0.0)).alias("wdeg"),
            )
        )

    def in_degrees(self) -> DataFrame:
        """(id, in_deg, in_wdeg); for undirected graphs equals degrees()."""
        d = self.edges.groupBy(F.col("dst").alias("id")).agg(
            F.count(F.lit(1)).alias("in_deg"), F.sum("weight").alias("in_wdeg")
        )
        return (
            self.nodes.join(d, "id", "left")
            .select(
                "id",
                F.coalesce("in_deg", F.lit(0)).cast("long").alias("in_deg"),
                F.coalesce("in_wdeg", F.lit(0.0)).alias("in_wdeg"),
            )
        )

    def total_edge_weight(self) -> float:
        """Sum of edge weights, undirected edges counted once
        (``Graph.hpp:1402``)."""
        if self.directed:
            return self.edges.agg(F.sum("weight")).collect()[0][0] or 0.0
        row = self.edges.select(
            F.sum(
                F.when(F.col("src") == F.col("dst"), F.col("weight")).otherwise(
                    F.col("weight") / 2.0
                )
            ).alias("w")
        ).collect()[0]
        return row["w"] or 0.0

    # ------------------------------------------------------------ transforms
    def to_undirected(self) -> "Graph":
        """GraphTools::toUndirected (``GraphTools.hpp:326``)."""
        if not self.directed:
            return self
        # collapse both orientations into symmetric storage; parallel
        # opposite edges merge (keep one weight per orientation pair by max,
        # matching toUndirected's overwrite-on-duplicate behavior loosely —
        # tests only rely on the unweighted case)
        und = (
            self.edges.select(
                F.least("src", "dst").alias("u"),
                F.greatest("src", "dst").alias("v"),
                "weight",
            )
            .groupBy("u", "v")
            .agg(F.max("weight").alias("weight"))
            .select(F.col("u").alias("src"), F.col("v").alias("dst"), "weight")
        )
        return Graph.from_edges(und, directed=False, weighted=self.weighted, nodes=self.nodes)

    def to_unweighted(self) -> "Graph":
        """GraphTools::toUnweighted (``GraphTools.hpp:335``)."""
        return replace(self, edges=self.edges.withColumn("weight", F.lit(1.0)), weighted=False)

    def to_weighted(self) -> "Graph":
        """GraphTools::toWeighted (``GraphTools.hpp:344``): mark weighted,
        existing edges at defaultEdgeWeight (already 1.0 in storage)."""
        return replace(self, weighted=True)

    def max_degree(self) -> int:
        """GraphTools::maxDegree (``GraphTools.hpp:103``)."""
        row = self.degrees().agg(F.max("deg")).collect()[0]
        return int(row[0] or 0)

    def max_weighted_degree(self) -> float:
        """GraphTools::maxWeightedDegree (``GraphTools.hpp:117``)."""
        row = self.degrees().agg(F.max("wdeg")).collect()[0]
        return float(row[0] or 0.0)

    def transpose(self) -> "Graph":
        """GraphTools::transpose (``GraphTools.hpp:353``) — directed only."""
        t = self.edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
        )
        return replace(self, edges=t)

    def symmetrized_edges(self) -> DataFrame:
        """Both orientations of every edge — the gather relation for
        undirected semantics (WCC on directed graphs runs over this;
        ``ConnectedComponentsImpl.cpp:57-59``)."""
        if not self.directed:
            return self.edges
        rev = self.edges.filter(F.col("src") != F.col("dst")).select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
        )
        return self.edges.unionByName(rev).dropDuplicates(["src", "dst"])

    def canonical_undirected_edges(self) -> DataFrame:
        """One row per undirected edge as (src < dst), self-loops dropped —
        input shape for triangle counting.

        When the relation is flagged ``simple`` (both orientations
        present, deduped, loop-free) the canonical set is exactly the
        ``src < dst`` half — a partitioning-preserving filter instead of
        a column rewrite + edge-scale dedupe Exchange."""
        if self.simple and not self.directed:
            return self.edges.filter(F.col("src") < F.col("dst")).select("src", "dst")
        e = self.edges if not self.directed else self.symmetrized_edges()
        return (
            e.filter(F.col("src") != F.col("dst"))
            .select(
                F.least("src", "dst").alias("src"),
                F.greatest("src", "dst").alias("dst"),
            )
            .dropDuplicates(["src", "dst"])
        )

    def subgraph_from_nodes(self, node_df: DataFrame, compact: bool = False) -> "Graph":
        """GraphTools::subgraphFromNodes (``GraphTools.hpp:247``):
        keep edges with BOTH endpoints in the node set (two semi-joins)."""
        ids = node_df.select(F.col(node_df.columns[0]).alias("id")).distinct()
        e = (
            self.edges.join(ids.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(ids.withColumnRenamed("id", "dst"), "dst", "left_semi")
            .select(*EDGE_COLS)
        )
        g = Graph(
            nodes=ids,
            edges=e,
            directed=self.directed,
            weighted=self.weighted,
            # endpoint-filtering a simple relation keeps it simple
            simple=self.simple,
        )
        if compact:
            from networkit_spark.ids import compact_graph

            g = compact_graph(g)
        return g

    def remove_self_loops(self) -> "Graph":
        return replace(self, edges=self.edges.filter(F.col("src") != F.col("dst")))

    # --------------------------------------------------------- mutation views
    # The Graph is an immutable DataFrame view, so the reference's mutators
    # (``graph.pyx`` addNode/removeNode/restoreNode/addEdge/removeEdge/
    # setWeight/increaseWeight) return NEW Graphs; each is one seq-ordered
    # event batch through the GraphUpdater fold (streaming/dynamics.py),
    # which is also the bulk path for large edit logs.
    def _with_events(self, rows: list[tuple]) -> "Graph":
        from networkit_spark.streaming.dynamics import apply_events

        ev = self.edges.sparkSession.createDataFrame(
            rows, "seq long, type string, u long, v long, w double"
        )
        return apply_events(self, ev)

    def add_nodes(self, ids: list[int]) -> "Graph":
        """Graph::addNodes (``graph.pyx:addNodes``)."""
        return self._with_events(
            [(i, "NODE_ADDITION", int(u), None, None) for i, u in enumerate(ids)]
        )

    def remove_nodes(self, ids: list[int]) -> "Graph":
        """Graph::removeNode (``graph.pyx:233``): drops incident edges;
        the id can later be brought back (edgeless) via restore_nodes."""
        return self._with_events(
            [(i, "NODE_REMOVAL", int(u), None, None) for i, u in enumerate(ids)]
        )

    def restore_nodes(self, ids: list[int]) -> "Graph":
        """Graph::restoreNode: re-adds a removed id WITHOUT its former
        edges (they were deleted at removal time)."""
        return self._with_events(
            [(i, "NODE_RESTORATION", int(u), None, None) for i, u in enumerate(ids)]
        )

    def add_edges(self, edge_list: list[tuple]) -> "Graph":
        """Graph::addEdge batch: (u, v[, w]) tuples."""
        return self._with_events(
            [
                (i, "EDGE_ADDITION", int(e[0]), int(e[1]),
                 float(e[2]) if len(e) > 2 else 1.0)
                for i, e in enumerate(edge_list)
            ]
        )

    def remove_edges(self, pairs: list[tuple]) -> "Graph":
        """Graph::removeEdge batch."""
        return self._with_events(
            [(i, "EDGE_REMOVAL", int(u), int(v), None) for i, (u, v) in enumerate(pairs)]
        )

    def set_weights(self, triples: list[tuple]) -> "Graph":
        """Graph::setWeight batch: (u, v, w)."""
        return self._with_events(
            [(i, "EDGE_WEIGHT_UPDATE", int(u), int(v), float(w))
             for i, (u, v, w) in enumerate(triples)]
        )

    def increase_weights(self, triples: list[tuple]) -> "Graph":
        """Graph::increaseWeight batch: (u, v, Δw)."""
        return self._with_events(
            [(i, "EDGE_WEIGHT_INCREMENT", int(u), int(v), float(w))
             for i, (u, v, w) in enumerate(triples)]
        )

    def density(self) -> float:
        """GraphTools::density (``GraphTools.hpp:130``): m / (n*(n-1)),
        doubled for undirected (self-loops excluded from m)."""
        n = self.num_nodes()
        if n < 2:
            return 0.0
        loops = self.num_self_loops()
        m = self.num_edges() - loops
        denom = n * (n - 1)
        return (m if self.directed else 2 * m) / denom

    def cache(self) -> "Graph":
        return replace(self, nodes=self.nodes.cache(), edges=self.edges.cache())

    def partitioned_by_src(self, num_partitions: int | None = None) -> "Graph":
        """Repartition edges by ``src`` — the one explicit shuffle that every
        superstep join then reuses (the Spark analogue of NetworKit's
        adjacency-array layout / CSR blocks, SURVEY.md §1.1)."""
        e = (
            self.edges.repartition(num_partitions, "src")
            if num_partitions
            else self.edges.repartition("src")
        )
        return replace(self, edges=e)
