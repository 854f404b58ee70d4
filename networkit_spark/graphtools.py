"""GraphTools — append / merge / seeded sampling / edge indexing.

Reference: ``include/networkit/graph/GraphTools.hpp``:

- ``append(G, G1)`` (``:361``): add G1's nodes under fresh ids after G's
  id bound, then its edges (disjoint union).
- ``merge(G, G1)`` (``:370``): union identifying equal ids.
- ``randomNode / randomNodes / randomEdge(s)`` (``:54-96``): the
  reference draws from its RNG; the distributed, cluster-size-stable
  analogue is a seeded-hash order (same row wins at any parallelism).
- ``Graph::indexEdges`` (``graph/Graph.hpp``): dense 0..m-1 edge ids —
  here in canonical (src, dst) order via the two-phase ranker (no global
  single-task window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.ids import assign_dense_ids


def append(g: Graph, g1: Graph) -> Graph:
    """Disjoint union: g1's ids are shifted past g's max id
    (``GraphTools.hpp:361``)."""
    row = g.nodes.agg(F.max("id")).collect()[0]
    offset = int(row[0]) + 1 if row[0] is not None else 0
    n1 = g1.nodes.select((F.col("id") + offset).alias("id"))
    e1 = g1.edges.select(
        (F.col("src") + offset).alias("src"),
        (F.col("dst") + offset).alias("dst"),
        "weight",
    )
    return Graph(
        nodes=g.nodes.unionByName(n1),
        edges=g.edges.unionByName(e1),
        directed=g.directed,
        weighted=g.weighted or g1.weighted,
    )


def merge(g: Graph, g1: Graph) -> Graph:
    """Union identifying equal node ids; duplicate (src, dst) edges keep
    g's weight (``GraphTools.hpp:370`` — merge only adds edges G lacks)."""
    nodes = g.nodes.unionByName(g1.nodes).distinct()
    edges = g.edges.unionByName(
        g1.edges.join(g.edges.select("src", "dst"), ["src", "dst"], "left_anti")
    )
    return Graph(
        nodes=nodes,
        edges=edges,
        directed=g.directed,
        weighted=g.weighted or g1.weighted,
    )


def random_node(g: Graph, seed: int = 42) -> int:
    """Seeded pseudo-uniform node pick, identical at any parallelism."""
    row = (
        g.nodes.orderBy(F.xxhash64("id", F.lit(seed)), F.asc("id"))
        .limit(1)
        .collect()
    )
    if not row:
        raise ValueError("random_node on an empty graph")
    return int(row[0]["id"])


def random_nodes(g: Graph, k: int, seed: int = 42) -> DataFrame:
    """(id) — k seeded-hash-sampled distinct nodes."""
    return (
        g.nodes.orderBy(F.xxhash64("id", F.lit(seed)), F.asc("id"))
        .limit(k)
        .select("id")
    )


def random_edges(g: Graph, k: int, seed: int = 42) -> DataFrame:
    """(src, dst, weight) — k seeded-hash-sampled canonical edges."""
    e = g.edges if g.directed else g.edges.filter(
        (F.col("src") <= F.col("dst"))
    )
    return (
        e.orderBy(F.xxhash64("src", "dst", F.lit(seed)), F.asc("src"), F.asc("dst"))
        .limit(k)
        .select("src", "dst", "weight")
    )


def random_edge(g: Graph, seed: int = 42) -> tuple[int, int]:
    rows = random_edges(g, 1, seed).collect()
    if not rows:
        raise ValueError("random_edge on an edgeless graph")
    return int(rows[0]["src"]), int(rows[0]["dst"])


def index_edges(g: Graph) -> DataFrame:
    """(src, dst, weight, edge_id) — dense 0..m-1 ids over canonical
    edges in (src, dst) sort order (``Graph::indexEdges`` analogue;
    undirected graphs index each edge once, both orientations receive
    the same id)."""
    canon = g.edges if g.directed else g.edges.filter(F.col("src") <= F.col("dst"))
    canon = canon.select("src", "dst").distinct()
    ids = assign_dense_ids(canon, ["src", "dst"]).withColumnRenamed("id", "edge_id")
    if g.directed:
        return g.edges.join(ids, ["src", "dst"])
    # map both orientations to the canonical id
    both = ids.unionByName(
        ids.filter(F.col("src") != F.col("dst")).select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "edge_id"
        )
    )
    return g.edges.join(both, ["src", "dst"])


def sort_edges_by_weight(g: Graph, descending: bool = False) -> DataFrame:
    """sortEdgesByWeight (``Graph.cpp`` edge ordering contract): the
    canonical edge table ordered by (weight, src, dst) — in Spark an
    ORDER BY is the materialization of that contract (range-partitioned
    global sort, no single-task funnel)."""
    if g.directed:
        e = g.edges.select("src", "dst", "weight")
    else:
        # canonical edges carry no weight column — join it back from the
        # symmetric relation (one row per canonical pair)
        w = (
            g.edges.filter(F.col("src") != F.col("dst"))
            .select(
                F.least("src", "dst").alias("src"),
                F.greatest("src", "dst").alias("dst"),
                "weight",
            )
            .dropDuplicates(["src", "dst"])
        )
        e = g.canonical_undirected_edges().join(w, ["src", "dst"])
    cols = [F.col("weight"), F.col("src"), F.col("dst")]
    return e.orderBy(*[c.desc() if descending else c.asc() for c in cols])


def random_neighbor(g: Graph, node: int, seed: int = 42) -> int | None:
    """GraphTools::randomNeighbor — seeded, parallelism-invariant: the
    neighbor with minimum hash(seed, nbr). None for isolated nodes."""
    sym = g.symmetrized_edges() if g.directed else g.edges
    row = (
        sym.filter(F.col("src") == int(node))
        .select(F.col("dst").alias("nbr"))
        .orderBy(F.xxhash64("nbr", F.lit(seed)), F.col("nbr"))
        .limit(1)
        .collect()
    )
    return int(row[0]["nbr"]) if row else None
