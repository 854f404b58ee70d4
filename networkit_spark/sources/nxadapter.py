"""NetworkX compatibility bridge (``networkit/nxadapter.py``).

``from_networkx`` (the reference's ``nx2nk``) maps arbitrary NetworkX
node ids to consecutive numeric ids in ``nxG.nodes()`` iteration order
and builds the edge DataFrame; ``to_networkx`` (``nk2nx``) materializes
the canonical edge list into a ``networkx`` graph. Both are driver-side
by nature — NetworkX graphs ARE driver objects — so these are
small-graph interchange paths, not the 100 TB route (that is Parquet).
Import-gated: raises ImportError with the reference's message shape if
networkx is absent.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from networkit_spark.graph import Graph


def _require_nx():
    try:
        import networkx as nx
    except ImportError as exc:  # pragma: no cover
        raise ImportError("MissingDependency: networkx") from exc
    return nx


def from_networkx(spark: SparkSession, nx_graph, weight_attr: str | None = None) -> Graph:
    """``nxadapter.nx2nk``: NetworkX graph → :class:`Graph`, node ids
    remapped to 0..n−1 in ``nodes()`` iteration order; ``weight_attr``
    selects the edge attribute used as weight (unweighted otherwise)."""
    _require_nx()
    idmap = {nid: u for u, nid in enumerate(nx_graph.nodes())}
    n = len(idmap)
    rows = []
    for u_, v_ in nx_graph.edges():
        w = float(nx_graph[u_][v_][weight_attr]) if weight_attr is not None else 1.0
        rows.append((idmap[u_], idmap[v_], w))
    edges = spark.createDataFrame(rows, "src long, dst long, weight double")
    nodes = spark.range(n).select(F.col("id"))
    return Graph.from_edges(
        edges,
        directed=bool(nx_graph.is_directed()),
        weighted=weight_attr is not None,
        nodes=nodes,
    )


def to_networkx(g: Graph):
    """``nxadapter.nk2nx``: :class:`Graph` → ``networkx`` graph
    (DiGraph when directed; weights carried when g is weighted)."""
    nx = _require_nx()
    out = nx.DiGraph() if g.directed else nx.Graph()
    out.add_nodes_from(int(r["id"]) for r in g.nodes.collect())
    e = g.edges if g.directed else g.edges.filter(F.col("src") <= F.col("dst"))
    for r in e.collect():
        if g.weighted:
            out.add_edge(int(r["src"]), int(r["dst"]), weight=float(r["weight"]))
        else:
            out.add_edge(int(r["src"]), int(r["dst"]))
    return out
