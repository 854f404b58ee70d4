"""Exchange-format bridges: Thrill binary, graph-tool binary, GEXF.

These close the reference's remaining IO surface (previously a
survey-sanctioned cut): ``io/ThrillGraphBinaryReader.cpp`` /
``ThrillGraphBinaryWriter.cpp``, ``io/GraphToolBinaryReader.cpp`` /
``GraphToolBinaryWriter.cpp``, and the Python-layer ``GEXFIO.py``
(static graphs; dynamic event streams round-trip through our DGS parser
and event replay instead, ``streaming/dynamics.py``).

Scale posture: all three are single-file exchange containers with
sequential variable-length records and NO chunk offset table, so unlike
the native chunked ``.nkb`` (``sources/nkb.py``) they cannot be
byte-range-parallelized; they are decoded/encoded driver-side with
numpy-vectorized fixed-width segments where the format allows, and the
resulting edge list is immediately distributed. They are import/export
bridges — the scale paths in and out of this engine are Parquet
adjacency and chunk-parallel ``.nkb``.

Format facts used here (learned from the reference sources, reimplemented):
- Thrill: per node ``u`` in 0..n-1, LEB128 degree then degree uint32-LE
  neighbor ids; undirected graphs store each edge once as a half-edge on
  the SMALLER endpoint's list (writer keeps ``v`` with ``u <= v``;
  ``ThrillGraphBinaryWriter.cpp:28``, reader symmetrizes).
- graph-tool: magic ``e2 9b be 20 67 74`` + version 0x01 + endian byte,
  uint64 comment length + comment, directed byte, uint64 n, then per
  node uint64 degree + fixed-width neighbor ids (width 1/2/4/8 bytes by
  n; ``GraphToolBinaryReader.cpp:88-97``). Undirected stores ``v <= u``.
- GEXF 1.2draft XML: ``<graph defaultedgetype=...><nodes><node id=../>
  <edges><edge source=.. target=.. [weight=..]/>`` (``GEXFIO.py:259``).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from networkit_spark.graph import Graph

_GT_MAGIC = bytes([0xE2, 0x9B, 0xBE, 0x20, 0x67, 0x74])


def _adj_lists(g: Graph, smaller_endpoint: bool) -> tuple[int, list[np.ndarray]]:
    """Driver-side per-node neighbor arrays in node order.

    Assumes dense node ids 0..n-1 (``ids.compact_graph`` first
    otherwise — same contract as ``write_metis``).

    ``smaller_endpoint=True``: undirected half-edges kept on the smaller
    id's list (Thrill convention, ``v >= u``); ``False``: kept on the
    larger id's list (graph-tool convention, ``v <= u``). Directed
    graphs always use out-neighbors.
    """
    n = g.num_nodes()
    if g.directed:
        e = g.edges.select("src", "dst")
    elif smaller_endpoint:
        e = g.edges.filter(F.col("dst") >= F.col("src")).select("src", "dst")
    else:
        e = g.edges.filter(F.col("dst") <= F.col("src")).select("src", "dst")
    pdf = e.orderBy("src", "dst").toPandas()
    us = pdf["src"].to_numpy()
    vs = pdf["dst"].to_numpy()
    starts = np.searchsorted(us, np.arange(n), side="left")
    ends = np.searchsorted(us, np.arange(n), side="right")
    return n, [vs[starts[i] : ends[i]] for i in range(n)]


# ---------------------------------------------------------------- thrill
def write_thrill(g: Graph, path: str) -> None:
    """ThrillGraphBinaryWriter (``io/ThrillGraphBinaryWriter.cpp:13``).

    Undirected only in the reference (a serialized DIA of uint32
    vectors); node ids must fit uint32.
    """
    if g.directed:
        raise ValueError("Thrill binary graphs are undirected")
    n, adj = _adj_lists(g, smaller_endpoint=True)
    if n > (1 << 32) - 1:
        raise ValueError("Thrill binary graphs support at most 2^32-1 nodes")
    out = bytearray()
    for nbrs in adj:
        deg = len(nbrs)
        if not deg:
            out.append(0)
        while deg:
            low, deg = deg & 0x7F, deg >> 7
            out.append(low | (0x80 if deg else 0))
        out += nbrs.astype("<u4").tobytes()
    with open(path, "wb") as f:
        f.write(bytes(out))


def read_thrill(spark: SparkSession, path: str, n: int = 0) -> Graph:
    """ThrillGraphBinaryReader (``io/ThrillGraphBinaryReader.cpp:47``)."""
    raw = open(path, "rb").read()
    pos, u = 0, 0
    us: list[int] = []
    all_vs: list[np.ndarray] = []
    max_v = -1
    while pos < len(raw):
        deg, shift = 0, 0
        while True:
            b = raw[pos]
            pos += 1
            deg |= (b & 0x7F) << shift
            shift += 7
            if not (b & 0x80):
                break
        vs = np.frombuffer(raw, dtype="<u4", count=deg, offset=pos)
        pos += 4 * deg
        if deg:
            us.extend([u] * deg)
            all_vs.append(vs)
            max_v = max(max_v, int(vs.max()))
        u += 1
    n_total = max(u, max_v + 1, n)
    edges = spark.createDataFrame(
        pd.DataFrame(
            {
                "src": np.asarray(us, dtype="int64"),
                "dst": (
                    np.concatenate(all_vs).astype("int64")
                    if all_vs
                    else np.array([], dtype="int64")
                ),
            }
        ),
        "src long, dst long",
    )
    return Graph.from_edges(
        edges, directed=False, weighted=False,
        nodes=spark.range(n_total).select("id"),
    )


# ------------------------------------------------------------- graph-tool
def _gt_width(n: int) -> int:
    for width, bound in ((1, 8), (2, 16), (4, 32)):
        if n < (1 << bound):
            return width
    return 8


def write_graphtool_binary(g: Graph, path: str, comment: str = "") -> None:
    """GraphToolBinaryWriter (``io/GraphToolBinaryWriter.cpp:17``):
    little-endian, empty comment, undirected keeps ``v <= u``."""
    n, adj = _adj_lists(g, smaller_endpoint=False)
    width = _gt_width(n)
    cmt = comment.encode()
    with open(path, "wb") as f:
        f.write(_GT_MAGIC + bytes([0x01, 0x00]))
        f.write(len(cmt).to_bytes(8, "little") + cmt)
        f.write(bytes([1 if g.directed else 0]))
        f.write(n.to_bytes(8, "little"))
        for nbrs in adj:
            f.write(len(nbrs).to_bytes(8, "little"))
            f.write(nbrs.astype(f"<u{width}").tobytes())


def read_graphtool_binary(spark: SparkSession, path: str) -> Graph:
    """GraphToolBinaryReader (``io/GraphToolBinaryReader.cpp:15``)."""
    raw = open(path, "rb").read()
    if raw[:6] != _GT_MAGIC or raw[6] != 0x01:
        raise ValueError("broken graph-tool binary header")
    if raw[7] not in (0x00, 0x01):
        raise ValueError("bad endianness byte")
    bo = "little" if raw[7] == 0x00 else "big"
    pos = 8
    clen = int.from_bytes(raw[pos : pos + 8], bo)
    pos += 8 + clen
    directed = bool(raw[pos])
    pos += 1
    n = int.from_bytes(raw[pos : pos + 8], bo)
    pos += 8
    width = _gt_width(n)
    dt = np.dtype(f"u{width}").newbyteorder("<" if bo == "little" else ">")
    us: list[int] = []
    all_vs: list[np.ndarray] = []
    for u in range(n):
        deg = int.from_bytes(raw[pos : pos + 8], bo)
        pos += 8
        vs = np.frombuffer(raw, dtype=dt, count=deg, offset=pos)
        pos += width * deg
        if deg:
            us.extend([u] * deg)
            all_vs.append(vs)
    edges = spark.createDataFrame(
        pd.DataFrame(
            {
                "src": np.asarray(us, dtype="int64"),
                "dst": (
                    np.concatenate(all_vs).astype("int64")
                    if all_vs
                    else np.array([], dtype="int64")
                ),
            }
        ),
        "src long, dst long",
    )
    return Graph.from_edges(
        edges, directed=directed, weighted=False,
        nodes=spark.range(n).select("id"),
    )


# ----------------------------------------------------- binary partitions
def write_binary_partition(labels, path: str, width: int = 8) -> None:
    """BinaryPartitionWriter (``io/BinaryPartitionWriter.cpp:13``): the
    label of node i as the i-th ``width``-byte little-endian integer.
    Node ids must be dense 0..n-1."""
    if width not in (4, 8):
        raise ValueError("Only width 4 and 8 are supported")
    pdf = labels.select("node", "label").orderBy("node").toPandas()
    vals = pdf["label"].to_numpy()
    if width == 4 and (vals > 0xFFFFFFFF).any():
        raise ValueError("labels exceed uint32; use width=8")
    with open(path, "wb") as f:
        f.write(vals.astype(f"<u{width}").tobytes())


def read_binary_partition(spark: SparkSession, path: str, width: int = 8):
    """BinaryPartitionReader (``io/BinaryPartitionReader.cpp:13``) →
    (node, label) DataFrame. Fixed-width records decode as one numpy
    view — no per-record loop."""
    if width not in (4, 8):
        raise ValueError("Only 4 and 8 are supported widths")
    arr = np.fromfile(path, dtype=f"<u{width}")
    return spark.createDataFrame(
        pd.DataFrame(
            {"node": np.arange(len(arr), dtype="int64"),
             "label": arr.astype("int64")}
        ),
        "node long, label long",
    )


def write_binary_edge_list_partition(
    labels, path: str, first_node: int = 0, width: int = 8
) -> None:
    """BinaryEdgeListPartitionWriter
    (``io/BinaryEdgeListPartitionWriter.cpp:13``): (node+firstNode,
    label) pairs as ``width``-byte little-endian integers in node
    order."""
    if width not in (4, 8):
        raise ValueError("Width must be 4 or 8")
    pdf = labels.select("node", "label").orderBy("node").toPandas()
    nodes = pdf["node"].to_numpy() + first_node
    vals = pdf["label"].to_numpy()
    if width == 4 and ((nodes > 0xFFFFFFFF).any() or (vals > 0xFFFFFFFF).any()):
        raise ValueError("ids/labels exceed uint32; use width=8")
    arr = np.empty(2 * len(pdf), dtype=f"<u{width}")
    arr[0::2] = nodes
    arr[1::2] = vals
    with open(path, "wb") as f:
        f.write(arr.tobytes())


def read_binary_edge_list_partition(
    spark: SparkSession, path: str, first_node: int = 0, width: int = 8
):
    """Inverse of ``write_binary_edge_list_partition`` (the reference
    ships only the writer; KaHIP-style tools read it) → (node, label)."""
    if width not in (4, 8):
        raise ValueError("Width must be 4 or 8")
    arr = np.fromfile(path, dtype=f"<u{width}")
    return spark.createDataFrame(
        pd.DataFrame(
            {"node": arr[0::2].astype("int64") - first_node,
             "label": arr[1::2].astype("int64")}
        ),
        "node long, label long",
    )


# ------------------------------------------------------------------ gexf
def write_gexf(g: Graph, path: str) -> None:
    """Static GEXF 1.2draft writer (``GEXFIO.py:259`` semantics: node ids
    0..n-1, one edge element per edge, weight attribute when weighted)."""
    root = ET.Element("gexf", {"version": "1.2"})
    ge = ET.SubElement(
        root,
        "graph",
        {
            "defaultedgetype": "directed" if g.directed else "undirected",
            "mode": "static",
        },
    )
    nodes_el = ET.SubElement(ge, "nodes")
    for r in g.nodes.orderBy("id").collect():
        ET.SubElement(nodes_el, "node", {"id": str(r.id)})
    edges_el = ET.SubElement(ge, "edges")
    e = (
        g.edges
        if g.directed
        else g.edges.filter(F.col("src") <= F.col("dst"))
    )
    for i, r in enumerate(e.orderBy("src", "dst").collect()):
        attrs = {"id": str(i), "source": str(r.src), "target": str(r.dst)}
        if g.weighted:
            attrs["weight"] = repr(r.weight)
        ET.SubElement(edges_el, "edge", attrs)
    ET.ElementTree(root).write(path, encoding="utf-8", xml_declaration=True)


def read_gexf(spark: SparkSession, path: str) -> Graph:
    """Static GEXF reader (``GEXFIO.py:8`` semantics, minus dynamics —
    event streams are handled by the DGS parser + replay instead).
    Namespace-agnostic; node ids may be arbitrary strings (remapped to
    dense ids in document order like the reference's id mapping)."""
    tree = ET.parse(path)

    def local(tag: str) -> str:
        return tag.rsplit("}", 1)[-1]

    graph_el = next(el for el in tree.iter() if local(el.tag) == "graph")
    directed = graph_el.get("defaultedgetype", "undirected") == "directed"
    ids: dict[str, int] = {}
    for el in tree.iter():
        if local(el.tag) == "node":
            ids.setdefault(el.get("id"), len(ids))
    rows = []
    weighted = False
    for el in tree.iter():
        if local(el.tag) == "edge":
            w = el.get("weight")
            weighted = weighted or w is not None
            for key in (el.get("source"), el.get("target")):
                ids.setdefault(key, len(ids))
            rows.append(
                (ids[el.get("source")], ids[el.get("target")],
                 float(w) if w is not None else 1.0)
            )
    edges = spark.createDataFrame(
        rows or [(0, 0, 0.0)], "src long, dst long, weight double"
    )
    if not rows:
        edges = edges.filter(F.lit(False))
    return Graph.from_edges(
        edges,
        directed=directed,
        weighted=weighted,
        nodes=spark.range(len(ids)).select("id"),
    )


# ---------------------------------------------------------------------------
# DibaP binary format (io/DibapGraphReader.cpp — read side only in the
# reference; the writer here is the exact inverse for round-trips)
# ---------------------------------------------------------------------------


def read_dibap(spark: SparkSession, path: str) -> Graph:
    """DibapGraphReader (``io/DibapGraphReader.cpp:15-140``): big-endian
    binary — magic short 'GI', int V, dvw (+V·dvw vertex weights),
    CSR offsets of[V+1], adjacency to[of[V]], dew (+edge weights), dxy
    (+V·dxy float32 coordinates, ignored here). Both orientations are
    stored; edges keep the v ≤ to[e] canonical copy like the reference
    (``:120-136``). Header parse is driver-side (a sequential binary
    layout); the edge list lands in a DataFrame."""
    import struct

    with open(path, "rb") as f:
        data = f.read()
    off = 0
    (magic,) = struct.unpack_from(">h", data, off)
    off += 2
    if magic != (ord("G") << 8 | ord("I")):
        raise ValueError("bad file structure")
    (v_count,) = struct.unpack_from(">i", data, off)
    off += 4
    (dvw,) = struct.unpack_from(">i", data, off)
    off += 4
    if dvw > 0:
        off += 4 * v_count * dvw  # vertex weights (unused, like the reference)
    of_arr = struct.unpack_from(f">{v_count + 1}i", data, off)
    off += 4 * (v_count + 1)
    num_e2 = of_arr[v_count]
    to = struct.unpack_from(f">{num_e2}i", data, off)
    off += 4 * num_e2
    (dew,) = struct.unpack_from(">i", data, off)
    off += 4
    ew = None
    if dew > 0:
        ew = struct.unpack_from(f">{num_e2 * dew}i", data, off)
        off += 4 * num_e2 * dew
    rows = []
    for v in range(v_count):
        for e in range(of_arr[v], of_arr[v + 1]):
            if v <= to[e]:
                w = float(ew[e]) if ew is not None else 1.0
                rows.append((v, int(to[e]), w))
    edges = spark.createDataFrame(rows, "src long, dst long, weight double")
    nodes = spark.range(v_count).select(F.col("id"))
    return Graph.from_edges(
        edges, directed=False, weighted=ew is not None, nodes=nodes
    )


def write_dibap(g: Graph, path: str, with_weights: bool = False) -> None:
    """Exact inverse of :func:`read_dibap` (big-endian 'GI' layout,
    integer edge weights when ``with_weights``)."""
    import struct

    can = g.edges.filter(F.col("src") <= F.col("dst")).select(
        "src", "dst", "weight"
    )
    rows = [(int(r["src"]), int(r["dst"]), float(r["weight"])) for r in can.collect()]
    nv = g.num_nodes()
    adj: list[list[tuple[int, float]]] = [[] for _ in range(nv)]
    for u, v, w in rows:
        adj[u].append((v, w))
        if u != v:
            adj[v].append((u, w))
    for lst in adj:
        lst.sort()
    with open(path, "wb") as f:
        f.write(struct.pack(">h", (ord("G") << 8 | ord("I"))))
        f.write(struct.pack(">i", nv))
        f.write(struct.pack(">i", 0))  # dvw
        offs = [0]
        for lst in adj:
            offs.append(offs[-1] + len(lst))
        f.write(struct.pack(f">{nv + 1}i", *offs))
        flat = [v for lst in adj for v, _ in lst]
        if flat:
            f.write(struct.pack(f">{len(flat)}i", *flat))
        if with_weights:
            f.write(struct.pack(">i", 1))
            ws = [int(w) for lst in adj for _, w in lst]
            if ws:
                f.write(struct.pack(f">{len(ws)}i", *ws))
        else:
            f.write(struct.pack(">i", 0))
        f.write(struct.pack(">i", 0))  # dxy
