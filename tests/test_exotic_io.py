"""Thrill / graph-tool binary / GEXF bridges — byte-level goldens and
round-trips (reference: io/ThrillGraphBinary*, io/GraphToolBinary*,
GEXFIO.py)."""

import pytest

from networkit_spark.graph import Graph
from networkit_spark.sources.exotic import (
    read_gexf,
    read_graphtool_binary,
    read_thrill,
    write_gexf,
    write_graphtool_binary,
    write_thrill,
)


def canon(g):
    rows = g.edges.collect()
    if g.directed:
        return sorted((r.src, r.dst) for r in rows)
    return sorted((r.src, r.dst) for r in rows if r.src <= r.dst)


def test_thrill_golden_bytes(spark, tmp_path):
    # path 0-1-2: half-edges live on the SMALLER endpoint's list
    # (ThrillGraphBinaryWriter.cpp:28: u's list keeps v with u <= v).
    g = Graph.of(spark, [(0, 1), (1, 2)], n=3)
    p = str(tmp_path / "g.thrill")
    write_thrill(g, p)
    raw = open(p, "rb").read()
    assert raw == (
        b"\x01" + (1).to_bytes(4, "little")  # node 0: deg 1, [1]
        + b"\x01" + (2).to_bytes(4, "little")  # node 1: deg 1, [2]
        + b"\x00"  # node 2: deg 0
    )


def test_thrill_roundtrip(spark, tmp_path):
    g = Graph.of(spark, [(0, 1), (1, 2), (2, 3), (0, 3), (1, 1)], n=5)
    p = str(tmp_path / "g.thrill")
    write_thrill(g, p)
    h = read_thrill(spark, p)
    assert not h.directed
    assert h.num_nodes() == 5
    assert canon(h) == canon(g)


def test_thrill_directed_raises(spark, tmp_path):
    g = Graph.of(spark, [(0, 1)], n=2, directed=True)
    with pytest.raises(ValueError, match="undirected"):
        write_thrill(g, str(tmp_path / "x.thrill"))


def test_thrill_large_degree_leb128(spark, tmp_path):
    # degree 200 needs a 2-byte LEB128 varint
    edges = [(0, v) for v in range(1, 201)]
    g = Graph.of(spark, edges, n=201)
    p = str(tmp_path / "star.thrill")
    write_thrill(g, p)
    raw = open(p, "rb").read()
    assert raw[0] == (200 & 0x7F) | 0x80 and raw[1] == 200 >> 7
    h = read_thrill(spark, p)
    assert canon(h) == canon(g)


def test_graphtool_golden_header(spark, tmp_path):
    g = Graph.of(spark, [(0, 1), (1, 2)], n=3)
    p = str(tmp_path / "g.gt")
    write_graphtool_binary(g, p)
    raw = open(p, "rb").read()
    assert raw[:8] == bytes([0xE2, 0x9B, 0xBE, 0x20, 0x67, 0x74, 0x01, 0x00])
    assert raw[8:16] == (0).to_bytes(8, "little")  # empty comment
    assert raw[16] == 0  # undirected
    assert raw[17:25] == (3).to_bytes(8, "little")
    # undirected keeps v <= u: node 0 [], node 1 [0], node 2 [1]; width 1
    assert raw[25:] == (
        (0).to_bytes(8, "little")
        + (1).to_bytes(8, "little") + b"\x00"
        + (1).to_bytes(8, "little") + b"\x01"
    )


def test_graphtool_roundtrip_directed(spark, tmp_path):
    g = Graph.of(spark, [(0, 1), (1, 0), (1, 2), (2, 2)], n=4, directed=True)
    p = str(tmp_path / "d.gt")
    write_graphtool_binary(g, p)
    h = read_graphtool_binary(spark, p)
    assert h.directed and h.num_nodes() == 4
    assert canon(h) == canon(g)


def test_graphtool_roundtrip_width2(spark, tmp_path):
    # n=300 forces 2-byte neighbor ids
    edges = [(i, i + 1) for i in range(299)]
    g = Graph.of(spark, edges, n=300)
    p = str(tmp_path / "w2.gt")
    write_graphtool_binary(g, p)
    h = read_graphtool_binary(spark, p)
    assert h.num_nodes() == 300
    assert canon(h) == canon(g)


def test_graphtool_bad_header(spark, tmp_path):
    p = str(tmp_path / "bad.gt")
    open(p, "wb").write(b"\x00" * 32)
    with pytest.raises(ValueError, match="header"):
        read_graphtool_binary(spark, p)


def test_binary_partition_roundtrip(spark, tmp_path):
    from networkit_spark.sources.exotic import (
        read_binary_partition,
        write_binary_partition,
    )

    labels = spark.createDataFrame(
        [(0, 2), (1, 2), (2, 0), (3, 5)], "node long, label long"
    )
    for width in (4, 8):
        p = str(tmp_path / f"p{width}.bin")
        write_binary_partition(labels, p, width=width)
        import os

        assert os.path.getsize(p) == 4 * width
        got = read_binary_partition(spark, p, width=width)
        assert sorted((r.node, r.label) for r in got.collect()) == [
            (0, 2), (1, 2), (2, 0), (3, 5),
        ]


def test_binary_edge_list_partition_roundtrip(spark, tmp_path):
    from networkit_spark.sources.exotic import (
        read_binary_edge_list_partition,
        write_binary_edge_list_partition,
    )

    labels = spark.createDataFrame(
        [(0, 7), (1, 0), (2, 7)], "node long, label long"
    )
    p = str(tmp_path / "elp.bin")
    write_binary_edge_list_partition(labels, p, first_node=1, width=4)
    raw = open(p, "rb").read()
    # node-order (node+1, label) uint32 pairs
    assert raw[:8] == (1).to_bytes(4, "little") + (7).to_bytes(4, "little")
    got = read_binary_edge_list_partition(spark, p, first_node=1, width=4)
    assert sorted((r.node, r.label) for r in got.collect()) == [
        (0, 7), (1, 0), (2, 7),
    ]


def test_gexf_roundtrip_weighted(spark, tmp_path):
    g = Graph.of(
        spark, [(0, 1, 2.5), (1, 2, 0.25), (2, 0, 4.0)], n=4, weighted=True
    )
    p = str(tmp_path / "g.gexf")
    write_gexf(g, p)
    h = read_gexf(spark, p)
    assert not h.directed and h.weighted
    assert h.num_nodes() == 4
    got = sorted(
        (r.src, r.dst, r.weight) for r in h.edges.collect() if r.src <= r.dst
    )
    want = sorted(
        (r.src, r.dst, r.weight) for r in g.edges.collect() if r.src <= r.dst
    )
    assert got == want


def test_gexf_roundtrip_directed(spark, tmp_path):
    g = Graph.of(spark, [(0, 1), (1, 2), (2, 0)], n=3, directed=True)
    p = str(tmp_path / "d.gexf")
    write_gexf(g, p)
    h = read_gexf(spark, p)
    assert h.directed and canon(h) == canon(g)


def test_gexf_namespaced_string_ids(spark, tmp_path):
    # foreign GEXF: xmlns + non-numeric ids (document-order dense remap)
    xml = """<?xml version="1.0" encoding="UTF-8"?>
<gexf xmlns="http://www.gexf.net/1.2draft" version="1.2">
  <graph defaultedgetype="undirected" mode="static">
    <nodes><node id="a"/><node id="b"/><node id="c"/></nodes>
    <edges>
      <edge id="0" source="a" target="b"/>
      <edge id="1" source="b" target="c" weight="3.5"/>
    </edges>
  </graph>
</gexf>"""
    p = str(tmp_path / "ns.gexf")
    open(p, "w").write(xml)
    h = read_gexf(spark, p)
    assert h.num_nodes() == 3 and not h.directed and h.weighted
    assert canon(h) == [(0, 1), (1, 2)]
    w = {(r.src, r.dst): r.weight for r in h.edges.collect()}
    assert w[(1, 2)] == 3.5 and w[(0, 1)] == 1.0


def test_edge_list_partition_roundtrip(spark, tmp_path):
    from networkit_spark.sources.readers import (
        read_binary_edge_list_partition,
        read_edge_list_cover,
        read_edge_list_partition,
        read_snap_edge_list_partition,
        write_binary_edge_list_partition,
        write_edge_list_partition,
    )
    from pyspark.sql import functions as F

    labels = spark.createDataFrame(
        [(0, 3), (1, 3), (2, 7), (3, 1)], "node long, label long"
    )
    p = str(tmp_path / "elp")
    write_edge_list_partition(labels, p, first_node=1)
    back = {
        (int(r["node"]), int(r["label"]))
        for r in read_edge_list_partition(spark, p, first_node=1).collect()
    }
    assert back == {(0, 3), (1, 3), (2, 7), (3, 1)}

    cov = str(tmp_path / "cov.txt")
    with open(cov, "w") as f:
        f.write("# comment\n1 0 2\n2 1\n4 0 1 2\n")
    got = {
        (int(r["node"]), int(r["subset"]))
        for r in read_edge_list_cover(spark, cov, first_node=1).collect()
    }
    assert got == {(0, 0), (0, 2), (1, 1), (3, 0), (3, 1), (3, 2)}

    snap = str(tmp_path / "snap.txt")
    with open(snap, "w") as f:
        f.write("# hdr\n10 20 30\n\n40 10\n")
    sg = {
        (int(r["node"]), int(r["subset"]))
        for r in read_snap_edge_list_partition(spark, snap).collect()
    }
    # line numbers are 1-based and count comments/blanks
    assert sg == {(10, 2), (20, 2), (30, 2), (40, 4), (10, 4)}

    for width in (4, 8):
        b = str(tmp_path / f"bin{width}")
        write_binary_edge_list_partition(labels, b, first_node=5, width=width)
        rb = {
            (int(r["node"]), int(r["label"]))
            for r in read_binary_edge_list_partition(
                spark, b, first_node=5, width=width
            ).collect()
        }
        assert rb == {(0, 3), (1, 3), (2, 7), (3, 1)}
    import pytest

    with pytest.raises(ValueError):
        write_binary_edge_list_partition(labels, str(tmp_path / "x"), width=3)


def test_dibap_roundtrip(spark, tmp_path):
    import struct

    import pytest
    from networkit_spark.graph import Graph
    from networkit_spark.sources.exotic import read_dibap, write_dibap
    from pyspark.sql import functions as F

    g = Graph.of(spark, [(0, 1, 2.0), (1, 2, 3.0), (0, 3, 1.0), (2, 2, 4.0)],
                 weighted=True, n=5)
    p = str(tmp_path / "g.dibap")
    write_dibap(g, p, with_weights=True)
    back = read_dibap(spark, p)
    a = {
        (int(r["src"]), int(r["dst"]), float(r["weight"]))
        for r in back.edges.filter(F.col("src") <= F.col("dst")).collect()
    }
    assert a == {(0, 1, 2.0), (1, 2, 3.0), (0, 3, 1.0), (2, 2, 4.0)}
    assert back.nodes.count() == 5  # isolated node 4 preserved via V
    # unweighted path
    write_dibap(g, p)
    back2 = read_dibap(spark, p)
    assert not back2.weighted
    assert back2.edges.filter(F.col("src") <= F.col("dst")).count() == 4
    # bad magic raises
    bad = str(tmp_path / "bad")
    with open(bad, "wb") as f:
        f.write(struct.pack(">h", 0x5858))
    with pytest.raises(ValueError, match="bad file structure"):
        read_dibap(spark, bad)


def test_networkx_adapter_roundtrip(spark):
    import networkx as nx
    from networkit_spark.operators.pagerank import pagerank
    from networkit_spark.sources.nxadapter import from_networkx, to_networkx
    from pyspark.sql import functions as F

    nxg = nx.Graph()
    nxg.add_edge("a", "b", w=2.0)
    nxg.add_edge("b", "c", w=3.0)
    nxg.add_node("iso")
    g = from_networkx(spark, nxg, weight_attr="w")
    assert g.num_nodes() == 4 and g.weighted and not g.directed
    e = {
        (int(r["src"]), int(r["dst"])): float(r["weight"])
        for r in g.edges.filter(F.col("src") <= F.col("dst")).collect()
    }
    # "a"->0, "b"->1, "c"->2 in nodes() order
    assert e == {(0, 1): 2.0, (1, 2): 3.0}
    back = to_networkx(g)
    assert back.number_of_nodes() == 4 and back.number_of_edges() == 2
    assert back[0][1]["weight"] == 2.0
    # directed path
    d = nx.DiGraph()
    d.add_edge(5, 7)
    gd = from_networkx(spark, d)
    assert gd.directed and to_networkx(gd).has_edge(0, 1)
    # interchange sanity: pagerank runs on the imported graph
    assert pagerank(g, max_iterations=3).scores.count() == 4
