import pytest

from networkit_spark.graph import Graph
from networkit_spark.ids import compact_graph, remap_edges
from networkit_spark.operators.degrees import degree_centrality

from tests.fixtures import G8DEG_EDGES, G8DEG_N, G8DEG_SCORES, G8W_EDGES, G8W_N


def test_degree_centrality_selfloop_golden(spark):
    """test_centrality.py:10-28 golden: self-loop counts once."""
    g = Graph.of(spark, G8DEG_EDGES, n=G8DEG_N)
    got = {r["id"]: r["score"] for r in degree_centrality(g).collect()}
    assert [int(got[i]) for i in range(G8DEG_N)] == G8DEG_SCORES


def test_counts_and_weights(spark):
    g = Graph.of(spark, G8W_EDGES, n=G8W_N, weighted=True)
    assert g.num_nodes() == 8
    assert g.num_edges() == 9
    assert g.num_self_loops() == 0
    assert g.total_edge_weight() == pytest.approx(sum(w for _, _, w in G8W_EDGES))


def test_selfloop_counting(spark):
    g = Graph.of(spark, [(0, 0), (0, 1)], n=2)
    assert g.num_edges() == 2
    assert g.num_self_loops() == 1
    assert g.total_edge_weight() == pytest.approx(2.0)


def test_degrees_weighted_out(spark):
    """weightedDegree = weighted OUT-degree (Graph.cpp:540-544)."""
    g = Graph.of(spark, [(0, 1, 2.0), (0, 2, 3.0), (2, 1, 1.0)], n=3,
                 directed=True, weighted=True)
    d = {r["id"]: (r["deg"], r["wdeg"]) for r in g.degrees().collect()}
    assert d[0] == (2, 5.0)
    assert d[1] == (0, 0.0)
    assert d[2] == (1, 1.0)
    ind = {r["id"]: r["in_deg"] for r in g.in_degrees().collect()}
    assert ind == {0: 0, 1: 2, 2: 1}


def test_transforms(spark):
    g = Graph.of(spark, [(0, 1), (1, 2)], n=4, directed=True)
    t = g.transpose()
    assert {(r["src"], r["dst"]) for r in t.edges.collect()} == {(1, 0), (2, 1)}
    u = g.to_undirected()
    assert u.num_edges() == 2 and not u.directed
    assert g.density() == pytest.approx(2 / 12)


def test_subgraph_from_nodes(spark):
    g = Graph.of(spark, [(0, 1), (1, 2), (2, 3), (3, 0)], n=4)
    sub = g.subgraph_from_nodes(g.nodes.filter("id < 3"))
    assert sub.num_nodes() == 3
    assert sub.num_edges() == 2  # (0,1) and (1,2)


def test_remap_and_compact(spark):
    e = spark.createDataFrame(
        [(100, 7), (7, 2000), (2000, 100)], "src long, dst long"
    )
    remapped, mapping = remap_edges(e)
    ids = {r["id"] for r in mapping.collect()}
    assert ids == {0, 1, 2}
    g = Graph.of(spark, [(5, 9), (9, 12)], directed=False)
    c = compact_graph(g)
    assert {r["id"] for r in c.nodes.collect()} == {0, 1, 2}
    assert c.num_edges() == 2


def test_assign_dense_ids_two_phase_order(spark):
    """Two-phase ranking must equal the global sort order at any bucket
    count (offsets + within-bucket rank == global rank)."""
    from networkit_spark.ids import assign_dense_ids

    vals = [(x,) for x in [50, 3, 99, 7, 7, 42, 0, 13, 99, 64]]
    df = spark.createDataFrame(vals, "key long")
    for buckets in (1, 3, 16):
        got = {
            r["key"]: r["id"]
            for r in assign_dense_ids(df, ["key"], buckets=buckets).collect()
        }
        expected = {k: i for i, k in enumerate(sorted({x for (x,) in vals}))}
        assert got == expected, (buckets, got)


def test_assign_dense_ids_empty(spark):
    from networkit_spark.ids import assign_dense_ids

    df = spark.createDataFrame([], "key long")
    assert assign_dense_ids(df, ["key"]).count() == 0


def test_compact_labels_two_phase(spark):
    from networkit_spark.operators.community_quality import compact_labels

    rows = [(i, l) for i, l in enumerate([900, 5, 5, 17, 900, 2, 17, 2, 2])]
    labels = spark.createDataFrame(rows, "node long, label long")
    got = {r["node"]: r["label"] for r in compact_labels(labels).collect()}
    # ascending old-label order: 2->0, 5->1, 17->2, 900->3
    exp_map = {2: 0, 5: 1, 17: 2, 900: 3}
    for node, old in rows:
        assert got[node] == exp_map[old]


def test_partition_roundtrip_and_text_reader(spark, tmp_path):
    from networkit_spark.sources.readers import (
        read_partition,
        read_partition_text,
        write_partition,
    )

    labels = spark.createDataFrame(
        [(i, i % 3) for i in range(9)], "node long, label long"
    )
    p = str(tmp_path / "part.parquet")
    write_partition(labels, p)
    got = {r["node"]: r["label"] for r in read_partition(spark, p).collect()}
    assert got == {i: i % 3 for i in range(9)}

    txt = tmp_path / "part.txt"
    txt.write_text("\n".join(str(i % 2) for i in range(6)) + "\n")
    got2 = {r["node"]: r["label"] for r in read_partition_text(spark, str(txt)).collect()}
    assert got2 == {i: i % 2 for i in range(6)}
