"""Named Graph mutation views (graph.pyx addNode/removeNode/restoreNode/
addEdge/removeEdge/setWeight/increaseWeight) and the exact removal-position
semantics of node removals inside the GraphUpdater fold."""

from networkit_spark.graph import Graph
from networkit_spark.streaming.dynamics import apply_events


def events_of(spark, rows):
    return spark.createDataFrame(
        rows, "seq long, type string, u long, v long, w double"
    )


def edge_set(g):
    return {(r.src, r.dst) for r in g.edges.filter("src <= dst").collect()}


def test_remove_then_restore_drops_former_edges(spark):
    # NetworKit: removeNode deletes incident edges; restoreNode brings the
    # id back EDGELESS. The old fold resurrected pre-removal edges.
    g = Graph.of(spark, [(0, 1), (1, 2), (2, 0)], n=3)
    g2 = g.remove_nodes([1]).restore_nodes([1])
    assert sorted(r.id for r in g2.nodes.collect()) == [0, 1, 2]
    assert edge_set(g2) == {(0, 2)}


def test_restore_then_add_edge_works(spark):
    g = Graph.of(spark, [(0, 1), (1, 2)], n=3)
    g2 = g.remove_nodes([1]).restore_nodes([1]).add_edges([(1, 2)])
    assert edge_set(g2) == {(1, 2)}
    assert g2.num_nodes() == 3


def test_node_removal_position_interleaves_with_edge_events(spark):
    # seq 1: add (0,1); seq 2: remove node 0 (drops it); seq 3: restore;
    # seq 4: re-add (0,1) → the edge exists with the seq-4 weight.
    g = Graph.of(spark, [], n=2, weighted=True)
    ev = events_of(spark, [
        (1, "EDGE_ADDITION", 0, 1, 5.0),
        (2, "NODE_REMOVAL", 0, None, None),
        (3, "NODE_RESTORATION", 0, None, None),
        (4, "EDGE_ADDITION", 0, 1, 7.0),
    ])
    g2 = apply_events(g, ev)
    rows = {(r.src, r.dst): r.weight for r in g2.edges.filter("src < dst").collect()}
    assert rows == {(0, 1): 7.0}
    # and WITHOUT the re-add the edge stays gone even though 0 is back
    g3 = apply_events(g, events_of(spark, [
        (1, "EDGE_ADDITION", 0, 1, 5.0),
        (2, "NODE_REMOVAL", 0, None, None),
        (3, "NODE_RESTORATION", 0, None, None),
    ]))
    assert g3.edges.count() == 0
    assert g3.num_nodes() == 2


def test_add_remove_nodes_named_methods(spark):
    g = Graph.of(spark, [(0, 1)], n=2)
    g2 = g.add_nodes([5, 6])
    assert sorted(r.id for r in g2.nodes.collect()) == [0, 1, 5, 6]
    g3 = g2.remove_nodes([1])
    assert sorted(r.id for r in g3.nodes.collect()) == [0, 5, 6]
    assert g3.edges.count() == 0


def test_edge_weight_named_methods(spark):
    g = Graph.of(spark, [(0, 1, 2.0)], n=3, weighted=True)
    g2 = (
        g.add_edges([(1, 2, 4.0)])
        .set_weights([(0, 1, 9.0)])
        .increase_weights([(1, 2, 0.5)])
    )
    rows = {(r.src, r.dst): r.weight for r in g2.edges.filter("src < dst").collect()}
    assert rows == {(0, 1): 9.0, (1, 2): 4.5}
    g3 = g2.remove_edges([(0, 1)])
    assert edge_set(g3) == {(1, 2)}


def test_directed_node_removal_interleaving(spark):
    g = Graph.of(spark, [(0, 1), (1, 0), (2, 1)], n=3, directed=True)
    g2 = g.remove_nodes([0]).restore_nodes([0]).add_edges([(0, 1)])
    got = sorted((r.src, r.dst) for r in g2.edges.collect())
    assert got == [(0, 1), (2, 1)]
