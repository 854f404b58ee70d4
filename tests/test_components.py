import numpy as np

from networkit_spark.graph import Graph
from networkit_spark.generators import chain, erdos_renyi, star
from networkit_spark.operators.components import (
    component_sizes,
    connected_components,
    extract_largest_connected_component,
    number_of_components,
)

from tests.fixtures import (
    G20CC_COMPONENTS,
    G20CC_EDGES,
    G20CC_N,
    numpy_components,
    same_partition,
)


def _labels(df, n):
    rows = {r["node"]: r["label"] for r in df.collect()}
    return np.array([rows[i] for i in range(n)])


def test_cc_g20_fixture(spark):
    """ConnectedComponentsGTest.cpp:31-62: 5 components + co-membership."""
    g = Graph.of(spark, G20CC_EDGES, n=G20CC_N)
    labels = connected_components(g)
    assert number_of_components(labels) == G20CC_COMPONENTS
    lab = _labels(labels, G20CC_N)
    assert lab[0] == lab[19]
    assert lab[3] == lab[7]
    assert lab[13] == lab[14]
    # node 15 isolated — its own singleton
    assert (lab == lab[15]).sum() == 1
    # full parity vs transitive-closure oracle (relabel-invariant AND exact:
    # both emit min-node-id labels)
    exp = numpy_components(G20CC_N, G20CC_EDGES)
    assert same_partition(lab, exp)
    assert (lab == exp).all()


def test_cc_directed_weak(spark):
    """WCC(directed) == CC(underlying undirected)
    (ConnectedComponentsGTest.cpp:429-441)."""
    edges = G20CC_EDGES + [(17, 10)]
    gd = Graph.of(spark, edges, n=G20CC_N, directed=True)
    labels = connected_components(gd)
    assert number_of_components(labels) == G20CC_COMPONENTS


def test_cc_long_chain(spark):
    """Path graph: worst case for plain min-label propagation — the
    star-contraction kernel must converge in O(log n) rounds."""
    n = 512
    g = chain(spark, n)
    labels = connected_components(g)
    lab = _labels(labels, n)
    assert (lab == 0).all()


def test_cc_star_hub(spark):
    """Hub skew fixture (FIXTURES.md §3 hub_star)."""
    g = star(spark, n_leaves=2000)
    labels = connected_components(g)
    assert number_of_components(labels) == 1


def test_cc_random_vs_oracle(spark):
    """Seeded ER graphs at several p cross-checked against closure oracle
    (ConnectedComponentsGTest.cpp:192-252 style)."""
    n = 120
    for p, seed in [(0.005, 1), (0.02, 2), (0.05, 3)]:
        g = erdos_renyi(spark, n, p, seed=seed)
        edges = [(r["src"], r["dst"]) for r in g.canonical_undirected_edges().collect()]
        exp = numpy_components(n, edges)
        lab = _labels(connected_components(g), n)
        assert (lab == exp).all(), f"p={p} seed={seed}"


def test_component_sizes_and_largest(spark):
    g = Graph.of(spark, G20CC_EDGES, n=G20CC_N)
    labels = connected_components(g)
    sizes = {r["label"]: r["size"] for r in component_sizes(labels).collect()}
    assert sorted(sizes.values(), reverse=True) == [7, 5, 5, 2, 1]
    big = extract_largest_connected_component(g, labels)
    assert big.num_nodes() == 7
