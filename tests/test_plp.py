import numpy as np

from networkit_spark.graph import Graph
from networkit_spark.generators import clustered_random
from networkit_spark.operators.plp import plp

from tests.fixtures import numpy_plp_sync, same_partition


def _labels(df, n):
    rows = {r["node"]: r["label"] for r in df.collect()}
    return np.array([rows[i] for i in range(n)])


def test_plp_planted_k3(spark):
    """CommunityGTest.cpp:125-147: pIntra=1, pInter=0 recovers exactly k
    clusters == ground truth."""
    g, truth = clustered_random(spark, 100, 3, 1.0, 0.0, seed=42)
    res = plp(g)
    lab = _labels(res.labels, 100)
    exp = _labels(truth, 100)
    assert len(set(lab)) == 3
    assert same_partition(lab, exp)


def test_plp_planted_k2(spark):
    g, truth = clustered_random(spark, 100, 2, 1.0, 0.0, seed=42)
    lab = _labels(plp(g).labels, 100)
    assert len(set(lab)) == 2
    assert same_partition(lab, _labels(truth, 100))


def test_plp_planted_many_clusters(spark):
    """Scaled-down analogue of the 1000-node/100-cluster fixture."""
    n, k = 300, 20
    g, truth = clustered_random(spark, n, k, 1.0, 0.0, seed=42)
    lab = _labels(plp(g).labels, n)
    assert same_partition(lab, _labels(truth, n))


def test_plp_isolated_and_selfloop(spark):
    """Isolated nodes stay singletons (PLP.cpp:48-59); single node with a
    weighted self-loop is both singleton and one-clustering
    (CommunityGTest.cpp:107-122)."""
    g = Graph.of(spark, [(0, 1), (0, 0, 5.0)], n=4, weighted=True)
    lab = _labels(plp(g).labels, 4)
    assert lab[2] != lab[0] and lab[3] != lab[0] and lab[2] != lab[3]
    g1 = Graph.of(spark, [(0, 0, 42.0)], n=1, weighted=True)
    assert len(_labels(plp(g1).labels, 1)) == 1


def test_plp_sync_matches_numpy_oracle_fixed_iters(spark):
    """Deterministic parity: synchronous supersteps with a fixed iteration
    budget match the numpy implementation label-for-label."""
    edges = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3, 0.1)]
    n = 6
    g = Graph.of(spark, edges, n=n, weighted=True)
    for iters in (1, 2, 5):
        got = _labels(plp(g, max_iterations=iters, theta=-1).labels, n)
        exp = numpy_plp_sync(n, edges, max_iterations=iters, threshold=-1)
        assert (got == exp).all(), f"iters={iters}"


def test_plp_active_set_equals_full(spark):
    """Active-set frontier optimization must not change results."""
    g, _ = clustered_random(spark, 80, 4, 0.6, 0.02, seed=7)
    a = _labels(plp(g, active_set=True, max_iterations=6, theta=-1).labels, 80)
    b = _labels(plp(g, active_set=False, max_iterations=6, theta=-1).labels, 80)
    assert (a == b).all()


def _lp_degree_ordered_python(edges, n, max_sweeps=32, bucket=None):
    """Class-serialized transcription of the lp_degree_ordered contract.
    ``bucket`` maps a degree to its class key (None = exact classes)."""
    nbrs = {u: [] for u in range(n)}
    for a, b in edges:
        nbrs[a].append(b)
        nbrs[b].append(a)
    rawdeg = {u: len(nbrs[u]) for u in range(n)}
    deg = {u: (bucket(d) if bucket and d > 0 else d) for u, d in rawdeg.items()}
    classes = sorted({d for d in deg.values() if d > 0})
    labels = {u: u for u in range(n)}
    for _ in range(max_sweeps):
        updates = 0
        for d in classes:
            snapshot = dict(labels)
            for v in [u for u in range(n) if deg[u] == d]:
                counts = {}
                for w in nbrs[v]:
                    counts[snapshot[w]] = counts.get(snapshot[w], 0) + 1
                if counts:
                    dom = max(counts, key=lambda l: (counts[l], -l))
                    if dom != labels[v]:
                        labels[v] = dom
                        updates += 1
        if updates == 0:
            break
    return labels


def test_lp_degree_ordered_matches_transcription_and_planted(spark):
    """lp_degree_ordered follows its class-serialized contract exactly
    and recovers a planted two-clique split."""
    import random

    from networkit_spark.operators.plp import lp_degree_ordered

    k4a = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    k4b = [(a, b) for a in range(4, 8) for b in range(a + 1, 8)]
    planted = k4a + k4b + [(0, 4)]
    g = Graph.of(spark, planted, n=8)
    got = {
        r["node"]: r["label"]
        for r in lp_degree_ordered(g, degree_buckets="exact").collect()
    }
    assert got == _lp_degree_ordered_python(planted, 8)
    assert len({got[i] for i in range(4)}) == 1
    assert len({got[i] for i in range(4, 8)}) == 1

    rng = random.Random(9)
    edges = sorted({tuple(sorted(rng.sample(range(12), 2))) for _ in range(20)})
    g2 = Graph.of(spark, edges, n=12)
    got2 = {
        r["node"]: r["label"]
        for r in lp_degree_ordered(g2, degree_buckets="exact").collect()
    }
    assert got2 == _lp_degree_ordered_python(edges, 12)

    # log2 buckets (the at-scale default: O(log maxdeg) jobs per sweep)
    # follow the same contract with coarsened classes, and still recover
    # the planted split
    lg = lambda d: d.bit_length() - 1
    got3 = {r["node"]: r["label"] for r in lp_degree_ordered(g).collect()}
    assert got3 == _lp_degree_ordered_python(planted, 8, bucket=lg)
    assert len({got3[i] for i in range(4)}) == 1
    got4 = {r["node"]: r["label"] for r in lp_degree_ordered(g2).collect()}
    assert got4 == _lp_degree_ordered_python(edges, 12, bucket=lg)
