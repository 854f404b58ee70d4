"""Partition-similarity measures (NMI / ARI / Rand) and conductance vs
closed-form oracles."""

import math

import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.community_quality import (
    adjusted_rand_dissimilarity,
    conductance,
    nmi_distance,
    rand_dissimilarity,
)


def _labels_df(spark, labels):
    return spark.createDataFrame(
        [(i, int(l)) for i, l in enumerate(labels)], "node long, label long"
    )


def _py_contingency(a, b):
    cells = {}
    for x, y in zip(a, b):
        cells[(x, y)] = cells.get((x, y), 0) + 1
    sa, sb = {}, {}
    for (x, y), s in cells.items():
        sa[x] = sa.get(x, 0) + s
        sb[y] = sb.get(y, 0) + s
    return cells, sa, sb, len(a)


def py_nmid(a, b):
    cells, sa, sb, n = _py_contingency(a, b)
    mi = sum(
        (s / n) * math.log2(s * n / (sa[x] * sb[y])) for (x, y), s in cells.items()
    )
    ha = -sum((s / n) * math.log2(s / n) for s in sa.values())
    hb = -sum((s / n) * math.log2(s / n) for s in sb.values())
    if ha + hb == 0:
        return 0.0
    return 1.0 - 2.0 * mi / (ha + hb)


def py_ari_dissim(a, b):
    cells, sa, sb, n = _py_contingency(a, b)
    ri = sum(s * (s - 1) / 2 for s in cells.values())
    pa = sum(s * (s - 1) / 2 for s in sa.values())
    pb = sum(s * (s - 1) / 2 for s in sb.values())
    denom = n * (n - 1) / 2
    mx = 0.5 * (pa + pb)
    exp = pa * pb / denom
    if mx == 0 or mx == exp:
        return 0.0
    return 1.0 - (ri - exp) / (mx - exp)


LAB_A = [0, 0, 0, 1, 1, 1, 2, 2, 2, 2]
LAB_B = [0, 0, 1, 1, 1, 2, 2, 2, 0, 2]


def test_nmi_identical_is_zero(spark):
    a = _labels_df(spark, LAB_A)
    assert nmi_distance(a, a) == pytest.approx(0.0, abs=1e-12)


def test_nmi_matches_closed_form(spark):
    a, b = _labels_df(spark, LAB_A), _labels_df(spark, LAB_B)
    assert nmi_distance(a, b) == pytest.approx(py_nmid(LAB_A, LAB_B), abs=1e-12)


def test_ari_matches_closed_form(spark):
    a, b = _labels_df(spark, LAB_A), _labels_df(spark, LAB_B)
    assert adjusted_rand_dissimilarity(a, b) == pytest.approx(
        py_ari_dissim(LAB_A, LAB_B), abs=1e-12
    )
    assert adjusted_rand_dissimilarity(a, a) == pytest.approx(0.0, abs=1e-12)


def test_rand_disagreement_fraction(spark):
    a, b = _labels_df(spark, LAB_A), _labels_df(spark, LAB_B)
    n = len(LAB_A)
    disagree = sum(
        1
        for i in range(n)
        for j in range(i + 1, n)
        if (LAB_A[i] == LAB_A[j]) != (LAB_B[i] == LAB_B[j])
    )
    assert rand_dissimilarity(a, b) == pytest.approx(
        disagree / (n * (n - 1) / 2), abs=1e-12
    )
    assert rand_dissimilarity(a, a) == 0.0


def test_conductance_barbell(spark):
    # two triangles joined by one edge; S = {0,1,2}
    edges = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    g = Graph.of(spark, edges, n=6)
    labels = _labels_df(spark, [0, 0, 0, 1, 1, 1])
    # cut = 1, vol(S) = 2*3 + 1 = 7, vol(T) = 7 -> 1/7
    assert conductance(g, labels) == pytest.approx(1.0 / 7.0, abs=1e-12)


def test_conductance_requires_2_partition(spark):
    g = Graph.of(spark, [(0, 1), (1, 2)], n=3)
    labels = _labels_df(spark, [0, 1, 2])
    with pytest.raises(ValueError):
        conductance(g, labels)


def test_hub_dominance_and_ipd(spark):
    from networkit_spark.operators.community_quality import (
        hub_dominance,
        intrapartition_density,
    )

    # two clusters: triangle {0,1,2} (dominance 1.0, density 1.0) and
    # path {3,4,5} (max internal deg 2 -> dominance 1.0, density 2/3)
    edges = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5)]
    g = Graph.of(spark, edges, n=6)
    labels = _labels_df(spark, [0, 0, 0, 1, 1, 1])
    assert hub_dominance(g, labels) == pytest.approx(1.0)
    d = intrapartition_density(g, labels)
    assert d["unweighted_avg"] == pytest.approx((1.0 + 2.0 / 3.0) / 2)
    assert d["global"] == pytest.approx(5.0 / 6.0)


def test_sfigality_star(spark):
    from networkit_spark.operators.degrees import sfigality

    star = Graph.of(spark, [(0, i) for i in range(1, 5)], n=5)
    s = {r["id"]: r["score"] for r in sfigality(star).collect()}
    assert s[0] == 0.0
    assert all(s[i] == 1.0 for i in range(1, 5))


def test_jaccard_and_graph_structural_rand(spark):
    from networkit_spark.operators.community_quality import (
        graph_structural_rand_dissimilarity,
        jaccard_dissimilarity,
    )

    a = _labels_df(spark, LAB_A)
    b = _labels_df(spark, LAB_B)
    # python oracle for jaccard
    cells, sa, sb, n = _py_contingency(LAB_A, LAB_B)
    s11 = sum(s * (s - 1) / 2 for s in cells.values())
    s00 = n * (n - 1) / 2 + s11 - (
        sum(s * (s - 1) / 2 for s in sa.values())
        + sum(s * (s - 1) / 2 for s in sb.values())
    )
    exp = 1.0 - 2.0 * s11 / (n * (n - 1) - 2.0 * s00)
    assert jaccard_dissimilarity(a, b) == pytest.approx(exp, abs=1e-12)
    assert jaccard_dissimilarity(a, a) == pytest.approx(0.0, abs=1e-12)

    edges = [(i, (i + 1) % 10) for i in range(10)]
    g = Graph.of(spark, edges, n=10)
    agree = sum(
        1
        for u, v in edges
        if ((LAB_A[u] == LAB_A[v]) and (LAB_B[u] == LAB_B[v]))
        or ((LAB_A[u] != LAB_A[v]) and (LAB_B[u] != LAB_B[v]))
    )
    assert graph_structural_rand_dissimilarity(g, a, b) == pytest.approx(
        1.0 - agree / 10.0, abs=1e-12
    )
    assert graph_structural_rand_dissimilarity(g, a, a) == 0.0


# ---------------------------------------------------------------------------
# Isolated interpartition conductance/expansion, fragmentation, stable nodes
# (python oracles transcribe the reference .cpp definitions)
# ---------------------------------------------------------------------------

_PM_EDGES = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5), (5, 3), (6, 7)]
_PM_N = 9  # node 8 isolated
_PM_LABELS = [0, 0, 0, 1, 1, 1, 2, 2, 2]


def _py_iic(edges, labels, n):
    cut, vol = {}, {}
    total = 0.0
    for u, v in edges:
        lu, lv = labels[u], labels[v]
        if lu != lv:
            cut[lu] = cut.get(lu, 0) + 1
            cut[lv] = cut.get(lv, 0) + 1
        vol[lu] = vol.get(lu, 0) + 1
        vol[lv] = vol.get(lv, 0) + 1
        total += 2
    vals = []
    for c in sorted(set(labels)):
        denom = min(vol.get(c, 0), total - vol.get(c, 0))
        vals.append(cut.get(c, 0) / denom if denom > 0 else 0.0)
    return sum(vals) / len(vals)


def _py_iie(edges, labels, n):
    cut = {}
    for u, v in edges:
        lu, lv = labels[u], labels[v]
        if lu != lv:
            cut[lu] = cut.get(lu, 0) + 1
            cut[lv] = cut.get(lv, 0) + 1
    vals = []
    for c in sorted(set(labels)):
        sz = labels.count(c)
        vals.append(cut.get(c, 0) / min(sz, n - sz))
    return sum(vals) / len(vals)


def test_isolated_interpartition_measures(spark):
    from networkit_spark.operators.community_quality import (
        isolated_interpartition_conductance,
        isolated_interpartition_expansion,
    )

    g = Graph.of(spark, _PM_EDGES, n=_PM_N)
    labs = _labels_df(spark, _PM_LABELS)
    got = isolated_interpartition_conductance(g, labs)
    assert got["unweighted_avg"] == pytest.approx(
        _py_iic(_PM_EDGES, _PM_LABELS, _PM_N), abs=1e-12
    )
    got = isolated_interpartition_expansion(g, labs)
    assert got["unweighted_avg"] == pytest.approx(
        _py_iie(_PM_EDGES, _PM_LABELS, _PM_N), abs=1e-12
    )


def test_partition_fragmentation(spark):
    from networkit_spark.operators.community_quality import partition_fragmentation

    g = Graph.of(spark, _PM_EDGES, n=_PM_N)
    # cluster 0 = {0,1,2} one piece -> 0; cluster 1 = {3,4,5} one piece -> 0
    # cluster 2 = {6,7,8}: pieces {6,7} and {8} -> 1 - 2/3 = 1/3
    labs = _labels_df(spark, _PM_LABELS)
    got = partition_fragmentation(g, labs)
    assert got["unweighted_avg"] == pytest.approx((0 + 0 + 1 / 3) / 3, abs=1e-12)
    assert got["max"] == pytest.approx(1 / 3, abs=1e-12)
    # aligned partition == components -> fragmentation 0 everywhere
    aligned = _labels_df(spark, [0, 0, 0, 0, 0, 0, 1, 1, 2])
    # clusters {0..5} span two components {0,1,2}/{3,4,5}? no - edge (2,3)
    # joins them, so {0..5} is ONE component: fragmentation 0
    got2 = partition_fragmentation(g, aligned)
    assert got2["unweighted_avg"] == pytest.approx(0.0, abs=1e-12)


def test_stable_partition_nodes(spark):
    from networkit_spark.operators.community_quality import stable_partition_nodes

    g = Graph.of(spark, _PM_EDGES, n=_PM_N)
    labs = _labels_df(spark, _PM_LABELS)
    got = stable_partition_nodes(g, labs)
    # oracle (reference semantics): stable iff isolated or own-label
    # neighbor weight positive and strictly greater than every other label
    # node 0: nbrs 1,2 own=2/other=0 -> stable; 1: same; 2: own 2 other 1 -> stable
    # node 3: nbrs 2(l0),4,5 -> own 2 other 1 -> stable; 4,5 stable
    # node 6: nbr 7 own -> stable; 7: nbr 6 own -> stable; 8 isolated -> stable
    assert got["stable_fraction"] == pytest.approx(1.0, abs=1e-12)
    # flip: give node 2 label 1 -> node 0,1 own_w 1 ... recompute oracle:
    labs2 = _labels_df(spark, [0, 0, 1, 1, 1, 1, 2, 2, 2])
    got2 = stable_partition_nodes(g, labs2)
    # node 0: nbrs 1(l0), 2(l1): own 1, other 1 -> NOT stable (>= own)
    # node 1: nbrs 0(l0), 2(l1): own 1 other 1 -> NOT stable
    # node 2: nbrs 0,1(l0), 3(l1): own 1 other 2 -> NOT stable
    # nodes 3,4,5: own >=2 other <=... node 3: nbrs 2(l1),4(l1),5(l1) own 3 -> stable
    # node 4: nbrs 3,5 own 2 -> stable; node 5: nbrs 4,3 own 2 -> stable
    # 6,7,8 stable
    assert got2["stable_fraction"] == pytest.approx(6 / 9, abs=1e-12)


def test_overlapping_nmi_distance_reference_fixtures(spark):
    """CommunityGTest.testOverlappingNMIDistance fixtures, both
    directions, plus the partial-cover MAX sweep."""
    from networkit_spark.operators.community_quality import overlapping_nmi_distance

    def cover(spark, subsets):
        rows = [(u, i) for i, members in enumerate(subsets) for u in members]
        return spark.createDataFrame(rows, "node long, subset long")

    A = cover(spark, [[0, 1], [0]])
    B = cover(spark, [[0]])
    assert abs(overlapping_nmi_distance(A, B, 2)) < 1e-12
    assert abs(overlapping_nmi_distance(B, A, 2)) < 1e-12

    A = cover(spark, [[0, 1], [0]])
    B = cover(spark, [[0], [1]])
    assert abs(overlapping_nmi_distance(A, B, 2) - 0.5) < 1e-12
    assert abs(overlapping_nmi_distance(B, A, 2) - 0.5) < 1e-12

    A = cover(spark, [[0, 1]])
    B = cover(spark, [[0], [1]])
    assert abs(overlapping_nmi_distance(A, B, 2) - 1.0) < 1e-12

    A = cover(spark, [[0, 1], [0], [0], [0]])
    B = cover(spark, [[0]])
    assert abs(overlapping_nmi_distance(A, B, 2) - 1.0 / 3.0) < 1e-12

    # partial-cover sweep at n=100: MAX distance = 1 - i/10
    full = [[u for u in range(i * 10, (i + 1) * 10)] for i in range(10)]
    fc = cover(spark, full)
    for i in (0, 3, 10):
        pc = cover(spark, full[:i])
        got = overlapping_nmi_distance(pc, fc, 100, normalization="max")
        assert abs(got - (1.0 - i / 10.0)) < 1e-10, (i, got)
        gmin = overlapping_nmi_distance(pc, fc, 100, normalization="min")
        assert abs(gmin - (1.0 if i == 0 else 0.0)) < 1e-10, (i, gmin)


def test_partition_intersection(spark):
    """PartitionIntersection.cpp: cells = pairwise label intersections,
    canonically labeled by min member."""
    from networkit_spark.operators.community_quality import partition_intersection

    a = spark.createDataFrame([(i, i % 2) for i in range(8)], "node long, label long")
    b = spark.createDataFrame([(i, i // 4) for i in range(8)], "node long, label long")
    got = {r["node"]: r["label"] for r in partition_intersection(a, b).collect()}
    # cells: {0,2},{1,3},{4,6},{5,7}
    assert got[0] == got[2] == 0 and got[1] == got[3] == 1
    assert got[4] == got[6] == 4 and got[5] == got[7] == 5
