"""Golden graph fixtures from /root/repo/FIXTURES.md (reference-cited)."""

import numpy as np

# G8w — 8-node weighted undirected graph (CentralityGTest.cpp:594-605)
G8W_EDGES = [
    (0, 2, 3.0),
    (1, 2, 2.0),
    (2, 3, 3.0),
    (2, 4, 2.0),
    (2, 5, 1.5),
    (3, 5, 3.0),
    (4, 5, 2.0),
    (5, 6, 3.0),
    (5, 7, 2.0),
]
G8W_N = 8
G8W_PAGERANK = [0.0753, 0.0565, 0.2552, 0.1319, 0.0942, 0.2552, 0.0753, 0.0565]
G8W_PAGERANK_NORM = [4.0175, 3.0117, 13.6083, 7.0350, 5.0233, 13.6083, 4.0175, 3.0117]
G8W_EIGENVECTOR = [0.2254, 0.1503, 0.5290, 0.4508, 0.3006, 0.5290, 0.2254, 0.1503]

# G20cc — 20 nodes, 15 edges, 5 components (ConnectedComponentsGTest.cpp:31-62)
G20CC_EDGES = [
    (0, 1), (1, 2), (2, 4), (4, 8), (8, 16), (16, 19),
    (3, 5), (5, 6), (6, 7), (7, 9),
    (10, 11), (10, 18), (10, 12), (18, 17),
    (13, 14),
]
G20CC_N = 20
G20CC_COMPONENTS = 5

# G8deg — self-loop degree fixture (test_centrality.py:10-28)
G8DEG_EDGES = [
    (0, 2), (0, 5), (1, 2), (2, 3), (2, 2), (2, 4),
    (3, 5), (4, 5), (5, 5), (5, 6), (5, 7), (7, 7),
]
G8DEG_N = 8
G8DEG_SCORES = [2, 1, 4, 2, 2, 5, 1, 1]

# K4 — complete graph, 4 triangles, all CC = 1.0
K4_EDGES = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]


def numpy_pagerank(
    n, edges, damp=0.85, tol=1e-8, directed=False, normalized=False, norm="l2",
    max_iterations=None,
):
    """NetworKit-semantics PageRank oracle (centrality/PageRank.cpp:20-104):
    in-edge gather, weighted out-degree divisor, NO per-step dangling fix,
    end-only normalization, convergence on pre-normalization values."""
    A = np.zeros((n, n))
    for e in edges:
        u, v = int(e[0]), int(e[1])
        w = float(e[2]) if len(e) > 2 else 1.0
        A[u, v] += w
        if not directed and u != v:
            A[v, u] += w
    wdeg = A.sum(axis=1)  # weighted out-degree
    score = np.full(n, 1.0 / n)
    teleport = (1.0 - damp) / n
    it = 0
    max_iterations = max_iterations or 1 << 30
    while it < max_iterations:
        frac = np.divide(score, wdeg, out=np.zeros(n), where=wdeg > 0)
        new = teleport + damp * (A.T @ frac)
        it += 1
        delta = (
            np.abs(new - score).sum() if norm == "l1"
            else np.sqrt(((new - score) ** 2).sum())
        )
        score = new
        if delta <= tol:
            break
    if normalized:
        factor = (1.0 / n) * ((1.0 - damp) + damp * score[wdeg == 0].sum())
    else:
        factor = score.sum()
    return score / factor, it


def numpy_components(n, edges):
    """Transitive-closure components oracle: label = min node id."""
    label = np.arange(n)
    changed = True
    adj = [(int(u), int(v)) for u, v, *_ in [tuple(e) for e in edges]]
    while changed:
        changed = False
        for u, v in adj:
            m = min(label[u], label[v])
            if label[u] != m or label[v] != m:
                label[u] = label[v] = m
                changed = True
    # propagate to full closure
    for _ in range(n):
        new = label[label]
        if (new == label).all():
            break
        label = new
    return label


def numpy_triangles_per_node(n, edges):
    """tri(u) = diag(A³)/2 on the simple undirected graph
    (AlgebraicTriangleCounting.hpp:59-71)."""
    A = np.zeros((n, n))
    for e in edges:
        u, v = int(e[0]), int(e[1])
        if u != v:
            A[u, v] = 1.0
            A[v, u] = 1.0
    return np.diag(np.linalg.matrix_power(A, 3)) / 2.0


def numpy_plp_sync(n, edges, max_iterations=100, threshold=None):
    """Synchronous PLP oracle: weighted vote, heaviest label, tie-break
    smallest label (community/PLP.cpp:78-90), threshold n/1e5."""
    if threshold is None:
        threshold = n / 1e5
    adj = {}
    for e in edges:
        u, v = int(e[0]), int(e[1])
        w = float(e[2]) if len(e) > 2 else 1.0
        adj.setdefault(u, []).append((v, w))
        if u != v:
            adj.setdefault(v, []).append((u, w))
    labels = np.arange(n)
    for _ in range(max_iterations):
        new = labels.copy()
        for u in range(n):
            nbrs = adj.get(u)
            if not nbrs:
                continue
            weights = {}
            for v, w in nbrs:
                weights[labels[v]] = weights.get(labels[v], 0.0) + w
            best = max(weights.items(), key=lambda kv: (kv[1], -kv[0]))
            # tie-break smallest label: pick max weight, then min label
            top_w = best[1]
            new[u] = min(l for l, w in weights.items() if w == top_w)
        n_updated = int((new != labels).sum())
        labels = new
        if n_updated <= threshold:
            break
    return labels


def same_partition(labels_a, labels_b):
    """equalClusterings semantics (GraphClusteringTools.cpp:99-115):
    identical partitions up to relabeling."""
    a_to_b, b_to_a = {}, {}
    for x, y in zip(labels_a, labels_b):
        if a_to_b.setdefault(x, y) != y:
            return False
        if b_to_a.setdefault(y, x) != x:
            return False
    return True
