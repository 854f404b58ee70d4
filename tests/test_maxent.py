"""MaxentStress layout: numpy replay parity + reference-contract tests.

The numpy replay below implements the exact semantics documented in
``operators/maxent.py`` (which mirrors ``viz/MaxentStress.cpp`` with the
documented grid-repulsion deviation); the Spark kernels must match it
numerically. The iterative run is compared end-to-end on provided
deterministic start coordinates (the reference's coordinate ctor) so
the replay needs no RNG.
"""

import math
from itertools import product

import numpy as np
import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.maxent import (
    maxent_full_stress,
    maxent_known_distances,
    maxent_ldme,
    maxent_mean_distance_error,
    maxent_measure,
    maxent_scale_layout,
    maxent_scaling_factor,
    maxent_stress,
)

EPS = 1e-5


# ---------------------------------------------------------------- replay
def np_known_distances(n, und_edges, k):
    """S as a dict (u, v) -> d. und_edges: list of (u, v, w), one per
    undirected edge."""
    adj = {u: {} for u in range(n)}
    for u, v, w in und_edges:
        adj[u][v] = w
        adj[v][u] = w
    s = {}
    for u in range(n):
        for v, w in adj[u].items():
            s[(u, v)] = w
        if k > 1:
            # hop depths via BFS
            depth = {u: 0}
            frontier = [u]
            for d in range(1, k + 1):
                nxt = []
                for x in frontier:
                    for y in adj[x]:
                        if y not in depth:
                            depth[y] = d
                            nxt.append(y)
                frontier = nxt
            weighted = any(w != 1.0 for _, _, w in und_edges)
            if weighted:
                # Dijkstra exact distances for depth (1, k] members
                import heapq

                dist = {u: 0.0}
                pq = [(0.0, u)]
                done = set()
                while pq:
                    dd, x = heapq.heappop(pq)
                    if x in done:
                        continue
                    done.add(x)
                    for y, w in adj[x].items():
                        nd = dd + w
                        if nd < dist.get(y, math.inf):
                            dist[y] = nd
                            heapq.heappush(pq, (nd, y))
                for v, d in depth.items():
                    if 1 < d <= k:
                        s[(u, v)] = dist[v]
            else:
                for v, d in depth.items():
                    if 1 < d <= k:
                        s[(u, v)] = float(d)
    return s


def np_attractive_rhs(s, x):
    n, dim = x.shape
    rhs = np.zeros_like(x)
    for (u, v), d in s.items():
        diff = x[u] - x[v]
        dist = max(float(np.linalg.norm(diff)), EPS)
        w = (1.0 / (d * d)) * d / dist
        rhs[u] += w * diff
    return rhs


def np_grid_repulsion(x, q, grid=8):
    n, dim = x.shape
    qsign = 1.0 if q >= 0.0 else -1.0
    q2 = (q + 2.0) / 2.0
    mn = x.min(axis=0)
    mx = x.max(axis=0)
    widths = np.where(mx > mn, (mx - mn) / grid, 1.0)
    cells = np.minimum(np.floor((x - mn) / widths).astype(int), grid - 1)
    groups = {}
    for i in range(n):
        groups.setdefault(tuple(cells[i]), []).append(i)
    com = {c: x[ix].mean(axis=0) for c, ix in groups.items()}
    cnt = {c: len(ix) for c, ix in groups.items()}
    b = np.zeros_like(x)
    for i in range(n):
        ci = tuple(cells[i])
        for c, m in com.items():
            if max(abs(ci[d] - c[d]) for d in range(dim)) > 1:
                diff = x[i] - m
                sqd = float(diff @ diff)
                if sqd >= EPS:
                    b[i] += qsign * cnt[c] / (sqd**q2) * diff
            else:
                for j in groups[c]:
                    if j == i:
                        continue
                    diff = x[i] - x[j]
                    sqd = float(diff @ diff)
                    if sqd >= EPS:
                        b[i] += qsign / (sqd**q2) * diff
    norms = np.maximum(np.linalg.norm(b, axis=0), 1e-12)
    return b / norms


def np_laplacian(s, n):
    lap = np.zeros((n, n))
    for (u, v), d in s.items():
        w = 1.0 / (d * d)
        lap[u, v] -= w
        lap[u, u] += w
    return lap


def np_maxent_stress(
    n,
    und_edges,
    x0,
    k=1,
    q=0.0,
    alpha=1.0,
    alpha_reduction=0.3,
    final_alpha=0.008,
    conv_threshold=1e-6,
    max_solves_per_alpha=50,
    fast_computation=False,
    grid=8,
):
    s = np_known_distances(n, und_edges, k)
    deg = {}
    for u, v, _ in und_edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    q_eff = 0.8 if sum(1 for u in range(n) if deg.get(u, 0) == 1) / n > 0.3 else q
    lap = np_laplacian(s, n)
    x = x0.copy()
    cur_alpha = alpha
    converged = False
    rep = None
    current_lb = None
    while not converged:
        inner_done = False
        for num_solves in range(max_solves_per_alpha):
            old = x.copy()
            new_lb = -1.0 if num_solves == 0 else float(
                math.floor(5.0 * math.log(num_solves))
            )
            if new_lb != current_lb:
                rep = np_grid_repulsion(old, q_eff, grid)
                current_lb = new_lb
            rhs = np_attractive_rhs(s, old)
            if num_solves < max_solves_per_alpha // 5:
                rhs = rhs / np.maximum(np.linalg.norm(rhs, axis=0), 1e-12)
            rhs = rhs + cur_alpha * rep
            rhs = rhs - rhs.mean(axis=0)
            # exact mean-free pseudoinverse solve, shifted to old's mean
            sol = np.linalg.lstsq(lap, rhs, rcond=None)[0]
            x = sol - sol.mean(axis=0) + old.mean(axis=0)
            rel = float(((x - old) ** 2).sum()) / max(
                float((old**2).sum()), 1e-300
            )
            if rel < conv_threshold and fast_computation:
                converged = True
                inner_done = True
                break
        cur_alpha *= alpha_reduction
        converged = converged or cur_alpha < final_alpha
        if inner_done:
            break
    return x, s


def np_apsp(s, n):
    import heapq

    adj = {u: [] for u in range(n)}
    for (u, v), d in s.items():
        adj[u].append((v, d))
    out = {}
    for u in range(n):
        dist = {u: 0.0}
        pq = [(0.0, u)]
        done = set()
        while pq:
            dd, x = heapq.heappop(pq)
            if x in done:
                continue
            done.add(x)
            out[(u, x)] = dd
            for y, w in adj[x]:
                nd = dd + w
                if nd < dist.get(y, math.inf):
                    dist[y] = nd
                    heapq.heappush(pq, (nd, y))
    return out


# --------------------------------------------------------------- fixtures
# a 14-node connected graph with branches, a cycle, and a weighted tail
EDGES = [
    (0, 1), (1, 2), (2, 3), (3, 0),          # 4-cycle
    (2, 4), (4, 5), (5, 6),                   # path tail
    (1, 7), (7, 8), (7, 9),                   # branch
    (4, 10), (10, 11), (11, 12), (12, 13),    # longer tail
    (9, 10),                                   # cross link
]
N = 14
W_EDGES = [(u, v, 1.0 + ((u + v) % 3) * 0.5) for u, v in EDGES]


def det_coords(n, dim=2):
    """Deterministic non-degenerate start layout (same in Spark + numpy)."""
    return np.array(
        [[(i * 7) % 13 + 0.25 * i, (i * i) % 11 - 0.1 * i][:dim] for i in range(n)],
        dtype=float,
    )


def spark_graph(spark, edges, weighted=False):
    return Graph.of(spark, edges, n=N, weighted=weighted)


def coords_df(spark, x):
    rows = [(i, [float(v) for v in x[i]]) for i in range(x.shape[0])]
    return spark.createDataFrame(rows, "id long, pos array<double>")


def collect_coords(df, n, dim=2):
    out = np.zeros((n, dim))
    for r in df.collect():
        out[int(r["id"])] = np.array(r["pos"], dtype=float)
    return out


def s_dict(df):
    return {(int(r["src"]), int(r["dst"])): float(r["d"]) for r in df.collect()}


# ----------------------------------------------------------------- tests
def test_known_distances_k1_k2_k3_unweighted(spark):
    g = spark_graph(spark, EDGES)
    und = [(u, v, 1.0) for u, v in EDGES]
    for k in (1, 2, 3):
        got = s_dict(maxent_known_distances(g, k=k))
        want = np_known_distances(N, und, k)
        assert got == want, f"k={k}"


def test_known_distances_weighted_k2_true_dijkstra(spark):
    g = spark_graph(spark, W_EDGES, weighted=True)
    got = s_dict(maxent_known_distances(g, k=2))
    want = np_known_distances(N, W_EDGES, 2)
    assert set(got) == set(want)
    for p in want:
        assert got[p] == pytest.approx(want[p])


def test_known_distances_weighted_guard(spark):
    g = spark_graph(spark, W_EDGES, weighted=True)
    with pytest.raises(ValueError, match="max_nodes"):
        maxent_known_distances(g, k=2, max_nodes=5)
    assert maxent_known_distances(g, k=2, max_nodes=None).count() > 0


def test_attractive_rhs_matches_numpy(spark):
    from networkit_spark.operators.maxent import _attractive_rhs

    g = spark_graph(spark, EDGES)
    s = maxent_known_distances(g, k=2)
    x = det_coords(N)
    cdf = coords_df(spark, x).select(
        "id", F.col("pos")[0].alias("c0"), F.col("pos")[1].alias("c1")
    )
    got = {
        int(r["id"]): (float(r["c0"]), float(r["c1"]))
        for r in _attractive_rhs(s, cdf, 2).collect()
    }
    want = np_attractive_rhs(s_dict(s), x)
    for i in range(N):
        assert got[i][0] == pytest.approx(want[i][0], abs=1e-9)
        assert got[i][1] == pytest.approx(want[i][1], abs=1e-9)


@pytest.mark.parametrize("q,grid", [(0.0, 3), (0.8, 2), (-1.0, 4)])
def test_grid_repulsion_matches_numpy(spark, q, grid):
    from networkit_spark.operators.maxent import _grid_repulsion

    x = det_coords(N)
    cdf = coords_df(spark, x).select(
        "id", F.col("pos")[0].alias("c0"), F.col("pos")[1].alias("c1")
    )
    got_df = _grid_repulsion(cdf, 2, q, grid)
    got = {
        int(r["id"]): (float(r["c0"]), float(r["c1"]))
        for r in got_df.collect()
    }
    want = np_grid_repulsion(x, q, grid)
    for i in range(N):
        assert got[i][0] == pytest.approx(want[i][0], abs=1e-9)
        assert got[i][1] == pytest.approx(want[i][1], abs=1e-9)


def test_block_cg_solves_weighted_laplacian(spark):
    from networkit_spark.operators.maxent import _block_cg

    g = spark_graph(spark, EDGES)
    s = maxent_known_distances(g, k=1)
    sd = s_dict(s)
    lap = np_laplacian(sd, N)
    rng = det_coords(N)
    b = rng - rng.mean(axis=0)  # mean-free rhs
    s_w = s.select("src", "dst", (F.lit(1.0) / (F.col("d") * F.col("d"))).alias("w"))
    wdeg = s_w.groupBy(F.col("src").alias("id")).agg(F.sum("w").alias("wd"))
    x0 = spark.createDataFrame(
        [(i, 0.0, 0.0) for i in range(N)], "id long, c0 double, c1 double"
    )
    bdf = spark.createDataFrame(
        [(i, float(b[i, 0]), float(b[i, 1])) for i in range(N)],
        "id long, c0 double, c1 double",
    )
    x = _block_cg(s_w, wdeg, x0, bdf, 2, tol=1e-10, max_iters=300)
    got = np.zeros((N, 2))
    for r in x.collect():
        got[int(r["id"])] = (float(r["c0"]), float(r["c1"]))
    # check the residual, not the (shift-ambiguous) solution
    res = lap @ got - b
    assert float(np.abs(res).max()) < 1e-6
    # x0 was zero-mean, so the solution stays zero-mean
    assert float(np.abs(got.mean(axis=0)).max()) < 1e-8


def test_maxent_stress_end_to_end_matches_numpy_replay(spark):
    g = spark_graph(spark, EDGES)
    x0 = det_coords(N)
    got_df = maxent_stress(
        g,
        dim=2,
        k=2,
        coordinates=coords_df(spark, x0),
        alpha=1.0,
        alpha_reduction=0.3,
        final_alpha=0.2,          # one alpha round
        max_solves_per_alpha=3,
        solver_tol=1e-9,
        cg_max_iters=400,
        grid=3,
    )
    got = collect_coords(got_df, N)
    want, _ = np_maxent_stress(
        N,
        [(u, v, 1.0) for u, v in EDGES],
        x0,
        k=2,
        final_alpha=0.2,
        max_solves_per_alpha=3,
        grid=3,
    )
    scale = float(np.abs(want).max())
    assert np.abs(got - want).max() / scale < 2e-4


def test_maxent_stress_improves_ldme(spark):
    g = spark_graph(spark, EDGES)
    x0 = det_coords(N)
    s = maxent_known_distances(g, k=1)
    before = maxent_ldme(s, coords_df(spark, x0))
    out = maxent_stress(
        g,
        k=1,
        coordinates=coords_df(spark, x0),
        final_alpha=0.2,
        max_solves_per_alpha=4,
        solver_tol=1e-8,
        grid=3,
    )
    scaled = maxent_scale_layout(s, out)
    after = maxent_ldme(s, scaled)
    assert after < before


def test_sphere_init_contract(spark):
    g = spark_graph(spark, W_EDGES, weighted=True)
    out = maxent_stress(
        g,
        k=1,
        seed=7,
        final_alpha=0.5,
        max_solves_per_alpha=1,
        solver_tol=1e-6,
        grid=3,
    )
    assert out.count() == N
    # deterministic across runs (seeded portable init)
    out2 = maxent_stress(
        g,
        k=1,
        seed=7,
        final_alpha=0.5,
        max_solves_per_alpha=1,
        solver_tol=1e-6,
        grid=3,
    )
    a = collect_coords(out, N)
    b = collect_coords(out2, N)
    assert np.allclose(a, b)


def test_disconnected_raises(spark):
    g = Graph.of(spark, [(0, 1), (2, 3)], n=4)
    with pytest.raises(ValueError, match="connected"):
        maxent_stress(g, max_solves_per_alpha=1, final_alpha=0.5)


def test_measures_match_numpy(spark):
    g = spark_graph(spark, W_EDGES, weighted=True)
    s = maxent_known_distances(g, k=1)
    sd = s_dict(s)
    x = det_coords(N)
    cdf = coords_df(spark, x)

    apsp = np_apsp(sd, N)

    def geo(u, v):
        return float(np.linalg.norm(x[u] - x[v]))

    top = sum(geo(u, v) / d for (u, v), d in apsp.items() if d >= EPS)
    bot = sum(geo(u, v) ** 2 / d**2 for (u, v), d in apsp.items() if d >= EPS)
    assert maxent_scaling_factor(s, cdf) == pytest.approx(top / bot)

    stress = (
        sum(
            (geo(u, v) - d) ** 2 / d**2
            for (u, v), d in apsp.items()
            if d >= EPS
        )
        / 2.0
    )
    assert maxent_full_stress(s, cdf) == pytest.approx(stress)

    m = len(sd)
    ldme = math.sqrt(sum((d - geo(u, v)) ** 2 for (u, v), d in sd.items()) / m)
    assert maxent_ldme(s, cdf) == pytest.approx(ldme)
    mde = sum(abs(geo(u, v) - d) / d for (u, v), d in sd.items()) / m
    assert maxent_mean_distance_error(s, cdf) == pytest.approx(mde)

    for q in (0.0, 0.8):
        ent = sum(
            math.log(max(geo(u, v), EPS)) if abs(q) < 0.001 else max(geo(u, v), EPS) ** (-q)
            for u, v in product(range(N), range(N))
            if u != v
        )
        energy = 0.0
        for (u, v), d in sd.items():
            dist = max(geo(u, v), EPS)
            energy += (dist - d) ** 2 / d**2
            ent -= math.log(dist) if abs(q) < 0.001 else dist ** (-q)
        if abs(q) > 0.001:
            ent *= -(1.0 if q >= 0 else -1.0)
        want = (energy - 0.008 * ent) / 2.0
        assert maxent_measure(s, cdf, q=q) == pytest.approx(want)

    with pytest.raises(ValueError, match="max_nodes"):
        maxent_scaling_factor(s, cdf, max_nodes=5)
    with pytest.raises(ValueError, match="max_nodes"):
        maxent_full_stress(s, cdf, max_nodes=5)
    with pytest.raises(ValueError, match="max_nodes"):
        maxent_measure(s, cdf, max_nodes=5)


def test_q_autoraise_on_star(spark):
    # star: 9 of 10 nodes have degree 1 -> q_eff = 0.8 (repulsion differs
    # from q=0); pin by comparing against the numpy replay with q=0.8
    star = [(0, i) for i in range(1, 10)]
    g = Graph.of(spark, star, n=10)
    x0 = det_coords(10)
    got = collect_coords(
        maxent_stress(
            g,
            coordinates=coords_df(spark, x0),
            q=0.0,
            final_alpha=0.5,
            max_solves_per_alpha=2,
            solver_tol=1e-9,
            cg_max_iters=200,
            grid=3,
        ),
        10,
    )
    want, _ = np_maxent_stress(
        10,
        [(u, v, 1.0) for u, v in star],
        x0,
        q=0.0,  # replay applies the same auto-raise internally
        final_alpha=0.5,
        max_solves_per_alpha=2,
        grid=3,
    )
    scale = float(np.abs(want).max())
    assert np.abs(got - want).max() / scale < 2e-4
