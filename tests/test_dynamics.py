"""Dynamic-graph event replay + incremental CC tests
(GraphEvent.hpp / GraphUpdater.cpp / DynConnectedComponents semantics)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.components import connected_components
from networkit_spark.streaming.dynamics import (
    DynConnectedComponents,
    apply_events,
    events_of,
    parse_dgs_lines,
    replay_at,
)


def _labels(df):
    return {r["node"]: r["label"] for r in df.collect()}


def test_apply_events_edge_lifecycle(spark):
    g = Graph.of(spark, [(0, 1, 2.0)], n=3, weighted=True)
    ev = events_of(spark, [
        (1, "EDGE_ADDITION", 1, 2, 5.0),
        (2, "EDGE_WEIGHT_INCREMENT", 0, 1, 1.5),   # 2.0 -> 3.5
        (3, "EDGE_WEIGHT_UPDATE", 1, 2, 7.0),      # 5.0 -> 7.0
        (4, "EDGE_ADDITION", 0, 2, 1.0),
        (5, "EDGE_REMOVAL", 0, 2, None),
    ])
    g2 = apply_events(g, ev)
    edges = {(r["src"], r["dst"]): r["weight"]
             for r in g2.edges.filter("src < dst").collect()}
    assert edges == {(0, 1): 3.5, (1, 2): 7.0}
    assert g2.num_nodes() == 3


def test_apply_events_node_removal_drops_incident_edges(spark):
    g = Graph.of(spark, [(0, 1), (1, 2), (2, 0)], n=3)
    ev = events_of(spark, [(1, "NODE_REMOVAL", 1, None, None)])
    g2 = apply_events(g, ev)
    assert g2.num_nodes() == 2
    edges = {(r["src"], r["dst"]) for r in g2.edges.filter("src < dst").collect()}
    assert edges == {(0, 2)}


def test_replay_at_time_travel(spark):
    g = Graph.of(spark, [], n=2)
    ev = events_of(spark, [
        (1, "EDGE_ADDITION", 0, 1, 1.0),
        (5, "EDGE_REMOVAL", 0, 1, None),
    ])
    assert replay_at(g, ev, 1).num_edges() == 1
    assert replay_at(g, ev, 5).num_edges() == 0


def test_fold_order_not_last_writer_wins(spark):
    # two increments then an addition reset: order matters
    g = Graph.of(spark, [], n=2, weighted=True)
    ev = events_of(spark, [
        (1, "EDGE_ADDITION", 0, 1, 1.0),
        (2, "EDGE_WEIGHT_INCREMENT", 0, 1, 2.0),
        (3, "EDGE_WEIGHT_INCREMENT", 0, 1, 3.0),
    ])
    g2 = apply_events(g, ev)
    w = g2.edges.filter("src = 0 and dst = 1").collect()[0]["weight"]
    assert w == 6.0


def test_parse_dgs_lines(spark):
    lines = spark.createDataFrame(
        [("an 0",), ("an 1",), ("ae 0 1 2.5",), ("de 0 1",), ("st",)], "value string"
    )
    ev = parse_dgs_lines(lines).orderBy("seq").collect()
    assert [r["type"] for r in ev] == [
        "NODE_ADDITION", "NODE_ADDITION", "EDGE_ADDITION", "EDGE_REMOVAL", "TIME_STEP",
    ]
    assert ev[2]["w"] == 2.5


def test_dyn_cc_addition_merges_and_matches_static(spark):
    # two components merge via an added edge; result == fresh recompute
    # (the reference's dynamic-vs-static cross-check,
    # ConnectedComponentsGTest.cpp:319-390)
    g = Graph.of(spark, [(0, 1), (2, 3)], n=5)  # {0,1} {2,3} {4}
    dyn = DynConnectedComponents(g)
    assert len(set(_labels(dyn.labels).values())) == 3
    ev = events_of(spark, [(1, "EDGE_ADDITION", 1, 2, 1.0)])
    labels = _labels(dyn.update_batch(ev))
    assert labels == _labels(connected_components(apply_events(g, ev)))
    assert len(set(labels.values())) == 2 and labels[3] == 0


def test_dyn_cc_removal_recomputes(spark):
    g = Graph.of(spark, [(0, 1), (1, 2)], n=3)
    dyn = DynConnectedComponents(g)
    ev = events_of(spark, [(1, "EDGE_REMOVAL", 1, 2, None)])
    labels = _labels(dyn.update_batch(ev))
    assert len(set(labels.values())) == 2 and labels[2] == 2


def test_dyn_cc_removal_is_component_scoped(spark):
    # two components; severing one must not disturb the other's labels,
    # and the result must equal a fresh static run (min-id labels)
    g = Graph.of(spark, [(0, 1), (1, 2), (2, 3), (5, 6), (6, 7)], n=8)
    dyn = DynConnectedComponents(g)
    ev = events_of(spark, [(1, "EDGE_REMOVAL", 1, 2, None)])
    labels = _labels(dyn.update_batch(ev))
    fresh = _labels(connected_components(apply_events(g, ev)))
    assert labels == fresh
    assert labels[2] == 2 and labels[3] == 2          # split half relabeled
    assert labels[5] == labels[6] == labels[7] == 5   # untouched comp kept


def test_dyn_cc_mixed_batch_split_and_cross_merge(spark):
    # one batch: split {0,1,2,3} at (1,2) AND merge the severed half into
    # the previously-untouched component {5,6} — exercises the stitched
    # seed + full-graph merge finisher
    g = Graph.of(spark, [(0, 1), (1, 2), (2, 3), (5, 6)], n=7)
    dyn = DynConnectedComponents(g)
    ev = events_of(spark, [
        (1, "EDGE_REMOVAL", 1, 2, None),
        (2, "EDGE_ADDITION", 3, 5, 1.0),
        (3, "EDGE_ADDITION", 4, 6, 1.0),
    ])
    labels = _labels(dyn.update_batch(ev))
    fresh = _labels(connected_components(apply_events(g, ev)))
    assert labels == fresh
    assert labels[5] == labels[4] == labels[2] == 2   # merged via 3-5, 4-6
    assert labels[0] == labels[1] == 0


def test_dyn_cc_node_removal_and_successive_batches(spark):
    g = Graph.of(spark, [(0, 1), (1, 2), (2, 0), (3, 4)], n=5)
    dyn = DynConnectedComponents(g)
    l1 = _labels(dyn.update_batch(
        events_of(spark, [(1, "NODE_REMOVAL", 1, None, None)])
    ))
    g1 = apply_events(g, events_of(spark, [(1, "NODE_REMOVAL", 1, None, None)]))
    assert l1 == _labels(connected_components(g1))
    assert 1 not in l1 and l1[0] == l1[2] == 0  # triangle survives via (2,0)
    # follow-up additions warm-start from the scoped labels
    l2 = _labels(dyn.update_batch(
        events_of(spark, [(1, "EDGE_ADDITION", 2, 3, 1.0)])
    ))
    assert l2[4] == 0 and len(set(l2.values())) == 1


def test_apsp_update_additions_matches_recompute(spark):
    """DynAPSP batch insertion == fresh APSP (DynAPSP.cpp updateMatrix)."""
    from networkit_spark.operators.distance import (
        apsp_update_additions,
        multi_source_bfs,
    )

    base = [(0, 1), (1, 2), (2, 3), (4, 5), (5, 6)]
    added = [(3, 4), (0, 6)]
    g0 = Graph.of(spark, base, n=7)
    g1 = Graph.of(spark, base + added, n=7)
    d0 = multi_source_bfs(g0, g0.nodes, with_sigma=False).visited
    add_df = spark.createDataFrame(added, "src long, dst long")
    upd = {
        (r["root"], r["node"]): r["dist"]
        for r in apsp_update_additions(d0, add_df).collect()
    }
    fresh = {
        (r["root"], r["node"]): r["dist"]
        for r in multi_source_bfs(g1, g1.nodes, with_sigma=False).visited.collect()
    }
    assert upd == fresh


def test_dyn_katz_matches_fresh_run(spark):
    """DynKatzCentrality: warm-started update == fresh Katz on the
    updated graph (centrality/DynKatzCentrality.cpp gtest pattern),
    for additions AND removals, with alpha pinned at construction."""
    from networkit_spark.operators.spectral import katz_centrality
    from networkit_spark.streaming.dynamics import (
        EDGE_ADDITION,
        EDGE_REMOVAL,
        DynKatzCentrality,
        events_of,
    )

    base = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0), (1, 3)]
    g0 = Graph.of(spark, base, n=6)
    dyn = DynKatzCentrality(g0, tol=1e-9)
    alpha = dyn.alpha

    # batch 1: add two edges (one touching the isolated node 5)
    ev1 = events_of(
        spark, [(1, EDGE_ADDITION, 2, 5, 1.0), (2, EDGE_ADDITION, 0, 3, 1.0)]
    )
    got1 = {r["id"]: round(r["score"], 8) for r in dyn.update_batch(ev1).collect()}
    fresh1 = katz_centrality(dyn.graph, alpha=alpha, tol=1e-9)
    want1 = {r["id"]: round(r["score"], 8) for r in fresh1.scores.collect()}
    assert got1 == want1
    # warm start converges in far fewer iterations than the cold run
    assert dyn.iterations < fresh1.iterations

    # batch 2: removal re-converges from the warm vector too
    ev2 = events_of(spark, [(3, EDGE_REMOVAL, 1, 3, 1.0)])
    got2 = {r["id"]: round(r["score"], 8) for r in dyn.update_batch(ev2).collect()}
    want2 = {
        r["id"]: round(r["score"], 8)
        for r in katz_centrality(dyn.graph, alpha=alpha, tol=1e-9).scores.collect()
    }
    assert got2 == want2


def test_dyn_katz_fixed_budget_replayable(spark):
    """DynKatzCentrality with tol=0 + max_iterations runs a fixed,
    deterministic iteration budget (the gate's SQL-replayable mode):
    init 10 rounds on the base graph, update 5 warm rounds on the grown
    graph — identical to driving katz_centrality manually with
    initial_scores (centrality/DynKatzCentrality.cpp update contract)."""
    from networkit_spark.operators.spectral import katz_centrality
    from networkit_spark.streaming.dynamics import (
        EDGE_ADDITION,
        DynKatzCentrality,
        events_of,
    )

    base = [(0, 1), (1, 2), (2, 3), (3, 0)]
    g0 = Graph.of(spark, base, n=4)
    g1 = Graph.of(spark, base + [(0, 2)], n=4)
    dyn = DynKatzCentrality(g0, alpha=0.2, tol=0.0, max_iterations=10)
    assert dyn.iterations == 10
    out = dyn.update_batch(
        events_of(spark, [(1, EDGE_ADDITION, 0, 2, 1.0)]), max_iterations=5
    )
    assert dyn.iterations == 5
    got = {r["id"]: r["score"] for r in out.collect()}
    r0 = katz_centrality(g0, alpha=0.2, tol=0.0, max_iterations=10)
    r1 = katz_centrality(
        g1, alpha=0.2, tol=0.0, max_iterations=5, initial_scores=r0.raw_scores
    )
    want = {r["id"]: r["score"] for r in r1.scores.collect()}
    assert got == pytest.approx(want, abs=1e-15)


def test_dyn_approx_betweenness_sample_maintenance(spark):
    """DynApproxBetweenness (centrality/DynApproxBetweenness.cpp:118-175):
    the pair sample persists across batches; only samples whose source
    SSSP changed are resampled; untouched batches are no-ops; every
    stored path stays a valid shortest path after the update; the
    estimate tracks exact normalized betweenness within epsilon."""
    import random

    from networkit_spark.operators.distance import betweenness, multi_source_bfs
    from networkit_spark.streaming.dynamics import (
        EDGE_ADDITION,
        DynApproxBetweenness,
        events_of,
    )

    n = 16
    rng = random.Random(5)
    edges = sorted({tuple(sorted(rng.sample(range(n), 2))) for _ in range(26)})
    g0 = Graph.of(spark, edges, n=n)
    dab = DynApproxBetweenness(g0, epsilon=0.35, delta=0.1, seed=3)

    def all_dists(g):
        vis = multi_source_bfs(g, g.nodes, with_sigma=False).visited
        return {(r["root"], r["node"]): r["dist"] for r in vis.collect()}

    def check_paths_valid(g):
        d = all_dists(g)
        rows = dab.contribs.join(dab.pairs, ["pair", "u"]).collect()
        per_pair = {}
        for r in rows:
            per_pair.setdefault((r["pair"], r["u"], r["v"]), []).append(r["id"])
        for (pair, u, v), interiors in per_pair.items():
            assert (u, v) in d, (u, v)
            assert len(interiors) == d[(u, v)] - 1, (pair, u, v, interiors)
            for z in interiors:
                assert d[(u, z)] + d[(z, v)] == d[(u, v)], (pair, u, z, v)

    check_paths_valid(g0)

    # a batch touching nothing near the sampled sources' component:
    # two brand-new nodes — no root's SSSP changes, nothing resampled
    before = sorted(map(tuple, dab.contribs.collect()))
    dab.update_batch(events_of(spark, [(1, EDGE_ADDITION, 100, 101, 1.0)]))
    after = sorted(map(tuple, dab.contribs.collect()))
    assert before == after

    # a real batch: shortcut edges change distances; resampled paths are
    # valid shortest paths of the NEW graph
    ev = events_of(
        spark, [(2, EDGE_ADDITION, 0, n - 1, 1.0), (3, EDGE_ADDITION, 1, n - 2, 1.0)]
    )
    scores = {r["id"]: r["score"] for r in dab.update_batch(ev).collect()}
    check_paths_valid(dab.graph)

    exact = {r["id"]: r["score"] for r in betweenness(dab.graph).collect()}
    n1 = dab.graph.num_nodes()
    worst = max(
        abs(scores.get(u, 0.0) - exact.get(u, 0.0) / (n1 * (n1 - 1)))
        for u in exact
    )
    assert worst <= 0.35, worst


def test_dyn_betweenness_one_node(spark):
    """DynBetweennessOneNode (centrality/DynBetweennessOneNode.cpp):
    initial score equals the ordered-pair brute force; a far-component
    addition changes nothing and resamples nothing; a shortcut addition
    updates incrementally to EXACTLY the fresh-recompute value (the
    kernel is deterministic); removals raise."""
    import random
    from collections import deque

    from networkit_spark.streaming.dynamics import (
        EDGE_ADDITION,
        EDGE_REMOVAL,
        DynBetweennessOneNode,
        events_of,
    )

    def brute_bcx(edges, nodes, x):
        nbrs = {u: set() for u in nodes}
        for a, b in edges:
            nbrs[a].add(b)
            nbrs[b].add(a)

        def bfs(s):
            d, sig = {s: 0}, {s: 1.0}
            q = deque([s])
            order = []
            while q:
                u = q.popleft()
                order.append(u)
                for w in nbrs[u]:
                    if w not in d:
                        d[w] = d[u] + 1
                        sig[w] = 0.0
                        q.append(w)
                    if d[w] == d[u] + 1:
                        sig[w] += sig[u]
            return d, sig

        D, S = {}, {}
        for s in nodes:
            D[s], S[s] = bfs(s)
        bcx = 0.0
        for s in nodes:
            for t in nodes:
                if s == x or t == x or t not in D[s]:
                    continue
                if x in D[s] and t in D[x] and D[s][x] + D[x][t] == D[s][t]:
                    bcx += S[s][x] * S[x][t] / S[s][t]
        return bcx

    n = 14
    rng = random.Random(17)
    edges = sorted({tuple(sorted(rng.sample(range(n), 2))) for _ in range(22)})
    nodes = list(range(n))
    g = Graph.of(spark, edges, n=n)
    x = 3
    dyn = DynBetweennessOneNode(g, x)
    assert dyn.score == pytest.approx(brute_bcx(edges, nodes, x), abs=1e-9)

    # far-component addition: two new nodes; bcx unchanged
    before = dyn.score
    vis_before = sorted(map(tuple, dyn.vis.filter("root < 100").collect()))
    dyn.update_batch(events_of(spark, [(1, EDGE_ADDITION, 100, 101, 1.0)]))
    assert dyn.score == pytest.approx(before, abs=1e-12)
    vis_after = sorted(map(tuple, dyn.vis.filter("root < 100").collect()))
    assert vis_before == vis_after  # untouched roots kept verbatim

    # real shortcut: incremental == fresh recompute, exactly
    ev = events_of(spark, [(2, EDGE_ADDITION, 0, n - 1, 1.0)])
    got = dyn.update_batch(ev)
    fresh = DynBetweennessOneNode(dyn.graph, x)
    assert got == pytest.approx(fresh.score, abs=1e-9)
    new_edges = sorted(set(edges) | {(0, n - 1)})
    assert got == pytest.approx(
        brute_bcx(new_edges, nodes + [100, 101], x), abs=1e-9
    )

    with pytest.raises(ValueError, match="insertions"):
        dyn.update_batch(events_of(spark, [(3, EDGE_REMOVAL, 0, 1, 1.0)]))


def test_dyn_betweenness_one_node_max_nodes_guard(spark):
    """DynBetweennessOneNode keeps O(n²) (root, node) state: the
    max_nodes cap raises with an explicit opt-out on larger graphs
    (the cut_clustering convention) while small-graph scores are
    unchanged by the guard plumbing."""
    from networkit_spark.streaming.dynamics import DynBetweennessOneNode

    g = Graph.of(spark, [(0, 1), (1, 2), (2, 3)], n=4)
    with pytest.raises(ValueError, match="max_nodes=2"):
        DynBetweennessOneNode(g, 1, max_nodes=2)
    # opt-out and default both still compute; path graph: bc(1) counts
    # ordered pairs (0,2),(0,3),(2,0),(3,0) -> 4
    assert DynBetweennessOneNode(g, 1, max_nodes=None).score == pytest.approx(4.0)
    assert DynBetweennessOneNode(g, 1).score == pytest.approx(4.0)


def test_dynamic_generator_event_streams(spark):
    """Dynamic generators emit reference-shaped GraphEvent streams
    (generators/DynamicPathGenerator.cpp,
    DynamicDorogovtsevMendesGenerator.cpp,
    DynamicForestFireGenerator.cpp): replaying the stream reproduces the
    matching static graph; prefixes give the intermediate states."""
    from networkit_spark.generators import (
        dorogovtsev_mendes,
        dynamic_dorogovtsev_mendes_events,
        dynamic_forest_fire_events,
        dynamic_path_events,
    )
    from networkit_spark.operators.components import connected_components
    from networkit_spark.streaming.dynamics import TIME_STEP, apply_events, replay_at

    empty = Graph.of(spark, [], n=0)

    ev = dynamic_path_events(spark, 5)
    g = apply_events(empty, ev)
    assert g.num_nodes() == 6
    path = sorted(map(tuple, g.canonical_undirected_edges().select("src", "dst").collect()))
    assert path == [(i, i + 1) for i in range(5)]

    ev2 = dynamic_dorogovtsev_mendes_events(spark, 7, seed=5)
    g2 = apply_events(empty, ev2)
    want = dorogovtsev_mendes(spark, 10, seed=5)
    e_dyn = sorted(map(tuple, g2.canonical_undirected_edges().select("src", "dst").collect()))
    e_sta = sorted(map(tuple, want.canonical_undirected_edges().select("src", "dst").collect()))
    assert e_dyn == e_sta and g2.num_nodes() == 10
    # prefix at the 3rd TIME_STEP = triangle + 2 growth steps
    steps = [r["seq"] for r in ev2.filter(F.col("type") == TIME_STEP).orderBy("seq").collect()]
    mid = replay_at(empty, ev2, steps[2])
    assert mid.num_nodes() == 5
    assert mid.canonical_undirected_edges().count() == 3 + 2 * 2

    ev3 = dynamic_forest_fire_events(spark, 8, p=0.4, seed=3)
    ev3b = dynamic_forest_fire_events(spark, 8, p=0.4, seed=3)
    assert sorted(map(tuple, ev3.collect())) == sorted(map(tuple, ev3b.collect()))
    g3 = apply_events(empty, ev3)
    assert g3.num_nodes() == 9
    assert connected_components(g3).select("label").distinct().count() == 1

    # portable mode replays a direct transcription of the md5 burning
    # draws (the dyn_replay 'ff' oracle regrows this state machine
    # draw-for-draw in SQL)
    from networkit_spark.functions.porthash import DEFAULT_PRIME, md5_mod_py

    evp = dynamic_forest_fire_events(spark, 8, p=0.3, seed=42, portable_hash=True)
    gp = apply_events(empty, evp)
    thresh = int(0.3 * DEFAULT_PRIME)
    nbrs = {0: set()}
    want_e = []
    for v in range(1, 9):
        a = md5_mod_py(f"a:{v}", salt="ff42:") % v
        visited, frontier, burned = {a}, [a], [a]
        while frontier:
            x = frontier.pop(0)
            valid = sorted(w for w in nbrs[x] if w not in visited)
            t = 0
            while valid:
                if md5_mod_py(f"c:{v}:{x}:{t}", salt="ff42:") >= thresh:
                    break
                i = md5_mod_py(f"i:{v}:{x}:{t}", salt="ff42:") % len(valid)
                t += 1
                w = valid.pop(i)
                visited.add(w)
                frontier.append(w)
                burned.append(w)
        nbrs[v] = set(burned)
        for w in burned:
            nbrs[w].add(v)
            want_e.append((w, v))
    got_e = sorted(
        map(tuple, gp.canonical_undirected_edges().select("src", "dst").collect())
    )
    assert got_e == sorted(want_e)


def test_dynamic_barabasi_albert_events(spark):
    """DynamicBarabasiAlbert (DynamicBarabasiAlbertGenerator.cpp):
    k-path seed, degree-proportional attachment, k distinct targets per
    step; the replayed graph is connected with the expected counts and
    early nodes end up with the highest degrees."""
    from networkit_spark.generators import dynamic_barabasi_albert_events
    from networkit_spark.operators.components import connected_components
    from networkit_spark.streaming.dynamics import apply_events

    empty = Graph.of(spark, [], n=0)
    ev = dynamic_barabasi_albert_events(spark, 12, k=2, seed=8)
    g = apply_events(empty, ev)
    assert g.num_nodes() == 14
    assert g.canonical_undirected_edges().count() == 1 + 12 * 2
    assert connected_components(g).select("label").distinct().count() == 1
    degs = {r["id"]: r["deg"] for r in g.degrees().collect()}
    # preferential attachment concentrates degree on early nodes
    import statistics

    assert max(degs, key=degs.get) < 5
    assert max(degs.values()) >= 2 * statistics.median(degs.values())

    # portable mode: the uniform-edge-endpoint draw is an exact
    # degree-proportional sampler; the stream replays to a transcription
    # of the same bounded-attempt md5 draws (the dyn_replay 'ba' oracle
    # regrows this CTE-for-CTE)
    from networkit_spark.functions.porthash import md5_mod_py
    from networkit_spark.generators import BA_PORTABLE_ATTEMPTS

    evp = dynamic_barabasi_albert_events(spark, 8, k=2, seed=42, portable_hash=True)
    gp = apply_events(empty, evp)
    edge_list = [(1, 0)]
    for u in range(2, 10):
        targets: set[int] = set()
        for a in range(BA_PORTABLE_ATTEMPTS):
            if len(targets) >= 2:
                break
            idx = md5_mod_py(f"{u}:{a}", salt="ba42:") % (2 * len(edge_list))
            targets.add(edge_list[idx // 2][idx % 2])
        for v in sorted(targets):
            edge_list.append((u, v))
    want = sorted((min(a, b), max(a, b)) for a, b in edge_list)
    got = sorted(
        (r["src"], r["dst"])
        for r in gp.canonical_undirected_edges().collect()
    )
    assert got == want


def test_dynamic_hyperbolic_events(spark):
    """DynamicHyperbolicGenerator (generators/
    DynamicHyperbolicGenerator.cpp, T=0 threshold model): the initial
    block replays to the static hyperbolic graph; replaying the FULL
    stream yields exactly the threshold edges of the final moved
    positions; move_prob=0 emits no edge events; streams are
    deterministic per seed."""
    from networkit_spark.generators import (
        _hyperbolic_threshold_edges,
        dynamic_hyperbolic_events,
        hyperbolic,
    )
    from networkit_spark.streaming.dynamics import TIME_STEP, apply_events

    empty = Graph.of(spark, [], n=0)
    n, steps, seed = 60, 3, 7

    ev, state = dynamic_hyperbolic_events(
        spark, n, steps, move_prob=0.6, move_distance=0.05, seed=seed,
        return_state=True,
    )
    # initial block == static generator at the same seed
    import math

    R = 2.0 * math.log(8.0 * n / (math.pi * 6.0))
    g_static = hyperbolic(spark, n, seed=seed)
    first_ts = ev.filter(F.col("type") == TIME_STEP).agg(F.min("seq")).collect()[0][0]
    from networkit_spark.streaming.dynamics import replay_at

    g_init = replay_at(empty, ev, int(first_ts))
    e_init = sorted(map(tuple, g_init.canonical_undirected_edges().select("src", "dst").collect()))
    e_sta = sorted(map(tuple, g_static.canonical_undirected_edges().select("src", "dst").collect()))
    assert e_init == e_sta and g_init.num_nodes() == n

    # full replay == threshold edges of the final positions
    g_fin = apply_events(empty, ev)
    e_fin = sorted(map(tuple, g_fin.canonical_undirected_edges().select("src", "dst").collect()))
    K = max(8, int(math.sqrt(n)))
    e_want = sorted(
        (int(r["src"]), int(r["dst"]))
        for r in _hyperbolic_threshold_edges(spark, state, R, 16, K).collect()
    )
    assert e_fin == e_want
    # movement must actually change the structure at this rate
    assert e_fin != e_init
    assert ev.filter(F.col("type") == TIME_STEP).count() == steps + 1

    # determinism + the frozen case
    ev_b = dynamic_hyperbolic_events(
        spark, n, steps, move_prob=0.6, move_distance=0.05, seed=seed
    )
    assert sorted(map(tuple, ev.collect())) == sorted(map(tuple, ev_b.collect()))
    ev0 = dynamic_hyperbolic_events(
        spark, n, 2, move_prob=0.0, seed=seed, write_initial=False
    )
    assert ev0.filter(F.col("type") != TIME_STEP).count() == 0


def test_dynamic_pubweb_events(spark):
    """DynamicPubWebGenerator (generators/DynamicPubWebGenerator.cpp):
    node count is invariant (5% deleted + 5% inserted from the INITIAL
    count each step), ids grow past n, replaying the full stream gives
    exactly the mutual-kNN structure (edges AND 0.01/d² weights) of the
    surviving positions, and surviving eligible edges are re-weighted
    via EDGE_WEIGHT_UPDATE."""
    from networkit_spark.generators import (
        _pubweb_mutual_knn,
        dynamic_pubweb_events,
        pubweb,
    )
    from networkit_spark.streaming.dynamics import (
        EDGE_WEIGHT_UPDATE,
        NODE_ADDITION,
        NODE_REMOVAL,
        TIME_STEP,
        apply_events,
    )

    empty = Graph.of(spark, [], n=0)
    n, steps, seed = 80, 3, 11
    ev, pos = dynamic_pubweb_events(
        spark, n, steps, num_dense_areas=4, neighborhood_radius=0.2,
        max_neighbors=3, seed=seed, return_state=True,
    )
    assert ev.filter(F.col("type") == TIME_STEP).count() == steps + 1
    churn = int(n * 0.05)
    assert ev.filter(F.col("type") == NODE_REMOVAL).count() == churn * steps
    assert ev.filter(F.col("type") == NODE_ADDITION).count() == n + churn * steps

    g_fin = apply_events(empty, ev)
    assert g_fin.num_nodes() == n  # invariant count, grown id space
    got = {
        (int(r["src"]), int(r["dst"])): round(float(r["weight"]), 9)
        for r in g_fin.edges.filter(F.col("src") < F.col("dst"))
        .select("src", "dst", "weight")
        .collect()
    }
    want = {
        (int(r["src"]), int(r["dst"])): round(float(r["weight"]), 9)
        for r in _pubweb_mutual_knn(spark, pos, 0.2, 3).collect()
    }
    assert got == want and len(want) > 0
    # ids beyond the initial range exist after churn
    assert max(r["id"] for r in g_fin.nodes.collect()) >= n
    # surviving eligible edges are re-weighted every step
    assert ev.filter(F.col("type") == EDGE_WEIGHT_UPDATE).count() > 0

    # initial block == the static generator
    first_ts = ev.filter(F.col("type") == TIME_STEP).agg(F.min("seq")).collect()[0][0]
    from networkit_spark.streaming.dynamics import replay_at

    g_init = replay_at(empty, ev, int(first_ts))
    g_sta = pubweb(spark, n, num_dense_areas=4, neighborhood_radius=0.2,
                   max_neighbors=3, seed=seed)
    e_init = sorted(map(tuple, g_init.canonical_undirected_edges().select("src", "dst").collect()))
    e_sta = sorted(map(tuple, g_sta.canonical_undirected_edges().select("src", "dst").collect()))
    assert e_init == e_sta


def test_dyn_top_harmonic_closeness_matches_static(spark):
    """DynTopHarmonicCloseness (centrality/DynTopHarmonicCloseness.cpp
    result contract): ranking() after each seeded event batch equals a
    fresh top_closeness(harmonic=True) on the updated graph, for
    additions and removals, ties by id."""
    from networkit_spark.operators.distance import top_closeness
    from networkit_spark.streaming.dynamics import (
        EDGE_ADDITION,
        EDGE_REMOVAL,
        DynTopHarmonicCloseness,
        events_of,
    )

    base = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 0), (1, 4)]
    g0 = Graph.of(spark, base, n=8)
    dyn = DynTopHarmonicCloseness(g0, k=4)

    def rank(df):
        return [(r["id"], round(r["score"], 9)) for r in df.collect()]

    assert rank(dyn.ranking()) == rank(top_closeness(g0, k=4, harmonic=True))

    ev1 = events_of(
        spark, [(1, EDGE_ADDITION, 6, 0, 1.0), (2, EDGE_ADDITION, 6, 3, 1.0)]
    )
    got1 = rank(dyn.update_batch(ev1))
    assert got1 == rank(top_closeness(dyn.graph, k=4, harmonic=True))

    ev2 = events_of(spark, [(3, EDGE_REMOVAL, 1, 4, 1.0)])
    got2 = rank(dyn.update_batch(ev2))
    assert got2 == rank(top_closeness(dyn.graph, k=4, harmonic=True))
    assert got1 != got2  # the batches actually moved the ranking

    import pytest as _pytest

    with _pytest.raises(ValueError, match="k"):
        DynTopHarmonicCloseness(g0, k=0)
