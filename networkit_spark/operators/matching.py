"""Independent set, matching, spanning forest — propose/accept supersteps.

Reference semantics:

- ``Luby`` maximal independent set (``independentset/Luby.cpp``, 195 LoC):
  classic rounds — every live node draws a random priority; local minima
  join the set; they and their neighbors leave the graph.
- ``SuitorMatcher`` (``matching/SuitorMatcher.cpp``): each node proposes
  to its best-weight neighbor; mutual proposals match — we implement the
  synchronous propose/accept variant (one round = one join-agg pair),
  iterating on the unmatched remainder. Deterministic tie-break:
  (weight desc, neighbor id asc).
- ``KruskalMSF`` / ``SpanningForest`` (``graph/KruskalMSF.cpp``): the
  reference sorts edges and runs union-find — inherently sequential; the
  distributed analogue is **Borůvka**: every component picks its
  minimum-weight incident edge, picked edges merge components (via the
  connected-components kernel on the picked subset), repeat — O(log n)
  rounds, everything join-agg.

All three are deterministic given the seed (Luby) / tie-breaks, so they
are stable across parallelism levels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.pin import pin


def _sym_edges(g: Graph) -> DataFrame:
    e = g.symmetrized_edges() if g.directed else g.edges
    return e.filter(F.col("src") != F.col("dst"))


def luby_independent_set(
    g: Graph, seed: int = 42, max_rounds: int = 64, portable_hash: bool = False
) -> DataFrame:
    """(id LONG, in_set BOOLEAN): a maximal independent set.

    Per round: priority(v) = hash(v, round, seed); v enters the set iff
    its priority beats every live neighbor's (ties by id); winners'
    neighbors drop out. ``portable_hash`` draws priorities from the
    md5-based cross-engine hash (``functions/porthash.py``) so a DuckDB
    oracle can replay the exact same rounds; the default ``xxhash64`` is
    cheaper and stays the internal path.
    """
    from networkit_spark.functions.porthash import md5_mod

    live = g.nodes
    edges = _sym_edges(g).select("src", "dst").transform(pin)
    chosen = []
    for rnd in range(max_rounds):
        n_live = live.count()
        if n_live == 0:
            break
        prio = (
            md5_mod(F.col("id"), salt=f"luby{seed}:{rnd}:")
            if portable_hash
            else F.xxhash64(F.col("id"), F.lit(rnd), F.lit(seed))
        )
        pri = live.select("id", prio.alias("p"))
        # max neighbor priority among live neighbors
        nbr = (
            edges.join(pri.withColumnRenamed("id", "src"), "src")
            .join(live.withColumnRenamed("id", "dst"), "dst", "left_semi")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.max(F.struct("p", F.col("src").alias("tie"))).alias("mx"))
        )
        winners = (
            pri.join(nbr, "id", "left")
            .filter(
                F.col("mx").isNull()
                | (F.struct(F.col("p"), F.col("id").alias("tie")) > F.col("mx"))
            )
            .select("id")
            .transform(pin)
        )
        chosen.append(winners)
        # remove winners and their neighbors from the live set
        loser = (
            edges.join(winners.withColumnRenamed("id", "src"), "src", "left_semi")
            .select(F.col("dst").alias("id"))
            .distinct()
        )
        live = (
            live.join(winners, "id", "left_anti")
            .join(loser, "id", "left_anti")
            .transform(pin)
        )
    if not chosen:  # empty node set: nothing to choose
        return g.nodes.withColumn("in_set", F.lit(False))
    in_set = chosen[0]
    for c in chosen[1:]:
        in_set = in_set.unionByName(c)
    return g.nodes.join(
        in_set.withColumn("in_set", F.lit(True)), "id", "left"
    ).select("id", F.coalesce("in_set", F.lit(False)).alias("in_set"))


def suitor_matching(g: Graph, max_rounds: int | None = None) -> DataFrame:
    """(u LONG, v LONG) matched pairs (u < v) — greedy weighted matching by
    synchronous propose/accept (SuitorMatcher semantics; ties by id).

    Always maximal, like the reference: the globally best live edge under
    (weight desc, pair asc) is mutual every round, so each round matches
    ≥ 1 pair and the loop runs until NO live edge remains (≤ ⌈n/2⌉ rounds;
    an adversarial strictly-increasing path needs the full O(n) — a fixed
    round cap would silently return a non-maximal matching there)."""
    edges = _sym_edges(g).select("src", "dst", "weight").transform(pin)
    unmatched = g.nodes
    matched_pairs = None
    w = Window.partitionBy("src").orderBy(F.desc("weight"), F.asc("dst"))
    rounds = 0
    while True:
        rounds += 1
        if max_rounds is not None and rounds > max_rounds:
            break
        # live edges: both endpoints unmatched
        live = (
            edges.join(unmatched.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(unmatched.withColumnRenamed("id", "dst"), "dst", "left_semi")
        )
        if live.limit(1).count() == 0:
            break
        prop = (
            live.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("src", "dst")
        )
        mutual = (
            prop.alias("a")
            .join(
                prop.alias("b"),
                (F.col("a.src") == F.col("b.dst")) & (F.col("a.dst") == F.col("b.src")),
                "left_semi",
            )
            .filter(F.col("src") < F.col("dst"))
            .transform(pin)
        )
        if mutual.limit(1).count() == 0:
            break
        matched_pairs = (
            mutual if matched_pairs is None else matched_pairs.unionByName(mutual)
        )
        newly = (
            mutual.select(F.col("src").alias("id"))
            .unionByName(mutual.select(F.col("dst").alias("id")))
        )
        unmatched = unmatched.join(newly, "id", "left_anti").transform(pin)
    if matched_pairs is None:
        return g.nodes.sparkSession.createDataFrame([], "u long, v long")
    return matched_pairs.select(F.col("src").alias("u"), F.col("dst").alias("v"))


def spanning_forest(g: Graph, max_rounds: int = 32, tiebreak=None) -> DataFrame:
    """(src, dst, weight): a minimum spanning forest via Borůvka rounds.

    Each round every current component selects its minimum-weight outgoing
    edge (ties: weight asc, then ``tiebreak`` asc if given, then canonical
    (src, dst) asc — deterministic), selected edges join the forest,
    components contract. Terminates in O(log n) rounds.

    ``tiebreak``: optional Column expression over the canonical
    (src < dst) edge columns, ordered asc among equal weights. Used by
    :func:`random_maximum_spanning_forest` to randomize tie resolution
    WITHOUT perturbing the weights themselves (a perturbation would
    reorder distinct weights whose gap is smaller than the jitter).
    """
    from networkit_spark.operators.components import connected_components

    sym = _sym_edges(g).select(
        F.least("src", "dst").alias("src"),
        F.greatest("src", "dst").alias("dst"),
        "weight",
    ).dropDuplicates(["src", "dst"])
    sym = sym.withColumn(
        "tb", tiebreak if tiebreak is not None else F.lit(0)
    ).transform(pin)

    labels = g.nodes.select(F.col("id").alias("node"), F.col("id").alias("label"))
    forest = None
    for _ in range(max_rounds):
        lab_e = (
            sym.join(
                labels.select(F.col("node").alias("src"), F.col("label").alias("ls")),
                "src",
            )
            .join(
                labels.select(F.col("node").alias("dst"), F.col("label").alias("ld")),
                "dst",
            )
            .filter(F.col("ls") != F.col("ld"))
        )
        if lab_e.limit(1).count() == 0:
            break
        # min outgoing edge per component (consider both component views)
        cand = lab_e.select(
            F.col("ls").alias("comp"), "src", "dst", "weight", "tb"
        ).unionByName(
            lab_e.select(F.col("ld").alias("comp"), "src", "dst", "weight", "tb")
        )
        wmin = Window.partitionBy("comp").orderBy(
            F.asc("weight"), F.asc("tb"), F.asc("src"), F.asc("dst")
        )
        picked = (
            cand.withColumn("rn", F.row_number().over(wmin))
            .filter(F.col("rn") == 1)
            .select("src", "dst", "weight")
            .dropDuplicates(["src", "dst"])
            .transform(pin)
        )
        forest = picked if forest is None else forest.unionByName(picked).dropDuplicates(
            ["src", "dst"]
        )
        # contract: components connected by the forest so far
        fg = Graph.from_edges(forest, directed=False, nodes=g.nodes)
        labels = connected_components(fg).transform(pin)
    if forest is None:
        return g.nodes.sparkSession.createDataFrame([], "src long, dst long, weight double")
    return forest


def local_max_matching(g: Graph, max_rounds: int = 64) -> DataFrame:
    """(u, v) matched pairs (u < v) — LocalMaxMatcher
    (``matching/LocalMaxMatcher.cpp``): repeatedly match every LOCALLY
    DOMINANT edge (strictly heavier than every adjacent live edge, ties
    broken by canonical (weight desc, u asc, v asc)), then drop the
    matched endpoints. Each round is two keyed aggregations — the edge
    analogue of Luby rounds; expected O(log n) rounds.
    """
    edges = (
        g.canonical_undirected_edges()
        .join(
            (g.symmetrized_edges() if g.directed else g.edges)
            .select(
                F.least("src", "dst").alias("src"),
                F.greatest("src", "dst").alias("dst"),
                "weight",
            )
            .dropDuplicates(["src", "dst"]),
            ["src", "dst"],
        )
        .transform(pin)
    )
    matched = []
    live = edges
    for _ in range(max_rounds):
        if live.isEmpty():
            break
        # per-node best incident edge under (weight desc, src asc, dst asc)
        inc = live.select(
            F.col("src").alias("node"), "src", "dst", "weight"
        ).unionByName(live.select(F.col("dst").alias("node"), "src", "dst", "weight"))
        pri = F.struct(
            F.col("weight"), (-F.col("src")).alias("ns"), (-F.col("dst")).alias("nd")
        )
        best = inc.groupBy("node").agg(F.max(pri).alias("b"))
        cand = (
            live.join(
                best.withColumnRenamed("node", "src").withColumnRenamed("b", "bs"),
                "src",
            )
            .join(
                best.withColumnRenamed("node", "dst").withColumnRenamed("b", "bd"),
                "dst",
            )
            .filter(
                (pri == F.col("bs")) & (pri == F.col("bd"))
            )
            .select("src", "dst")
            .transform(pin)
        )
        if cand.isEmpty():
            break
        matched.append(cand)
        used = cand.select(F.col("src").alias("node")).unionByName(
            cand.select(F.col("dst").alias("node"))
        )
        live = (
            live.join(used.withColumnRenamed("node", "src"), "src", "left_anti")
            .join(used.withColumnRenamed("node", "dst"), "dst", "left_anti")
            .select("src", "dst", "weight")
            .transform(pin)
        )
    spark = g.edges.sparkSession
    if not matched:
        return spark.createDataFrame([], "u long, v long")
    out = matched[0]
    for c in matched[1:]:
        out = out.unionByName(c)
    return out.select(F.col("src").alias("u"), F.col("dst").alias("v"))


def union_maximum_spanning_forest(g: Graph) -> DataFrame:
    """(src, dst, weight) — union of ALL maximum-weight spanning forests
    (``graph/UnionMaximumSpanningForest.cpp:18-75``): an edge belongs to
    some maximum spanning forest iff its endpoints are NOT connected by
    strictly heavier edges.

    Distributed form: process distinct weights DESCENDING; before each
    weight class, the connected components of the strictly-heavier
    subgraph are known — an edge of the class is in the UMSF iff its
    endpoints lie in different components. One CC run per distinct
    weight (the reference's sorted sweep has the same weight-class
    structure); fine when the weight cardinality is bounded, which is
    the common case for similarity/count-valued weights.
    """
    from networkit_spark.operators.components import connected_components

    spark = g.edges.sparkSession
    canon = (
        _sym_edges(g)
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            "weight",
        )
        .dropDuplicates(["src", "dst"])
        .localCheckpoint(eager=True)
    )
    weights = sorted(
        (r["weight"] for r in canon.select("weight").distinct().collect()),
        reverse=True,
    )
    picked = []
    for w in weights:
        heavier = canon.filter(F.col("weight") > w)
        if heavier.isEmpty():
            cls = canon.filter(F.col("weight") == w).select("src", "dst", "weight")
            picked.append(cls)
            continue
        hg = Graph(
            nodes=g.nodes,
            edges=heavier.unionByName(
                heavier.select(
                    F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
                )
            ),
            directed=False,
            weighted=True,
        )
        cc = connected_components(hg)
        cls = (
            canon.filter(F.col("weight") == w)
            .join(
                cc.select(F.col("node").alias("src"), F.col("label").alias("cs")),
                "src",
            )
            .join(
                cc.select(F.col("node").alias("dst"), F.col("label").alias("cd")),
                "dst",
            )
            .filter(F.col("cs") != F.col("cd"))
            .select("src", "dst", "weight")
        )
        picked.append(cls)
    out = picked[0]
    for p_ in picked[1:]:
        out = out.unionByName(p_)
    return out


def random_maximum_spanning_forest(g: Graph, seed: int = 42) -> DataFrame:
    """(src, dst, weight) — ONE maximum spanning forest with random
    tie-breaking (``graph/RandomMaximumSpanningForest.cpp``): equal
    weights are ordered by a seeded hash of the CANONICAL pair, so
    Borůvka's deterministic tie-break becomes a seeded uniform choice
    among maximum forests. The weights themselves are untouched — a
    lexicographic (weight desc, hash) order, not an additive jitter,
    so distinct weights can never be reordered regardless of gap, and
    both orientations of an edge carry the identical tie-break."""
    neg = g.edges.select("src", "dst", (-F.col("weight")).alias("weight"))
    ng = Graph(nodes=g.nodes, edges=neg, directed=g.directed, weighted=True)
    # evaluated over canonical (src < dst) edges inside spanning_forest
    tb = F.xxhash64("src", "dst", F.lit(seed))
    msf = spanning_forest(ng, tiebreak=tb)
    canon = g.canonical_undirected_edges().join(
        (g.symmetrized_edges() if g.directed else g.edges).select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            "weight",
        ).dropDuplicates(["src", "dst"]),
        ["src", "dst"],
    )
    return msf.select("src", "dst").join(canon, ["src", "dst"]).select(
        "src", "dst", "weight"
    )


def path_growing_matcher(
    g: Graph, max_edges: int | None = 500_000
) -> DataFrame:
    """PathGrowingMatcher (``matching/PathGrowingMatcher.cpp``,
    Drake-Hougardy ½-approximation): grow vertex-disjoint paths by
    repeatedly following the heaviest live incident edge, color the path
    edges alternately into two matchings (the alternation flag persists
    ACROSS paths, ``PathGrowingMatcher.cpp:36,96-104``), delete each
    visited vertex, and return the heavier matching (ties → the second,
    ``:150-153``). Returns canonical (src < dst) matched pairs with
    weights. Raises on directed graphs and self-loops like the
    reference's checkInput.

    The algorithm is INHERENTLY sequential — every step conditions on
    all previous deletions — so like the reference it runs as one
    driver-side pass over the (collected) edge list; ``max_edges``
    (default 500k) caps that driver state and raises on larger graphs,
    with ``max_edges=None`` as the explicit opt-out (the
    ``cut_clustering`` convention). For distributed matching at scale
    use :func:`suitor_matching` / :func:`local_max_matching` — this
    operator's value is exact Drake-Hougardy path-growing semantics on
    dimension-sized graphs. Deterministic tie-breaks replace the
    reference's BucketPQ/iteration order: the start vertex is the
    highest-degree live node (ties → smallest id); the heaviest incident
    edge breaks ties toward the smallest neighbor id.
    """
    spark = g.edges.sparkSession
    if g.directed:
        raise ValueError("undirected graphs only (reference contract)")
    canon = (
        g.edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            F.col("weight").cast("double").alias("weight"),
        )
        .groupBy("src", "dst")
        .agg(F.max("weight").alias("weight"))
    )
    if g.edges.filter(F.col("src") == F.col("dst")).limit(1).count() > 0:
        raise ValueError("self-loops are not supported (reference contract)")
    m = canon.count()
    if max_edges is not None and m > max_edges:
        raise ValueError(
            f"path_growing_matcher is driver-sequential: {m} edges exceeds "
            f"max_edges={max_edges}; raise the cap or pass max_edges=None "
            "to opt in explicitly (use suitor_matching/local_max_matching "
            "for scale)"
        )
    rows = canon.collect()
    nbrs: dict[int, dict[int, float]] = {}
    for r in rows:
        a, b, w = int(r["src"]), int(r["dst"]), float(r["weight"])
        nbrs.setdefault(a, {})[b] = w
        nbrs.setdefault(b, {})[a] = w
    alive = {u for u, d in nbrs.items() if d}
    m1: list[tuple[int, int, float]] = []
    m2: list[tuple[int, int, float]] = []
    take_m1 = True
    num_edges = m
    while num_edges > 0:
        # highest-degree live vertex, ties -> smallest id
        v = min(alive, key=lambda x: (-len(nbrs[x]), x))
        while nbrs.get(v):
            best_u = min(
                nbrs[v], key=lambda u: (-nbrs[v][u], u)
            )
            w = nbrs[v][best_u]
            (m1 if take_m1 else m2).append(
                (min(v, best_u), max(v, best_u), w)
            )
            take_m1 = not take_m1
            for u in list(nbrs[v]):
                del nbrs[u][v]
                num_edges -= 1
                if not nbrs[u]:
                    alive.discard(u)
            nbrs[v] = {}
            alive.discard(v)
            v = best_u

    def _valid(match: list[tuple[int, int, float]]):
        seen: set[int] = set()
        out = []
        for a, b, w in match:
            if a not in seen and b not in seen:
                out.append((a, b, w))
                seen.add(a)
                seen.add(b)
        return out

    m1 = _valid(m1)
    m2 = _valid(m2)
    best = m1 if sum(w for *_, w in m1) > sum(w for *_, w in m2) else m2
    if not best:
        return spark.createDataFrame([], "src long, dst long, weight double")
    return spark.createDataFrame(best, "src long, dst long, weight double")


def random_spanning_forest(g: Graph, seed: int = 42) -> DataFrame:
    """(src, dst) — a seeded random spanning forest
    (``components/RandomSpanningForest.cpp``). The reference samples a
    UNIFORM spanning forest by Wilson's loop-erased random walks — an
    inherently sequential walk process; here every canonical edge draws
    a portable md5 weight and one Borůvka pass keeps a maximum forest
    under those weights (documented deviation: seeded-random but not
    uniform over all spanning forests; the walk chain is not
    parallelizable or replayable). Same forest at any parallelism."""
    from networkit_spark.functions.porthash import md5_mod

    rnd = g.canonical_undirected_edges().select(
        "src",
        "dst",
        (
            md5_mod(
                F.col("src") * F.lit(1_000_003) + F.col("dst"), salt=f"rsf{seed}:"
            ).cast("double")
            + 1.0
        ).alias("weight"),
    )
    rg = Graph.from_edges(rnd, directed=False, weighted=True, nodes=g.nodes)
    return spanning_forest(rg).select("src", "dst")
