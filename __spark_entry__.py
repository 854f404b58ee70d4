"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: PageRank over the part co-occurrence graph
derived from sf0.001 lineitem.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator
(SURVEY.md §2). The graph kernels run over a deterministic edge table
derived from ``lineitem``: two parts are linked iff they appear in the
same order (canonical ``src < dst``, deduped) — computable identically in
Spark and DuckDB, so even the iterative kernels (PageRank, connected
components) have exact SQL oracles via recursive CTEs. Float-valued
results are rounded to 6 decimals ON BOTH SIDES so cross-engine
summation-order noise (~1e-15) can't flip the value hash.

Every registry entry has a hash-checked oracle (since round 3): the
iterative and seeded kernels replay via chained fixed-round CTEs,
portable md5 draws, and recursive-CTE state machines — there are no
rows-only entries.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from networkit_spark.functions.porthash import DEFAULT_PRIME, md5_mod_sql
from networkit_spark.graph import Graph

# --------------------------------------------------------------------------
# shared graph derivation: part co-occurrence graph from lineitem
# --------------------------------------------------------------------------

# DuckDB-side canonical edge table (src < dst, distinct)
CO_EDGES_SQL = """
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a
  JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
"""

# symmetrized (both orientations) + node set + degree table, reused below
# MATERIALIZED: DuckDB inlines CTEs once per reference; the chained
# fixed-round oracles reference `edges` dozens of times, which without
# the hint re-plans the lineitem self-join per round (slow AND enough
# parquet handles to hit the fd limit). One evaluation, reused.
GRAPH_PRELUDE_SQL = f"""
  e0 AS MATERIALIZED ({CO_EDGES_SQL}),
  edges AS MATERIALIZED (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
  nodes AS MATERIALIZED (SELECT DISTINCT src AS id FROM edges),
  deg AS MATERIALIZED (SELECT src AS id, count(*) AS deg FROM edges GROUP BY src)
"""


def _lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))


# Memo for shared inputs: the driver calls all 34 queries in one process,
# and re-deriving the co-occurrence graph (a lineitem self-join + distinct)
# per query dominated round-1 gate time. Keyed by (applicationId, sf_dir)
# so a restarted SparkSession never sees stale cached plans.
_MEMO: dict[tuple, object] = {}


def _memo(spark: SparkSession, sf_dir: str, what: str, build):
    key = (spark.sparkContext.applicationId, sf_dir, what)
    if key not in _MEMO:
        _MEMO[key] = build()
    return _MEMO[key]


def _co_graph(spark: SparkSession, sf_dir: str) -> Graph:
    """Part co-occurrence graph: undirected, unweighted, nodes = endpoints.

    Built once per (session, sf_dir); edges and nodes are eagerly
    local-checkpointed so every query starts from a materialized,
    lineage-free relation instead of re-running the self-join.
    """

    def build() -> Graph:
        li = _lineitem(spark, sf_dir).select("l_orderkey", "l_partkey")
        a = li.select("l_orderkey", F.col("l_partkey").alias("src"))
        b = li.select("l_orderkey", F.col("l_partkey").alias("dst"))
        # r8 load plan (guide §2.3/§3.1). Three changes vs the r3-r7 plan:
        # 1. the orderkey self-join BROADCASTS the probe side while the
        #    lineitem file is small (file-size proxy, env-tunable) — no
        #    shuffle of either join input;
        # 2. the old repartition("src") is gone: localCheckpoint does not
        #    carry partitioning metadata into the rebuilt LogicalRDD, so
        #    it bought downstream queries nothing (kernels now build their
        #    shared layouts via plans/edge_layout.py) while forcing the
        #    FULL pre-dedupe pair relation (~6x the edge count on this
        #    data) through one exchange. A bare dropDuplicates instead
        #    dedupes map-side first, so only near-deduped rows shuffle;
        # 3. the constant weight column is attached AFTER dedupe +
        #    checkpoint — narrower exchange, 2-column checkpoint blocks.
        bcast_bytes = int(
            os.environ.get("SPARK_GRAFT_BROADCAST_FILE_BYTES", str(256 << 20))
        )
        li_small = (
            os.path.getsize(os.path.join(sf_dir, "lineitem.parquet")) <= bcast_bytes
        )
        # the small parquet arrives as ONE scan split — spread the probe
        # side to cluster parallelism first, or the broadcast join (and
        # the map-side dedupe behind it) runs on a single task
        if li_small:
            par = spark.sparkContext.defaultParallelism
            a = a.repartition(par, "l_orderkey")
        sym = (
            a.join(F.broadcast(b) if li_small else b, "l_orderkey")
            .filter(F.col("src") != F.col("dst"))
            .select("src", "dst")
        )
        edges = (
            sym.dropDuplicates(["src", "dst"])
            .localCheckpoint(eager=True)
            .withColumn("weight", F.lit(1.0))
        )
        # nodes: LAZY checkpoint — re-derivable, and eagerly materializing
        # them was the round-2 load_graph bench regression (+26%)
        nodes = edges.select(F.col("src").alias("id")).distinct().localCheckpoint(
            eager=False
        )
        # simple=True: deduped, loop-filtered, both orientations by
        # construction — canonical/adjacency consumers skip their
        # defensive dedupe Exchange
        return Graph(
            nodes=nodes, edges=edges, directed=False, weighted=False, simple=True
        )

    return _memo(spark, sf_dir, "co_graph", build)


def _co_subgraph200(spark: SparkSession, sf_dir: str) -> Graph:
    """Nodes-<200 induced subgraph of the co-graph (linkpred / PLM input),
    materialized once."""

    def build() -> Graph:
        g = _co_graph(spark, sf_dir)
        sub = g.subgraph_from_nodes(spark.range(200).select("id"))
        return Graph(
            nodes=sub.nodes.localCheckpoint(eager=True),
            edges=sub.edges.localCheckpoint(eager=True),
            directed=False,
            weighted=False,
            simple=True,  # endpoint filter of a simple relation
        )

    return _memo(spark, sf_dir, "co_subgraph200", build)


def _chain_graph(spark: SparkSession, sf_dir: str) -> Graph:
    """Directed part-sequence graph: edge partkey(i) → partkey(i+1) for
    consecutive line numbers within each order (orders with key % 7 == 0
    only — the sparsified variant has a giant SCC plus a large DAG
    periphery, the interesting decomposition shape)."""

    def build() -> Graph:
        li = _lineitem(spark, sf_dir).filter(F.col("l_orderkey") % 7 == 0).select(
            "l_orderkey", "l_linenumber", "l_partkey"
        )
        b = li.select(
            "l_orderkey",
            (F.col("l_linenumber") - 1).alias("l_linenumber"),
            F.col("l_partkey").alias("dst_part"),
        )
        e = (
            li.join(b, ["l_orderkey", "l_linenumber"])
            .filter(F.col("l_partkey") != F.col("dst_part"))
            .select(F.col("l_partkey").alias("src"), F.col("dst_part").alias("dst"))
            .distinct()
        )
        g = Graph.from_edges(e, directed=True)
        return Graph(
            nodes=g.nodes.localCheckpoint(eager=True),
            edges=g.edges.localCheckpoint(eager=True),
            directed=True,
            weighted=False,
        )

    return _memo(spark, sf_dir, "chain_graph", build)


# DuckDB-side chain graph (must match _chain_graph exactly)
CHAIN_EDGES_SQL = """
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND b.l_linenumber = a.l_linenumber + 1
   AND a.l_partkey <> b.l_partkey
  WHERE a.l_orderkey % 7 = 0
"""


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


def _scalar_df(spark: SparkSession, name: str, value: float) -> DataFrame:
    return spark.createDataFrame([(float(value),)], f"{name} double")


# --------------------------------------------------------------------------
# flagship
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """PageRank ranking over the sf0.001 part co-occurrence graph."""
    from networkit_spark.operators.pagerank import pagerank
    from networkit_spark.operators.ranking import ranking

    g = _co_graph(spark, "/root/testdata/sf0.001")
    res = pagerank(g, damp=0.85, tol=1e-8)
    scores = res.scores.select("id", F.round("score", 8).alias("score"))
    return ranking(scores)


# --------------------------------------------------------------------------
# graph kernel queries
# --------------------------------------------------------------------------

def q_graph_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree table in one (variant, id, deg) shape:
    - deg: per-node degree of the full co-graph (id = node);
    - hh: the degree sequence REALIZED by the HavelHakimi generator fed
      the <200 subgraph's degree sequence, sorted descending (id = rank,
      1-based). HavelHakimi realizes any graphical sequence exactly
      (generators/HavelHakimiGenerator.cpp), and a real graph's sequence
      is graphical, so the oracle is the sub200 degree sequence itself —
      the row equality checks realization, not just plumbing;
    - sbm: per-node degree of a 60-node / 3-block StochasticBlockmodel
      (generators/StochasticBlockmodel.cpp) with portable md5 pair
      draws — the oracle replays the Bernoulli edge set bit-for-bit,
      checking the generator's pair relation, not just its marginals."""
    from networkit_spark.generators import havel_hakimi, stochastic_blockmodel

    g = _co_graph(spark, sf_dir)
    a = g.degrees().select(F.lit("deg").alias("variant"), "id", "deg")
    sub = _co_subgraph200(spark, sf_dir)
    seq = [int(r["deg"]) for r in sub.degrees().orderBy("id").collect()]
    hh = havel_hakimi(spark, seq)
    b = (
        hh.degrees()
        .select(
            F.lit("hh").alias("variant"),
            F.row_number()
            .over(Window.orderBy(F.desc("deg"), F.asc("id")))
            .cast("long")
            .alias("id"),
            "deg",
        )
    )
    sbm_g, _truth = stochastic_blockmodel(
        spark,
        60,
        [[0.5, 0.05, 0.05], [0.05, 0.5, 0.05], [0.05, 0.05, 0.5]],
        seed=42,
        portable_hash=True,
    )
    c = sbm_g.degrees().select(F.lit("sbm").alias("variant"), "id", "deg")
    return a.unionByName(b).unionByName(c)


def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed 15 power-iteration supersteps then sum-normalize (the
    NetworKit end-only normalization, PageRank.cpp:75-80)."""
    from networkit_spark.operators.pagerank import pagerank

    g = _co_graph(spark, sf_dir)
    res = pagerank(g, damp=0.85, tol=0.0, max_iterations=15)
    return res.scores.select("id", F.round("score", 6).alias("score"))


def q_graph_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components, canonical labels = min node id per component."""
    from networkit_spark.operators.components import connected_components

    g = _co_graph(spark, sf_dir)
    return connected_components(g)


def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.triangles import triangle_count_per_node

    return triangle_count_per_node(_co_graph(spark, sf_dir))



def q_graph_lcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.triangles import local_clustering_coefficient

    lcc = local_clustering_coefficient(_co_graph(spark, sf_dir))
    return lcc.select("id", F.round("lcc", 6).alias("lcc"))





def _mc_matching(sub) -> DataFrame:
    """Deterministic one-round hash-dominant matching on the sub200
    canonical edges (the gate input for MatchingCoarsening): an edge is
    matched iff it is the (md5-hash, src, dst)-minimal edge incident to
    BOTH endpoints — one LocalMax-style round, valid by construction
    (each endpoint nominates exactly one best edge), replayed verbatim
    by the oracle's two row_number windows. Returns (u, v), u < v."""
    from networkit_spark.functions.porthash import md5_mod

    ce = sub.canonical_undirected_edges().select(
        "src",
        "dst",
        md5_mod(F.col("src") * 1_000_003 + F.col("dst"), salt="mc:").alias("h"),
    )
    inc = ce.select(F.col("src").alias("ep"), "src", "dst", "h").unionByName(
        ce.select(F.col("dst").alias("ep"), "src", "dst", "h")
    )
    w = Window.partitionBy("ep").orderBy("h", "src", "dst")
    best = inc.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") == 1)
    return (
        best.groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") == 2)
        .select(F.col("src").alias("u"), F.col("dst").alias("v"))
    )


def q_graph_coarsen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coarsening/projection/overlap family in one
    (variant, src, dst, weight) table:
    - ppc: ParallelPartitionCoarsening by label = id % 10 on the full
      co-graph — contracted edges (coarsening/
      ParallelPartitionCoarsening.cpp);
    - mc / mcmap: MatchingCoarsening (coarsening/MatchingCoarsening.cpp)
      on the (src+dst)%11+1-weighted sub200 graph under the
      hash-dominant one-round matching — coarse canonical edges
      (src, dst, summed weight) and the fine→coarse map
      (src=node, dst=coarse, 1.0); coarse ids are the reference's
      ordinal carried-node ranks;
    - proj: ClusteringProjector::projectBack
      (coarsening/ClusteringProjector.cpp:14) of the coarse clustering
      label = coarse % 7 through that map — (src=node, dst=label, 1.0);
    - ov2 / ov3: HashingOverlapper (overlap/HashingOverlapper.cpp) of
      (id%5, id%7) and (id%3, id%4, id%5) on the sub200 node set —
      (src=node, dst=compacted core label, 1.0); the oracle replays the
      byte-wise djb2 (list_reduce with stop-at-zero-byte) and compacts
      with dense_rank."""
    from networkit_spark.operators.coarsening import (
        hashing_overlapper,
        matching_coarsening,
        project_back,
    )
    from networkit_spark.operators.community_quality import coarsen

    g = _co_graph(spark, sf_dir)
    labels = g.nodes.select(F.col("id").alias("node"), (F.col("id") % 10).alias("label"))
    cg = coarsen(g, labels)
    ppc = cg.edges.select(
        F.lit("ppc").alias("variant"),
        "src",
        "dst",
        F.round("weight", 6).alias("weight"),
    )

    sub = _co_subgraph200(spark, sf_dir)
    weighted = Graph(
        nodes=sub.nodes,
        edges=sub.edges.select(
            "src",
            "dst",
            ((F.col("src") + F.col("dst")) % 11 + 1).cast("double").alias("weight"),
        ),
        directed=False,
        weighted=True,
    )
    mcg, f2c = matching_coarsening(weighted, _mc_matching(sub))
    mc = mcg.edges.filter(F.col("src") <= F.col("dst")).select(
        F.lit("mc").alias("variant"),
        "src",
        "dst",
        F.round("weight", 6).alias("weight"),
    )
    mcmap = f2c.select(
        F.lit("mcmap").alias("variant"),
        F.col("node").alias("src"),
        F.col("coarse").alias("dst"),
        F.lit(1.0).alias("weight"),
    )
    coarse_labels = mcg.nodes.select(
        F.col("id").alias("node"), (F.col("id") % 7).alias("label")
    )
    proj = project_back(f2c, coarse_labels).select(
        F.lit("proj").alias("variant"),
        F.col("node").alias("src"),
        F.col("label").alias("dst"),
        F.lit(1.0).alias("weight"),
    )

    def part(m: int) -> DataFrame:
        return sub.nodes.select(
            F.col("id").alias("node"), (F.col("id") % m).alias("label")
        )

    ov2 = hashing_overlapper(sub, [part(5), part(7)]).select(
        F.lit("ov2").alias("variant"),
        F.col("node").alias("src"),
        F.col("label").alias("dst"),
        F.lit(1.0).alias("weight"),
    )
    ov3 = hashing_overlapper(sub, [part(3), part(4), part(5)]).select(
        F.lit("ov3").alias("variant"),
        F.col("node").alias("src"),
        F.col("label").alias("dst"),
        F.lit(1.0).alias("weight"),
    )
    return (
        ppc.unionByName(mc)
        .unionByName(mcmap)
        .unionByName(proj)
        .unionByName(ov2)
        .unionByName(ov3)
    )


def q_graph_katz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Katz centrality, fixed 10 iterations, α = 1/(1+maxDegree), β=0.1
    (KatzCentrality.cpp:15-17,28-75)."""
    from networkit_spark.operators.spectral import katz_centrality

    g = _co_graph(spark, sf_dir)
    res = katz_centrality(g, beta=0.1, tol=0.0, max_iterations=10)
    return res.scores.select("id", F.round("score", 6).alias("score"))


def q_graph_eigenvector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eigenvector centrality, fixed 10 power-iteration steps
    (EigenvectorCentrality.cpp:21-67). Per-step L2 normalization only
    rescales, so the SQL oracle runs the unnormalized recurrence and
    normalizes once at the end — mathematically identical."""
    from networkit_spark.operators.spectral import eigenvector_centrality

    g = _co_graph(spark, sf_dir)
    res = eigenvector_centrality(g, tol=0.0, max_iterations=10)
    return res.scores.select("id", F.round("score", 6).alias("score"))


KCORE_ROUNDS = 24  # measured H-index convergence at sf0.01 = 19 rounds


def q_graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Core decomposition via the H-index fixpoint (coreness = stationary
    point of repeated neighborhood H-index, Lü et al.). The oracle
    unrolls KCORE_ROUNDS chained H-index CTEs — identical fixpoint, so
    fixed-round state == converged coreness."""
    from networkit_spark.operators.kcore import core_decomposition

    return core_decomposition(_co_graph(spark, sf_dir))


def q_graph_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS hop distances from node 0 (distance/BFS.cpp semantics:
    unreachable nodes absent)."""
    from networkit_spark.operators.traversal import bfs

    return bfs(_co_graph(spark, sf_dir), source=0)


def q_graph_linkpred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbor link-prediction indices (Adamic-Adar, Jaccard,
    resource allocation) on the subgraph induced by nodes < 200 —
    restricted so the all-pairs output stays comparison-sized."""
    from networkit_spark.operators.linkprediction import common_neighbor_scores

    sub = _co_subgraph200(spark, sf_dir)
    out = common_neighbor_scores(sub)
    return out.select(
        "u",
        "v",
        "common",
        F.round("jaccard", 6).alias("jaccard"),
        F.round("adamic_adar", 6).alias("adamic_adar"),
        F.round("resource_alloc", 6).alias("resource_alloc"),
    )


def q_graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity (Pearson r of endpoint degrees over edge
    slots) — correlation/Assortativity.cpp semantics."""
    from networkit_spark.operators.linkprediction import degree_assortativity

    v = degree_assortativity(_co_graph(spark, sf_dir))
    return _scalar_df(spark, "assortativity", round(v, 6))



PLP_STEPS = 8  # measured convergence at sf0.01 = 6 sync supersteps


def q_graph_plp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous PLP, fixed PLP_STEPS supersteps (community/PLP.cpp
    weight-desc/label-asc vote). The DuckDB oracle unrolls the SAME
    number of chained vote CTEs; early convergence is a no-op on both
    sides, so the states coincide at step PLP_STEPS exactly."""
    from networkit_spark.operators.plp import plp

    g = _co_graph(spark, sf_dir)
    return plp(g, max_iterations=PLP_STEPS).labels


LPDO_SWEEPS = 2


def q_graph_plm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection on the nodes < 200 subgraph in one
    (variant, node, label) table:
    - plm: PLM / Louvain (deterministic seeded move gating, portable md5)
      — exact two-level move-round replay oracle (_plm_sql);
    - lpdo: LPDegreeOrdered with log2 degree buckets (the at-scale
      default — O(log maxdeg) jobs per sweep), 2 sweeps — exact
      class-serialized replay (_lpdo_sql), all-integer arithmetic;
    - lme: LouvainMapEquation, 3 synchronous rounds with portable md5
      move gating AND the portable 1e-12 delta quantization (absorbs
      cross-engine ln() ulps) — full fitnessChange replay (_lme_sql);
    - aggc: ParallelAgglomerativeClusterer, 2 score-match-contract
      rounds — Δmod scores, LocalMax matching replay, coarsening with
      the w/2 self-loop convention (_aggc_sql); all-dyadic arithmetic.

    Gate budget: the subgraph is tiny (≤200 nodes), so shuffle width is
    dropped to 4 around the calls — per-round Spark overhead, not data,
    is the cost driver here."""
    from networkit_spark.operators.louvain import (
        agglomerative_clusterer,
        louvain_map_equation,
        plm,
    )
    from networkit_spark.operators.plp import lp_degree_ordered

    sub = _co_subgraph200(spark, sf_dir)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        # portable md5 move gating: the DuckDB oracle replays both levels'
        # move rounds exactly (_plm_sql)
        labels = plm(sub, max_rounds=4, max_levels=2, portable_hash=True).labels
        labels = labels.localCheckpoint(eager=True)
        lpdo = lp_degree_ordered(
            sub, max_sweeps=LPDO_SWEEPS, degree_buckets="log2"
        ).localCheckpoint(eager=True)
        lme = louvain_map_equation(
            sub, max_rounds=LME_ROUNDS, portable_hash=True
        ).localCheckpoint(eager=True)
        aggc = agglomerative_clusterer(
            sub, max_rounds=AGGC_ROUNDS
        ).localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return (
        labels.select(F.lit("plm").alias("variant"), "node", "label")
        .unionByName(lpdo.select(F.lit("lpdo").alias("variant"), "node", "label"))
        .unionByName(lme.select(F.lit("lme").alias("variant"), "node", "label"))
        .unionByName(aggc.select(F.lit("aggc").alias("variant"), "node", "label"))
    )


def q_graph_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact standard closeness on the <200-node subgraph
    (Closeness.hpp:78-93; all-pairs BFS — subgraph-sized on purpose).
    The subgraph is disconnected (isolated ids), where the reference
    throws; check_connected=False opts into the documented deviation
    (reachable-set closeness) that the oracle mirrors."""
    from networkit_spark.operators.distance import closeness_centrality

    sub = _co_subgraph200(spark, sf_dir)
    out = closeness_centrality(sub, variant="standard", check_connected=False)
    return out.select("id", F.round("score", 6).alias("score"))


def q_graph_harmonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Harmonic closeness on the <200-node subgraph (HarmonicCloseness.cpp)."""
    from networkit_spark.operators.distance import harmonic_closeness

    sub = _co_subgraph200(spark, sf_dir)
    out = harmonic_closeness(sub)
    return out.select("id", F.round("score", 6).alias("score"))


def q_graph_betweenness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Brandes betweenness on the <200-node subgraph
    (Betweenness.cpp:47-91) — hash-oracled by the fixed-point σ/δ
    Brandes replay CTE (also exact parity vs a numpy Brandes oracle in
    pytest)."""
    from networkit_spark.operators.distance import betweenness

    sub = _co_subgraph200(spark, sf_dir)
    out = betweenness(sub)
    return out.select("id", F.round("score", 6).alias("score"))


KPATH_K = 4
KPATH_ALPHA = 0.2


def q_graph_betweenness_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled centrality estimators in one (method, id, score) table:
    - est16: EstimateBetweenness (16 hash-sampled sources, seed 42) on
      the FULL co-graph (EstimateBetweenness.cpp) — the at-scale
      variant;
    - kpath: KPathCentrality (KPathCentrality.cpp), k=4, α=0.2 on the
      <200 subgraph with portable md5 draws — t = ⌊2k²n^0.6 ln n⌋
      self-avoiding walks replayed step by step in the oracle."""
    from networkit_spark.operators.distance import (
        estimate_betweenness,
        k_path_centrality,
    )

    g = _co_graph(spark, sf_dir)
    a = estimate_betweenness(g, n_samples=16, seed=42, portable_hash=True).select(
        F.lit("est16").alias("method"), "id", F.round("score", 4).alias("score")
    )
    sub = _co_subgraph200(spark, sf_dir)
    b = k_path_centrality(
        sub, alpha=KPATH_ALPHA, k=KPATH_K, seed=42, portable_hash=True
    ).select(F.lit("kpath").alias("method"), "id", F.round("score", 6).alias("score"))
    return a.unionByName(b)


def q_graph_edge_betweenness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-edge betweenness on the <200 subgraph
    (Betweenness.cpp computeEdgeCentrality) — hash-oracled by the same
    σ/δ replay CTE at edge granularity; pytest-pinned too."""
    from networkit_spark.operators.distance import edge_betweenness

    sub = _co_subgraph200(spark, sf_dir)
    out = edge_betweenness(sub)
    return out.select("src", "dst", F.round("score", 6).alias("score"))


def q_graph_diameter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact hop diameter of the <200-node subgraph (max eccentricity,
    Diameter.cpp exact path)."""
    from networkit_spark.operators.distance import diameter_exact

    sub = _co_subgraph200(spark, sf_dir)
    return spark.createDataFrame([(int(diameter_exact(sub)),)], "diameter long")


def q_graph_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted SSSP from node 0 on the <200-node subgraph with
    deterministic integer weights w(u,v) = (u+v) % 5 + 1 (Bellman-Ford
    relax loop; Dijkstra.cpp:93 fixed point). Integer weights keep the
    DuckDB recursive-CTE oracle's state space finite."""
    from networkit_spark.operators.distance import sssp

    sub = _co_subgraph200(spark, sf_dir)
    weighted = Graph(
        nodes=sub.nodes,
        edges=sub.edges.select(
            "src",
            "dst",
            ((F.col("src") + F.col("dst")) % 5 + 1).cast("double").alias("weight"),
        ),
        directed=False,
        weighted=True,
    )
    out = sssp(weighted, source=0)
    return out.select("node", F.round("dist", 6).alias("dist"))


def _sub200_weighted(spark: SparkSession, sf_dir: str) -> Graph:
    """<200 subgraph with deterministic integer weights (u+v)%3+1 —
    shared by the weighted-distance entries; integer weights keep the
    DuckDB walk-CTE state space finite."""
    sub = _co_subgraph200(spark, sf_dir)
    return Graph(
        nodes=sub.nodes,
        edges=sub.edges.select(
            "src",
            "dst",
            ((F.col("src") + F.col("dst")) % 3 + 1).cast("double").alias("weight"),
        ),
        directed=False,
        weighted=True,
    )


def q_graph_closeness_w(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED closeness on the <200 subgraph (Closeness.cpp dijkstra
    variant semantics; multi-source Bellman-Ford distances)."""
    from networkit_spark.operators.distance import closeness_centrality_weighted

    g = _sub200_weighted(spark, sf_dir)
    out = closeness_centrality_weighted(g)
    return out.select("id", F.round("score", 6).alias("score"))


def q_graph_betweenness_w(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED Brandes betweenness on the <200 subgraph (Betweenness.cpp
    with Dijkstra SSSP; σ/δ DAG fixed points) — hash-oracled via the
    fixed-point σ/δ replay CTE (also pinned to a numpy Dijkstra-Brandes
    oracle in pytest)."""
    from networkit_spark.operators.distance import betweenness_weighted

    g = _sub200_weighted(spark, sf_dir)
    out = betweenness_weighted(g)
    return out.select("id", F.round("score", 6).alias("score"))


def q_graph_scc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strongly connected components of the directed part-sequence graph
    (StronglyConnectedComponents.cpp semantics; coloring/FW-BW kernel).
    Labels are canonical min-member ids — oracle = transitive-closure SQL."""
    from networkit_spark.operators.scc import strongly_connected_components

    g = _chain_graph(spark, sf_dir)
    return strongly_connected_components(g)






def q_graph_sfigality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sfigality: fraction of neighbors with strictly higher degree
    (Sfigality.cpp)."""
    from networkit_spark.operators.degrees import sfigality

    out = sfigality(_co_graph(spark, sf_dir))
    return out.select("id", F.round("score", 6).alias("score"))




def q_graph_eccentricity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node eccentricity on the <200 subgraph (distance/Eccentricity.cpp)
    — max BFS distance to any reached node; isolated nodes get 0."""
    from networkit_spark.operators.distance import eccentricities

    sub = _co_subgraph200(spark, sf_dir)
    return eccentricities(sub).select("id", "ecc")


def q_graph_algebraic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coordinate-embedding kernels in one (variant, src, dst, score)
    table (layout family gate-folded round 7):
    - algdist: algebraic distance per edge
      (distance/AlgebraicDistance.cpp): 4 systems, 5 Jacobi iterations,
      ω=0.5, L2 norm; the portable-md5 uniform init makes the whole
      computation reproducible in DuckDB;
    - pivot_b: the double-centered pivot-distance matrix PivotMDS
      eigen-decomposes (viz/PivotMDS.cpp:44-76) on the <200 subgraph
      with explicit pivots 0..7 (j = root id) — the distributed half of
      the layout kernel, present entries only, (src=node, dst=j);
    - crossings: numEdgeCrossings
      (viz/GraphLayoutAlgorithm.hpp:numEdgeCrossings) of the <200
      subgraph under the deterministic layout x=id, y=(id²) mod 97,
      mirrored quirks included (b2 uses segment 1's slope; collinear
      parallel pairs count; ordered double-count halved) — one row
      (src=-1, dst=-1, score=count).
    - maxent_s: the MaxentStress known-distance set S at k=2
      (viz/MaxentStress.cpp computeKnownDistances:455-483 — direct
      neighbors at edge weight, hop-2 ball members at depth 2) on the
      <200 subgraph;
    - maxent_rhs: the attractive rhs of the maxent Laplacian solve
      (computeCoordinateLaplacianTerm, MaxentStress.cpp:383-404) over S
      under the same deterministic layout the crossings row uses
      (x=id, y=(id²) mod 97) — (src=node, dst=axis 0/1);
    - maxent_m: the S-restricted layout measures ldme and
      meanDistanceError (MaxentStress.cpp:305-330) for that layout —
      (src=-1, dst=0/1, score);
    - lamg_elim / lamg_elim_f: one LAMG low-degree elimination stage
      (numerics/LAMG/MultiLevelSetup.hpp lowDegreeSweep:317-343 +
      eliminationOperators:345-358, hash-local-min rule with the md5
      porthash): the Schur-complement coarse edge list (src, dst, w)
      and the eliminated f set (src=id, dst=-1, score=weighted degree).
      The dense sub200 co-graph has almost no degree<=3 nodes, so the
      stage runs on a deterministic porthash edge sample (canonical
      edge kept iff md5('lsp:'||least*1000003+greatest) % 5 == 0 —
      mean degree ~2, plenty of elimination candidates), replayed
      identically in the oracle;
    - lamg_aff: LAMG TV affinities (generateTVs:458-475 +
      computeAffinityMatrix:574-617) — 4 porthash test vectors, 4
      weighted-Jacobi sweeps on L·t=0, c_uv = (Σ t_u t_v)²/(ns_u·ns_v)
      on the strong edges (all of them here: uniform weights).
    The seeded power iteration atop pivot_b, the iterative maxent solve
    loop, and the LAMG V-cycle/PCG solve stay pytest-pinned (numpy
    replays / lstsq parity in tests/test_layout.py, tests/test_maxent.py,
    tests/test_lamg.py) — tolerance-controlled iteration, not
    SQL-replayable; the distributed building blocks (S, rhs, measures,
    elimination stage, affinities) are what hash here."""
    from networkit_spark.operators.algebraic import algebraic_distances
    from networkit_spark.operators.layout import (
        centered_pivot_distances,
        num_edge_crossings,
    )
    from networkit_spark.operators.maxent import (
        _attractive_rhs,
        maxent_known_distances,
        maxent_ldme,
        maxent_mean_distance_error,
    )

    g = _co_graph(spark, sf_dir)
    out = algebraic_distances(g, num_systems=4, num_iters=5, omega=0.5, norm=2)
    a = out.select(
        F.lit("algdist").alias("variant"),
        "src",
        "dst",
        F.round("score", 6).alias("score"),
    )

    sub = _co_subgraph200(spark, sf_dir)
    piv = spark.createDataFrame(
        [(i, i) for i in range(8)], "root long, j int"
    )
    b = centered_pivot_distances(sub, piv).select(
        F.lit("pivot_b").alias("variant"),
        F.col("node").alias("src"),
        F.col("j").cast("long").alias("dst"),
        F.round("b", 6).alias("score"),
    )

    coords = sub.nodes.select(
        "id",
        F.array(
            F.col("id").cast("double"),
            ((F.col("id") * F.col("id")) % 97).cast("double"),
        ).alias("pos"),
    )
    nx = num_edge_crossings(sub, coords, max_edges=None)
    c = spark.createDataFrame(
        [("crossings", -1, -1, float(nx))],
        "variant string, src long, dst long, score double",
    )

    s2 = maxent_known_distances(sub, k=2)
    ms = s2.select(
        F.lit("maxent_s").alias("variant"),
        "src",
        "dst",
        F.round("d", 6).alias("score"),
    )
    cw = sub.nodes.select(
        "id",
        F.col("id").cast("double").alias("c0"),
        ((F.col("id") * F.col("id")) % 97).cast("double").alias("c1"),
    )
    rhs = _attractive_rhs(s2, cw, 2)
    mr = rhs.select(
        F.lit("maxent_rhs").alias("variant"),
        F.col("id").alias("src"),
        F.lit(0).cast("long").alias("dst"),
        F.round("c0", 6).alias("score"),
    ).unionByName(
        rhs.select(
            F.lit("maxent_rhs").alias("variant"),
            F.col("id").alias("src"),
            F.lit(1).cast("long").alias("dst"),
            F.round("c1", 6).alias("score"),
        )
    )
    ldme = maxent_ldme(s2, coords)
    mde = maxent_mean_distance_error(s2, coords)
    mm = spark.createDataFrame(
        [("maxent_m", -1, 0, round(ldme, 6)), ("maxent_m", -1, 1, round(mde, 6))],
        "variant string, src long, dst long, score double",
    )

    from networkit_spark.operators.lamg import (
        _affinities,
        _elimination_stage,
        _smooth_tvs,
        _strong_edges,
    )

    ledges = (
        sub.edges.filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.sum(F.col("weight").cast("double")).alias("w"))
    )
    lnodes = sub.nodes.select("id")
    from networkit_spark.functions.porthash import md5_mod

    lkey = F.least("src", "dst") * F.lit(1000003) + F.greatest("src", "dst")
    sp = ledges.filter(md5_mod(lkey, salt="lsp:") % 5 == 0)
    spn = sp.select(F.col("src").alias("id")).distinct()
    n_sp = spn.count()
    stage, ce, _cn, _c2 = _elimination_stage(sp, spn, n_sp, 0, porthash=True)
    # couple the gate to the fixture: the stage must be productive, else
    # the SQL replay (which always eliminates) silently diverges
    assert stage is not None, "sparsified sub200 elimination stage degenerated"
    le = ce.select(
        F.lit("lamg_elim").alias("variant"),
        "src",
        "dst",
        F.round("w", 6).alias("score"),
    )
    lf = stage.f.select(
        F.lit("lamg_elim_f").alias("variant"),
        F.col("id").alias("src"),
        F.lit(-1).cast("long").alias("dst"),
        F.round("d", 6).alias("score"),
    )
    tvs = _smooth_tvs(ledges, lnodes, 4, 4, seed=11, porthash=True)
    la = _affinities(_strong_edges(ledges), tvs, 4).select(
        F.lit("lamg_aff").alias("variant"),
        "src",
        "dst",
        F.round("aff", 6).alias("score"),
    )
    return (
        a.unionByName(b)
        .unionByName(c)
        .unionByName(ms)
        .unionByName(mr)
        .unionByName(mm)
        .unionByName(le)
        .unionByName(lf)
        .unionByName(la)
    )


def q_graph_hopplot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighborhood-growth family on the <200 subgraph, one
    (variant, hop, value) table:
    - exact: per hop h, ordered node pairs at distance ≤ h
      (distance/HopPlotApproximation.cpp semantics, exact tier; the
      Flajolet-Martin sketch tier stays in graph_anf);
    - volume: Volume (distance/Volume.cpp) at radii 1..3 from 32
      portable-hash samples — expected ball size |B(s,r)| including the
      root, an exact integer/32 so the hash compare is bit-stable;
    - nfh: NeighborhoodFunctionHeuristic
      (distance/NeighborhoodFunctionHeuristic.cpp RANDOM strategy) on
      the LARGEST component (the reference's connected-graph contract)
      with 32 portable-hash samples: N(1) = 2m and N(diam) = n(n−1)
      pinned exactly, interior hops = cumulative round(hist·n/k)."""
    from networkit_spark.operators.components import (
        connected_components,
        extract_largest_connected_component,
    )
    from networkit_spark.operators.distance import multi_source_bfs, volume
    from networkit_spark.operators.sketches import neighborhood_function_heuristic

    sub = _co_subgraph200(spark, sf_dir)
    vis = multi_source_bfs(sub, sub.nodes, with_sigma=False).visited
    per = vis.filter(F.col("dist") > 0).groupBy("dist").count()
    w = Window.orderBy("dist").rowsBetween(Window.unboundedPreceding, 0)
    exact = (
        per.withColumn("value", F.sum("count").over(w).cast("double"))
        .select(
            F.lit("exact").alias("variant"),
            F.col("dist").cast("int").alias("hop"),
            "value",
        )
    )
    radii = [1.0, 2.0, 3.0]
    vols = volume(sub, radii, samples=32, seed=42, portable_hash=True)
    vol_rows = spark.createDataFrame(
        [("volume", int(rv), float(v)) for rv, v in zip(radii, vols)],
        "variant string, hop int, value double",
    )
    cc = extract_largest_connected_component(sub, connected_components(sub))
    nf = neighborhood_function_heuristic(
        cc, n_samples=32, seed=42, portable_hash=True
    )
    nfh_rows = spark.createDataFrame(
        [("nfh", d + 1, float(v)) for d, v in enumerate(nf)],
        "variant string, hop int, value double",
    )
    return exact.unionByName(vol_rows).unionByName(nfh_rows)




def q_graph_nibble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRankNibble community around seed node 0 on the <200 subgraph
    (scd/PageRankNibble.cpp) — iterative PPR + sweep, hash-oracled by the
    40-iteration PPR unroll CTE with the reference stop rule."""
    from networkit_spark.operators.scd import pagerank_nibble

    sub = _co_subgraph200(spark, sf_dir)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        res = pagerank_nibble(sub, seed=0, alpha=0.5, tol=1e-6)
        out = res.community.localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    return out


def q_graph_randomize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-preserving edge-switching randomization on the <200
    subgraph (randomization/EdgeSwitching* semantics, parallel double
    swaps) — hash-oracled by the porthash swap-chain replay; pytest
    additionally asserts the degree sequence is preserved."""
    from networkit_spark.operators.randomization import edge_switching

    sub = _co_subgraph200(spark, sf_dir)
    # portable md5 pairing/coin hashes: the DuckDB oracle replays the
    # identical swap rounds CTE-for-CTE (_edge_switching_ctes)
    g2 = edge_switching(sub, rounds=3, seed=42, portable_hash=True)
    return g2.canonical_undirected_edges()


def q_graph_cliques(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal cliques (size ≥ 3) on the <200 subgraph — ego-net
    Bron-Kerbosch over applyInPandas (clique/MaximalCliques.cpp) —
    hash-oracled by the list-extension BK replay CTE (also pinned to a
    python BK oracle in pytest)."""
    from networkit_spark.operators.cliques import maximal_cliques

    sub = _co_subgraph200(spark, sf_dir)
    out = maximal_cliques(sub, min_size=3)
    return out.select(F.col("clique").cast("string").alias("clique"), "size")


def q_graph_msf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum spanning forest (Borůvka) of the <200-node subgraph with
    deterministic weights (KruskalMSF semantics) — iterative contraction,
    hash-oracled via the cycle-property characterization (an edge is in
    the MSF iff no cheaper path avoids it); pytest also checks forest
    weight vs a python Kruskal oracle."""
    from networkit_spark.operators.matching import spanning_forest

    sub = _co_subgraph200(spark, sf_dir)
    weighted = Graph(
        nodes=sub.nodes,
        edges=sub.edges.select(
            "src",
            "dst",
            (
                (F.least("src", "dst") * 7 + F.greatest("src", "dst") * 13) % 97 + 1
            ).cast("double").alias("weight"),
        ),
        directed=False,
        weighted=True,
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        out = spanning_forest(weighted)
        out = out.localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return out.select("src", "dst", F.round("weight", 6).alias("weight"))


def q_graph_suitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suitor matching on the weighted <200-node subgraph
    (SuitorMatcher.cpp) — hash-oracled by the propose/accept round-replay
    CTE."""
    from networkit_spark.operators.matching import suitor_matching

    sub = _co_subgraph200(spark, sf_dir)
    weighted = Graph(
        nodes=sub.nodes,
        edges=sub.edges.select(
            "src",
            "dst",
            ((F.col("src") + F.col("dst")) % 11 + 1).cast("double").alias("weight"),
        ),
        directed=False,
        weighted=True,
    )
    return suitor_matching(weighted)


def q_graph_luby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luby maximal independent set, seeded (independentset/Luby.cpp).
    Priorities come from the portable md5 hash so the DuckDB oracle
    replays the identical rounds (LUBY_ROUNDS chained CTEs; measured
    convergence at sf0.01 = 6 rounds)."""
    from networkit_spark.operators.matching import luby_independent_set

    g = _co_graph(spark, sf_dir)
    return luby_independent_set(g, seed=42, portable_hash=True)


def q_graph_anf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANF / effective diameter approximation (Flajolet-Martin sketches,
    EffectiveDiameterApproximation.cpp) — exact sketch replay oracle."""
    from networkit_spark.operators.sketches import effective_diameter_approx

    g = _co_graph(spark, sf_dir)
    # portable md5 trailing-zero draws so the DuckDB oracle replays the
    # identical FM sketches (ANF_HOPS unrolled OR-propagation rounds)
    v = effective_diameter_approx(g, ratio=0.9, k=16, seed=42, portable_hash=True)
    return _scalar_df(spark, "effective_diameter", float(v))


# --------------------------------------------------------------------------
# training-data pipeline queries: dedup
# --------------------------------------------------------------------------

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.pipeline.dedup import exact_duplicates

    return exact_duplicates(_docs(spark, sf_dir))


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.pipeline.dedup import minhash_lsh_candidates

    return minhash_lsh_candidates(_docs(spark, sf_dir), num_hashes=16, bands=4)


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.pipeline.dedup import simhash_signatures

    return simhash_signatures(_docs(spark, sf_dir), bits=60).select(
        F.col("id").alias("doc_id"), "simhash"
    )


def q_dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verified n-gram Jaccard near-dup pairs PLUS the resolved cluster
    decision (round-4 ``dedup_clusters``) in one table: kind='pair' rows
    carry (id_a, id_b, jaccard); kind='cluster' rows carry one row per
    document — id_a=doc_id, id_b=cluster label (min doc_id in the
    near-dup component), jaccard=1.0 iff the doc is the canonical keep
    under the keep='longest' policy (longest text, ties to smallest
    id)."""
    from networkit_spark.pipeline.dedup import dedup_clusters, ngram_jaccard_pairs

    docs = _docs(spark, sf_dir)
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.5, max_df=100)
    a = pairs.select(
        F.lit("pair").alias("kind"),
        "id_a",
        "id_b",
        F.round("jaccard", 6).alias("jaccard"),
    )
    cl = dedup_clusters(
        pairs.select("id_a", "id_b"), docs, id_col="doc_id", keep="longest"
    )
    b = cl.select(
        F.lit("cluster").alias("kind"),
        F.col("doc_id").cast("long").alias("id_a"),
        F.col("cluster").cast("long").alias("id_b"),
        F.col("is_canonical").cast("double").alias("jaccard"),
    )
    return a.unionByName(b)


# --------------------------------------------------------------------------
# training-data pipeline queries: text analysis
# --------------------------------------------------------------------------





def q_ingest_sha256(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row content-hash invariant (BASELINE.json input_hint)."""
    return _docs(spark, sf_dir).select(
        "doc_id", F.sha2(F.col("text"), 256).alias("content_sha256")
    )


# --------------------------------------------------------------------------
# similarity search over embeddings
# --------------------------------------------------------------------------

def q_sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.pipeline.similarity import cosine_topk

    embs = _embs(spark, sf_dir)
    queries = embs.filter(F.col("vec_id") < 10)
    return cosine_topk(embs, queries, k=5)


def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (exact verifier tier,
    explicit all_pairs=True opt-in — the bucketed tier is the library
    default; see cosine_near_dupes / hyperplane_lsh_buckets)."""
    from networkit_spark.pipeline.similarity import cosine_near_dupes

    return cosine_near_dupes(_embs(spark, sf_dir), threshold=0.4, all_pairs=True)


def q_sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic-stride IVF tier (ivf_topk_stride) — chosen here
    BECAUSE its codebook is hash-free and replayable in the DuckDB
    oracle; the library default ivf_topk is the k-means codebook."""
    from networkit_spark.pipeline.similarity import ivf_topk_stride

    embs = _embs(spark, sf_dir)
    queries = embs.filter(F.col("vec_id") < 10)
    return ivf_topk_stride(embs, queries, k=5, stride=20, nprobe=3)


# --------------------------------------------------------------------------
# dynamics: event replay (GraphEvent / GraphUpdater semantics)
# --------------------------------------------------------------------------

def q_dyn_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-replay tiers in one (variant, src, dst, weight) table:
    - orders: a deterministic edit log derived from orders — every order
      adds a customer→order edge; 'F' orders later remove it; output =
      surviving canonical edges (the ordered event fold);
    - path: the DynamicPathGenerator stream (20 steps) replayed onto an
      empty graph (generators/DynamicPathGenerator.cpp) — closed-form
      oracle;
    - dm: the DynamicDorogovtsevMendesGenerator stream (12 steps,
      portable md5 edge-index draws) replayed onto an empty graph
      (generators/DynamicDorogovtsevMendesGenerator.cpp) — the oracle
      regrows the edge chain CTE-for-CTE and must match every edge;
    - ba: the DynamicBarabasiAlbertGenerator stream (12 steps, k=2,
      portable mode: degree-proportional uniform-edge-endpoint draws
      with a bounded rejection budget) replayed the same way — the
      oracle regrows the ordinal edge list CTE-for-CTE (gate-folded
      round 7);
    - ff: the DynamicForestFireGenerator stream (12 steps, p=0.3,
      portable mode: integer-compare continue draws + md5 victim
      indices) replayed by a single-row recursive-CTE state machine,
      draw-for-draw (gate-folded round 7).
    - io:* (gate-folded r7): persistence replay — the sub200 co-graph
      round-tripped through each serialization bridge (.nkb double +
      varint, Thrill, graph-tool, GEXF, METIS, edge list); see
      _io_roundtrip_frames;
    - seir (gate-folded r7): the EpidemicSimulationSEIR census on the
      sub200 co-graph (12 rounds, portable md5 contact draws), rounds
      unrolled as chained CTEs; see _seir_frame.
    Only the SPATIAL streams stay pytest-pinned (transcendental
    movement draws — cos/acosh ulps can flip threshold edges across
    engines; tests/test_dynamics.py pins them by replay-vs-final-state
    instead)."""
    from networkit_spark.generators import (
        dynamic_barabasi_albert_events,
        dynamic_dorogovtsev_mendes_events,
        dynamic_forest_fire_events,
        dynamic_path_events,
    )
    from networkit_spark.graph import Graph
    from networkit_spark.streaming.dynamics import apply_events

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    add = orders.select(
        (F.col("o_orderkey") * 2).alias("seq"),
        F.lit("EDGE_ADDITION").alias("type"),
        F.col("o_custkey").alias("u"),
        (F.col("o_orderkey") + 1000000).alias("v"),
        F.lit(1.0).alias("w"),
    )
    rm = orders.filter(F.col("o_orderstatus") == "F").select(
        (F.col("o_orderkey") * 2 + 1).alias("seq"),
        F.lit("EDGE_REMOVAL").alias("type"),
        F.col("o_custkey").alias("u"),
        (F.col("o_orderkey") + 1000000).alias("v"),
        F.lit(None).cast("double").alias("w"),
    )
    nodes = (
        orders.select(F.col("o_custkey").alias("id"))
        .unionByName(orders.select((F.col("o_orderkey") + 1000000).alias("id")))
        .distinct()
    )
    empty = spark.createDataFrame([], "src long, dst long, weight double")
    base = Graph(nodes=nodes, edges=empty, directed=False)
    g2 = apply_events(base, add.unionByName(rm))
    a = g2.edges.filter(F.col("src") < F.col("dst")).select(
        F.lit("orders").alias("variant"),
        "src",
        "dst",
        F.round("weight", 6).alias("weight"),
    )
    empty = Graph.of(spark, [], n=0)
    gp = apply_events(empty, dynamic_path_events(spark, 20))
    b = gp.edges.filter(F.col("src") < F.col("dst")).select(
        F.lit("path").alias("variant"), "src", "dst",
        F.round("weight", 6).alias("weight"),
    )
    gdm = apply_events(
        empty,
        dynamic_dorogovtsev_mendes_events(spark, 12, seed=42, portable_hash=True),
    )
    c = gdm.edges.filter(F.col("src") < F.col("dst")).select(
        F.lit("dm").alias("variant"), "src", "dst",
        F.round("weight", 6).alias("weight"),
    )
    gba = apply_events(
        empty,
        dynamic_barabasi_albert_events(spark, 12, k=2, seed=42, portable_hash=True),
    )
    d = gba.edges.filter(F.col("src") < F.col("dst")).select(
        F.lit("ba").alias("variant"), "src", "dst",
        F.round("weight", 6).alias("weight"),
    )
    gff = apply_events(
        empty,
        dynamic_forest_fire_events(spark, 12, p=0.3, seed=42, portable_hash=True),
    )
    e = gff.edges.filter(F.col("src") < F.col("dst")).select(
        F.lit("ff").alias("variant"), "src", "dst",
        F.round("weight", 6).alias("weight"),
    )
    out = a.unionByName(b).unionByName(c).unionByName(d).unionByName(e)
    for frame in _io_roundtrip_frames(spark, sf_dir):
        out = out.unionByName(frame)
    out = out.unionByName(_seir_frame(spark, sf_dir))
    return out.unionByName(_graph_difference_frame(spark, sf_dir))


def _graph_difference_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """diff:* variants (gate-folded r7): GraphDifference
    (``dynamics/GraphDifference.cpp``) between the (src+dst)%11+1
    weighted sub200 graph and a deterministic mutation of it (drop
    edges with src·dst ≡ 0 mod 7, +2 weight where src+dst ≡ 0 mod 3,
    add the (2i, 2i+1) pairs not already present at weight 9). The
    oracle re-derives each edit class by the same closed-form rules —
    pure anti-join replay. Rows: (diff:rm u v 0) / (diff:add u v w) /
    (diff:wu u v w)."""
    from networkit_spark.streaming.dynamics import graph_difference

    sub = _co_subgraph200(spark, sf_dir)
    w1 = ((F.col("src") + F.col("dst")) % 11 + 1).cast("double")
    g1 = Graph(
        nodes=sub.nodes,
        edges=sub.edges.select("src", "dst", w1.alias("weight")),
        directed=False,
        weighted=True,
    )
    can = sub.canonical_undirected_edges()
    kept = can.filter((F.col("src") * F.col("dst")) % 7 != 0).select(
        "src",
        "dst",
        (
            w1
            + F.when((F.col("src") + F.col("dst")) % 3 == 0, 2.0).otherwise(0.0)
        ).alias("weight"),
    )
    extra = (
        spark.range(10)
        .select(
            (F.col("id") * 2).alias("src"),
            (F.col("id") * 2 + 1).alias("dst"),
            F.lit(9.0).alias("weight"),
        )
        .join(can, ["src", "dst"], "left_anti")
    )
    g2 = Graph.from_edges(
        kept.unionByName(extra), directed=False, weighted=True, nodes=sub.nodes
    )
    d = graph_difference(g1, g2)
    e = d["edits"]
    return (
        e.filter(F.col("type") == "EDGE_REMOVAL").select(
            F.lit("diff:rm").alias("variant"),
            F.col("u").alias("src"),
            F.col("v").alias("dst"),
            F.lit(0.0).alias("weight"),
        )
        .unionByName(
            e.filter(F.col("type") == "EDGE_ADDITION").select(
                F.lit("diff:add").alias("variant"),
                F.col("u").alias("src"),
                F.col("v").alias("dst"),
                F.round("w", 6).alias("weight"),
            )
        )
        .unionByName(
            e.filter(F.col("type") == "EDGE_WEIGHT_UPDATE").select(
                F.lit("diff:wu").alias("variant"),
                F.col("u").alias("src"),
                F.col("v").alias("dst"),
                F.round("w", 6).alias("weight"),
            )
        )
    )


def _seir_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """seir variant (gate-folded r7): EpidemicSimulationSEIR
    (``simulation/EpidemicSimulationSEIR.cpp``) on the sub200 co-graph —
    12 rounds, transP=0.3, eTime=2, iTime=4, index case = the smallest
    non-isolated node, portable md5 contact draws. Output = the census
    rows (src=round, dst=compartment 0..3, weight=population); the
    oracle unrolls the identical 12 sweeps as chained CTEs,
    draw-for-draw (integer threshold compare — exact both engines)."""
    from networkit_spark.operators.simulation import epidemic_simulation_seir

    sub = _co_subgraph200(spark, sf_dir)
    zero = int(sub.edges.agg(F.min("src")).collect()[0][0])
    census = epidemic_simulation_seir(
        sub, t_max=12, trans_p=0.3, e_time=2, i_time=4, zero=zero, seed=7
    )
    return census.select(
        F.lit("seir").alias("variant"),
        F.col("t").alias("src"),
        F.col("state").alias("dst"),
        F.col("population").cast("double").alias("weight"),
    )


def _io_roundtrip_frames(spark: SparkSession, sf_dir: str) -> list[DataFrame]:
    """Persistence replay (io:* variants of dyn_replay, gate-folded r7):
    push the sub200 co-graph through every serialization bridge — native
    ``.nkb`` (double + varint weight formats, ``sources/nkb.py``), Thrill
    binary, graph-tool binary, GEXF (``sources/exotic.py``), METIS and
    text edge list (``sources/readers.py``) — read each file back, and
    emit the canonical surviving edges. The oracle is the identity: the
    same sub200 edge set with the same exact weight stamps, so any
    encode/decode bug (varint boundary, width, half-edge convention,
    weight-format detection) breaks the value hash."""
    import tempfile

    from networkit_spark.sources.exotic import (
        read_gexf,
        read_graphtool_binary,
        read_thrill,
        write_gexf,
        write_graphtool_binary,
        write_thrill,
    )
    from networkit_spark.sources.nkb import (
        read_networkit_binary,
        write_networkit_binary,
    )
    from networkit_spark.sources.readers import (
        read_edge_list,
        read_metis,
        write_edge_list,
        write_metis,
    )

    g = _co_subgraph200(spark, sf_dir)  # node ids 0..199: already dense
    canon = g.edges.filter(F.col("src") < F.col("dst"))
    frac = canon.select(
        "src", "dst",
        (1.0 + ((F.col("src") * 7 + F.col("dst")) % 5) / 4.0).alias("weight"),
    )
    ints = canon.select(
        "src", "dst",
        (1.0 + (F.col("src") + F.col("dst")) % 5).cast("double").alias("weight"),
    )
    gw = Graph.from_edges(frac, weighted=True, nodes=g.nodes)
    gi = Graph.from_edges(ints, weighted=True, nodes=g.nodes)
    tmp = tempfile.mkdtemp(prefix="nk_gate_io_")
    frames: list[DataFrame] = []

    def emit(tag: str, h: Graph) -> None:
        frames.append(
            h.edges.filter(F.col("src") <= F.col("dst")).select(
                F.lit(tag).alias("variant"), "src", "dst",
                F.round("weight", 6).alias("weight"),
            )
        )

    p = f"{tmp}/g.nkb"
    write_networkit_binary(gw, p, chunks=3)
    emit("io:nkb", read_networkit_binary(spark, p))
    p = f"{tmp}/gi.nkb"
    write_networkit_binary(gi, p, chunks=2)
    emit("io:nkb_int", read_networkit_binary(spark, p))
    p = f"{tmp}/g.thrill"
    write_thrill(g, p)
    emit("io:thrill", read_thrill(spark, p))
    p = f"{tmp}/g.gt"
    write_graphtool_binary(g, p)
    emit("io:graphtool", read_graphtool_binary(spark, p))
    p = f"{tmp}/g.gexf"
    write_gexf(gw, p)
    emit("io:gexf", read_gexf(spark, p))
    p = f"{tmp}/g.metis"
    write_metis(g, p)
    emit("io:metis", read_metis(spark, p))
    p = f"{tmp}/g.el"
    write_edge_list(g, p)
    emit("io:edgelist", read_edge_list(spark, p, separator="\t"))
    return frames


# --------------------------------------------------------------------------
# multimodal plumbing (binary payload columns; decode stubbed)
# --------------------------------------------------------------------------

def q_mm_media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed media metadata over binary payload columns: the Spark-side
    plumbing (schema, utf-8 payload synthesis) is real; n_bytes comes from
    the binary column."""
    from networkit_spark.pipeline.multimodal import attach_binary_payload

    media = attach_binary_payload(_docs(spark, sf_dir))
    return media.select(
        "media_id", "modality", "mime", F.octet_length("payload").alias("n_bytes")
    )


def q_mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling (Arrow-batched mapInPandas; decoder stubbed as
    deterministic byte slices — documents are ASCII so the SQL oracle's
    string slices hash identically)."""
    from networkit_spark.pipeline.multimodal import attach_binary_payload, frame_sample

    media = attach_binary_payload(_docs(spark, sf_dir))
    return frame_sample(media, every_ms=1000)


def q_mm_jpeg_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Baseline JFIF codec (pipeline/jpeg.py) through the real
    Arrow-batched mapInPandas path: per document, synthesize a flat
    GRAY 16×24 RGB image (value = (37 + 7·doc_id) mod 256), encode at
    quality 75, decode, and emit the decoded pixel sum. Flat gray
    blocks round-trip EXACTLY (chroma planes are zero; the Y DC quant
    step at q75 is 8, and the flat-block DC is a multiple of 8), so
    the oracle is the closed-form sum v·16·24·3 — a hash-checked pin
    of the full encoder+decoder loop, not just plumbing."""
    import pandas as pd  # noqa: F401 — mapInPandas batches

    docs = _docs(spark, sf_dir).select("doc_id").filter(F.col("doc_id") < 48)

    def run(batches):
        import numpy as np

        from networkit_spark.pipeline.jpeg import decode_jpeg, encode_jpeg

        for b in batches:
            out = []
            for did in b["doc_id"]:
                v = int((37 + 7 * int(did)) % 256)
                img = np.full((16, 24, 3), v, dtype=np.uint8)
                dec = decode_jpeg(encode_jpeg(img, quality=75))
                out.append((int(did), int(dec.astype(np.int64).sum())))
            import pandas as _pd

            yield _pd.DataFrame(out, columns=["media_id", "pix_sum"])

    return docs.mapInPandas(run, schema="media_id long, pix_sum long")


def q_mm_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-video decode through the REAL strict pipeline (gate-folded
    round 7): per document, synthesize an uncompressed 3-frame
    16×12 AVI whose frame i is flat value (37 + 5·doc_id + 11·i) mod
    256 at 1 fps, then run frame_sample(strict=True) — the Y4M/raw-AVI
    parser decodes actual frames, so pix_sum is the exact decoded RGB
    sum v·16·12·3 and the oracle is closed-form (the AVI DIB path is
    pure byte reshuffling: no colorspace arithmetic to replicate)."""
    docs = _docs(spark, sf_dir).select("doc_id").filter(F.col("doc_id") < 48)

    def synth(batches):
        import numpy as np
        import pandas as _pd

        from networkit_spark.pipeline.multimodal import encode_avi_raw

        for b in batches:
            out = []
            for did in b["doc_id"]:
                vals = [(37 + 5 * int(did) + 11 * i) % 256 for i in range(3)]
                frames = np.stack(
                    [np.full((12, 16, 3), v, dtype=np.uint8) for v in vals]
                )
                out.append((int(did), bytearray(encode_avi_raw(frames, fps=1.0))))
            yield _pd.DataFrame(out, columns=["media_id", "payload"])

    from networkit_spark.pipeline.multimodal import frame_sample

    media = docs.mapInPandas(
        synth, schema="media_id long, payload binary"
    ).withColumn("modality", F.lit("video"))
    return frame_sample(media, every_ms=1000, strict=True)


def q_mm_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing in one (kind, media_id, k, info) table:
    typed media metadata + Arrow-batched frame sampling (merged
    mm_media_meta + mm_frame_sample so both keep a dense oracle row
    inside the driver's 50-slot window) + the baseline JFIF codec
    round-trip rows (kind='jpeg', k = decoded pixel sum — see
    q_mm_jpeg_roundtrip) + strict raw-AVI frame decode rows
    (kind='video', k = decoded pixel sum per sampled frame — see
    q_mm_video_frames)."""
    a = q_mm_media_meta(spark, sf_dir).select(
        F.lit("meta").alias("kind"),
        "media_id",
        F.col("n_bytes").cast("int").alias("k"),
        F.concat_ws("/", "modality", "mime").alias("info"),
    )
    b = q_mm_frame_sample(spark, sf_dir).select(
        F.lit("frame").alias("kind"),
        "media_id",
        F.col("frame_idx").cast("int").alias("k"),
        F.col("frame_sha256").alias("info"),
    )
    c = q_mm_jpeg_roundtrip(spark, sf_dir).select(
        F.lit("jpeg").alias("kind"),
        "media_id",
        F.col("pix_sum").cast("int").alias("k"),
        F.lit("16x24x3:q75").alias("info"),
    )
    d = q_mm_video_frames(spark, sf_dir).select(
        F.lit("video").alias("kind"),
        "media_id",
        F.col("pix_sum").cast("int").alias("k"),
        F.concat(F.lit("avi:"), F.col("frame_idx").cast("string")).alias("info"),
    )
    return a.unionByName(b).unionByName(c).unionByName(d)


# --------------------------------------------------------------------------
# events (windowed aggregation)
# --------------------------------------------------------------------------

def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window counts per event type THROUGH the library
    operator (streaming/stateful.py::windowed_event_counts, batch mode —
    the watermark is a no-op on batch input; the streaming path over the
    same rows is pinned in tests/test_streaming.py). Timezone-proof
    oracle mapping: tumbling windows are epoch-aligned, so the emitted
    window start is exactly epoch-seconds // 3600."""
    from networkit_spark.streaming.stateful import windowed_event_counts

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return windowed_event_counts(ev).select(
        (F.unix_timestamp("window_start") / F.lit(3600))
        .cast("long")
        .alias("hour_bucket"),
        "event_type",
        "n_events",
        F.round("total_value", 6).alias("total_value"),
    )


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------



# --------------------------------------------------------------------------
# round-3 additions: merged scalar rows + new operator entries
# --------------------------------------------------------------------------

LUBY_ROUNDS = 9  # measured convergence at sf0.01 = 6 seeded rounds


def q_graph_tri_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total triangles + exact global clustering coefficient in ONE row
    (merged from the round-2 graph_triangle_total / graph_global_cc
    entries to free correctness-window slots; same operators)."""
    from networkit_spark.operators.triangles import (
        global_clustering_coefficient,
        total_triangles,
    )

    g = _co_graph(spark, sf_dir)
    t = int(total_triangles(g))
    c = round(global_clustering_coefficient(g), 6)
    return spark.createDataFrame(
        [(t, float(c))], "total_triangles long, global_cc double"
    )


def q_graph_partition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-quality scalars in one row (merged round-2 entries:
    modularity + edge cut + hub dominance + intrapartition density over
    id%10; conductance over the id%2 bipartition)."""
    from networkit_spark.operators.community_quality import (
        conductance,
        edge_cut,
        hub_dominance,
        intrapartition_density,
        modularity,
    )

    g = _co_graph(spark, sf_dir)
    l10 = g.nodes.select(F.col("id").alias("node"), (F.col("id") % 10).alias("label"))
    l2 = g.nodes.select(F.col("id").alias("node"), (F.col("id") % 2).alias("label"))
    ipd = intrapartition_density(g, l10)
    return spark.createDataFrame(
        [
            (
                round(modularity(g, l10), 6),
                round(edge_cut(g, l10), 6),
                round(conductance(g, l2), 6),
                round(hub_dominance(g, l10), 6),
                round(ipd["unweighted_avg"], 6),
                round(ipd["global"], 6),
            )
        ],
        "modularity double, cut_weight double, conductance double, "
        "hub_dominance double, ipd_avg double, ipd_global double",
    )


def q_graph_partition_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-similarity scalars in one row (merged round-2 entries:
    NMI / ARI / Jaccard / graph-structural Rand between id%10 and id%7).
    Round 7 adds: CoverF1Similarity unweighted+weighted averages (cx vs
    cy covers), CoverHubDominance unweighted average (cx), the sampled
    node/graph structural Rand dissimilarities (portable md5 samples,
    500 each), and DynamicNMIDistance over the even-id snapshot
    restriction. Float columns floor-quantize (dyadic .5 ties)."""
    from networkit_spark.operators.community_quality import (
        adjusted_rand_dissimilarity,
        cover_f1_similarity,
        cover_hub_dominance,
        dynamic_nmi_distance,
        graph_structural_rand_dissimilarity,
        jaccard_dissimilarity,
        nmi_distance,
        sampled_graph_structural_rand_dissimilarity,
        sampled_node_structural_rand_dissimilarity,
    )

    from networkit_spark.operators.community_quality import overlapping_nmi_distance

    g = _co_graph(spark, sf_dir)
    a = g.nodes.select(F.col("id").alias("node"), (F.col("id") % 10).alias("label"))
    b = g.nodes.select(F.col("id").alias("node"), (F.col("id") % 7).alias("label"))
    # overlapping covers: the partitions above plus one extra overlapping
    # subset each (id%3==0 / id%5==0) — exercises the Cover machinery
    cx = a.select("node", F.col("label").alias("subset")).unionByName(
        g.nodes.filter(F.col("id") % 3 == 0).select(
            F.col("id").alias("node"), F.lit(10).alias("subset")
        )
    )
    cy = b.select("node", F.col("label").alias("subset")).unionByName(
        g.nodes.filter(F.col("id") % 5 == 0).select(
            F.col("id").alias("node"), F.lit(7).alias("subset")
        )
    )
    n = g.num_nodes()
    import math

    q6 = lambda x: math.floor(x * 1e6) / 1e6  # noqa: E731
    cf1 = cover_f1_similarity(g, cx, cy)
    chd = cover_hub_dominance(g, cx)
    old = a.filter(F.col("node") % 2 == 0)
    return spark.createDataFrame(
        [
            (
                round(nmi_distance(a, b), 6),
                round(adjusted_rand_dissimilarity(a, b), 6),
                round(jaccard_dissimilarity(a, b), 6),
                round(graph_structural_rand_dissimilarity(g, a, b), 6),
                round(overlapping_nmi_distance(cx, cy, n), 6),
                q6(cf1["unweighted_avg"]),
                q6(cf1["weighted_avg"]),
                q6(chd["unweighted_avg"]),
                q6(sampled_node_structural_rand_dissimilarity(a, b, 500, seed=13)),
                q6(sampled_graph_structural_rand_dissimilarity(g, a, b, 500, seed=13)),
                q6(dynamic_nmi_distance(g, old, b)),
            )
        ],
        "nmi_distance double, ari_distance double, jaccard_distance double, "
        "gs_rand_distance double, onmi_distance double, coverf1_uavg double, "
        "coverf1_wavg double, cover_hub_uavg double, snsr double, sgsr double, "
        "dyn_nmi double",
    )


def _q_prefix_jaccard_sub200(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PrefixJaccardScore on the <200 subgraph with triangle-count
    attributes (edgescores/PrefixJaccardScore.cpp) — merged into
    graph_sparsifiers as the 'prefix_jaccard' method."""
    from networkit_spark.operators.sparsification import prefix_jaccard_scores

    sub = _co_subgraph200(spark, sf_dir)
    return prefix_jaccard_scores(sub).select(
        "src", "dst", F.round("score", 6).alias("score")
    )


def q_graph_sparsifiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-edge sparsifier/backbone scores in one table keyed by method
    (merged round-2 graph_sparsify / graph_local_degree /
    graph_local_similarity + the round-3 simmelian entry):
    (method, src, dst, score). The first three run on the full co-graph;
    simmelian (rank-overlap, maxRank=5) runs on the <200 subgraph like
    its round-3 standalone row did. Round 7 adds the edgescores family
    on the full co-graph over the (src+dst)%11+1 attribute: gmean
    (GeometricMeanScore), multiscale (MultiscaleScore), cct
    (ChanceCorrectedTriangleScore, floor-quantized — dyadic .5 ties),
    rescore (RandomEdgeScore, portable draws), linearize
    (EdgeScoreLinearizer, canonical tie-break), normalize
    (EdgeScoreNormalizer invert to [0.25, 0.75])."""
    from networkit_spark.operators.edgescores import (
        chance_corrected_triangle_score,
        edge_score_linearizer,
        edge_score_normalizer,
        geometric_mean_score,
        multiscale_score,
        random_edge_score,
    )
    from networkit_spark.operators.sparsification import (
        jaccard_similarity_scores,
        local_degree_scores,
        local_similarity_scores,
    )

    g = _co_graph(spark, sf_dir)
    # deterministic edge attribute for the r7 edgescores variants
    attr = g.canonical_undirected_edges().select(
        "src",
        "dst",
        ((F.col("src") + F.col("dst")) % 11 + 1).cast("double").alias("score"),
    )
    parts = [
        jaccard_similarity_scores(g).select(
            F.lit("jaccard").alias("method"), "src", "dst",
            F.round("score", 6).alias("score"),
        ),
        local_degree_scores(g).select(
            F.lit("local_degree").alias("method"), "src", "dst",
            F.round("score", 6).alias("score"),
        ),
        local_similarity_scores(g).select(
            F.lit("local_similarity").alias("method"), "src", "dst",
            F.round("score", 6).alias("score"),
        ),
        q_graph_simmelian(spark, sf_dir).select(
            F.lit("simmelian").alias("method"), "src", "dst", "score"
        ),
        _q_prefix_jaccard_sub200(spark, sf_dir).select(
            F.lit("prefix_jaccard").alias("method"), "src", "dst", "score"
        ),
        # r7 edgescores family (edgescores/ + remaining sparsification
        # scores) over the (src+dst)%11+1 attribute
        geometric_mean_score(g, attr).select(
            F.lit("gmean").alias("method"), "src", "dst",
            F.round("score", 6).alias("score"),
        ),
        multiscale_score(g, attr).select(
            F.lit("multiscale").alias("method"), "src", "dst",
            F.round("score", 6).alias("score"),
        ),
        # floor-quantized, not round: tri·(n−2)/((du−1)(dv−1)) lands on
        # exact dyadic .5 ties (power-of-two denominators) where Spark
        # HALF_UP and DuckDB half-even disagree; floor has no ties
        chance_corrected_triangle_score(g).select(
            F.lit("cct").alias("method"), "src", "dst",
            (F.floor(F.col("score") * 1e6) / 1e6).alias("score"),
        ),
        random_edge_score(g, seed=5).select(
            F.lit("rescore").alias("method"), "src", "dst",
            F.round("score", 6).alias("score"),
        ),
        edge_score_linearizer(g, attr).select(
            F.lit("linearize").alias("method"), "src", "dst",
            F.round("score", 6).alias("score"),
        ),
        edge_score_normalizer(attr, invert=True, lower=0.25, upper=0.75).select(
            F.lit("normalize").alias("method"), "src", "dst",
            F.round("score", 6).alias("score"),
        ),
    ]
    out = parts[0]
    for df in parts[1:]:
        out = out.unionByName(df)
    return out


def q_text_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-pipeline columns in one per-document table (merged round-2
    text_tokens / text_langid / text_quality / text_fingerprint)."""
    from networkit_spark.pipeline.text import (
        doc_fingerprint,
        language_id,
        quality_scores,
        token_counts,
    )

    docs = _docs(spark, sf_dir)
    t = token_counts(docs)
    l = language_id(docs).select(
        "doc_id", "lang_pred", F.round("lang_score", 6).alias("lang_score")
    )
    q = quality_scores(docs).select(
        "doc_id",
        F.round("mean_word_len", 6).alias("mean_word_len"),
        F.round("punct_ratio", 6).alias("punct_ratio"),
        F.round("stopword_ratio", 6).alias("stopword_ratio"),
        F.round("alpha_ratio", 6).alias("alpha_ratio"),
        F.round("quality", 6).alias("quality"),
    )
    fp = doc_fingerprint(docs, shingle_n=4)
    return t.join(l, "doc_id").join(q, "doc_id").join(fp, "doc_id")


def q_graph_bicc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Articulation points from the Tarjan-Vishkin biconnected-components
    kernel (components/BiconnectedComponents.cpp semantics), on the
    (src+dst)%4==0-sparsified <200 subgraph — sparsified BECAUSE the full
    sub200 is biconnected (0 articulation points is a vacuous check);
    the sparse variant has ~28. The oracle recomputes articulation
    points INDEPENDENTLY as vertices whose removal increases the
    component count (per-v min-label propagation) — so this checks the
    whole TV pipeline (forest, preorder, low/high, aux CC) end to end."""
    from networkit_spark.operators.bicc import articulation_points

    sub = _co_subgraph200(spark, sf_dir)
    sparse = Graph(
        nodes=sub.nodes,
        edges=sub.edges.filter((F.col("src") + F.col("dst")) % 4 == 0),
        directed=False,
        weighted=False,
    )
    # tiny graph, many supersteps (forest + traversals + aux CC): shuffle
    # width 4 keeps per-round fixed cost down, same as q_graph_plm
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        out = articulation_points(sparse).select("id").localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return out


GROUP_DEGREE_K = 4


def q_graph_group_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy GroupDegree, k=4 on the full co-graph
    (centrality/GroupDegree.cpp greedy; ties → smallest id). Output one
    row per greedy pick: (rank, id) — the oracle replays the same greedy
    with chained CTEs."""
    from networkit_spark.operators.group_centrality import group_degree

    g = _co_graph(spark, sf_dir)
    group, _score = group_degree(g, k=GROUP_DEGREE_K)
    return spark.createDataFrame(
        [(i + 1, int(u)) for i, u in enumerate(group)], "rank int, id long"
    )


GROUP_CLOSENESS_K = 3


def q_graph_group_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy GroupCloseness, k=3 on the <200 subgraph
    (centrality/GroupCloseness.cpp greedy with its dominance pruning).
    Output (rank, id); oracle replays the greedy over the walk-CTE
    distance table."""
    from networkit_spark.operators.group_centrality import group_closeness

    sub = _co_subgraph200(spark, sf_dir)
    group, _far = group_closeness(sub, k=GROUP_CLOSENESS_K)
    return spark.createDataFrame(
        [(i + 1, int(u)) for i, u in enumerate(group)], "rank int, id long"
    )


def q_graph_partition_iic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local partition evaluation sweep in one row: isolated
    interpartition conductance + expansion, partition fragmentation and
    stable-node fraction for the id%10 partition
    (community/IsolatedInterpartition{Conductance,Expansion}.cpp,
    PartitionFragmentation.cpp, StablePartitionNodes.cpp)."""
    from networkit_spark.operators.community_quality import (
        isolated_interpartition_conductance,
        isolated_interpartition_expansion,
        partition_fragmentation,
        stable_partition_nodes,
    )

    g = _co_graph(spark, sf_dir)
    l10 = g.nodes.select(F.col("id").alias("node"), (F.col("id") % 10).alias("label"))
    iic = isolated_interpartition_conductance(g, l10)
    iie = isolated_interpartition_expansion(g, l10)
    frag = partition_fragmentation(g, l10)
    stab = stable_partition_nodes(g, l10)
    return spark.createDataFrame(
        [
            (
                round(iic["unweighted_avg"], 6),
                round(iie["unweighted_avg"], 6),
                round(frag["unweighted_avg"], 6),
                round(stab["stable_fraction"], 6),
            )
        ],
        "iic_avg double, iie_avg double, frag_avg double, stable_frac double",
    )


KATZ_INDEX_L = 4
KATZ_INDEX_BETA = 0.1


def q_graph_katz_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KatzIndex link-prediction scores (linkprediction/KatzIndex.cpp):
    damped walk counts up to length 4 for the deterministic candidate
    pairs (i, i+1), i < 20, on the co-graph."""
    from networkit_spark.operators.linkprediction import katz_index

    g = _co_graph(spark, sf_dir)
    pairs = spark.range(20).select(
        F.col("id").alias("u"), (F.col("id") + 1).alias("v")
    )
    out = katz_index(g, pairs, max_path_length=KATZ_INDEX_L, damping=KATZ_INDEX_BETA)
    return out.select("u", "v", F.round("katz", 6).alias("katz"))


def q_graph_roc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-prediction ROC AUC (linkprediction/ROCMetric.cpp +
    EvaluationMetric.cpp): hold out the <200-subgraph edges with
    (src+dst) % 4 == 0, score every candidate pair by common-neighbor
    count on the training remainder, label = held-out edge. One-row AUC
    (mid-rank tie convention)."""
    from networkit_spark.operators.linkprediction import roc_auc

    sub = _co_subgraph200(spark, sf_dir)
    can = sub.canonical_undirected_edges().select("src", "dst")
    train = can.filter((F.col("src") + F.col("dst")) % 4 != 0)
    held = can.filter((F.col("src") + F.col("dst")) % 4 == 0)
    tsym = train.unionByName(
        train.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    a = tsym.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    b = tsym.select(F.col("dst").alias("v"), F.col("src").alias("w"))
    cand = (
        a.join(b, "w")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("score"))
        .join(train.select(F.col("src").alias("u"), F.col("dst").alias("v")),
              ["u", "v"], "left_anti")
    )
    scored = cand.join(
        held.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .withColumn("label", F.lit(1)),
        ["u", "v"],
        "left",
    ).select("score", F.coalesce("label", F.lit(0)).alias("label"))
    auc = roc_auc(scored.select(F.col("score").cast("double").alias("score"), "label"))
    return _scalar_df(spark, "auc", round(auc, 6))


def q_graph_curveball(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GlobalCurveball trade rounds on the <200 subgraph
    (randomization/GlobalCurveball.cpp; synchronous variant) — hash-oracled
    by the porthash trade-chain replay (pytest additionally pins degree
    preservation + simplicity + determinism)."""
    from networkit_spark.operators.randomization import global_curveball

    sub = _co_subgraph200(spark, sf_dir)
    # portable md5 hashes: oracle replays the trade rounds (_curveball_ctes)
    out = global_curveball(sub, rounds=3, seed=42, portable_hash=True)
    return out.canonical_undirected_edges().select("src", "dst")


KADABRA_BATCH = 64


def q_graph_approx_betweenness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled-path betweenness estimators in one (method, id, score)
    table on the <200 subgraph, both with portable md5 draws (pair
    sampling + per-step σ-weighted path choice) so the DuckDB oracle
    replays the identical sampled paths:
    - rk: ApproxBetweenness ε-δ (centrality/ApproxBetweenness.cpp,
      Riondato-Kornaropoulos fixed sample bound);
    - kadabra: KadabraBetweenness
      (centrality/KadabraBetweenness.cpp) pinned to ONE fixed batch of
      64 samples (max_rounds=1) — the adaptive empirical-Bernstein stop
      is exercised in pytest; the gate row checks the sampling and
      path-walk machinery exactly;
    - dyn: DynApproxBetweenness
      (centrality/DynApproxBetweenness.cpp) seeded on sub200 MINUS its
      last canonical edge, then one EDGE_ADDITION batch restores it —
      the oracle replays the initial epoch-0 sample on the reduced
      graph, the modified-source anti-diff, and the epoch-1 resample of
      ONLY the touched pairs (vd pinned at 6 so both sides share
      r = 59)."""
    from networkit_spark.operators.distance import (
        approx_betweenness,
        kadabra_betweenness,
    )
    from networkit_spark.streaming.dynamics import DynApproxBetweenness, events_of

    sub = _co_subgraph200(spark, sf_dir)
    a = approx_betweenness(
        sub, epsilon=0.2, delta=0.1, seed=42, portable_hash=True
    ).select(F.lit("rk").alias("method"), "id", F.round("score", 6).alias("score"))
    b = kadabra_betweenness(
        sub,
        seed=42,
        batch_size=KADABRA_BATCH,
        max_rounds=1,
        portable_hash=True,
    ).select(
        F.lit("kadabra").alias("method"), "id", F.round("score", 6).alias("score")
    )
    estar = (
        sub.canonical_undirected_edges()
        .orderBy(F.desc("src"), F.desc("dst"))
        .limit(1)
        .collect()[0]
    )
    eu, ev = int(estar["src"]), int(estar["dst"])
    g0 = Graph(
        nodes=sub.nodes,
        edges=sub.edges.filter(
            ~(
                ((F.col("src") == eu) & (F.col("dst") == ev))
                | ((F.col("src") == ev) & (F.col("dst") == eu))
            )
        ).localCheckpoint(eager=True),
        directed=False,
        weighted=False,
    )
    dyn = DynApproxBetweenness(
        g0, epsilon=0.3, delta=0.1, seed=42, portable_hash=True, vd=6
    )
    out = dyn.update_batch(events_of(spark, [(1, "EDGE_ADDITION", eu, ev, 1.0)]))
    c = out.select(
        F.lit("dyn").alias("method"), "id", F.round("score", 6).alias("score")
    )
    return a.unionByName(b).unionByName(c)




def q_graph_simmelian(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simmelian overlap scores, maxRank=5, on the <200 subgraph
    (sparsification/SimmelianOverlapScore.cpp) — hash-oracled inside the
    graph_sparsifiers union; pytest pins the score against a brute-force
    ranked-overlap oracle."""
    from networkit_spark.operators.sparsification import simmelian_overlap_scores

    sub = _co_subgraph200(spark, sf_dir)
    out = simmelian_overlap_scores(sub, max_rank=5)
    return out.select("src", "dst", F.round("score", 6).alias("score"))


def q_graph_local_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LocalMax matching on the weighted <200 subgraph
    (matching/LocalMaxMatcher.cpp) — hash-oracled by the round-replay CTE
    in graph_matching; pytest pins validity, maximality and the
    dominant-edge fixture."""
    from networkit_spark.operators.matching import local_max_matching

    g = _sub200_weighted(spark, sf_dir)
    return local_max_matching(g)


def q_graph_gce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GCE greedy community expansion from seed 0 on the <200 subgraph
    (scd/GCE.cpp objective M) — hash-oracled by the scalar-state greedy
    round replay in graph_scd; pytest pins the planted two-clique
    fixture."""
    from networkit_spark.operators.scd import gce

    sub = _co_subgraph200(spark, sf_dir)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        # cap expansion: the dense sub200 giant component would absorb
        # ~190 nodes over as many greedy rounds — 12 is plenty for the gate
        out = gce(sub, seeds=[0], max_iterations=12).localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return out


def q_graph_ctd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Commute-time distance for a fixed pair on the <200 subgraph
    via the distributed CG Laplacian solver (distance/
    CommuteTimeDistance.cpp runSinglePair; numerics/) — hash-oracled by
    the 20-iteration CG unroll replay; pytest pins the solver against
    numpy pinv."""
    from networkit_spark.operators.numerics import commute_time_distance
    from networkit_spark.operators.components import connected_components

    sub = _co_subgraph200(spark, sf_dir)
    # pick pairs inside the largest component so the solve is defined
    labels = connected_components(sub)
    big = (
        labels.groupBy("label").count().orderBy(F.desc("count")).limit(1).collect()
    )[0]["label"]
    ids = [
        r["node"]
        for r in labels.filter(F.col("label") == big).orderBy("node").limit(3).collect()
    ]
    # one pair: each CG solve is ~20s of driver-round-trip latency at
    # gate scale; one solve demonstrates the numerics path end to end
    pairs = [(ids[0], ids[1])]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        out = commute_time_distance(sub, pairs, tol=1e-4).localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return out.select("u", "v", F.round("ectd", 4).alias("ectd"))


# --------------------------------------------------------------------------
# round-4 merged entries: near-duplicate rows folded into variant tables so
# every registry entry fits inside the driver's 50-slot oracle window
# --------------------------------------------------------------------------


APPROX_CLOSENESS_K = 8
APPROX_CLOSENESS_EPS = 0.5


def q_graph_closeness_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closeness family in one (variant, id, score) table: standard,
    harmonic, and weighted closeness on the <200 subgraph (merged from
    the round-3 graph_closeness / graph_harmonic / graph_closeness_w
    rows to free oracle-window slots; same operators), plus (round 5)
    - approx: ApproxCloseness (centrality/ApproxCloseness.cpp, Cohen
      pivot estimator), k=8 md5-drawn samples, ε=0.5 — full set-form
      replay oracle; all sums are integer hop distances so the replay
      is exact."""
    from networkit_spark.operators.distance import approx_closeness

    a = q_graph_closeness(spark, sf_dir).select(
        F.lit("standard").alias("variant"), "id", "score"
    )
    b = q_graph_harmonic(spark, sf_dir).select(
        F.lit("harmonic").alias("variant"), "id", "score"
    )
    c = q_graph_closeness_w(spark, sf_dir).select(
        F.lit("weighted").alias("variant"), "id", "score"
    )
    sub = _co_subgraph200(spark, sf_dir)
    d = approx_closeness(
        sub,
        n_samples=APPROX_CLOSENESS_K,
        epsilon=APPROX_CLOSENESS_EPS,
        seed=42,
        portable_hash=True,
    ).select(F.lit("approx").alias("variant"), "id", F.round("score", 6).alias("score"))
    return a.unionByName(b).unionByName(c).unionByName(d)


def q_graph_eccentricity_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node eccentricity plus the exact diameter as the id = -1 row
    (merged from round-3 graph_eccentricity + graph_diameter)."""
    ecc = q_graph_eccentricity(spark, sf_dir).select(
        "id", F.col("ecc").cast("long").alias("ecc")
    )
    dia = q_graph_diameter(spark, sf_dir).select(
        F.lit(-1).cast("long").alias("id"), F.col("diameter").cast("long").alias("ecc")
    )
    return ecc.unionByName(dia)


GEDWALK_GROUP = (0, 3, 7)
GEDWALK_ALPHA = 0.25  # a power of two: every α^ℓ·(integer walk count)
GEDWALK_LEVELS = 4  # product is exact in FP, so the replay is bit-identical

GC_REFINE_START = [0, 1, 2]  # fixed seed group for the refinement rows
GC_REFINE_ROUNDS = 3  # swap / grow-shrink / local-search round unroll
GC_REFINE_BEAM = 6  # degree-ranked candidate beam (local_search: all)


def q_graph_group_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group/partition centralities in one (method, rank, id, score)
    table (merged graph_group_degree + graph_group_closeness, plus the
    round-4 operators gate-folded round 5):
    - degree / closeness: greedy picks, (rank, id), score NULL;
    - lpc: LocalPartitionCoverage of the id%10 partition on the full
      co-graph (centrality/LocalPartitionCoverage.cpp) — rank=-1,
      id=node, score=coverage;
    - gedwalk: exact GED-Walk score of the fixed group {0,3,7} on the
      <200 subgraph (centrality/GedWalk.cpp evaluateGroup hit/miss DP,
      α=0.25, 4 levels) — one (rank=-1, id=-1, score) row. Walk counts
      are integers and α^ℓ is a power of two, so the arithmetic is
      exact and cross-engine bit-identical;
    - harmonic: greedy GroupHarmonicCloseness k=3
      (centrality/GroupHarmonicCloseness.cpp) in portable_sum mode —
      member rows (rank, id) plus a (rank=0, id=-1) score row whose
      ordered-fold float is bit-identical to the oracle's list_reduce;
    - local_swaps / grow_shrink / local_search: the three
      GroupCloseness refinement passes
      (GroupClosenessLocalSwaps/GrowShrink/LocalSearch.cpp) from the
      fixed seed group {0,1,2} — member rows plus a (rank=0, id=-1)
      exact-integer farness row; the oracle replays every swap round
      (candidate beam, exact farness evaluation, accept rule) as
      chained CTEs."""
    from networkit_spark.operators.degrees import local_partition_coverage
    from networkit_spark.operators.group_centrality import (
        ged_walk_score,
        group_closeness_grow_shrink,
        group_closeness_local_search,
        group_closeness_local_swaps,
        group_harmonic_closeness,
    )

    nulld = F.lit(None).cast("double")
    a = q_graph_group_degree(spark, sf_dir).select(
        F.lit("degree").alias("method"), "rank", "id", nulld.alias("score")
    )
    b = q_graph_group_closeness(spark, sf_dir).select(
        F.lit("closeness").alias("method"), "rank", "id", nulld.alias("score")
    )
    g = _co_graph(spark, sf_dir)
    l10 = g.nodes.select(F.col("id").alias("node"), (F.col("id") % 10).alias("label"))
    c = local_partition_coverage(g, l10).select(
        F.lit("lpc").alias("method"),
        F.lit(-1).cast("int").alias("rank"),
        "id",
        F.round("score", 6).alias("score"),
    )
    sub = _co_subgraph200(spark, sf_dir)
    gw = ged_walk_score(
        sub, list(GEDWALK_GROUP), alpha=GEDWALK_ALPHA, levels=GEDWALK_LEVELS
    )
    # no rounding: the value is exact (see docstring), and Python round()
    # vs SQL round() tie rules differ — raw doubles compare bit-identical
    d = spark.createDataFrame(
        [("gedwalk", -1, -1, float(gw))],
        "method string, rank int, id long, score double",
    )
    rows: list[tuple] = []
    hg, hs = group_harmonic_closeness(sub, k=3, portable_sum=True)
    rows += [("harmonic", i + 1, int(u), None) for i, u in enumerate(hg)]
    rows.append(("harmonic", 0, -1, float(hs)))
    for method, (grp, far) in (
        ("local_swaps", group_closeness_local_swaps(
            sub, GC_REFINE_START, max_swaps=GC_REFINE_ROUNDS, beam=GC_REFINE_BEAM)),
        ("grow_shrink", group_closeness_grow_shrink(
            sub, GC_REFINE_START, max_iterations=GC_REFINE_ROUNDS,
            beam=GC_REFINE_BEAM)),
        ("local_search", group_closeness_local_search(
            sub, GC_REFINE_START, run_grow_shrink=False,
            max_iterations=GC_REFINE_ROUNDS)[:2]),
    ):
        rows += [(method, i + 1, int(u), None) for i, u in enumerate(grp)]
        rows.append((method, 0, -1, float(far)))
    e = spark.createDataFrame(
        rows, "method string, rank int, id long, score double"
    )
    return a.unionByName(b).unionByName(c).unionByName(d).unionByName(e)


DYN_KATZ_INIT_ITERS = 10
DYN_KATZ_UPDATE_ITERS = 5


def q_graph_dyn_katz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DynKatzCentrality warm-start maintenance
    (centrality/DynKatzCentrality.cpp dynamic contract): initialize on
    the co-graph MINUS the edges with (src+dst)%7==0 (fixed 10
    iterations, tol=0, α pinned from that base graph), then stream the
    removed edges back in as one EDGE_ADDITION batch and re-converge
    warm-started for a fixed 5 iterations. Fixed budgets + tol=0 make
    the whole init→update trajectory a deterministic recurrence the
    DuckDB oracle replays round by round (15 chained CTE rounds)."""
    from networkit_spark.streaming.dynamics import EDGE_ADDITION, DynKatzCentrality

    g = _co_graph(spark, sf_dir)
    keep = g.edges.filter((F.col("src") + F.col("dst")) % 7 != 0)
    g0 = Graph(nodes=g.nodes, edges=keep.localCheckpoint(eager=True),
               directed=False, weighted=False)
    dk = DynKatzCentrality(g0, beta=0.1, tol=0.0,
                           max_iterations=DYN_KATZ_INIT_ITERS)
    # the removed edges, canonical orientation, as an addition batch —
    # built distributively (no collect; seq only needs per-pair uniqueness
    # because all events are distinct additions)
    batch = (
        g.edges.filter(((F.col("src") + F.col("dst")) % 7 == 0)
                       & (F.col("src") < F.col("dst")))
        .select(
            (F.col("src") * 1000000 + F.col("dst")).alias("seq"),
            F.lit(EDGE_ADDITION).alias("type"),
            F.col("src").alias("u"),
            F.col("dst").alias("v"),
            F.lit(1.0).alias("w"),
        )
    )
    out = dk.update_batch(batch, max_iterations=DYN_KATZ_UPDATE_ITERS)
    return out.select("id", F.round("score", 6).alias("score"))


def q_graph_spectral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spectral centralities in one (method, id, score) table
    (merged graph_katz + graph_eigenvector + the round-4 DynKatz
    warm-start variant, gate-folded round 5)."""
    a = q_graph_katz(spark, sf_dir).select(
        F.lit("katz").alias("method"), "id", "score"
    )
    b = q_graph_eigenvector(spark, sf_dir).select(
        F.lit("eigenvector").alias("method"), "id", "score"
    )
    c = q_graph_dyn_katz(spark, sf_dir).select(
        F.lit("dyn_katz").alias("method"), "id", "score"
    )
    return a.unionByName(b).unionByName(c)


PATH_TARGETS = (7, 50, 199)  # reachable from 0 at every driver sf


def q_graph_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path queries in one (variant, node, dist) table:
    - bfs: hop distances from node 0 on the full co-graph;
    - sssp: weighted SSSP from 0 on the <200 subgraph ((u+v)%5+1);
    - bibfs: BidirectionalBFS point-to-point hop distances 0→t for
      t ∈ PATH_TARGETS on the full co-graph (round 4 operator;
      unreachable targets emit no row, matching the bfs contract);
    - bidijkstra: BidirectionalDijkstra 0→t on the %5+1 weighted
      subgraph (round 5 operator; same absent-when-unreachable rule);
    - inc_dijkstra: IncompleteDijkstra from 0 on the %3+1 weighted
      subgraph with explored={5,7} and max_dist=4 — only nodes settled
      within the bound appear (round 4 operator);
    - simple_paths: AllSimplePaths 0→50 on the <200 subgraph with
      cutoff 4, aggregated to per-hop-count path counts
      (node=hops, dist=count) so the enumeration has a finite row shape
      (round 4 operator);
    - affected: AffectedNodes (distance/AffectedNodes.cpp, round 6) for
      the EDGE_ADDITION of sub200's last canonical edge — node = each
      affected node, dist = its min distance to the modification over
      the without-edge graph (the improvement-bound column lives in the
      pytest transcription check);
    - bfs_sample (sampling.bfsSample, r7 late): the k=40 (dist, id)-
      smallest BFS ball around 0 on sub200 with hop distances —
      oracle = rank over the shared sp table."""
    from networkit_spark.operators.distance import (
        bidirectional_bfs,
        bidirectional_dijkstra,
        incomplete_dijkstra,
    )
    from networkit_spark.operators.reachability import affected_nodes, all_simple_paths

    a = q_graph_bfs(spark, sf_dir).select(
        F.lit("bfs").alias("variant"), "node", F.col("dist").cast("double").alias("dist")
    )
    b = q_graph_sssp(spark, sf_dir).select(
        F.lit("sssp").alias("variant"), "node", "dist"
    )
    g = _co_graph(spark, sf_dir)
    sub = _co_subgraph200(spark, sf_dir)
    w5 = Graph(
        nodes=sub.nodes,
        edges=sub.edges.select(
            "src",
            "dst",
            ((F.col("src") + F.col("dst")) % 5 + 1).cast("double").alias("weight"),
        ),
        directed=False,
        weighted=True,
    )
    bibfs_rows = [
        (t, float(d))
        for t in PATH_TARGETS
        for d in [bidirectional_bfs(g, 0, t)]
        if d != float("inf")
    ]
    c = spark.createDataFrame(bibfs_rows, "node long, dist double").select(
        F.lit("bibfs").alias("variant"), "node", "dist"
    )
    bidij_rows = [
        (t, float(d))
        for t in PATH_TARGETS
        for d in [bidirectional_dijkstra(w5, 0, t)]
        if d != float("inf")
    ]
    d = spark.createDataFrame(bidij_rows, "node long, dist double").select(
        F.lit("bidijkstra").alias("variant"), "node", "dist"
    )
    e = incomplete_dijkstra(
        _sub200_weighted(spark, sf_dir),
        sources=[0],
        explored=spark.createDataFrame([(5,), (7,)], "id long"),
        max_dist=4.0,
    ).select(F.lit("inc_dijkstra").alias("variant"), "node", F.round("dist", 6).alias("dist"))
    f = (
        all_simple_paths(sub, source=0, target=50, cutoff=4)
        .select((F.size("path") - 1).cast("long").alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("double").alias("dist"))
        .select(F.lit("simple_paths").alias("variant"), "node", "dist")
    )
    estar = (
        sub.canonical_undirected_edges()
        .orderBy(F.desc("src"), F.desc("dst"))
        .limit(1)
        .collect()[0]
    )
    h = affected_nodes(
        sub, "EDGE_ADDITION", int(estar["src"]), int(estar["dst"])
    ).select(F.lit("affected").alias("variant"), "node", "dist")
    # bfs_sample (sampling.bfsSample, gate-folded r7 late): the k=40
    # (dist, id)-smallest ball around node 0 on sub200 — members with
    # their hop distance; oracle = rank over the shared sp table
    from networkit_spark.operators.coloring import bfs_sample
    from networkit_spark.operators.traversal import bfs

    samp = bfs_sample(sub, source=0, k=40)
    dists = bfs(sub, 0)
    i = (
        samp.nodes.join(dists.withColumnRenamed("node", "id"), "id")
        .select(
            F.lit("bfs_sample").alias("variant"),
            F.col("id").alias("node"),
            F.col("dist").cast("double").alias("dist"),
        )
    )
    return (
        a.unionByName(b).unionByName(c).unionByName(d)
        .unionByName(e).unionByName(f).unionByName(h).unionByName(i)
    )


def q_graph_lp_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-prediction evaluation scores in one (metric, u, v, score)
    table: KatzIndex pair scores + the held-out ROC AUC as the
    (u, v) = (-1, -1) row (merged graph_katz_index + graph_roc).
    Round 7 adds, on the sub200 graph and its distance-2 pair set
    (MissingLinksFinder): mlf2 (the pairs), ari (AdjustedRandIndex —
    the reference's set_union quirk replicated), same_comm
    (SameCommunityIndex over labels id%7), thresh
    (LinkThresholder::byCount top-50 under ScoreComp), rls
    (RandomLinkSampler kept-edge set, portable rank), pr
    (PrecisionRecallMetric points keyed by floor(recall·1e6)).
    All float variants floor-quantize (dyadic .5 rounding ties).
    AlgebraicDistanceIndex stays pytest-pinned (30-iteration float
    smoothing; tests/test_linkpred_utils.py)."""
    from networkit_spark.operators.linkprediction import (
        adjusted_rand_index,
        link_thresholder_by_count,
        missing_links_finder,
        precision_recall_points,
        random_link_sampler_by_count,
        same_community_index,
    )

    a = q_graph_katz_index(spark, sf_dir).select(
        F.lit("katz").alias("metric"), "u", "v", F.col("katz").alias("score")
    )
    b = q_graph_roc(spark, sf_dir).select(
        F.lit("roc_auc").alias("metric"),
        F.lit(-1).cast("long").alias("u"),
        F.lit(-1).cast("long").alias("v"),
        F.col("auc").alias("score"),
    )
    sub = _co_subgraph200(spark, sf_dir)
    q6 = lambda c: (F.floor(c * 1e6) / 1e6).alias("score")  # noqa: E731
    pairs = missing_links_finder(sub, 2).localCheckpoint(eager=True)
    mlf = pairs.select(
        F.lit("mlf2").alias("metric"), "u", "v", F.lit(1.0).alias("score")
    )
    ari = adjusted_rand_index(sub, pairs)
    ari_rows = ari.select(F.lit("ari").alias("metric"), "u", "v", q6(F.col("score")))
    labels7 = sub.nodes.select(
        F.col("id").alias("node"), (F.col("id") % 7).alias("label")
    )
    sc = same_community_index(sub, pairs, labels7).select(
        F.lit("same_comm").alias("metric"), "u", "v", "score"
    )
    th = link_thresholder_by_count(ari, 50).select(
        F.lit("thresh").alias("metric"), "u", "v", F.lit(1.0).alias("score")
    )
    rls = random_link_sampler_by_count(sub, 600, seed=11)
    rls_rows = rls.canonical_undirected_edges().select(
        F.lit("rls").alias("metric"),
        F.col("src").alias("u"),
        F.col("dst").alias("v"),
        F.lit(1.0).alias("score"),
    )
    stats = (
        pairs.join(
            sub.edges.select(F.col("src").alias("u"), F.col("dst").alias("z")), "u"
        )
        .join(sub.edges.select(F.col("src").alias("v"), F.col("dst").alias("z")), ["v", "z"])
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    pr_scored = pairs.join(stats, ["u", "v"], "left").fillna(0, subset=["common"]).select(
        F.col("common").cast("double").alias("score"),
        F.when((F.col("u") * F.col("v")) % 3 == 0, 1).otherwise(0).alias("label"),
    )
    pr = precision_recall_points(pr_scored).select(
        F.lit("pr").alias("metric"),
        F.floor(F.col("recall") * 1e6).cast("long").alias("u"),
        F.lit(-1).cast("long").alias("v"),
        q6(F.col("precision")),
    )
    out = a.unionByName(b)
    for df in (mlf, ari_rows, sc, th, rls_rows, pr):
        out = out.unionByName(df)
    return out


def q_sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN tiers in one (method, query_id, neighbor_id, cosine, rank)
    table: exact brute-force cosine top-k + stride-codebook IVF
    (merged sim_cosine_topk + sim_ivf_topk)."""
    a = q_sim_cosine_topk(spark, sf_dir).select(
        F.lit("exact").alias("method"), "query_id", "neighbor_id", "cosine", "rank"
    )
    b = q_sim_ivf_topk(spark, sf_dir).select(
        F.lit("ivf").alias("method"), "query_id", "neighbor_id", "cosine", "rank"
    )
    return a.unionByName(b)


def q_graph_betweenness_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Brandes betweenness in one (kind, u, v, score) table: node
    scores as (kind='node', u=id, v=-1) rows + per-edge scores as
    (kind='edge', u=src, v=dst) rows, both on the <200 subgraph
    (merged graph_betweenness + graph_edge_betweenness)."""
    a = q_graph_betweenness(spark, sf_dir).select(
        F.lit("node").alias("kind"),
        F.col("id").alias("u"),
        F.lit(-1).cast("long").alias("v"),
        "score",
    )
    b = q_graph_edge_betweenness(spark, sf_dir).select(
        F.lit("edge").alias("kind"),
        F.col("src").alias("u"),
        F.col("dst").alias("v"),
        "score",
    )
    return a.unionByName(b)


def q_graph_scd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective community detection in one (method, node) table:
    PageRankNibble + GCE + TCE communities around seed 0 on the <200
    subgraph (merged graph_nibble + graph_gce; TCE gate-folded round 5).
    TCE runs in portable_sum mode (ordered per-term fold) so its float
    score sums are bit-identical to the DuckDB list_reduce replay.
    Round 7 adds: rbfs (RandomBFS ball, seed 0, size 40, portable
    partial-level order), setcond (SetConductance of that ball, encoded
    node = floor(φ·1e6)), gtc (SCDGroundTruthComparison best-jaccard of
    the seed-0/seed-1 balls vs the id%5 cover, encoded node =
    seed·10⁷ + floor(j·1e6)). TwoPhaseL and CombinedSCD stay
    pytest-pinned (sequential add/prune state; tests/test_scd_extras)."""
    from networkit_spark.operators.scd import (
        random_bfs_scd,
        scd_ground_truth_comparison,
        set_conductance,
        tce,
    )

    a = q_graph_nibble(spark, sf_dir).select(
        F.lit("nibble").alias("method"), F.col("id").alias("node")
    )
    b = q_graph_gce(spark, sf_dir).select(F.lit("gce").alias("method"), "node")
    sub = _co_subgraph200(spark, sf_dir)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        c = tce(
            sub, seeds=[0], max_iterations=TCE_ROUNDS, portable_sum=True
        ).localCheckpoint(eager=True)
        rb0 = random_bfs_scd(sub, [0], com_size=40, seed=7).localCheckpoint(
            eager=True
        )
        rb1 = random_bfs_scd(sub, [1], com_size=30, seed=7).localCheckpoint(
            eager=True
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    import math

    cond = set_conductance(sub, rb0)
    gt = sub.nodes.select(F.col("id").alias("node"), (F.col("id") % 5).alias("subset"))
    found = rb0.select(F.lit(0).cast("long").alias("seed"), "node").unionByName(
        rb1.select(F.lit(1).cast("long").alias("seed"), "node")
    )
    gtc = scd_ground_truth_comparison(sub, gt, found)
    enc = [
        (
            "gtc",
            int(r["seed"]) * 10_000_000 + math.floor(float(r["jaccard"]) * 1e6),
        )
        for r in gtc["scores"].collect()
    ]
    extra = spark.createDataFrame(
        [("setcond", math.floor(cond * 1e6))] + enc, "method string, node long"
    )
    return (
        a.unionByName(b)
        .unionByName(c.select(F.lit("tce").alias("method"), "node"))
        .unionByName(rb0.select(F.lit("rbfs").alias("method"), "node"))
        .unionByName(extra)
    )


def q_graph_randomized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Randomized graphs in one (method, src, dst) table: seeded edge
    switching + GlobalCurveball on the <200 subgraph (merged
    graph_randomize + graph_curveball)."""
    a = q_graph_randomize(spark, sf_dir).select(
        F.lit("switching").alias("method"), "src", "dst"
    )
    b = q_graph_curveball(spark, sf_dir).select(
        F.lit("curveball").alias("method"), "src", "dst"
    )
    return a.unionByName(b)


def q_graph_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted matchings in one (method, u, v) table: Suitor + LocalMax
    + PathGrowingMatcher on deterministic-weighted <200 subgraphs (merged
    graph_suitor + graph_local_max; pgm gate-folded round 7 — the oracle
    replays the driver-sequential Drake-Hougardy pass as a recursive-CTE
    state machine with the documented tie-breaks)."""
    from networkit_spark.operators.matching import path_growing_matcher

    a = q_graph_suitor(spark, sf_dir).select(
        F.lit("suitor").alias("method"), "u", "v"
    )
    b = q_graph_local_max(spark, sf_dir).select(
        F.lit("local_max").alias("method"), "u", "v"
    )
    sub = _co_subgraph200(spark, sf_dir)
    weighted = Graph(
        nodes=sub.nodes,
        edges=sub.edges.select(
            "src",
            "dst",
            ((F.col("src") + F.col("dst")) % 11 + 1).cast("double").alias("weight"),
        ),
        directed=False,
        weighted=True,
    )
    c = path_growing_matcher(weighted).select(
        F.lit("pgm").alias("method"),
        F.col("src").alias("u"),
        F.col("dst").alias("v"),
    )
    return a.unionByName(b).unionByName(c)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Driver registry. ORDER MATTERS: the driver's correctness gate
    checks the first 50 entries. Round 4 merged near-duplicate rows into
    variant tables (closeness_all, spectral, paths, lp_scores, sim_topk,
    betweenness_exact, group_centrality, scd, randomized, matching) so
    that EVERY registry entry sits inside the 50-slot window; round 5
    folded the round-4/5 operator batch into those variant tables with
    full replay oracles — hh→graph_degree, dyn_katz→graph_spectral,
    lpc+gedwalk→graph_group_centrality, kadabra→
    graph_approx_betweenness, tce→graph_scd, lpdo+lme→graph_plm,
    approx→graph_closeness_all, kpath→graph_betweenness_est,
    bibfs/bidijkstra/inc_dijkstra/simple_paths→graph_paths, and
    dedup_clusters→dedup_jaccard. Every windowed entry now carries a
    hash oracle (graph_ctd's CG replay included); the registry holds
    EXACTLY 50 entries and events_hourly is slot 50, hash-green in the
    gate like every other row. Round 6 folded the round-5/6 batch the
    same way: volume+nfh→graph_hopplot, sbm→graph_degree,
    dyn_approx_betweenness→graph_approx_betweenness,
    harmonic/local_swaps/grow_shrink/local_search→graph_group_centrality,
    jpeg round-trip→mm_pipeline, and the path+DorogovtsevMendes event
    streams→dyn_replay (ForestFire/BarabasiAlbert/spatial streams use
    unbounded-rejection or transcendental draws and stay pytest-pinned)."""
    return {
        # --- graph kernels ------------------------------------------------
        "graph_degree": q_graph_degree,
        "graph_pagerank": q_graph_pagerank,
        "graph_components": q_graph_components,
        "graph_triangles": q_graph_triangles,
        "graph_tri_stats": q_graph_tri_stats,
        "graph_lcc": q_graph_lcc,
        "graph_partition_quality": q_graph_partition_quality,
        "graph_coarsen": q_graph_coarsen,
        "graph_spectral": q_graph_spectral,
        "graph_paths": q_graph_paths,
        "graph_linkpred": q_graph_linkpred,
        "graph_lp_scores": q_graph_lp_scores,
        "graph_assortativity": q_graph_assortativity,
        "graph_sparsifiers": q_graph_sparsifiers,
        "graph_plp": q_graph_plp,
        "graph_closeness_all": q_graph_closeness_all,
        "graph_eccentricity": q_graph_eccentricity_all,
        "graph_scc": q_graph_scc,
        "graph_partition_dist": q_graph_partition_dist,
        "graph_sfigality": q_graph_sfigality,
        "graph_algebraic": q_graph_algebraic,
        "graph_kcore": q_graph_kcore,
        "graph_hopplot": q_graph_hopplot,
        "graph_betweenness_exact": q_graph_betweenness_exact,
        "graph_betweenness_est": q_graph_betweenness_est,
        "graph_luby": q_graph_luby,
        "graph_bicc": q_graph_bicc,
        "graph_group_centrality": q_graph_group_centrality,
        "graph_partition_iic": q_graph_partition_iic,
        # --- round-3 stragglers rotated into the window --------------------
        "graph_plm": q_graph_plm,
        "graph_betweenness_w": q_graph_betweenness_w,
        "graph_scd": q_graph_scd,
        "graph_randomized": q_graph_randomized,
        "graph_cliques": q_graph_cliques,
        "graph_msf": q_graph_msf,
        "graph_matching": q_graph_matching,
        "graph_anf": q_graph_anf,
        "graph_approx_betweenness": q_graph_approx_betweenness,
        "graph_ctd": q_graph_ctd,
        # --- LLM-pipeline ---------------------------------------------------
        "dedup_exact": q_dedup_exact,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_simhash": q_dedup_simhash,
        "dedup_jaccard": q_dedup_jaccard,
        "text_all": q_text_all,
        "ingest_sha256": q_ingest_sha256,
        "sim_topk": q_sim_topk,
        "dedup_embedding": q_dedup_embedding,
        "dyn_replay": q_dyn_replay,
        "mm_pipeline": q_mm_pipeline,
        "events_hourly": q_events_hourly,
    }


# --------------------------------------------------------------------------
# DuckDB oracles
# --------------------------------------------------------------------------

# shared subgraph-<200 prelude (nodes are ALL ids 0..199, matching the
# Spark subgraph_from_nodes node set, isolated ids included)
# Walk-CTE caps: every recursive walk below is bounded at dist < 96.
# Measured true maxima on this data: hop distance ≤ weighted distance,
# max weighted shortest distance = 7 (sf0.01) / 48 (sf0.1) — ≥2×
# headroom, so the cap can never silently truncate a shortest path at
# the scale factors the driver runs (the old 32-cap WOULD have at sf0.1).
SUB200_PRELUDE_SQL = """
  e0 AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
         FROM lineitem a JOIN lineitem b
           ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         WHERE a.l_partkey < 200 AND b.l_partkey < 200),
  edges AS MATERIALIZED (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
  nodes AS MATERIALIZED (SELECT CAST(u.i AS BIGINT) AS id FROM UNNEST(range(200)) AS u(i)),
  walk(root, node, dist) AS (
    SELECT id, id, CAST(0 AS BIGINT) FROM nodes
    UNION
    SELECT w.root, e.dst, w.dist + 1
    FROM walk w JOIN edges e ON w.node = e.src WHERE w.dist < 96
  ),
  sp AS MATERIALIZED (SELECT root, node, min(dist) AS dist FROM walk GROUP BY root, node)
"""

# same subgraph without the all-pairs walk CTE — for oracles that only
# need the canonical edge set (matching, cliques, randomization replays)
SUB200_PRELUDE_NOWALK_SQL = """
  e0 AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
         FROM lineitem a JOIN lineitem b
           ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         WHERE a.l_partkey < 200 AND b.l_partkey < 200),
  edges AS MATERIALIZED (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
  nodes AS MATERIALIZED (SELECT CAST(u.i AS BIGINT) AS id FROM UNNEST(range(200)) AS u(i))
"""

# shared text prelude: tokens / shingles (3-gram), mirroring pipeline.dedup
_TOKS_SQL = """
  toks AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                       x -> x <> '') AS t
    FROM documents
  )
"""


def _shingle_sql(n: int) -> str:
    parts = " || ' ' || ".join(f"t[i+{j}]" for j in range(n))
    return f"""
  sh AS (
    SELECT DISTINCT doc_id, {parts} AS s
    FROM toks, UNNEST(range(1, greatest(len(t) - {n - 2}, 1))) AS u(i)
  )
"""


_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "von", "zu"],
    "fr": ["le", "la", "les", "et", "est", "pas", "pour", "que", "une", "dans"],
    "es": ["el", "la", "los", "que", "de", "no", "es", "en", "un", "por"],
}


def _sql_list(words: list[str]) -> str:
    return ", ".join(f"'{w}'" for w in words)


def oracle_sql() -> dict[str, str]:
    mh = [md5_mod_sql("s", salt=f"mh{i}:") for i in range(16)]
    band_keys = [
        " || '_' || ".join(f"CAST(h{b * 4 + r} AS VARCHAR)" for r in range(4))
        for b in range(4)
    ]
    all_sw = _sql_list([w for ws in _STOPWORDS.values() for w in ws])

    base = {
        "graph_degree": f"""
WITH {GRAPH_PRELUDE_SQL},
s0 AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
       FROM lineitem a JOIN lineitem b
         ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       WHERE a.l_partkey < 200 AND b.l_partkey < 200),
subdeg AS (
  SELECT n.id, coalesce(d.c, 0) AS deg
  FROM (SELECT CAST(u.i AS BIGINT) AS id FROM UNNEST(range(200)) AS u(i)) n
  LEFT JOIN (SELECT src AS id, count(*) AS c
             FROM (SELECT src, dst FROM s0 UNION ALL SELECT dst, src FROM s0)
             GROUP BY src) d USING (id))
SELECT 'deg' AS variant, id, deg FROM deg
UNION ALL
-- HavelHakimi realizes a graphical sequence exactly, so the realized
-- sorted degree sequence IS the input sequence (sub200's degrees)
SELECT 'hh' AS variant,
       CAST(row_number() OVER (ORDER BY deg DESC, id ASC) AS BIGINT) AS id,
       deg
FROM subdeg
UNION ALL
-- StochasticBlockmodel portable replay: pair kept iff
-- porthash(src*60+dst)/PRIME <= affinity[block][block']
SELECT 'sbm' AS variant, n60.id,
       coalesce(sd.c, 0) AS deg
FROM (SELECT CAST(u.i AS BIGINT) AS id FROM UNNEST(range(60)) AS u(i)) n60
LEFT JOIN (
  SELECT id, count(*) AS c FROM (
    SELECT src AS id FROM (
      SELECT a.i AS src, b.i AS dst
      FROM UNNEST(range(60)) AS aa(i), UNNEST(range(60)) AS bb(i),
           LATERAL (SELECT CAST(aa.i AS BIGINT) AS i) a,
           LATERAL (SELECT CAST(bb.i AS BIGINT) AS i) b
      WHERE a.i < b.i
        AND {_porthash_sql('a.i * 60 + b.i', 'sbm42:')} / 2147483629.0
            <= CASE WHEN a.i % 3 = b.i % 3 THEN 0.5 ELSE 0.05 END)
    UNION ALL
    SELECT dst FROM (
      SELECT a.i AS src, b.i AS dst
      FROM UNNEST(range(60)) AS aa(i), UNNEST(range(60)) AS bb(i),
           LATERAL (SELECT CAST(aa.i AS BIGINT) AS i) a,
           LATERAL (SELECT CAST(bb.i AS BIGINT) AS i) b
      WHERE a.i < b.i
        AND {_porthash_sql('a.i * 60 + b.i', 'sbm42:')} / 2147483629.0
            <= CASE WHEN a.i % 3 = b.i % 3 THEN 0.5 ELSE 0.05 END)
  ) s GROUP BY id) sd ON sd.id = n60.id
""",
        "graph_pagerank": f"""
WITH RECURSIVE {GRAPH_PRELUDE_SQL},
nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
pr(iter, node, score) AS (
  SELECT 0, id, 1.0 / (SELECT n FROM nn) FROM nodes
  UNION ALL
  SELECT iter + 1, dst,
         (1 - 0.85) / (SELECT n FROM nn) + 0.85 * sum(score / wdeg)
  FROM (SELECT pr.iter, e.dst, pr.score, d.deg::DOUBLE AS wdeg
        FROM pr JOIN edges e ON pr.node = e.src JOIN deg d ON pr.node = d.id
        WHERE pr.iter < 15) sub
  GROUP BY iter + 1, dst
),
final AS (SELECT node AS id, score FROM pr WHERE iter = 15)
SELECT id, round(score / (SELECT sum(score) FROM final), 6) AS score FROM final
""",
        "graph_components": f"""
WITH RECURSIVE {GRAPH_PRELUDE_SQL},
cc(node, label) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.dst, cc.label FROM cc JOIN edges e ON cc.node = e.src
  WHERE cc.label < e.dst
)
SELECT node, min(label) AS label FROM cc GROUP BY node
""",
        "graph_triangles": f"""
WITH {GRAPH_PRELUDE_SQL},
tri AS (
  SELECT a.src AS a, a.dst AS b, b.dst AS c
  FROM e0 a JOIN e0 b ON a.src = b.src AND a.dst < b.dst
  JOIN e0 c ON c.src = a.dst AND c.dst = b.dst
),
corners AS (
  SELECT a AS id FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri
),
cnt AS (SELECT id, count(*) AS triangles FROM corners GROUP BY id)
SELECT n.id, coalesce(c.triangles, 0) AS triangles
FROM nodes n LEFT JOIN cnt c ON n.id = c.id
""",
        "graph_triangle_total": f"""
WITH {GRAPH_PRELUDE_SQL}
SELECT count(*) AS total_triangles
FROM e0 a JOIN e0 b ON a.src = b.src AND a.dst < b.dst
JOIN e0 c ON c.src = a.dst AND c.dst = b.dst
""",
        "graph_lcc": f"""
WITH {GRAPH_PRELUDE_SQL},
tri AS (
  SELECT a.src AS a, a.dst AS b, b.dst AS c
  FROM e0 a JOIN e0 b ON a.src = b.src AND a.dst < b.dst
  JOIN e0 c ON c.src = a.dst AND c.dst = b.dst
),
corners AS (
  SELECT a AS id FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri
),
cnt AS (SELECT id, count(*) AS triangles FROM corners GROUP BY id)
SELECT n.id,
       CASE WHEN coalesce(d.deg, 0) >= 2
            THEN round(2.0 * coalesce(c.triangles, 0) / (d.deg * (d.deg - 1)), 6)
            ELSE 0.0 END AS lcc
FROM nodes n LEFT JOIN cnt c ON n.id = c.id LEFT JOIN deg d ON n.id = d.id
""",
        "graph_global_cc": f"""
WITH {GRAPH_PRELUDE_SQL},
tri AS (
  SELECT a.src AS a, a.dst AS b, b.dst AS c
  FROM e0 a JOIN e0 b ON a.src = b.src AND a.dst < b.dst
  JOIN e0 c ON c.src = a.dst AND c.dst = b.dst
),
corners AS (
  SELECT a AS id FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri
),
cnt AS (SELECT id, count(*) AS triangles FROM corners GROUP BY id)
SELECT round(2.0 * (SELECT coalesce(sum(triangles), 0) FROM cnt)
             / (SELECT sum(deg * (deg - 1)) FROM deg), 6) AS global_cc
""",
        "graph_modularity": f"""
WITH {GRAPH_PRELUDE_SQL},
m AS (SELECT count(*)::DOUBLE AS m FROM e0),
intra AS (SELECT count(*)::DOUBLE AS c FROM e0 WHERE src % 10 = dst % 10),
vols AS (SELECT id % 10 AS label, sum(deg)::DOUBLE AS cvol FROM deg GROUP BY 1)
SELECT round((SELECT c FROM intra) / (SELECT m FROM m)
             - (SELECT sum(pow(cvol / (2 * (SELECT m FROM m)), 2)) FROM vols),
             6) AS modularity
""",
        "graph_edge_cut": f"""
WITH {GRAPH_PRELUDE_SQL}
SELECT round(count(*)::DOUBLE, 6) AS cut_weight FROM e0 WHERE src % 10 <> dst % 10
""",
        "graph_coarsen": _graph_coarsen_sql(),
        "graph_katz": f"""
WITH RECURSIVE {GRAPH_PRELUDE_SQL},
alpha AS (SELECT CAST(1.0 AS DOUBLE) / (1 + max(deg)) AS a FROM deg),
kz(iter, node, score) AS (
  SELECT 0, id, CAST(1.0 AS DOUBLE) FROM nodes
  UNION ALL
  SELECT iter + 1, src,
         CAST(0.1 AS DOUBLE) + (SELECT a FROM alpha) * sum(CAST(1.0 AS DOUBLE) + score)
  FROM (SELECT kz.iter, e.src, kz.score
        FROM kz JOIN edges e ON kz.node = e.dst WHERE kz.iter < 10) s
  GROUP BY iter + 1, src
),
fin AS (SELECT node AS id, score FROM kz WHERE iter = 10)
SELECT id, round(score / sqrt((SELECT sum(score * score) FROM fin)), 6) AS score
FROM fin
""",
        "graph_eigenvector": f"""
WITH RECURSIVE {GRAPH_PRELUDE_SQL},
ev(iter, node, score) AS (
  SELECT 0, id, CAST(1.0 AS DOUBLE) FROM nodes
  UNION ALL
  SELECT iter + 1, dst, sum(score)
  FROM (SELECT ev.iter, e.dst, ev.score
        FROM ev JOIN edges e ON ev.node = e.src WHERE ev.iter < 10) s
  GROUP BY iter + 1, dst
),
fin AS (SELECT node AS id, score FROM ev WHERE iter = 10)
SELECT id, round(score / sqrt((SELECT sum(score * score) FROM fin)), 6) AS score
FROM fin
""",
        # graph_kcore: no SQL oracle (iterative peel-to-exhaustion is not
        # expressible in DuckDB recursive CTEs)
        "graph_bfs": f"""
WITH RECURSIVE {GRAPH_PRELUDE_SQL},
walk(node, dist) AS (
  SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT)
  UNION
  SELECT e.dst, w.dist + 1
  FROM walk w JOIN edges e ON w.node = e.src
  WHERE w.dist < 96
)
SELECT node, min(dist) AS dist FROM walk GROUP BY node
""",
        "graph_linkpred": f"""
WITH e0 AS ({CO_EDGES_SQL}),
sube AS (SELECT src, dst FROM e0 WHERE src < 200 AND dst < 200),
adj AS (SELECT src AS node, dst AS nbr FROM sube UNION ALL SELECT dst, src FROM sube),
d AS (SELECT node, count(*) AS deg FROM adj GROUP BY node),
cent AS (SELECT nbr AS z, node AS e FROM adj),
w AS (
  SELECT a.e AS u, b.e AS v, dz.deg AS zdeg
  FROM cent a JOIN cent b ON a.z = b.z AND a.e < b.e
  JOIN d dz ON dz.node = a.z
),
s AS (
  SELECT u, v, count(*) AS common,
         sum(1.0 / ln(zdeg)) AS aa, sum(1.0 / zdeg) AS ra
  FROM w GROUP BY u, v
),
ne AS (
  SELECT s.* FROM s LEFT JOIN sube ON s.u = sube.src AND s.v = sube.dst
  WHERE sube.src IS NULL
)
SELECT u, v, common,
       round(common::DOUBLE / (du.deg + dv.deg - common), 6) AS jaccard,
       round(aa, 6) AS adamic_adar, round(ra, 6) AS resource_alloc
FROM ne JOIN d du ON du.node = u JOIN d dv ON dv.node = v
""",
        "graph_assortativity": f"""
WITH {GRAPH_PRELUDE_SQL}
SELECT round(corr(dsrc.deg::DOUBLE, ddst.deg::DOUBLE), 6) AS assortativity
FROM edges e JOIN deg dsrc ON e.src = dsrc.id JOIN deg ddst ON e.dst = ddst.id
""",
        "graph_sparsify": f"""
WITH {GRAPH_PRELUDE_SQL},
tri AS (
  SELECT a.src AS a, a.dst AS b, b.dst AS c
  FROM e0 a JOIN e0 b ON a.src = b.src AND a.dst < b.dst
  JOIN e0 c ON c.src = a.dst AND c.dst = b.dst
),
pairs AS (
  SELECT a AS x, b AS y FROM tri
  UNION ALL SELECT a, c FROM tri UNION ALL SELECT b, c FROM tri
),
etri AS (
  SELECT e0.src, e0.dst, coalesce(t.n, 0) AS tri
  FROM e0 LEFT JOIN (
    SELECT least(x, y) AS src, greatest(x, y) AS dst, count(*) AS n
    FROM pairs GROUP BY 1, 2
  ) t USING (src, dst)
)
SELECT e.src, e.dst,
       CASE WHEN du.deg + dv.deg - 2 - e.tri > 0
            THEN round(e.tri::DOUBLE / (du.deg + dv.deg - 2 - e.tri), 6)
            ELSE 0.0 END AS score
FROM etri e JOIN deg du ON e.src = du.id JOIN deg dv ON e.dst = dv.id
""",
        # graph_plp: no SQL oracle (iterative label propagation w/ window
        # tie-breaks is not expressible in DuckDB recursive CTEs)
        # graph_plm / graph_betweenness / graph_betweenness_est: no SQL
        # oracle (multilevel optimization / shortest-path counting DP);
        # pytest covers them against numpy oracles.
        "graph_closeness": f"""
WITH RECURSIVE {SUB200_PRELUDE_SQL},
agg AS (SELECT root AS id, sum(dist) AS s FROM sp WHERE dist > 0 GROUP BY root)
SELECT n.id,
       round(CASE WHEN coalesce(a.s, 0) > 0
                  THEN CAST(1.0 AS DOUBLE) / a.s ELSE 0.0 END, 6) AS score
FROM nodes n LEFT JOIN agg a ON n.id = a.id
""",
        "graph_harmonic": f"""
WITH RECURSIVE {SUB200_PRELUDE_SQL},
agg AS (SELECT root AS id, sum(CAST(1.0 AS DOUBLE) / dist) AS s
        FROM sp WHERE dist > 0 GROUP BY root)
SELECT n.id, round(coalesce(a.s, 0.0), 6) AS score
FROM nodes n LEFT JOIN agg a ON n.id = a.id
""",
        "graph_diameter": f"""
WITH RECURSIVE {SUB200_PRELUDE_SQL}
SELECT coalesce(max(dist), 0) AS diameter FROM sp
""",
        "graph_sssp": f"""
WITH RECURSIVE e0 AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  WHERE a.l_partkey < 200 AND b.l_partkey < 200
),
edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
wedges AS (SELECT src, dst, (src + dst) % 5 + 1 AS w FROM edges),
wk(node, dist) AS (
  SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT)
  UNION
  SELECT e.dst, wk.dist + e.w FROM wk JOIN wedges e ON wk.node = e.src
  WHERE wk.dist < 96
)
SELECT node, round(CAST(min(dist) AS DOUBLE), 6) AS dist FROM wk GROUP BY node
""",
        "graph_closeness_w": f"""
WITH RECURSIVE e0 AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  WHERE a.l_partkey < 200 AND b.l_partkey < 200
),
edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
wedges AS (SELECT src, dst, (src + dst) % 3 + 1 AS w FROM edges),
nodes AS (SELECT CAST(u.i AS BIGINT) AS id FROM UNNEST(range(200)) AS u(i)),
wk(root, node, dist) AS (
  SELECT id, id, CAST(0 AS BIGINT) FROM nodes
  UNION
  SELECT wk.root, e.dst, wk.dist + e.w
  FROM wk JOIN wedges e ON wk.node = e.src WHERE wk.dist < 96
),
sp AS (SELECT root, node, min(dist) AS dist FROM wk GROUP BY root, node),
agg AS (SELECT root AS id, sum(dist) AS s FROM sp WHERE dist > 0 GROUP BY root)
SELECT n.id,
       round(CASE WHEN coalesce(a.s, 0) > 0
                  THEN CAST(1.0 AS DOUBLE) / a.s ELSE 0.0 END, 6) AS score
FROM nodes n LEFT JOIN agg a ON n.id = a.id
""",
        "graph_scc": f"""
WITH RECURSIVE de AS ({CHAIN_EDGES_SQL}),
reach(s, d) AS (
  SELECT src, dst FROM de
  UNION
  SELECT r.s, e.dst FROM reach r JOIN de e ON r.d = e.src
),
mutual AS (SELECT a.s AS u, a.d AS v FROM reach a JOIN reach b ON a.s = b.d AND a.d = b.s),
vs AS (SELECT src AS id FROM de UNION SELECT dst FROM de)
SELECT n.id AS node, least(n.id, coalesce(min(m.v), n.id)) AS label
FROM vs n LEFT JOIN mutual m ON m.u = n.id
GROUP BY n.id
""",
        "graph_nmi": f"""
WITH {GRAPH_PRELUDE_SQL},
nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
pa AS (SELECT id % 10 AS la, count(*)::DOUBLE AS s FROM nodes GROUP BY 1),
pb AS (SELECT id % 7 AS lb, count(*)::DOUBLE AS s FROM nodes GROUP BY 1),
cells AS (SELECT id % 10 AS la, id % 7 AS lb, count(*)::DOUBLE AS s FROM nodes GROUP BY 1, 2),
mi AS (SELECT sum((c.s / (SELECT n FROM nn))
                  * log2(c.s * (SELECT n FROM nn) / (pa.s * pb.s))) AS v
       FROM cells c JOIN pa USING (la) JOIN pb USING (lb)),
ha AS (SELECT -sum((s / (SELECT n FROM nn)) * log2(s / (SELECT n FROM nn))) AS v FROM pa),
hb AS (SELECT -sum((s / (SELECT n FROM nn)) * log2(s / (SELECT n FROM nn))) AS v FROM pb)
SELECT round(CAST(1.0 AS DOUBLE)
             - 2.0 * (SELECT v FROM mi) / ((SELECT v FROM ha) + (SELECT v FROM hb)),
             6) AS nmi_distance
""",
        "graph_ari": f"""
WITH {GRAPH_PRELUDE_SQL},
nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
pa AS (SELECT id % 10 AS la, count(*)::DOUBLE AS s FROM nodes GROUP BY 1),
pb AS (SELECT id % 7 AS lb, count(*)::DOUBLE AS s FROM nodes GROUP BY 1),
cells AS (SELECT id % 10 AS la, id % 7 AS lb, count(*)::DOUBLE AS s FROM nodes GROUP BY 1, 2),
ri AS (SELECT sum(s * (s - 1) / 2) AS v FROM cells),
sa AS (SELECT sum(s * (s - 1) / 2) AS v FROM pa),
sb AS (SELECT sum(s * (s - 1) / 2) AS v FROM pb),
parts AS (
  SELECT (SELECT v FROM ri) AS ri, (SELECT v FROM sa) AS sa, (SELECT v FROM sb) AS sb,
         (SELECT n FROM nn) * ((SELECT n FROM nn) - 1) / 2 AS denom
)
SELECT round(CAST(1.0 AS DOUBLE)
             - (ri - sa * sb / denom) / (0.5 * (sa + sb) - sa * sb / denom),
             6) AS ari_distance
FROM parts
""",
        "graph_sfigality": f"""
WITH {GRAPH_PRELUDE_SQL}
SELECT n.id,
       round(coalesce(s.score, 0.0), 6) AS score
FROM nodes n LEFT JOIN (
  SELECT e.src AS id,
         sum(CASE WHEN du.deg < dv.deg THEN 1 ELSE 0 END)::DOUBLE / count(*) AS score
  FROM edges e JOIN deg du ON e.src = du.id JOIN deg dv ON e.dst = dv.id
  GROUP BY e.src
) s ON n.id = s.id
""",
        "graph_hub_dominance": f"""
WITH {GRAPH_PRELUDE_SQL},
sizes AS (SELECT id % 10 AS label, count(*) AS sz FROM nodes GROUP BY 1),
ideg AS (
  SELECT src % 10 AS label, src, count(*) AS d
  FROM edges WHERE src % 10 = dst % 10 GROUP BY 1, 2
),
mx AS (SELECT label, max(d) AS max_ideg FROM ideg GROUP BY label)
SELECT round(avg(CASE WHEN s.sz > 1
                      THEN coalesce(m.max_ideg, 0)::DOUBLE / (s.sz - 1)
                      ELSE 1.0 END), 6) AS hub_dominance
FROM sizes s LEFT JOIN mx m ON s.label = m.label
""",
        "graph_ipd": f"""
WITH {GRAPH_PRELUDE_SQL},
sizes AS (SELECT id % 10 AS label, count(*) AS sz FROM nodes GROUP BY 1),
intra AS (
  SELECT src % 10 AS label, count(*) AS i
  FROM e0 WHERE src % 10 = dst % 10 GROUP BY 1
),
per AS (
  SELECT s.sz, coalesce(i.i, 0) AS i, s.sz * (s.sz - 1) / 2 AS possible
  FROM sizes s LEFT JOIN intra i ON s.label = i.label
)
SELECT round(avg(CASE WHEN possible > 0 THEN i::DOUBLE / possible ELSE 1.0 END), 6) AS unweighted_avg,
       round(sum(i)::DOUBLE / sum(possible), 6) AS global_density
FROM per
""",
        "graph_eccentricity": f"""
WITH RECURSIVE {SUB200_PRELUDE_SQL}
SELECT root AS id, max(dist) AS ecc FROM sp GROUP BY root
""",
        "graph_algebraic": f"""
WITH RECURSIVE {GRAPH_PRELUDE_SQL},
step AS (
  SELECT src, dst, FALSE AS selfrow FROM edges
  UNION ALL
  SELECT id, id, TRUE FROM nodes
),
ad(iter, node, l0, l1, l2, l3) AS (
  SELECT 0, id,
         {", ".join(f"CAST({md5_mod_sql('id', salt=f'ad{i}:')} AS DOUBLE) / 2147483629" for i in range(4))}
  FROM nodes
  UNION ALL
  SELECT iter + 1, s.dst,
         {", ".join(f"sum(CASE WHEN s.selfrow THEN 0.5 * l{i} ELSE 0.5 * l{i} / d.deg END)" for i in range(4))}
  FROM ad JOIN step s ON ad.node = s.src JOIN deg d ON s.dst = d.id
  WHERE iter < 5
  GROUP BY iter + 1, s.dst
),
fin AS (SELECT node, l0, l1, l2, l3 FROM ad WHERE iter = 5),
mm AS (SELECT {", ".join(f"min(l{i}) AS mn{i}, max(l{i}) AS mx{i}" for i in range(4))} FROM fin),
nrm AS (
  SELECT node,
         {", ".join(f"(mm.mn{i} - l{i}) / (mm.mn{i} - mm.mx{i}) AS l{i}" for i in range(4))}
  FROM fin, mm
),
-- layout family (round 7): sub200 prelude under s_ names
s_e0 AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
       FROM lineitem a JOIN lineitem b
         ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       WHERE a.l_partkey < 200 AND b.l_partkey < 200),
s_edges AS MATERIALIZED (SELECT src, dst FROM s_e0 UNION ALL SELECT dst, src FROM s_e0),
-- pivot_b: BFS from explicit pivots 0..7, present-only double centering
-- (b = d - rowMean - colMean + grandMean over reached entries; the
-- arithmetic order matches centered_pivot_distances exactly)
s_walk(root, node, dist) AS (
  SELECT CAST(u.i AS BIGINT), CAST(u.i AS BIGINT), CAST(0 AS BIGINT)
  FROM UNNEST(range(8)) AS u(i)
  UNION
  SELECT w.root, e.dst, w.dist + 1
  FROM s_walk w JOIN s_edges e ON w.node = e.src WHERE w.dist < 96
),
s_sp AS MATERIALIZED (SELECT root, node, min(dist) AS dist FROM s_walk GROUP BY root, node),
s_trip AS (SELECT node, root AS j, CAST(dist AS DOUBLE) AS d FROM s_sp),
s_rm AS (SELECT node, sum(d) / 8.0 AS rm FROM s_trip GROUP BY node),
s_cm AS (SELECT j, sum(d) / 200.0 AS cm FROM s_trip GROUP BY j),
s_gm AS (SELECT sum(d) / 1600.0 AS gm FROM s_trip),
pivot_rows AS (
  SELECT 'pivot_b' AS variant, t.node AS src, t.j AS dst,
         round(t.d - r.rm - c.cm + s_gm.gm, 6) AS score
  FROM s_trip t JOIN s_rm r ON t.node = r.node JOIN s_cm c ON t.j = c.j, s_gm
),
-- crossings: deterministic layout x=id, y=(id*id) mod 97; reference
-- quirks replicated (b2 uses segment 1's slope, collinear parallels
-- count, ordered double-count halved); no vertical segments exist
-- because x is injective, so plain division is total here
s_seg AS (
  SELECT src, dst,
         CAST(src AS DOUBLE) AS x1, CAST((src * src) % 97 AS DOUBLE) AS y1,
         CAST(dst AS DOUBLE) AS x2, CAST((dst * dst) % 97 AS DOUBLE) AS y2
  FROM s_e0
),
s_pairs AS (
  SELECT a.x1 AS ux, a.y1 AS uy, a.x2 AS vx, a.y2 AS vy,
         b.x1 AS px, b.y1 AS py, b.x2 AS qx, b.y2 AS qy
  FROM s_seg a, s_seg b
  WHERE NOT (a.src = b.src AND a.dst = b.dst)
),
s_lin AS (
  SELECT *, (vy - uy) / (vx - ux) AS m1, (qy - py) / (qx - px) AS m2
  FROM s_pairs
),
s_hit AS (
  SELECT CASE
    WHEN m1 <> m2 THEN (CASE
      WHEN (py - m1 * px - (uy - m1 * ux)) / (m1 - m2) >= least(ux, vx)
       AND (py - m1 * px - (uy - m1 * ux)) / (m1 - m2) >= least(px, qx)
       AND (py - m1 * px - (uy - m1 * ux)) / (m1 - m2) <= greatest(ux, vx)
       AND (py - m1 * px - (uy - m1 * ux)) / (m1 - m2) <= greatest(px, qx)
      THEN 1 ELSE 0 END)
    WHEN uy - m1 * ux = py - m1 * px THEN 1 ELSE 0 END AS hit
  FROM s_lin
),
cross_row AS (
  SELECT 'crossings' AS variant, CAST(-1 AS BIGINT) AS src,
         CAST(-1 AS BIGINT) AS dst,
         CAST(CAST(sum(hit) AS BIGINT) // 2 AS DOUBLE) AS score
  FROM s_hit
),
-- maxent known distances at k=2: neighbors at edge weight (1.0 here),
-- hop-2 ball members (reachable in 2, not 1, not self) at depth 2
s_h2 AS MATERIALIZED (
  SELECT DISTINCT a.src, b.dst
  FROM s_edges a JOIN s_edges b ON a.dst = b.src
  WHERE a.src <> b.dst
    AND NOT EXISTS (
      SELECT 1 FROM s_edges e WHERE e.src = a.src AND e.dst = b.dst
    )
),
s_kd AS MATERIALIZED (
  SELECT src, dst, 1.0 AS d FROM s_edges
  UNION ALL
  SELECT src, dst, 2.0 FROM s_h2
),
-- layout x=id, y=(id*id) mod 97 shared with the crossings row; geo and
-- the 1e-5 floor match _attractive_rhs / maxent_ldme exactly
m_geo AS (
  SELECT src, dst, d,
         CAST(src AS DOUBLE) - CAST(dst AS DOUBLE) AS dx,
         CAST((src * src) % 97 AS DOUBLE) - CAST((dst * dst) % 97 AS DOUBLE) AS dy
  FROM s_kd
),
m_dist AS (SELECT *, sqrt(dx * dx + dy * dy) AS geo FROM m_geo),
m_rhs AS (
  SELECT src AS id,
         sum((1.0 / (d * d)) * d / greatest(geo, 1e-5) * dx) AS rx,
         sum((1.0 / (d * d)) * d / greatest(geo, 1e-5) * dy) AS ry
  FROM m_dist GROUP BY src
),
m_meas AS (
  SELECT sqrt(sum(pow(d - geo, 2)) / count(*)) AS ldme,
         sum(abs(geo - d) / d) / count(*) AS mde
  FROM m_dist
),
-- LAMG elimination stage 0 (md5-porthash hash-local-min independent set
-- of structural degree <= 3, Schur fill w_ju*w_uk/d_u) + TV affinities.
-- The elimination runs on a porthash edge sample (the dense sub200 has
-- almost no degree<=3 nodes); TVs/affinities stay on the full graph.
l_nodes AS (SELECT DISTINCT src AS id FROM s_edges),
l_deg AS (SELECT src AS id, CAST(count(*) AS DOUBLE) AS d FROM s_edges GROUP BY src),
lsp AS MATERIALIZED (
  SELECT src, dst FROM s_edges
  WHERE {md5_mod_sql('least(src, dst) * 1000003 + greatest(src, dst)', salt='lsp:')} % 5 = 0
),
lsp_deg AS (SELECT src AS id, CAST(count(*) AS DOUBLE) AS d FROM lsp GROUP BY src),
le_h AS (SELECT id, {md5_mod_sql('id', salt='le0:')} AS h FROM (SELECT DISTINCT src AS id FROM lsp)),
le_cand AS (SELECT id, d FROM lsp_deg WHERE d <= 3),
le_bad AS (
  SELECT DISTINCT e.src AS id
  FROM lsp e
  JOIN le_cand a ON e.src = a.id JOIN le_cand b ON e.dst = b.id
  JOIN le_h hs ON e.src = hs.id JOIN le_h hd ON e.dst = hd.id
  WHERE hd.h < hs.h OR (hd.h = hs.h AND e.dst < e.src)
),
le_f AS MATERIALIZED (
  SELECT id, d FROM le_cand WHERE id NOT IN (SELECT id FROM le_bad)
),
le_fe AS (SELECT e.src, e.dst, 1.0 AS w, f.d FROM lsp e JOIN le_f f ON e.src = f.id),
le_fill AS (
  SELECT a.dst AS src, b.dst AS dst, a.w * b.w / a.d AS w
  FROM le_fe a JOIN le_fe b ON a.src = b.src WHERE a.dst <> b.dst
),
le_coarse AS (
  SELECT src, dst, sum(w) AS w FROM (
    SELECT e.src, e.dst, 1.0 AS w FROM lsp e
    WHERE e.src NOT IN (SELECT id FROM le_f)
      AND e.dst NOT IN (SELECT id FROM le_f)
    UNION ALL SELECT src, dst, w FROM le_fill
  ) GROUP BY src, dst
),
-- 4 porthash TVs, 4 weighted-Jacobi sweeps on L t = 0, unrolled
l_tv0 AS MATERIALIZED (
  SELECT id, {", ".join(f"2.0 * (CAST({md5_mod_sql('id', salt=f'lamg{11 * 1009 + k}:')} AS DOUBLE) / 2147483629.0) - 1.0 AS t{k}" for k in range(4))}
  FROM l_nodes
),
{"".join(chr(10).join([
    f"l_g{s} AS (SELECT e.src AS id, " + ", ".join(f"sum(t.t{k}) AS g{k}" for k in range(4)) + f" FROM l_tv{s - 1} t JOIN s_edges e ON t.id = e.dst GROUP BY e.src),",
    f"l_tv{s} AS MATERIALIZED (SELECT t.id, " + ", ".join(
        f"(1.0 - 2.0/3.0) * t.t{k} + (2.0/3.0) * coalesce(g.g{k}, 0.0) / greatest(coalesce(dd.d, 0.0), 1e-300) AS t{k}"
        for k in range(4)
    ) + f" FROM l_tv{s - 1} t LEFT JOIN l_g{s} g ON t.id = g.id LEFT JOIN l_deg dd ON t.id = dd.id),",
    "",
]) for s in range(1, 5))}
l_ns AS (SELECT id, t0*t0 + t1*t1 + t2*t2 + t3*t3 AS ns FROM l_tv4),
lamg_aff_rows AS (
  SELECT e.src, e.dst,
         round(((a.t0*b.t0 + a.t1*b.t1 + a.t2*b.t2 + a.t3*b.t3)
                * (a.t0*b.t0 + a.t1*b.t1 + a.t2*b.t2 + a.t3*b.t3))
               / greatest(na.ns * nb.ns, 1e-300), 6) AS score
  FROM s_edges e
  JOIN l_tv4 a ON e.src = a.id JOIN l_tv4 b ON e.dst = b.id
  JOIN l_ns na ON e.src = na.id JOIN l_ns nb ON e.dst = nb.id
)
SELECT 'algdist' AS variant, e.src, e.dst,
       round(sqrt({" + ".join(f"pow(a.l{i} - b.l{i}, 2)" for i in range(4))}), 6) AS score
FROM e0 e JOIN nrm a ON e.src = a.node JOIN nrm b ON e.dst = b.node
UNION ALL SELECT variant, src, dst, score FROM pivot_rows
UNION ALL SELECT variant, src, dst, score FROM cross_row
UNION ALL SELECT 'maxent_s', src, dst, round(d, 6) FROM s_kd
UNION ALL SELECT 'maxent_rhs', id, CAST(0 AS BIGINT), round(rx, 6) FROM m_rhs
UNION ALL SELECT 'maxent_rhs', id, CAST(1 AS BIGINT), round(ry, 6) FROM m_rhs
UNION ALL SELECT 'maxent_m', CAST(-1 AS BIGINT), CAST(0 AS BIGINT), round(ldme, 6) FROM m_meas
UNION ALL SELECT 'maxent_m', CAST(-1 AS BIGINT), CAST(1 AS BIGINT), round(mde, 6) FROM m_meas
UNION ALL SELECT 'lamg_elim', src, dst, round(w, 6) FROM le_coarse
UNION ALL SELECT 'lamg_elim_f', id, CAST(-1 AS BIGINT), round(d, 6) FROM le_f
UNION ALL SELECT 'lamg_aff', src, dst, score FROM lamg_aff_rows
""",
        "graph_local_degree": f"""
WITH {GRAPH_PRELUDE_SQL},
nbr AS (
  SELECT e.src AS ego, e.dst AS nbr, d1.deg AS ego_deg, d2.deg AS nbr_deg
  FROM edges e JOIN deg d1 ON e.src = d1.id JOIN deg d2 ON e.dst = d2.id
),
ranked AS (
  SELECT ego, nbr, ego_deg,
         rank() OVER (PARTITION BY ego ORDER BY nbr_deg DESC) AS rk
  FROM nbr
),
scored AS (
  SELECT least(ego, nbr) AS src, greatest(ego, nbr) AS dst,
         CASE WHEN ego_deg > 1
              THEN CAST(1.0 AS DOUBLE) - ln(rk) / ln(ego_deg)
              ELSE CAST(1.0 AS DOUBLE) END AS e
  FROM ranked
)
SELECT src, dst, round(max(e), 6) AS score FROM scored GROUP BY src, dst
""",
        "graph_local_similarity": f"""
WITH {GRAPH_PRELUDE_SQL},
tri AS (
  SELECT a.src AS a, a.dst AS b, b.dst AS c
  FROM e0 a JOIN e0 b ON a.src = b.src AND a.dst < b.dst
  JOIN e0 c ON c.src = a.dst AND c.dst = b.dst
),
pairs AS (
  SELECT a AS x, b AS y FROM tri
  UNION ALL SELECT a, c FROM tri UNION ALL SELECT b, c FROM tri
),
etri AS (
  SELECT e0.src, e0.dst, coalesce(t.n, 0) AS tri
  FROM e0 LEFT JOIN (
    SELECT least(x, y) AS src, greatest(x, y) AS dst, count(*) AS n
    FROM pairs GROUP BY 1, 2
  ) t USING (src, dst)
),
sim AS (
  SELECT e.src, e.dst,
         e.tri::DOUBLE / (du.deg + dv.deg - e.tri) AS sim
  FROM etri e JOIN deg du ON e.src = du.id JOIN deg dv ON e.dst = dv.id
),
egoviews AS (
  SELECT src AS ego, dst AS nbr, src, dst, sim FROM sim
  UNION ALL
  SELECT dst AS ego, src AS nbr, src, dst, sim FROM sim
),
ranked AS (
  SELECT ego, src, dst,
         count(*) OVER (PARTITION BY ego) AS ego_deg,
         row_number() OVER (PARTITION BY ego ORDER BY sim DESC, nbr ASC) AS rk
  FROM egoviews
),
scored AS (
  SELECT src, dst,
         CASE WHEN ego_deg > 1
              THEN CAST(1.0 AS DOUBLE) - ln(rk) / ln(ego_deg)
              ELSE CAST(1.0 AS DOUBLE) END AS e
  FROM ranked
)
SELECT src, dst, round(max(e), 6) AS score FROM scored GROUP BY src, dst
""",
        "graph_jaccard_measure": f"""
WITH {GRAPH_PRELUDE_SQL},
nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
pa AS (SELECT id % 10 AS la, count(*)::DOUBLE AS s FROM nodes GROUP BY 1),
pb AS (SELECT id % 7 AS lb, count(*)::DOUBLE AS s FROM nodes GROUP BY 1),
cells AS (SELECT id % 10 AS la, id % 7 AS lb, count(*)::DOUBLE AS s FROM nodes GROUP BY 1, 2),
parts AS (
  SELECT (SELECT sum(s * (s - 1) / 2) FROM cells) AS s11,
         (SELECT sum(s * (s - 1) / 2) FROM pa) AS sza,
         (SELECT sum(s * (s - 1) / 2) FROM pb) AS szb,
         (SELECT n FROM nn) AS n
)
SELECT round(CAST(1.0 AS DOUBLE)
             - 2.0 * s11 / (n * (n - 1) - 2.0 * (n * (n - 1) / 2 + s11 - sza - szb)),
             6) AS jaccard_distance
FROM parts
""",
        "graph_gs_rand": f"""
WITH {GRAPH_PRELUDE_SQL}
SELECT round(CAST(1.0 AS DOUBLE)
             - sum(CASE WHEN (src % 10 = dst % 10) = (src % 7 = dst % 7)
                        THEN 1 ELSE 0 END)::DOUBLE / count(*),
             6) AS gs_rand_distance
FROM e0
""",
        "graph_conductance": f"""
WITH {GRAPH_PRELUDE_SQL},
cut AS (SELECT count(*)::DOUBLE AS c FROM e0 WHERE src % 2 <> dst % 2),
vols AS (SELECT id % 2 AS side, sum(deg)::DOUBLE AS vol FROM deg GROUP BY 1)
SELECT round((SELECT c FROM cut) / (SELECT min(vol) FROM vols), 6) AS conductance
""",
        "dedup_exact": """
SELECT sha256(text) AS digest, count(*) AS group_size, min(doc_id) AS keep_id
FROM documents GROUP BY 1
""",
        "dedup_minhash_lsh": f"""
WITH {_TOKS_SQL}, {_shingle_sql(3)},
sig AS (
  SELECT doc_id, {", ".join(f"min({mh[i]}) AS h{i}" for i in range(16))}
  FROM sh GROUP BY doc_id
),
buckets AS (
  {" UNION ALL ".join(f"SELECT doc_id, {b} AS band, {band_keys[b]} AS key FROM sig" for b in range(4))}
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS bands_shared
FROM buckets a JOIN buckets b
  ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
GROUP BY 1, 2
""",
        "dedup_simhash": f"""
WITH {_TOKS_SQL},
tok AS (
  SELECT doc_id, u.t AS t, count(*) AS cnt
  FROM toks, UNNEST(t) AS u(t) GROUP BY doc_id, u.t
),
hashed AS (SELECT doc_id, cnt, {md5_mod_sql("t", salt="sh:", prime=(1 << 61) - 1)} AS th FROM tok),
votes AS (
  SELECT doc_id, b.b AS b,
         sum(CASE WHEN (th >> b.b) % 2 = 1 THEN cnt ELSE -cnt END) AS v
  FROM hashed, (SELECT unnest(range(60)) AS b) b
  GROUP BY doc_id, b.b
)
SELECT doc_id,
       -- CAST the sum: DuckDB sum(BIGINT) -> HUGEINT, which the gate's
       -- pandas fetch converts through float64 and rounds the low ~7 bits
       -- of the 60-bit signature. BIGINT round-trips exactly.
       CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << CAST(b AS INT)) ELSE 0 END) AS BIGINT) AS simhash
FROM votes GROUP BY doc_id
""",
        "dedup_jaccard": f"""
WITH RECURSIVE {_TOKS_SQL}, {_shingle_sql(3)},
keep AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= 100),
shf AS (SELECT sh.doc_id, sh.s FROM sh JOIN keep USING (s)),
sz AS (SELECT doc_id, count(*) AS sz FROM shf GROUP BY doc_id),
co AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
  FROM shf a JOIN shf b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
jpairs AS MATERIALIZED (
  SELECT id_a, id_b,
         round(common::DOUBLE / (x.sz + y.sz - common), 6) AS jaccard
  FROM co JOIN sz x ON id_a = x.doc_id JOIN sz y ON id_b = y.doc_id
  WHERE common::DOUBLE / (x.sz + y.sz - common) >= 0.5
),
pedges AS (SELECT id_a AS u, id_b AS v FROM jpairs
           UNION ALL SELECT id_b, id_a FROM jpairs),
cwalk(node, reach) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT w.node, e.v FROM cwalk w JOIN pedges e ON w.reach = e.u
),
lab AS (SELECT node AS doc_id, min(reach) AS cluster FROM cwalk GROUP BY node),
cranked AS (
  SELECT l.doc_id, l.cluster,
         row_number() OVER (PARTITION BY l.cluster
                            ORDER BY length(d.text) DESC, l.doc_id) AS rn
  FROM lab l JOIN documents d USING (doc_id)
)
SELECT 'pair' AS kind, id_a, id_b, jaccard FROM jpairs
UNION ALL
SELECT 'cluster' AS kind, doc_id AS id_a, cluster AS id_b,
       CASE WHEN rn = 1 THEN 1.0 ELSE 0.0 END AS jaccard
FROM cranked
""",
        "text_tokens": r"""
SELECT doc_id,
       len(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> ''))::BIGINT AS n_tokens,
       len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9'']+'), x -> x <> ''))::BIGINT AS n_words,
       length(text)::BIGINT AS n_chars
FROM documents
""",
        "text_langid": f"""
WITH {_TOKS_SQL},
ranked AS (
  SELECT doc_id, lang, score,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang DESC) AS rn
  FROM ({" UNION ALL ".join(f"SELECT doc_id, '{lang}' AS lang, len(list_filter(t, x -> list_contains([{_sql_list(ws)}], x)))::DOUBLE / greatest(len(t), 1) AS score FROM toks" for lang, ws in sorted(_STOPWORDS.items()))})
)
SELECT doc_id,
       CASE WHEN score > 0 THEN lang ELSE 'und' END AS lang_pred,
       round(score, 6) AS lang_score
FROM ranked WHERE rn = 1
""",
        "text_quality": rf"""
WITH {_TOKS_SQL},
base AS (
  SELECT d.doc_id, t,
         greatest(len(t), 1) AS n_toks,
         greatest(length(text), 1) AS n_chars,
         length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')) AS punct,
         length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS alpha,
         len(list_filter(t, x -> list_contains([{all_sw}], x))) AS sw_hits
  FROM documents d JOIN toks ON d.doc_id = toks.doc_id
),
r AS (
  SELECT doc_id,
         list_sum(list_transform(t, x -> length(x)))::DOUBLE / n_toks AS mean_word_len,
         punct::DOUBLE / n_chars AS punct_ratio,
         sw_hits::DOUBLE / n_toks AS stopword_ratio,
         alpha::DOUBLE / n_chars AS alpha_ratio
  FROM base
)
SELECT doc_id,
       round(mean_word_len, 6) AS mean_word_len,
       round(punct_ratio, 6) AS punct_ratio,
       round(stopword_ratio, 6) AS stopword_ratio,
       round(alpha_ratio, 6) AS alpha_ratio,
       round(least(stopword_ratio * 4, 1.0) * 0.4
             + least(alpha_ratio * 1.25, 1.0) * 0.4
             + (1 - least(punct_ratio * 5, 1.0)) * 0.2, 6) AS quality
FROM r
""",
        "text_fingerprint": f"""
WITH {_TOKS_SQL}, {_shingle_sql(4)},
fp AS (SELECT doc_id, min({md5_mod_sql("s", salt="fp:")}) AS fingerprint FROM sh GROUP BY doc_id)
SELECT d.doc_id, fp.fingerprint
FROM documents d LEFT JOIN fp ON d.doc_id = fp.doc_id
""",
        "ingest_sha256": """
SELECT doc_id, sha256(text) AS content_sha256 FROM documents
""",
        "sim_cosine_topk": """
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
scored AS (
  SELECT query_id, neighbor_id,
         round(list_dot_product(qv, cv)
               / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 6) AS cosine
  FROM q CROSS JOIN c WHERE query_id <> neighbor_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank FROM ranked WHERE rank <= 5
""",
        "sim_ivf_topk": """
WITH cent AS (SELECT vec_id AS cent_id, CAST(embedding AS DOUBLE[]) AS cent_v FROM embeddings WHERE vec_id % 20 = 0),
c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 10),
asg AS (
  SELECT neighbor_id, cv, cent_id,
         row_number() OVER (PARTITION BY neighbor_id
           ORDER BY round(list_dot_product(cv, cent_v)
             / (sqrt(list_dot_product(cv, cv)) * sqrt(list_dot_product(cent_v, cent_v))), 6) DESC,
           cent_id ASC) AS rn
  FROM c CROSS JOIN cent
),
assigned AS (SELECT neighbor_id, cv, cent_id FROM asg WHERE rn = 1),
prb AS (
  SELECT query_id, qv, cent_id,
         row_number() OVER (PARTITION BY query_id
           ORDER BY round(list_dot_product(qv, cent_v)
             / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cent_v, cent_v))), 6) DESC,
           cent_id ASC) AS rn
  FROM q CROSS JOIN cent
),
probes AS (SELECT query_id, qv, cent_id FROM prb WHERE rn <= 3),
scored AS (
  SELECT query_id, neighbor_id,
         round(list_dot_product(qv, cv)
               / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 6) AS cosine
  FROM probes JOIN assigned USING (cent_id)
  WHERE query_id <> neighbor_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank FROM ranked WHERE rank <= 5
""",
        "dedup_embedding": """
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_dot_product(a.e, b.e)
             / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))), 6) AS cosine
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE round(list_dot_product(a.e, b.e)
            / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))), 6) >= 0.4
""",
        "dyn_replay": _dyn_replay_sql(),
        "mm_media_meta": """
SELECT doc_id AS media_id,
       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
       'application/octet-stream' AS mime,
       octet_length(encode(text))::INT AS n_bytes
FROM documents
""",
        "mm_frame_sample": """
WITH vids AS (
  SELECT doc_id AS media_id, text, length(text) AS n
  FROM documents WHERE doc_id % 3 = 2
)
SELECT media_id, CAST(u.i AS INT) AS frame_idx,
       sha256(substring(text, CAST(u.i * 1000 + 1 AS BIGINT), 1000)) AS frame_sha256
FROM vids, UNNEST(range(least(greatest(n // 1000, 1), 8))) AS u(i)
""",
        "events_hourly": """
SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour_bucket, event_type,
       count(*) AS n_events, round(sum(value), 6) AS total_value
FROM events GROUP BY 1, 2
""",
    }
    base.update(_oracle_sql_r3())

    # ---- round-4 merged variant tables (window-densifying merges) -------
    base["graph_closeness_all"] = _variant_union("variant", [
        ("standard", base["graph_closeness"]),
        ("harmonic", base["graph_harmonic"]),
        ("weighted", base["graph_closeness_w"]),
        ("approx", _approx_closeness_sql()),
    ])
    base["graph_eccentricity"] = f"""
SELECT t.id, CAST(t.ecc AS BIGINT) AS ecc FROM (
{base["graph_eccentricity"]}
) t
UNION ALL
SELECT CAST(-1 AS BIGINT) AS id, CAST(d.diameter AS BIGINT) AS ecc FROM (
{base["graph_diameter"]}
) d
"""
    base["graph_spectral"] = _variant_union("method", [
        ("katz", base["graph_katz"]),
        ("eigenvector", base["graph_eigenvector"]),
        ("dyn_katz", _dyn_katz_sql()),
    ])
    path_targets = ", ".join(str(t) for t in PATH_TARGETS)
    base["graph_paths"] = f"""
SELECT 'bfs' AS variant, t.node, CAST(t.dist AS DOUBLE) AS dist FROM (
{base["graph_bfs"]}
) t
UNION ALL
SELECT 'sssp' AS variant, s.node, s.dist FROM (
{base["graph_sssp"]}
) s
UNION ALL
SELECT 'bibfs' AS variant, t.node, CAST(t.dist AS DOUBLE) AS dist FROM (
{base["graph_bfs"]}
) t WHERE t.node IN ({path_targets})
UNION ALL
SELECT 'bidijkstra' AS variant, s.node, s.dist FROM (
{base["graph_sssp"]}
) s WHERE s.node IN ({path_targets})
UNION ALL
SELECT 'inc_dijkstra' AS variant, i.node, i.dist FROM (
WITH RECURSIVE e0 AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  WHERE a.l_partkey < 200 AND b.l_partkey < 200
),
edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
fedges AS (SELECT * FROM edges WHERE src NOT IN (5, 7) AND dst NOT IN (5, 7)),
wedges AS (SELECT src, dst, (src + dst) % 3 + 1 AS w FROM fedges),
wk(node, dist) AS (
  SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT)
  UNION
  SELECT e.dst, wk.dist + e.w FROM wk JOIN wedges e ON wk.node = e.src
  WHERE wk.dist + e.w <= 4
)
SELECT node, round(CAST(min(dist) AS DOUBLE), 6) AS dist FROM wk GROUP BY node
) i
UNION ALL
SELECT 'simple_paths' AS variant, p.node, p.dist FROM (
WITH RECURSIVE e0 AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  WHERE a.l_partkey < 200 AND b.l_partkey < 200
),
edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
sp(path, last) AS (
  SELECT [CAST(0 AS BIGINT)], CAST(0 AS BIGINT)
  UNION ALL
  SELECT list_append(sp.path, e.dst), e.dst FROM sp JOIN edges e ON sp.last = e.src
  WHERE NOT list_contains(sp.path, e.dst) AND len(sp.path) <= 4 AND sp.last <> 50
)
SELECT CAST(len(path) - 1 AS BIGINT) AS node, count(*)::DOUBLE AS dist
FROM sp WHERE last = 50 GROUP BY 1
) p
UNION ALL
SELECT 'affected' AS variant, q.node, q.dist FROM (
WITH RECURSIVE afe0 AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  WHERE a.l_partkey < 200 AND b.l_partkey < 200
),
afstar AS (SELECT src, dst FROM afe0 ORDER BY src DESC, dst DESC LIMIT 1),
afm AS MATERIALIZED (SELECT a.src, a.dst FROM afe0 a
  WHERE NOT EXISTS (SELECT 1 FROM afstar t WHERE t.src = a.src AND t.dst = a.dst)),
afedges AS MATERIALIZED (SELECT src, dst FROM afm UNION ALL SELECT dst, src FROM afm),
afroots AS (SELECT src AS id FROM afstar UNION ALL SELECT dst FROM afstar),
afwk(root, node, dist) AS (
  SELECT id, id, CAST(0 AS BIGINT) FROM afroots
  UNION
  SELECT w.root, e.dst, w.dist + 1 FROM afwk w JOIN afedges e ON w.node = e.src
  WHERE w.dist < 96
),
afsp AS (SELECT root, node, min(dist) AS dist FROM afwk GROUP BY root, node),
afd AS (
  SELECT n.id AS node,
         coalesce(CAST(u.dist AS DOUBLE), CAST('inf' AS DOUBLE)) AS du,
         coalesce(CAST(v.dist AS DOUBLE), CAST('inf' AS DOUBLE)) AS dv
  FROM (SELECT CAST(g.i AS BIGINT) AS id FROM UNNEST(range(200)) AS g(i)) n
  LEFT JOIN afsp u ON u.root = (SELECT src FROM afstar) AND u.node = n.id
  LEFT JOIN afsp v ON v.root = (SELECT dst FROM afstar) AND v.node = n.id
)
SELECT node, least(du, dv) AS dist FROM afd
WHERE (node <> (SELECT src FROM afstar)
       AND (node = (SELECT dst FROM afstar) OR dv + 1.0 < du))
   OR (node <> (SELECT dst FROM afstar)
       AND (node = (SELECT src FROM afstar) OR du + 1.0 < dv))
) q
UNION ALL
SELECT 'bfs_sample' AS variant, bs.node, CAST(bs.dist AS DOUBLE) FROM (
WITH RECURSIVE {SUB200_PRELUDE_SQL}
SELECT node, dist FROM (
  SELECT node, dist, row_number() OVER (ORDER BY dist, node) AS rk
  FROM sp WHERE root = 0 AND node <> 0
) WHERE rk <= 40
UNION ALL SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT)
) bs
"""
    base["graph_lp_scores"] = f"""
SELECT 'katz' AS metric, t.u, t.v, t.katz AS score FROM (
{base["graph_katz_index"]}
) t
UNION ALL
SELECT 'roc_auc' AS metric, CAST(-1 AS BIGINT) AS u, CAST(-1 AS BIGINT) AS v,
       r.auc AS score FROM (
{base["graph_roc"]}
) r
UNION ALL
SELECT z.metric, z.u, z.v, z.score FROM (
{_lp_utils_sql()}
) z
"""
    base["sim_topk"] = _variant_union("method", [
        ("exact", base["sim_cosine_topk"]),
        ("ivf", base["sim_ivf_topk"]),
    ])
    base["graph_betweenness_exact"] = f"""
SELECT 'node' AS kind, t.id AS u, CAST(-1 AS BIGINT) AS v, t.score FROM (
{base["graph_betweenness"]}
) t
UNION ALL
SELECT 'edge' AS kind, e.src AS u, e.dst AS v, e.score FROM (
{base["graph_edge_betweenness"]}
) e
"""
    lpc_sql = f"""
WITH {GRAPH_PRELUDE_SQL}
SELECT CAST(-1 AS INT) AS rank, src AS id,
       round(CASE WHEN inw > 0 THEN inw / wdeg ELSE 0.0 END, 6) AS score
FROM (SELECT src,
             sum(CASE WHEN src % 10 = dst % 10 THEN 1.0 ELSE 0.0 END) AS inw,
             sum(1.0) AS wdeg
      FROM edges GROUP BY src)
"""
    base["graph_group_centrality"] = _variant_union("method", [
        ("degree", f"SELECT t.rank, t.id, CAST(NULL AS DOUBLE) AS score "
                   f"FROM (\n{base['graph_group_degree']}\n) t"),
        ("closeness", f"SELECT t.rank, t.id, CAST(NULL AS DOUBLE) AS score "
                      f"FROM (\n{base['graph_group_closeness']}\n) t"),
        ("lpc", lpc_sql),
        ("gedwalk", f"SELECT CAST(-1 AS INT) AS rank, CAST(-1 AS BIGINT) AS id, "
                    f"t.score FROM (\n{_gedwalk_sql()}\n) t"),
        ("harmonic", _group_harmonic_sql()),
        ("local_swaps", _group_refine_sql("local_swaps")),
        ("grow_shrink", _group_refine_sql("grow_shrink")),
        ("local_search", _group_refine_sql("local_search")),
    ])
    base["graph_sparsifiers"] = (
        base["graph_sparsifiers"]
        + f"""
UNION ALL SELECT 'simmelian' AS method, s.src, s.dst, s.score FROM (
{_SIMMELIAN_SUB200_SQL}
) s
UNION ALL SELECT 'prefix_jaccard' AS method, p.src, p.dst, p.score FROM (
{_PREFIX_JACCARD_SUB200_SQL}
) p
"""
    )
    base["graph_partition_dist"] = f"""
SELECT t.*, o.onmi_distance, r7.* FROM (
{base["graph_partition_dist"]}
) t CROSS JOIN (
{_ONMI_SQL}
) o CROSS JOIN (
{_pdist_r7_sql()}
) r7
"""
    base["graph_msf"] = _MSF_SUB200_SQL
    base["graph_matching"] = _matching_sql()
    base["graph_betweenness_w"] = _weighted_brandes_sql()
    base["graph_anf"] = _anf_sql()
    base["graph_randomized"] = _randomized_sql()
    base["graph_approx_betweenness"] = _variant_union("method", [
        ("rk", _approx_betweenness_sql()),
        ("kadabra", _approx_betweenness_sql(r=KADABRA_BATCH, tag="kb")),
        ("dyn", _dyn_approx_betweenness_sql()),
    ])
    base["graph_scd"] = _scd_sql()
    base["graph_plm"] = _variant_union("variant", [
        ("plm", _plm_sql()),
        ("lpdo", _lpdo_sql()),
        ("lme", _lme_sql()),
        ("aggc", _aggc_sql()),
    ])
    base["graph_ctd"] = _ctd_sql()

    # maximal cliques (size >= 3): enumerate ALL cliques by ordered list
    # extension (a clique [..., last] extends by any neighbor-of-all with
    # id > last), then keep the ones no outside node is adjacent to all
    # of. Matches the ego-net Bron-Kerbosch output exactly — both list
    # members ascending, and DuckDB's list→VARCHAR renders '[a, b, c]'
    # identically to Spark's array→string cast.
    base["graph_cliques"] = f"""
WITH RECURSIVE {SUB200_PRELUDE_NOWALK_SQL},
  nbrs AS MATERIALIZED (SELECT src AS id, list(dst ORDER BY dst) AS ns FROM edges GROUP BY src),
  cl(members, last) AS (
    SELECT [e.src, e.dst], e.dst FROM e0 e
    UNION ALL
    SELECT list_append(c.members, n.id), n.id
    FROM cl c JOIN nbrs n ON n.id > c.last AND list_has_all(n.ns, c.members)
  )
SELECT CAST(members AS VARCHAR) AS clique, CAST(len(members) AS INT) AS size
FROM cl c
WHERE len(members) >= 3
  AND NOT EXISTS (SELECT 1 FROM nbrs n WHERE list_has_all(n.ns, c.members))
"""

    base["mm_pipeline"] = f"""
SELECT 'meta' AS kind, t.media_id, CAST(t.n_bytes AS INT) AS k,
       t.modality || '/' || t.mime AS info
FROM ({base["mm_media_meta"]}) t
UNION ALL
SELECT 'frame' AS kind, s.media_id, CAST(s.frame_idx AS INT) AS k,
       s.frame_sha256 AS info
FROM ({base["mm_frame_sample"]}) s
UNION ALL
-- flat GRAY images round-trip the baseline JFIF codec exactly, so the
-- decoded pixel sum is the closed form v * 16 * 24 * 3
SELECT 'jpeg' AS kind, doc_id AS media_id,
       CAST(((37 + 7 * doc_id) % 256) * 1152 AS INT) AS k,
       '16x24x3:q75' AS info
FROM documents WHERE doc_id < 48
UNION ALL
-- raw-AVI DIB decode is exact byte reshuffling, so each sampled flat
-- frame's decoded pixel sum is the closed form v * 16 * 12 * 3
SELECT 'video' AS kind, doc_id AS media_id,
       CAST(((37 + 5 * doc_id + 11 * f.i) % 256) * 576 AS INT) AS k,
       'avi:' || f.i AS info
FROM documents, UNNEST([0, 1, 2]) AS f(i) WHERE doc_id < 48
"""

    # entries merged into multi-column rows in rounds 3-4 (their SQL lives
    # on inside the merged oracles); dropping the stale keys keeps the
    # contract exactly aligned with queries()
    for stale in (
        "graph_triangle_total", "graph_global_cc", "graph_modularity",
        "graph_edge_cut", "graph_conductance", "graph_hub_dominance",
        "graph_ipd", "graph_nmi", "graph_ari", "graph_jaccard_measure",
        "graph_gs_rand", "graph_sparsify", "graph_local_degree",
        "graph_local_similarity", "text_tokens", "text_langid",
        "text_quality", "text_fingerprint",
        # round-4 merges
        "graph_closeness", "graph_harmonic", "graph_closeness_w",
        "graph_diameter", "graph_katz", "graph_eigenvector",
        "graph_bfs", "graph_sssp", "graph_katz_index", "graph_roc",
        "sim_cosine_topk", "sim_ivf_topk", "graph_betweenness",
        "graph_edge_betweenness", "graph_group_degree",
        "graph_group_closeness", "mm_media_meta", "mm_frame_sample",
    ):
        base.pop(stale, None)
    return base


def _variant_union(colname: str, parts: list[tuple[str, str]]) -> str:
    """UNION ALL of complete SELECT statements (each may carry its own
    WITH clause — DuckDB allows CTEs inside subqueries), tagged with a
    literal variant column. The per-part column sets must match."""
    return "\nUNION ALL\n".join(
        f"SELECT '{v}' AS {colname}, t.* FROM (\n{sql}\n) t" for v, sql in parts
    )


def _dyn_katz_sql(
    init_iters: int = DYN_KATZ_INIT_ITERS, upd_iters: int = DYN_KATZ_UPDATE_ITERS
) -> str:
    """(id, score) oracle for the dyn_katz spectral variant: exact replay
    of q_graph_dyn_katz — ``init_iters`` Katz rounds on the co-graph
    minus the (src+dst)%7==0 edges (α pinned from that base graph), then
    ``upd_iters`` warm-started rounds on the full edge set, l2-normalized
    once at the end (mirror of operators/spectral.py::katz_centrality's
    β + Σ w·α·(1+score) gather, chained CTE per round)."""
    ctes = [
        GRAPH_PRELUDE_SQL.strip(),
        "ke AS MATERIALIZED (SELECT src, dst FROM edges WHERE (src + dst) % 7 <> 0)",
        """alpha0 AS (SELECT CAST(1.0 AS DOUBLE) / (1 + max(c)) AS a
  FROM (SELECT src, count(*) AS c FROM ke GROUP BY src))""",
        "dk0 AS (SELECT id, CAST(1.0 AS DOUBLE) AS score FROM nodes)",
    ]
    for r in range(1, init_iters + upd_iters + 1):
        rel = "ke" if r <= init_iters else "edges"
        ctes.append(f"""dk{r} AS MATERIALIZED (
  SELECT n.id, 0.1 + coalesce(g.s, 0.0) AS score
  FROM nodes n LEFT JOIN (
    SELECT e.src AS id, sum((SELECT a FROM alpha0) * (1.0 + k.score)) AS s
    FROM {rel} e JOIN dk{r - 1} k ON k.id = e.dst GROUP BY e.src) g
  ON g.id = n.id)""")
    last = f"dk{init_iters + upd_iters}"
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT id, round(score / sqrt((SELECT sum(score * score) FROM {last})), 6) AS score
FROM {last}
"""
    )


def _gedwalk_sql(
    group: tuple = GEDWALK_GROUP,
    alpha: float = GEDWALK_ALPHA,
    levels: int = GEDWALK_LEVELS,
) -> str:
    """Single-value oracle for the gedwalk group-centrality variant:
    exact replay of ged_walk_score's hit/miss walk DP over the sub200
    graph, unrolled per level. Walk counts are integers and α^ℓ is a
    power of two, so every operation is exact in FP — bit-identical
    across engines with no rounding."""
    grp = ", ".join(str(int(x)) for x in group)
    ctes = [
        SUB200_PRELUDE_NOWALK_SQL.strip(),
        f"""gw0 AS (SELECT id, (id IN ({grp})) AS ing,
    CASE WHEN id IN ({grp}) THEN CAST(1.0 AS DOUBLE) ELSE 0.0 END AS hit,
    CASE WHEN id IN ({grp}) THEN CAST(0.0 AS DOUBLE) ELSE 1.0 END AS miss
  FROM nodes)""",
    ]
    for r in range(1, levels + 1):
        ctes.append(f"""gw{r} AS MATERIALIZED (
  SELECT s.id, s.ing,
    CASE WHEN s.ing THEN coalesce(t.gh, 0.0) + coalesce(t.gm, 0.0)
         ELSE coalesce(t.gh, 0.0) END AS hit,
    CASE WHEN s.ing THEN 0.0 ELSE coalesce(t.gm, 0.0) END AS miss
  FROM gw{r - 1} s LEFT JOIN (
    SELECT e.dst AS id, sum(p.hit) AS gh, sum(p.miss) AS gm
    FROM edges e JOIN gw{r - 1} p ON p.id = e.src GROUP BY e.dst) t
  ON t.id = s.id)""")
    terms = " + ".join(
        f"{alpha ** r!r} * (SELECT sum(hit) FROM gw{r})" for r in range(1, levels + 1)
    )
    return "WITH " + ",\n".join(ctes) + f"\nSELECT {terms} AS score\n"


def _weighted_brandes_sql(k_rounds: int = 10) -> str:
    """(id, score) oracle for graph_betweenness_w: weighted shortest
    distances via the bounded walk CTE ((src+dst)%3+1 integer weights,
    cap 96), shortest-path DAG p→t iff dist(p)+w = dist(t), then σ
    forward and δ backward as K unrolled fixed-point rounds — the exact
    SQL mirror of operators/distance.py::betweenness_weighted. DAG hop
    depth ≤ max weighted distance (7 at sf0.01, weights ≥ 1), so K=10
    rounds over-converge; extra rounds are idempotent."""
    ctes = [
        """e0 AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  WHERE a.l_partkey < 200 AND b.l_partkey < 200)""",
        "edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0)",
        "wedges AS MATERIALIZED (SELECT src, dst, (src + dst) % 3 + 1 AS w FROM edges)",
        "nodes AS MATERIALIZED (SELECT CAST(u.i AS BIGINT) AS id FROM UNNEST(range(200)) AS u(i))",
        """wk(root, node, dist) AS (
  SELECT id, id, CAST(0 AS BIGINT) FROM nodes
  UNION
  SELECT wk.root, e.dst, wk.dist + e.w FROM wk JOIN wedges e ON wk.node = e.src WHERE wk.dist < 96)""",
        "sp AS MATERIALIZED (SELECT root, node, min(dist) AS dist FROM wk GROUP BY root, node)",
        """wdag AS MATERIALIZED (
  SELECT p.root, e.src, e.dst FROM wedges e
  JOIN sp p ON p.node = e.src
  JOIN sp q ON q.root = p.root AND q.node = e.dst
  WHERE p.dist + e.w = q.dist)""",
        "sg0 AS MATERIALIZED (SELECT root, node, CASE WHEN dist = 0 THEN 1.0 ELSE 0.0 END AS sigma FROM sp)",
    ]
    for k in range(1, k_rounds + 1):
        ctes.append(f"""sg{k} AS MATERIALIZED (
  SELECT sp.root, sp.node,
         CASE WHEN sp.dist = 0 THEN 1.0 ELSE coalesce(pr.s, 0.0) END AS sigma
  FROM sp LEFT JOIN (
    SELECT d.root, d.dst AS node, sum(s.sigma) AS s
    FROM wdag d JOIN sg{k - 1} s ON s.root = d.root AND s.node = d.src
    GROUP BY d.root, d.dst) pr
  ON pr.root = sp.root AND pr.node = sp.node)""")
    ctes.append("dl0 AS MATERIALIZED (SELECT root, node, 0.0 AS delta FROM sp)")
    for k in range(1, k_rounds + 1):
        ctes.append(f"""dl{k} AS MATERIALIZED (
  SELECT sp.root, sp.node, coalesce(bk.d, 0.0) AS delta
  FROM sp LEFT JOIN (
    SELECT d.root, d.src AS node, sum((sgp.sigma / sgt.sigma) * (1.0 + dt.delta)) AS d
    FROM wdag d
    JOIN sg{k_rounds} sgt ON sgt.root = d.root AND sgt.node = d.dst
    JOIN sg{k_rounds} sgp ON sgp.root = d.root AND sgp.node = d.src
    JOIN dl{k - 1} dt ON dt.root = d.root AND dt.node = d.dst
    GROUP BY d.root, d.src) bk
  ON bk.root = sp.root AND bk.node = sp.node)""")
    return "WITH RECURSIVE " + ",\n".join(ctes) + f"""
SELECT n.id, round(coalesce(s.v, 0.0), 6) AS score
FROM nodes n LEFT JOIN (
  SELECT d.node, sum(d.delta) AS v FROM dl{k_rounds} d
  JOIN sp ON sp.root = d.root AND sp.node = d.node
  WHERE sp.dist > 0 GROUP BY d.node) s ON n.id = s.node
"""


ANF_HOPS = 6  # measured FM-sketch saturation at sf0.01 = hop 4 (break on <=)


def _anf_sql(hops: int = ANF_HOPS, k: int = 16, bits: int = 48, seed: int = 42) -> str:
    """Exact replay of the portable-hash Flajolet-Martin ANF sketch
    (operators/sketches.py): per-(node, trial) geometric index = trailing
    zeros of the md5 porthash (pure integer, bit-identical in both
    engines); per hop OR-in neighbor masks; estimate = Σ 2^(mean lowest
    zero bit)/φ. The list stops at the first non-increasing hop (same
    rule as neighborhood_function) and the answer is the first hop
    covering ≥ 0.9 of the final mass — an integer, so float summation
    order across engines cannot flip it."""
    hmod = lambda t: (  # noqa: E731
        f"CAST(md5_number_lower('anf{seed}:{t}:' || CAST(id AS VARCHAR)) % {DEFAULT_PRIME} AS BIGINT)"
    )
    mask_exprs = ", ".join(
        f"(CAST(1 AS BIGINT) << (CASE WHEN h{t} = 0 THEN {bits - 1} "
        f"ELSE least(bit_count((h{t} & (-h{t})) - 1), {bits - 1}) END)) AS m{t}"
        for t in range(k)
    )
    hcols = ", ".join(f"{hmod(t)} AS h{t}" for t in range(k))
    ctes = [
        """e0 AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
    FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)""",
        "edges AS MATERIALIZED (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0)",
        "nodes AS MATERIALIZED (SELECT DISTINCT src AS id FROM edges)",
        f"hs AS (SELECT id, {hcols} FROM nodes)",
        f"mk0 AS MATERIALIZED (SELECT id, {mask_exprs} FROM hs)",
    ]
    for h in range(1, hops + 1):
        bo = ", ".join(f"bit_or(m.m{t}) AS b{t}" for t in range(k))
        ors = ", ".join(
            f"m.m{t} | coalesce(n.b{t}, CAST(0 AS BIGINT)) AS m{t}" for t in range(k)
        )
        lz = " + ".join(
            f"CAST(bit_count(((~m{t}) & (m{t} + 1)) - 1) AS DOUBLE)" for t in range(k)
        )
        ctes.append(f"""nb{h} AS (SELECT e.dst AS id, {bo}
      FROM edges e JOIN mk{h - 1} m ON m.id = e.src GROUP BY e.dst)""")
        ctes.append(f"""mk{h} AS MATERIALIZED (SELECT m.id, {ors}
      FROM mk{h - 1} m LEFT JOIN nb{h} n ON n.id = m.id)""")
        ctes.append(
            f"est{h} AS (SELECT sum(pow(2.0, ({lz}) / {float(k)}) / 0.77351) AS v FROM mk{h})"
        )
    ests = " UNION ALL ".join(
        f"SELECT {h} AS hop, (SELECT v FROM est{h}) AS v" for h in range(1, hops + 1)
    )
    return "WITH " + ",\n".join(ctes) + f""",
ests AS ({ests}),
stop AS (SELECT coalesce(min(a.hop), {hops}) AS s FROM ests a JOIN ests b ON b.hop = a.hop - 1 WHERE a.v <= b.v),
fin AS (SELECT v FROM ests, stop WHERE hop = stop.s)
SELECT CAST(min(hop) AS DOUBLE) AS effective_diameter
FROM ests, stop, fin WHERE ests.hop <= stop.s AND ests.v >= 0.9 * fin.v
"""


def _approx_closeness_sql(
    n: int = 200,
    k: int = APPROX_CLOSENESS_K,
    eps: float = APPROX_CLOSENESS_EPS,
    seed: int = 42,
) -> str:
    """(id, score) oracle for the approx closeness variant: exact replay
    of operators/distance.py::approx_closeness's set-form Cohen
    estimator over the sub200 walk-CTE distances — same md5 sample draw,
    same pivot tie-break, the LC/HC/dropped classification, the per-
    pivot tail suffix sums, and the reference estimator formula. All
    sums are integer hop distances, every threshold is delta·(1/ε−1) or
    delta/ε with ε=0.5 (exact dyadics), so the replay is bit-exact."""
    inv1 = 1.0 / eps - 1.0
    ctes = [
        SUB200_PRELUDE_SQL.strip(),
        f"""acs AS MATERIALIZED (SELECT id FROM nodes
  ORDER BY {_porthash_sql('id', f'ac{seed}:')} ASC, id ASC LIMIT {k})""",
        """avis AS MATERIALIZED (SELECT root, node, CAST(dist AS DOUBLE) AS dist
  FROM sp WHERE root IN (SELECT id FROM acs))""",
        "aex AS (SELECT root AS id, sum(dist) AS farness FROM avis GROUP BY root)",
        """apiv AS MATERIALIZED (SELECT node, root AS pvt, dist AS delta FROM (
  SELECT node, root, dist,
    row_number() OVER (PARTITION BY node ORDER BY dist ASC, root ASC) AS rn
  FROM avis) z WHERE rn = 1)""",
        "ans AS MATERIALIZED (SELECT * FROM avis WHERE node NOT IN (SELECT id FROM acs))",
        """adp AS (SELECT root AS i, node AS ps, dist AS dp FROM avis
  WHERE node IN (SELECT id FROM acs))""",
        f"""apr AS (
  SELECT p.node, p.dist, v.pvt, v.delta, d.dp,
    (p.dist <= v.delta * {inv1!r}) OR (d.dp <= v.delta / {eps!r}) AS lc
  FROM ans p JOIN apiv v ON v.node = p.node
  LEFT JOIN adp d ON d.i = p.root AND d.ps = v.pvt)""",
        """apn AS MATERIALIZED (SELECT node,
  sum(CASE WHEN lc THEN dist ELSE 0.0 END) AS lcsum,
  sum(CASE WHEN lc THEN 1 ELSE 0 END) AS lcnum,
  sum(CASE WHEN (NOT lc) AND dp >= dist THEN dist ELSE 0.0 END) AS hcsum,
  min(delta) AS delta, min(pvt) AS pvt
  FROM apr GROUP BY node)""",
        """alev AS (SELECT root AS pvt, dist AS dval, sum(dist) AS dsum,
  count(*) AS dcnt FROM ans GROUP BY root, dist)""",
        """asuf AS MATERIALIZED (SELECT pvt, dval,
  sum(dsum) OVER (PARTITION BY pvt ORDER BY dval DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ssum,
  sum(dcnt) OVER (PARTITION BY pvt ORDER BY dval DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS scnt
  FROM alev)""",
        f"""aht AS (SELECT node, ssum AS hsum, scnt AS hnum FROM (
  SELECT a.node, s.ssum, s.scnt,
    row_number() OVER (PARTITION BY a.node ORDER BY s.dval ASC) AS rn
  FROM apn a JOIN asuf s ON s.pvt = a.pvt AND s.dval > a.delta / {eps!r}) z
  WHERE rn = 1)""",
        f"""aest AS (SELECT a.node AS id,
  CASE WHEN a.lcnum > 0 THEN
    coalesce(h.hsum, 0.0) + a.hcsum
    + a.lcsum / (CAST(a.lcnum AS DOUBLE)
                 / ({float(n - 1)!r} - CAST(coalesce(h.hnum, 0) AS DOUBLE)
                    - {float(k)!r} + CAST(a.lcnum AS DOUBLE)))
  END AS farness
  FROM apn a LEFT JOIN aht h ON h.node = a.node)""",
        "afar AS (SELECT * FROM aest UNION ALL SELECT id, farness FROM aex)",
    ]
    return (
        "WITH RECURSIVE "
        + ",\n".join(ctes)
        + """
SELECT n.id,
       round(CASE WHEN f.farness > 0 THEN 1.0 / f.farness ELSE 0.0 END, 6)
         AS score
FROM nodes n LEFT JOIN afar f ON f.id = n.id
"""
    )


def _kpath_sql(
    n: int = 200, k: int = KPATH_K, alpha: float = KPATH_ALPHA, seed: int = 42
) -> str:
    """(id, score) oracle for the kpath variant of graph_betweenness_est:
    exact replay of k_path_centrality(portable_hash=True) on sub200 — t
    seeded self-avoiding walks advanced k unrolled steps, each step a
    frontier⋈edges join with list_contains self-avoidance and the
    uniform rn == draw % cnt + 1 choice. Counts are integers; the final
    k·n·(count/t) expression mirrors the Spark/Python op order."""
    import math as _math

    t = max(1, int(2.0 * k * k * (float(n) ** (1 - 2 * alpha)) * _math.log(float(n))))
    ctes = [
        SUB200_PRELUDE_NOWALK_SQL.strip(),
        f"""kwk0 AS MATERIALIZED (SELECT w.wid, w.l, m.cur,
    [m.cur] AS path
  FROM (SELECT CAST(u.i + 1 AS BIGINT) AS wid,
               {_porthash_sql('u.i + 1', f'kp{seed}:s:')} % {n} AS sidx,
               1 + {_porthash_sql('u.i + 1', f'kp{seed}:l:')} % {k} AS l
        FROM UNNEST(range({t})) AS u(i)) w
  JOIN (SELECT id AS sidx, id AS cur FROM nodes) m USING (sidx))""",
    ]
    for j in range(1, k + 1):
        ctes.append(f"""kcd{j} AS (
  SELECT s.wid, s.l, s.path, e.dst AS nxt
  FROM kwk{j - 1} s JOIN edges e ON e.src = s.cur
  WHERE s.l >= {j} AND NOT list_contains(s.path, e.dst))""")
        ctes.append(f"""kwk{j} AS MATERIALIZED (
  SELECT wid, l, nxt AS cur, list_append(path, nxt) AS path FROM (
    SELECT wid, l, path, nxt,
      row_number() OVER (PARTITION BY wid ORDER BY nxt) AS rn,
      count(*) OVER (PARTITION BY wid) AS cnt,
      {_porthash_sql('wid', f'kp{seed}:c:{j}:')} AS drw
    FROM kcd{j}) z WHERE rn = drw % cnt + 1)""")
    allc = " UNION ALL ".join(f"SELECT cur AS id FROM kwk{j}" for j in range(1, k + 1))
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
kallc AS ({allc}),
kcnt AS (SELECT id, count(*) AS c FROM kallc GROUP BY id)
SELECT n.id,
       round(coalesce({float(k) * float(n)!r} * (CAST(kc.c AS DOUBLE) / {float(t)!r}), 0.0), 6) AS score
FROM nodes n LEFT JOIN kcnt kc ON kc.id = n.id
"""
    )


def _porthash_sql(expr: str, salt: str) -> str:
    return (
        f"CAST(md5_number_lower('{salt}' || CAST({expr} AS VARCHAR)) "
        f"% {DEFAULT_PRIME} AS BIGINT)"
    )


def _edge_switching_ctes(r: int, prev: str, seed: int = 42, buckets: int = 32) -> list[str]:
    """One parallel double-edge-switching round as CTE text — the exact
    SQL mirror of operators/randomization.py::edge_switching with
    portable_hash: hash-bucket pairing, seeded coin, self-loop/duplicate
    /collision rejection, rewire. ``buckets`` must equal the Spark side's
    max(32, m // 4096) — 32 for every sub200 input."""
    p = f"sw{r}"
    hsql = _porthash_sql("CAST(src AS VARCHAR) || '_' || CAST(dst AS VARCHAR)", f"es{seed}:{r}:")
    coin = _porthash_sql("pair", f"esc{seed}:{r}:")
    return [
        f"""{p}h AS (SELECT src, dst, {hsql} AS h FROM {prev})""",
        f"""{p}d AS (SELECT src, dst, h, h % {buckets} AS bucket FROM {p}h)""",
        f"""{p}r AS (SELECT src, dst, bucket,
   row_number() OVER (PARTITION BY bucket ORDER BY h, src, dst) AS rn FROM {p}d)""",
        f"""{p}k AS (SELECT src, dst,
   CAST(bucket AS VARCHAR) || '_' || CAST(rn // 2 AS VARCHAR) AS pair, rn % 2 AS side FROM {p}r)""",
        f"""{p}p AS (SELECT a.pair, a.src AS a, a.dst AS b, c.src AS c, c.dst AS d
   FROM (SELECT * FROM {p}k WHERE side = 1) a
   JOIN (SELECT * FROM {p}k WHERE side = 0) c ON a.pair = c.pair)""",
        f"""{p}e AS (SELECT pair, a, b, c, d, ({coin} % 2 = 0) AS coin FROM {p}p)""",
        f"""{p}f AS (SELECT pair, a, b, c, d,
   CASE WHEN coin THEN least(a,d) ELSE least(a,c) END AS n1s,
   CASE WHEN coin THEN greatest(a,d) ELSE greatest(a,c) END AS n1d,
   CASE WHEN coin THEN least(c,b) ELSE least(b,d) END AS n2s,
   CASE WHEN coin THEN greatest(c,b) ELSE greatest(b,d) END AS n2d
   FROM {p}e)""",
        f"""{p}ok AS (SELECT * FROM {p}f
   WHERE n1s <> n1d AND n2s <> n2d AND NOT (n1s = n2s AND n1d = n2d))""",
        f"""{p}ne AS (SELECT pair, a, b, c, d, n1s AS src, n1d AS dst FROM {p}ok
   UNION ALL SELECT pair, a, b, c, d, n2s, n2d FROM {p}ok)""",
        f"""{p}bad AS (
   SELECT DISTINCT pair FROM {p}ne ne JOIN {prev} e ON e.src = ne.src AND e.dst = ne.dst
   WHERE NOT ((ne.src = least(ne.a, ne.b) AND ne.dst = greatest(ne.a, ne.b))
           OR (ne.src = least(ne.c, ne.d) AND ne.dst = greatest(ne.c, ne.d)))
   UNION
   SELECT DISTINCT ne2.pair FROM {p}ne ne2 JOIN (
     SELECT src, dst FROM {p}ne GROUP BY src, dst HAVING count(*) > 1) dup
     ON dup.src = ne2.src AND dup.dst = ne2.dst)""",
        f"""{p}acc AS (SELECT * FROM {p}ok WHERE pair NOT IN (SELECT pair FROM {p}bad))""",
        f"""{p}out AS MATERIALIZED (
   SELECT e.src, e.dst FROM {prev} e
   WHERE NOT EXISTS (SELECT 1 FROM {p}acc x
     WHERE (e.src = least(x.a, x.b) AND e.dst = greatest(x.a, x.b))
        OR (e.src = least(x.c, x.d) AND e.dst = greatest(x.c, x.d)))
   UNION ALL SELECT n1s, n1d FROM {p}acc
   UNION ALL SELECT n2s, n2d FROM {p}acc)""",
    ]


def _curveball_ctes(r: int, prev: str, seed: int = 42, buckets: int = 32) -> list[str]:
    """One synchronous GlobalCurveball trade round as CTE text — mirror
    of operators/randomization.py::global_curveball with portable_hash:
    hash-bucket node pairing, edge→trade ownership by smaller pair hash,
    disjoint-neighborhood pool redistribution by seeded per-trade rank."""
    p = f"cb{r}"
    return [
        f"""{p}n AS (SELECT id, {_porthash_sql('id', f'cb{seed}:{r}:')} AS h FROM nodes)""",
        f"""{p}r AS (SELECT id, h % {buckets} AS bucket, h,
    row_number() OVER (PARTITION BY h % {buckets} ORDER BY h, id) AS rn FROM {p}n)""",
        f"""{p}k AS (SELECT id, CAST({r} AS VARCHAR) || '_' || CAST(bucket AS VARCHAR) || '_' || CAST(rn // 2 AS VARCHAR) AS pair, rn % 2 AS side FROM {p}r)""",
        f"""{p}pp AS (SELECT k.id, k.pair, k.side, {_porthash_sql('k.pair', 'cbp:')} AS ph FROM {p}k k
    JOIN (SELECT pair FROM {p}k GROUP BY pair HAVING count(*) = 2) f ON f.pair = k.pair)""",
        f"""{p}e AS (SELECT e.src, e.dst, pa.pair AS pair_a, pa.side AS side_a, pa.ph AS ph_a,
    pb.pair AS pair_b, pb.side AS side_b, pb.ph AS ph_b
    FROM {prev} e LEFT JOIN {p}pp pa ON pa.id = e.src LEFT JOIN {p}pp pb ON pb.id = e.dst)""",
        f"""{p}b AS (SELECT *, (ph_a < ph_b OR (ph_a = ph_b AND pair_a <= pair_b)) AS ois FROM {p}e
    WHERE pair_a IS NOT NULL AND pair_b IS NOT NULL AND pair_a <> pair_b)""",
        f"""{p}rest AS (SELECT src, dst FROM {p}e
    WHERE NOT (pair_a IS NOT NULL AND pair_b IS NOT NULL AND pair_a <> pair_b))""",
        f"""{p}a1 AS (SELECT CASE WHEN ois THEN src ELSE dst END AS owner,
    CASE WHEN ois THEN dst ELSE src END AS w,
    CASE WHEN ois THEN pair_a ELSE pair_b END AS pair,
    CASE WHEN ois THEN side_a ELSE side_b END AS side FROM {p}b)""",
        f"""{p}a2 AS (SELECT a.owner, a.w, a.pair, a.side, o.id AS other FROM {p}a1 a
    JOIN {p}pp o ON o.pair = a.pair AND o.side = 1 - a.side)""",
        f"""{p}sym AS (SELECT src AS other, dst AS w FROM {prev} UNION ALL SELECT dst, src FROM {prev})""",
        f"""{p}adj AS (SELECT a.* FROM {p}a2 a
    WHERE EXISTS (SELECT 1 FROM {p}sym s WHERE s.other = a.other AND s.w = a.w))""",
        f"""{p}pool AS (SELECT a.* FROM {p}a2 a
    WHERE NOT EXISTS (SELECT 1 FROM {p}sym s WHERE s.other = a.other AND s.w = a.w)
      AND a.w <> a.other)""",
        f"""{p}stay AS (SELECT owner, w FROM {p}adj
    UNION ALL
    SELECT owner, w FROM {p}a2 a
    WHERE NOT EXISTS (SELECT 1 FROM {p}pool q WHERE q.pair = a.pair AND q.w = a.w)
      AND NOT EXISTS (SELECT 1 FROM {p}adj d WHERE d.pair = a.pair AND d.w = a.w))""",
        f"""{p}cnt AS (SELECT pair, sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS n_first FROM {p}pool GROUP BY pair)""",
        f"""{p}mem AS (SELECT pair, max(CASE WHEN side = 1 THEN id END) AS m_first,
    max(CASE WHEN side = 0 THEN id END) AS m_second FROM {p}pp GROUP BY pair)""",
        f"""{p}prn AS (SELECT pair, w, row_number() OVER (PARTITION BY pair ORDER BY {_porthash_sql('w', f'cbw{seed}:{r}:')}, w) AS prn FROM {p}pool)""",
        f"""{p}red AS (SELECT CASE WHEN r.prn <= c.n_first THEN m.m_first ELSE m.m_second END AS owner, r.w
    FROM {p}prn r JOIN {p}cnt c ON c.pair = r.pair JOIN {p}mem m ON m.pair = r.pair)""",
        f"""{p}out AS MATERIALIZED (SELECT src, dst FROM {p}rest
    UNION ALL SELECT least(owner, w), greatest(owner, w) FROM {p}stay
    UNION ALL SELECT least(owner, w), greatest(owner, w) FROM {p}red)""",
    ]


def _randomized_sql(rounds: int = 3) -> str:
    """(method, src, dst) oracle for graph_randomized: exact replay of
    the portable-hash edge-switching and GlobalCurveball chains."""
    es = ["""er0 AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      WHERE a.l_partkey < 200 AND b.l_partkey < 200)""",
          "nodes AS (SELECT CAST(u.i AS BIGINT) AS id FROM UNNEST(range(200)) AS u(i))"]
    prev = "er0"
    for r in range(rounds):
        es += _edge_switching_ctes(r, prev)
        prev = f"sw{r}out"
    es_final = prev
    prev = "er0"
    for r in range(rounds):
        es += _curveball_ctes(r, prev)
        prev = f"cb{r}out"
    cb_final = prev
    return "WITH " + ",\n".join(es) + f"""
SELECT 'switching' AS method, src, dst FROM {es_final}
UNION ALL
SELECT 'curveball' AS method, src, dst FROM {cb_final}
"""


def _approx_betweenness_sql(
    n: int = 200,
    r: int = 133,  # ceil((1/0.2²)(⌊log2(vd−2)⌋ + 1 + ln(1/0.1))), vd = 6 at sf0.01
    vd: int = 6,  # two-sweep vertex-diameter upper bound, measured at sf0.01
    seed: int = 42,
    levels: int = 9,
    m_mod: int = 1_000_003,
    tag: str = "ab",  # porthash salt prefix: "ab" = approx_betweenness, "kb" = kadabra
) -> str:
    """(id, score) oracle for graph_approx_betweenness: exact replay of
    the RK sampled-path estimator (operators/distance.py::
    approx_betweenness with portable_hash). r seeded (u,v) pairs (dense
    ids are the identity on the 0..199 node range), hop BFS dist + σ by
    level, then vd+1 unrolled predecessor-sampling steps where each pair
    walks back one σ-weighted choice drawn from the shared md5 porthash.
    σ sums and the x threshold are integer-derived doubles, so the
    cum/tot > x comparisons are bit-identical across engines."""
    ctes = [
        """e0 AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      WHERE a.l_partkey < 200 AND b.l_partkey < 200)""",
        "edges AS MATERIALIZED (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0)",
        "nodes AS MATERIALIZED (SELECT CAST(u.i AS BIGINT) AS id FROM UNNEST(range(200)) AS u(i))",
        f"""prs AS MATERIALIZED (SELECT p, iu AS u, CASE WHEN iv0 >= iu THEN iv0 + 1 ELSE iv0 END AS v FROM (
    SELECT CAST(u.i AS BIGINT) AS p,
           {_porthash_sql('u.i', f'{tag}{seed}:u:')} % {n} AS iu,
           {_porthash_sql('u.i', f'{tag}{seed}:v:')} % {n - 1} AS iv0
    FROM UNNEST(range({r})) AS u(i)))""",
        "roots AS (SELECT DISTINCT u AS id FROM prs)",
        """wk(root, node, dist) AS (
    SELECT id, id, CAST(0 AS BIGINT) FROM roots
    UNION
    SELECT wk.root, e.dst, wk.dist + 1 FROM wk JOIN edges e ON wk.node = e.src WHERE wk.dist < 96)""",
        "sp AS MATERIALIZED (SELECT root, node, min(dist) AS dist FROM wk GROUP BY root, node)",
        "sg0 AS MATERIALIZED (SELECT id AS root, id AS node, CAST(1 AS DOUBLE) AS sigma FROM roots)",
    ]
    for d in range(1, levels + 1):
        ctes.append(f"""sg{d} AS MATERIALIZED (
  SELECT s.root, e.dst AS node, sum(s.sigma) AS sigma
  FROM sg{d - 1} s JOIN edges e ON s.node = e.src
  JOIN sp p ON p.root = s.root AND p.node = e.dst
  WHERE p.dist = {d} GROUP BY s.root, e.dst)""")
    allsg = " UNION ALL ".join(f"SELECT * FROM sg{d}" for d in range(levels + 1))
    ctes.append(
        f"vis AS MATERIALIZED (SELECT g.root, g.node, p.dist, g.sigma FROM ({allsg}) g "
        "JOIN sp p ON p.root = g.root AND p.node = g.node)"
    )
    ctes.append("""act0 AS (SELECT p.p AS pair, p.u, p.v AS cur FROM prs p
  WHERE EXISTS (SELECT 1 FROM sp WHERE sp.root = p.u AND sp.node = p.v AND sp.dist > 0))""")
    contribs = []
    for st in range(1, vd + 2):
        x = f"({_porthash_sql('pair', f'{tag}{seed}:x:{st}:')} % {m_mod}) / {float(m_mod)}"
        ctes.append(f"""cd{st} AS (
  SELECT a.pair, a.u, e.src AS z, vz.sigma AS sz
  FROM act{st - 1} a
  JOIN edges e ON e.dst = a.cur
  JOIN vis vz ON vz.root = a.u AND vz.node = e.src
  JOIN vis vc ON vc.root = a.u AND vc.node = a.cur
  WHERE vz.dist = vc.dist - 1)""")
        ctes.append(f"""ch{st} AS MATERIALIZED (SELECT pair, u, z AS cur FROM (
  SELECT pair, u, z, row_number() OVER (PARTITION BY pair ORDER BY z) AS rn FROM (
    SELECT pair, u, z,
      sum(sz) OVER (PARTITION BY pair ORDER BY z) AS cum,
      sum(sz) OVER (PARTITION BY pair) AS tot,
      {x} AS x
    FROM cd{st}) f WHERE cum / tot > x) g WHERE rn = 1)""")
        ctes.append(
            f"act{st} AS MATERIALIZED (SELECT pair, u, cur FROM ch{st} WHERE cur <> u)"
        )
        contribs.append(f"SELECT cur AS id FROM ch{st} WHERE cur <> u")
    allc = " UNION ALL ".join(contribs)
    return "WITH RECURSIVE " + ",\n".join(ctes) + f""",
allc AS ({allc}),
sc AS (SELECT id, count(*) / {float(r)} AS s FROM allc GROUP BY id)
SELECT n.id, round(coalesce(sc.s, 0.0), 6) AS score
FROM nodes n LEFT JOIN sc ON sc.id = n.id
"""


def _dyn_approx_betweenness_sql(
    n: int = 200,
    r: int = 59,  # ceil((1/0.3²)(⌊log2(6−2)⌋ + 1 + ln(1/0.1))), vd pinned 6
    vd: int = 6,
    seed: int = 42,
    levels: int = 14,
    m_mod: int = 1_000_003,
) -> str:
    """(id, score) oracle for the graph_approx_betweenness 'dyn' method:
    exact replay of DynApproxBetweenness (streaming/dynamics.py) seeded
    on sub200 minus its LAST canonical edge and updated by the batch
    that restores it. Pair draws use the class's dab salts; the epoch-0
    path sample runs over the reduced graph's (dist, σ) table, the
    modified-source set is the full-outer (dist, σ) anti-diff, and only
    touched pairs resample over the full graph with epoch-1 salts —
    untouched epoch-0 contributions are kept verbatim, exactly the
    class's kept/fresh union."""

    def walk(pfx: str, edges: str, vis: str, epoch: int):
        ctes, contribs = [], []
        for st in range(1, vd + 2):
            x = (
                f"({_porthash_sql('pair', f'dab{seed}:{epoch}:x:{st}:')} % {m_mod})"
                f" / {float(m_mod)}"
            )
            ctes.append(f"""{pfx}cd{st} AS (
  SELECT a.pair, a.u, e.src AS z, vz.sigma AS sz
  FROM {pfx}act{st - 1} a
  JOIN {edges} e ON e.dst = a.cur
  JOIN {vis} vz ON vz.root = a.u AND vz.node = e.src
  JOIN {vis} vc ON vc.root = a.u AND vc.node = a.cur
  WHERE vz.dist = vc.dist - 1)""")
            ctes.append(f"""{pfx}ch{st} AS MATERIALIZED (SELECT pair, u, z AS cur FROM (
  SELECT pair, u, z, row_number() OVER (PARTITION BY pair ORDER BY z) AS rn FROM (
    SELECT pair, u, z,
      sum(sz) OVER (PARTITION BY pair ORDER BY z) AS cum,
      sum(sz) OVER (PARTITION BY pair) AS tot,
      {x} AS x
    FROM {pfx}cd{st}) f WHERE cum / tot > x) g WHERE rn = 1)""")
            ctes.append(
                f"{pfx}act{st} AS MATERIALIZED "
                f"(SELECT pair, u, cur FROM {pfx}ch{st} WHERE cur <> u)"
            )
            contribs.append(
                f"SELECT pair, u, cur AS id FROM {pfx}ch{st} WHERE cur <> u"
            )
        return ctes, " UNION ALL ".join(contribs)

    def sigma(pfx: str, edges: str, sp: str):
        ctes = [
            f"{pfx}sg0 AS MATERIALIZED (SELECT id AS root, id AS node, "
            "CAST(1 AS DOUBLE) AS sigma FROM droots)"
        ]
        for d in range(1, levels + 1):
            ctes.append(f"""{pfx}sg{d} AS MATERIALIZED (
  SELECT s.root, e.dst AS node, sum(s.sigma) AS sigma
  FROM {pfx}sg{d - 1} s JOIN {edges} e ON s.node = e.src
  JOIN {sp} p ON p.root = s.root AND p.node = e.dst
  WHERE p.dist = {d} GROUP BY s.root, e.dst)""")
        allsg = " UNION ALL ".join(f"SELECT * FROM {pfx}sg{d}" for d in range(levels + 1))
        ctes.append(
            f"{pfx}vis AS MATERIALIZED (SELECT g.root, g.node, p.dist, g.sigma "
            f"FROM ({allsg}) g JOIN {sp} p ON p.root = g.root AND p.node = g.node)"
        )
        return ctes

    ctes = [
        """de0 AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      WHERE a.l_partkey < 200 AND b.l_partkey < 200)""",
        "destar AS (SELECT src, dst FROM de0 ORDER BY src DESC, dst DESC LIMIT 1)",
        """de0m AS MATERIALIZED (SELECT a.src, a.dst FROM de0 a
      WHERE NOT EXISTS (SELECT 1 FROM destar t WHERE t.src = a.src AND t.dst = a.dst))""",
        "dedges0 AS MATERIALIZED (SELECT src, dst FROM de0m UNION ALL SELECT dst, src FROM de0m)",
        "dedges1 AS MATERIALIZED (SELECT src, dst FROM de0 UNION ALL SELECT dst, src FROM de0)",
        "dnodes AS (SELECT CAST(u.i AS BIGINT) AS id FROM UNNEST(range(200)) AS u(i))",
        f"""dprs AS MATERIALIZED (SELECT p, iu AS u, CASE WHEN iv0 >= iu THEN iv0 + 1 ELSE iv0 END AS v FROM (
    SELECT CAST(u.i AS BIGINT) AS p,
           {_porthash_sql('u.i', f'dab{seed}:u:')} % {n} AS iu,
           {_porthash_sql('u.i', f'dab{seed}:v:')} % {n - 1} AS iv0
    FROM UNNEST(range({r})) AS u(i)))""",
        "droots AS (SELECT DISTINCT u AS id FROM dprs)",
        """dwk0(root, node, dist) AS (
    SELECT id, id, CAST(0 AS BIGINT) FROM droots
    UNION
    SELECT w.root, e.dst, w.dist + 1 FROM dwk0 w JOIN dedges0 e ON w.node = e.src WHERE w.dist < 32)""",
        "dsp0 AS MATERIALIZED (SELECT root, node, min(dist) AS dist FROM dwk0 GROUP BY root, node)",
        """dwk1(root, node, dist) AS (
    SELECT id, id, CAST(0 AS BIGINT) FROM droots
    UNION
    SELECT w.root, e.dst, w.dist + 1 FROM dwk1 w JOIN dedges1 e ON w.node = e.src WHERE w.dist < 32)""",
        "dsp1 AS MATERIALIZED (SELECT root, node, min(dist) AS dist FROM dwk1 GROUP BY root, node)",
    ]
    ctes += sigma("d0", "dedges0", "dsp0")
    ctes += sigma("d1", "dedges1", "dsp1")
    ctes.append("""d0act0 AS (SELECT p.p AS pair, p.u, p.v AS cur FROM dprs p
  WHERE EXISTS (SELECT 1 FROM dsp0 WHERE dsp0.root = p.u AND dsp0.node = p.v AND dsp0.dist > 0))""")
    w0, c0 = walk("d0", "dedges0", "d0vis", 0)
    ctes += w0
    ctes.append(f"d0contrib AS MATERIALIZED ({c0})")
    ctes.append("""dmod AS MATERIALIZED (SELECT DISTINCT coalesce(a.root, b.root) AS root
  FROM d0vis a FULL JOIN d1vis b ON a.root = b.root AND a.node = b.node
  WHERE a.root IS NULL OR b.root IS NULL OR a.dist <> b.dist OR a.sigma <> b.sigma)""")
    ctes.append("""d1act0 AS (SELECT p.p AS pair, p.u, p.v AS cur FROM dprs p
  WHERE p.u IN (SELECT root FROM dmod)
    AND EXISTS (SELECT 1 FROM dsp1 WHERE dsp1.root = p.u AND dsp1.node = p.v AND dsp1.dist > 0))""")
    w1, c1 = walk("d1", "dedges1", "d1vis", 1)
    ctes += w1
    ctes.append(f"d1contrib AS MATERIALIZED ({c1})")
    return "WITH RECURSIVE " + ",\n".join(ctes) + f""",
dallc AS (
  SELECT id FROM d0contrib WHERE u NOT IN (SELECT root FROM dmod)
  UNION ALL
  SELECT id FROM d1contrib),
dsc AS (SELECT id, count(*) / {float(r)} AS s FROM dallc GROUP BY id)
SELECT n.id, round(coalesce(dsc.s, 0.0), 6) AS score
FROM dnodes n LEFT JOIN dsc ON dsc.id = n.id
"""


def _gc_prelude(p: str) -> list[str]:
    """Prefixed sub200 prelude (edges, nodes, all-pairs sp, degrees) for
    the group-refinement replay oracles — prefixes keep CTE aliases
    unique across the method-union subqueries."""
    return [
        f"""{p}e0 AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      WHERE a.l_partkey < 200 AND b.l_partkey < 200)""",
        f"{p}edges AS MATERIALIZED (SELECT src, dst FROM {p}e0 UNION ALL SELECT dst, src FROM {p}e0)",
        f"{p}nodes AS (SELECT CAST(u.i AS BIGINT) AS id FROM UNNEST(range(200)) AS u(i))",
        f"""{p}wk(root, node, dist) AS (
    SELECT id, id, CAST(0 AS BIGINT) FROM {p}nodes
    UNION
    SELECT w.root, e.dst, w.dist + 1 FROM {p}wk w JOIN {p}edges e ON w.node = e.src WHERE w.dist < 96)""",
        f"{p}sp AS MATERIALIZED (SELECT root, node, min(dist) AS dist FROM {p}wk GROUP BY root, node)",
        f"{p}degt AS MATERIALIZED (SELECT src AS id, count(*) AS deg FROM {p}edges GROUP BY src)",
    ]


def _group_refine_sql(
    mode: str,
    rounds: int = GC_REFINE_ROUNDS,
    beam: int = GC_REFINE_BEAM,
    n: int = 200,
    k: int = 3,
) -> str:
    """(rank, id, score) oracle replaying a GroupCloseness refinement
    pass (operators/group_centrality.py local_swaps / grow_shrink /
    local_search) from the fixed seed group {0,1,2}: each unrolled round
    recomputes the exact integer farness of every evaluated
    member/candidate exchange over the all-pairs sp table and applies
    the method's accept rule; a rejected round leaves the group
    unchanged, so extra unrolled rounds are idempotent no-ops exactly
    like the Spark loop's break."""
    p = {"local_swaps": "lw", "grow_shrink": "gs", "local_search": "lc"}[mode]
    thr = repr(1.0 / (k * (n - k)))
    ctes = _gc_prelude(p)
    ctes.append(
        f"{p}g0 AS (SELECT CAST(u.i AS BIGINT) AS u FROM UNNEST([0, 1, 2]) AS u(i))"
    )
    for r in range(rounds):
        ctes.append(f"""{p}far{r} AS (SELECT CAST(sum(md) AS DOUBLE) AS f FROM (
  SELECT s.node, min(s.dist) AS md FROM {p}sp s JOIN {p}g{r} g ON s.root = g.u
  GROUP BY s.node) t)""")
        if mode == "grow_shrink":
            ctes.append(f"""{p}cand{r} AS (SELECT id AS v FROM {p}degt
  WHERE id NOT IN (SELECT u FROM {p}g{r}) ORDER BY deg DESC, id ASC LIMIT {beam})""")
            ctes.append(f"""{p}gev{r} AS (
  SELECT c.v, g.u AS root FROM {p}cand{r} c, {p}g{r} g
  UNION ALL SELECT c.v, c.v FROM {p}cand{r} c)""")
            ctes.append(f"""{p}gpick{r} AS (SELECT v FROM (
  SELECT e.v, CAST(sum(md) AS DOUBLE) AS f FROM (
    SELECT e2.v, s.node, min(s.dist) AS md FROM {p}gev{r} e2
    JOIN {p}sp s ON s.root = e2.root GROUP BY e2.v, s.node) e GROUP BY e.v)
  ORDER BY f ASC, v ASC LIMIT 1)""")
            ctes.append(f"""{p}g2_{r} AS MATERIALIZED (
  SELECT u FROM {p}g{r} UNION ALL SELECT v FROM {p}gpick{r})""")
            ctes.append(f"""{p}spick{r} AS (SELECT u, f AS nf FROM (
  SELECT e.u, CAST(sum(md) AS DOUBLE) AS f FROM (
    SELECT a.u, s.node, min(s.dist) AS md
    FROM {p}g2_{r} a JOIN {p}g2_{r} b ON b.u <> a.u
    JOIN {p}sp s ON s.root = b.u GROUP BY a.u, s.node) e GROUP BY e.u)
  ORDER BY f ASC, u ASC LIMIT 1)""")
            ctes.append(
                f"{p}acc{r} AS (SELECT u FROM {p}spick{r} "
                f"WHERE nf < (SELECT f FROM {p}far{r}))"
            )
            ctes.append(f"""{p}g{r + 1} AS MATERIALIZED (
  SELECT u FROM {p}g2_{r}
  WHERE EXISTS (SELECT 1 FROM {p}acc{r}) AND u NOT IN (SELECT u FROM {p}acc{r})
  UNION ALL
  SELECT u FROM {p}g{r} WHERE NOT EXISTS (SELECT 1 FROM {p}acc{r}))""")
        else:
            if mode == "local_swaps":
                ctes.append(f"""{p}cand{r} AS (SELECT id AS v FROM {p}degt
  WHERE id NOT IN (SELECT u FROM {p}g{r}) ORDER BY deg DESC, id ASC LIMIT {beam})""")
            else:
                ctes.append(f"""{p}cand{r} AS (SELECT id AS v FROM {p}nodes
  WHERE id NOT IN (SELECT u FROM {p}g{r}))""")
            ctes.append(f"""{p}ev{r} AS (
  SELECT g.u, c.v, g3.u AS root FROM {p}g{r} g, {p}cand{r} c, {p}g{r} g3
  WHERE g3.u <> g.u
  UNION ALL SELECT g.u, c.v, c.v FROM {p}g{r} g, {p}cand{r} c)""")
            ctes.append(f"""{p}nf{r} AS MATERIALIZED (
  SELECT u, v, CAST(sum(md) AS DOUBLE) AS nf FROM (
    SELECT e.u, e.v, s.node, min(s.dist) AS md
    FROM {p}ev{r} e JOIN {p}sp s ON s.root = e.root
    GROUP BY e.u, e.v, s.node) t GROUP BY u, v)""")
            ctes.append(
                f"{p}best{r} AS (SELECT u, v, nf FROM {p}nf{r} "
                f"ORDER BY nf ASC, u ASC, v ASC LIMIT 1)"
            )
            if mode == "local_swaps":
                acc = f"nf < (SELECT f FROM {p}far{r})"
            else:
                acc = (
                    f"(SELECT f FROM {p}far{r}) > 0 AND "
                    f"((SELECT f FROM {p}far{r}) - nf) / (SELECT f FROM {p}far{r})"
                    f" >= {thr}"
                )
            ctes.append(f"{p}acc{r} AS (SELECT u, v FROM {p}best{r} WHERE {acc})")
            ctes.append(f"""{p}g{r + 1} AS MATERIALIZED (
  SELECT u FROM {p}g{r} WHERE u NOT IN (SELECT u FROM {p}acc{r})
  UNION ALL SELECT v FROM {p}acc{r})""")
    ctes.append(f"""{p}far{rounds} AS (SELECT CAST(sum(md) AS DOUBLE) AS f FROM (
  SELECT s.node, min(s.dist) AS md FROM {p}sp s JOIN {p}g{rounds} g ON s.root = g.u
  GROUP BY s.node) t)""")
    return "WITH RECURSIVE " + ",\n".join(ctes) + f"""
SELECT CAST(row_number() OVER (ORDER BY u ASC) AS INT) AS rank, u AS id,
       CAST(NULL AS DOUBLE) AS score
FROM {p}g{rounds}
UNION ALL
SELECT 0, CAST(-1 AS BIGINT), (SELECT f FROM {p}far{rounds})
"""


def _group_harmonic_sql(k: int = 3) -> str:
    """(rank, id, score) oracle replaying group_harmonic_closeness
    (operators/group_centrality.py, portable_sum mode) k greedy rounds:
    per-candidate marginal gains are ordered list_reduce folds over the
    ascending-node term sequence — bit-identical to Spark's sorted
    F.aggregate fold — so argmax ties resolve identically; the score row
    is the same ordered fold of 1/d(S,v)."""
    p = "gh"
    ctes = _gc_prelude(p)
    ctes.append(
        f"{p}dp AS MATERIALIZED (SELECT root, node, dist FROM {p}sp WHERE dist > 0)"
    )
    ctes.append(f"{p}grp0 AS (SELECT CAST(NULL AS BIGINT) AS u WHERE 1 = 0)")
    for r in range(k):
        ctes.append(f"""{p}cr{r} AS (SELECT d.root, d.node, d.dist FROM {p}dp d
  WHERE d.root NOT IN (SELECT u FROM {p}grp{r})
    AND d.node NOT IN (SELECT u FROM {p}grp{r}))""")
        if r == 0:
            term_src = f"SELECT c.root, c.node, 1.0 / c.dist AS t FROM {p}cr{r} c"
        else:
            term_src = f"""SELECT c.root, c.node,
    CASE WHEN c.dist < coalesce(b.bd, CAST('inf' AS DOUBLE))
         THEN 1.0 / c.dist - coalesce(1.0 / b.bd, 0.0) ELSE 0.0 END AS t
  FROM {p}cr{r} c LEFT JOIN {p}hb{r} b ON b.node = c.node"""
        ctes.append(f"""{p}gf{r} AS (SELECT root AS id,
  list_reduce(list_prepend(0.0, list(t ORDER BY node ASC)), (a, b) -> a + b) AS gain
  FROM ({term_src}) x GROUP BY root)""")
        own = (
            f" - coalesce(1.0 / b.bd, 0.0)" if r > 0 else ""
        )
        bjoin = f" LEFT JOIN {p}hb{r} b ON b.node = n.id" if r > 0 else ""
        ctes.append(f"""{p}gn{r} AS (SELECT n.id, coalesce(g.gain, 0.0){own} AS gain
  FROM {p}nodes n LEFT JOIN {p}gf{r} g ON g.id = n.id{bjoin}
  WHERE n.id NOT IN (SELECT u FROM {p}grp{r}))""")
        ctes.append(
            f"{p}pk{r} AS MATERIALIZED (SELECT id FROM {p}gn{r} "
            f"ORDER BY gain DESC, id ASC LIMIT 1)"
        )
        ctes.append(f"""{p}grp{r + 1} AS MATERIALIZED (
  SELECT u FROM {p}grp{r} UNION ALL SELECT id FROM {p}pk{r})""")
        ctes.append(f"""{p}sl{r} AS (SELECT node, CAST(dist AS DOUBLE) AS nd
  FROM {p}dp WHERE root = (SELECT id FROM {p}pk{r}))""")
        if r == 0:
            ctes.append(f"""{p}hb1 AS MATERIALIZED (SELECT node, nd AS bd FROM {p}sl0
  WHERE node NOT IN (SELECT u FROM {p}grp1))""")
        else:
            ctes.append(f"""{p}hb{r + 1} AS MATERIALIZED (
  SELECT coalesce(b.node, s.node) AS node,
         least(coalesce(b.bd, s.nd), coalesce(s.nd, b.bd)) AS bd
  FROM {p}hb{r} b FULL JOIN {p}sl{r} s ON b.node = s.node
  WHERE coalesce(b.node, s.node) NOT IN (SELECT u FROM {p}grp{r + 1}))""")
    ctes.append(f"""{p}sc AS (SELECT
  list_reduce(list_prepend(0.0, list(t ORDER BY node ASC)), (a, b) -> a + b) AS sv
  FROM (SELECT node, 1.0 / bd AS t FROM {p}hb{k}) x)""")
    member_rows = "\nUNION ALL\n".join(
        f"SELECT {r + 1} AS rank, (SELECT id FROM {p}pk{r}) AS id, "
        f"CAST(NULL AS DOUBLE) AS score"
        for r in range(k)
    )
    return "WITH RECURSIVE " + ",\n".join(ctes) + f"""
{member_rows}
UNION ALL
SELECT 0, CAST(-1 AS BIGINT), (SELECT sv FROM {p}sc)
"""


def _dm_replay_ctes(steps: int = 12, seed: int = 42) -> list[str]:
    """Chained-CTE regrowth of the portable DorogovtsevMendes stream:
    step w picks edge index porthash('dm{seed}:' || w) % |E| from the
    ordinal-numbered edge list and appends (w, u), (w, v) — exactly
    generators.py::dynamic_dorogovtsev_mendes_events(portable_hash)."""
    ctes = [
        "dme3 AS (SELECT * FROM (VALUES "
        "(0, CAST(0 AS BIGINT), CAST(1 AS BIGINT)), (1, 1, 2), (2, 2, 0)"
        ") t(ord, u, v))"
    ]
    for w in range(3, 3 + steps):
        cnt = 3 + 2 * (w - 3)
        ctes.append(
            f"dmp{w} AS (SELECT u, v FROM dme{w} "
            f"WHERE ord = {_porthash_sql(str(w), f'dm{seed}:')} % {cnt})"
        )
        ctes.append(f"""dme{w + 1} AS MATERIALIZED (SELECT ord, u, v FROM dme{w}
  UNION ALL SELECT {cnt}, CAST({w} AS BIGINT), (SELECT u FROM dmp{w})
  UNION ALL SELECT {cnt + 1}, CAST({w} AS BIGINT), (SELECT v FROM dmp{w}))""")
    return ctes


def _ba_replay_ctes(steps: int = 12, seed: int = 42, attempts: int = 16) -> list[str]:
    """Chained-CTE regrowth of the portable BarabasiAlbert stream (k=2):
    node u draws ``attempts`` md5 indices over 2·|E| edge-endpoint slots
    of the ordinal edge list; the first two DISTINCT picks in attempt
    order become its targets (fewer if the budget exhausts), appended in
    sorted order — exactly generators.py::
    dynamic_barabasi_albert_events(portable_hash=True)."""
    ctes = [
        "bae2 AS (SELECT * FROM (VALUES "
        "(0, CAST(1 AS BIGINT), CAST(0 AS BIGINT))) t(ord, a, b))"
    ]
    for u in range(2, 2 + steps):
        draw = _porthash_sql(f"('{u}:' || CAST(p.i AS VARCHAR))", f"ba{seed}:")
        ctes.append(f"""ba_pk{u} AS MATERIALIZED (
  SELECT p.i AS att,
         CASE WHEN {draw} % (2 * (SELECT count(*) FROM bae{u})) % 2 = 0
              THEN e.a ELSE e.b END AS pick
  FROM UNNEST(range({attempts})) AS p(i)
  JOIN bae{u} e
    ON e.ord = ({draw} % (2 * (SELECT count(*) FROM bae{u}))) // 2)""")
        ctes.append(
            f"ba_t1{u} AS (SELECT pick FROM ba_pk{u} ORDER BY att LIMIT 1)"
        )
        ctes.append(
            f"ba_t2{u} AS (SELECT pick FROM ba_pk{u} "
            f"WHERE pick <> (SELECT pick FROM ba_t1{u}) ORDER BY att LIMIT 1)"
        )
        ctes.append(f"""bae{u + 1} AS MATERIALIZED (SELECT ord, a, b FROM bae{u}
  UNION ALL
  SELECT (SELECT count(*) FROM bae{u}) + row_number() OVER (ORDER BY pick) - 1,
         CAST({u} AS BIGINT), pick
  FROM (SELECT pick FROM ba_t1{u} UNION SELECT pick FROM ba_t2{u}) ts
  WHERE pick IS NOT NULL)""")
    return ctes


def _ff_replay_ctes(steps: int = 12, p: float = 0.3, seed: int = 42) -> list[str]:
    """Single-row recursive-CTE state machine replaying the portable
    ForestFire stream draw-for-draw (generators.py::
    dynamic_forest_fire_events(portable_hash=True)): the row carries
    (node being added v, ordinal edge list, BFS frontier, visited,
    burned, per-node draw counter); each recursion step evaluates ONE
    transition — new-step ambassador draw (md5 % v), one
    continue+victim draw pair (continue iff md5 % PRIME < ⌊p·PRIME⌋,
    victim = valid[md5 % |valid|] over the recomputed sorted unvisited
    neighbor list — identical to the Python pop-by-index order), or a
    frontier pop that finishes the step by appending (v, burned)
    edges."""
    thresh = int(p * DEFAULT_PRIME)
    pfx = f"ff{seed}:"
    return [f"""ff_st AS (
  SELECT 0 AS rn, CAST(1 AS BIGINT) AS v,
         CAST([] AS STRUCT(a BIGINT, b BIGINT)[]) AS adj,
         CAST([] AS BIGINT[]) AS frontier,
         CAST([] AS BIGINT[]) AS visited,
         CAST([] AS BIGINT[]) AS burned,
         CAST(0 AS BIGINT) AS t
  UNION ALL
  SELECT ff_st.rn + 1,
         CASE WHEN tf.c3 AND tf.fin THEN ff_st.v + 1 ELSE ff_st.v END,
         CASE WHEN tf.c3 AND tf.fin
              THEN ff_st.adj || list_transform(ff_st.burned,
                     w -> struct_pack(a := ff_st.v, b := w))
              ELSE ff_st.adj END,
         CASE WHEN tf.c1 THEN [ta.amb]
              WHEN tf.c2 THEN list_append(ff_st.frontier, tc.victim)
              ELSE ff_st.frontier[2:] END,
         CASE WHEN tf.c1 THEN [ta.amb]
              WHEN tf.c2 THEN list_append(ff_st.visited, tc.victim)
              WHEN tf.fin THEN CAST([] AS BIGINT[])
              ELSE ff_st.visited END,
         CASE WHEN tf.c1 THEN [ta.amb]
              WHEN tf.c2 THEN list_append(ff_st.burned, tc.victim)
              WHEN tf.fin THEN CAST([] AS BIGINT[])
              ELSE ff_st.burned END,
         CASE WHEN tf.c2 THEN ff_st.t + 1 ELSE CAST(0 AS BIGINT) END
  FROM ff_st,
    LATERAL (SELECT len(ff_st.frontier) = 0 AS newstep) tn,
    LATERAL (SELECT CASE WHEN tn.newstep
        THEN (md5_number_lower('{pfx}a:' || CAST(ff_st.v AS VARCHAR))
              % {DEFAULT_PRIME}) % ff_st.v
        END AS amb) ta,
    LATERAL (SELECT CASE WHEN tn.newstep THEN NULL
        ELSE ff_st.frontier[1] END AS x) tx,
    LATERAL (SELECT CASE WHEN tn.newstep THEN CAST([] AS BIGINT[])
        ELSE list_sort(list_filter(
               list_concat(
                 list_transform(list_filter(ff_st.adj, e -> e.a = tx.x), e -> e.b),
                 list_transform(list_filter(ff_st.adj, e -> e.b = tx.x), e -> e.a)),
               w -> NOT list_contains(ff_st.visited, w)))
        END AS valid) tv,
    LATERAL (SELECT
        (NOT tn.newstep) AND len(tv.valid) > 0
          AND (md5_number_lower('{pfx}c:' || CAST(ff_st.v AS VARCHAR) || ':'
               || CAST(tx.x AS VARCHAR) || ':' || CAST(ff_st.t AS VARCHAR))
               % {DEFAULT_PRIME}) < {thresh} AS cont) tk,
    LATERAL (SELECT CASE WHEN tk.cont
        THEN tv.valid[CAST((md5_number_lower('{pfx}i:' || CAST(ff_st.v AS VARCHAR)
             || ':' || CAST(tx.x AS VARCHAR) || ':' || CAST(ff_st.t AS VARCHAR))
             % {DEFAULT_PRIME}) % len(tv.valid) AS BIGINT) + 1]
        END AS victim) tc,
    LATERAL (SELECT tn.newstep AS c1,
                    tk.cont AS c2,
                    (NOT tn.newstep) AND (NOT tk.cont) AS c3,
                    (NOT tn.newstep) AND (NOT tk.cont)
                      AND len(ff_st.frontier) = 1 AS fin) tf
  WHERE ff_st.v <= {steps}
)""", "ff_fin AS (SELECT adj FROM ff_st ORDER BY rn DESC LIMIT 1)"]


def _pdist_r7_sql() -> str:
    """One-row replay of the r7 partition-dist additions: CoverF1 /
    CoverHubDominance on the cx/cy covers, portable-sample node/graph
    structural Rand, DynamicNMIDistance on the even-id restriction.
    All six columns floor-quantize to 1e-6."""
    snsr_rank = md5_mod_sql("id", salt="snsr13:")
    sgsr_rank = md5_mod_sql("src * 1000003 + dst", salt="sgsr13:")
    return f"""
WITH {GRAPH_PRELUDE_SQL},
cx AS MATERIALIZED (
  SELECT id AS node, id % 10 AS subset FROM nodes
  UNION ALL SELECT id, 10 FROM nodes WHERE id % 3 = 0),
cy AS MATERIALIZED (
  SELECT id AS node, id % 7 AS subset FROM nodes
  UNION ALL SELECT id, 7 FROM nodes WHERE id % 5 = 0),
csz AS (SELECT subset AS cs, count(*) AS csz FROM cx GROUP BY 1),
rsz AS (SELECT subset AS rs, count(*) AS rsz FROM cy GROUP BY 1),
ol AS (
  SELECT x.subset AS cs, y.subset AS rs, count(*) AS ol
  FROM cx x JOIN cy y ON x.node = y.node GROUP BY 1, 2),
bestf1 AS (
  SELECT o.cs,
         max(2.0 * (o.ol::DOUBLE / r.rsz) * (o.ol::DOUBLE / c.csz)
             / (o.ol::DOUBLE / r.rsz + o.ol::DOUBLE / c.csz)) AS f1
  FROM ol o JOIN csz c ON o.cs = c.cs JOIN rsz r ON o.rs = r.rs GROUP BY 1),
cf1 AS (
  SELECT avg(coalesce(b.f1, 0.0)) AS ua,
         sum(coalesce(b.f1, 0.0) * c.csz) / (SELECT count(*) FROM cx) AS wa
  FROM csz c LEFT JOIN bestf1 b ON c.cs = b.cs),
chd_int AS (
  SELECT x.subset, e.src, count(*) AS ideg
  FROM edges e
  JOIN cx x ON e.src = x.node JOIN cx y ON e.dst = y.node
  WHERE x.subset = y.subset AND e.src <> e.dst
  GROUP BY 1, 2),
chd_max AS (SELECT subset, max(ideg) AS mx FROM chd_int GROUP BY 1),
chd AS (
  SELECT avg(CASE WHEN c.csz > 1
                  THEN coalesce(m.mx, 0)::DOUBLE / (c.csz - 1)
                  ELSE 1.0 END) AS ua
  FROM csz c LEFT JOIN chd_max m ON c.cs = m.subset),
snsr_rk AS (
  SELECT id, row_number() OVER (ORDER BY {snsr_rank}, id) AS rk FROM nodes),
snsr AS (
  SELECT 1.0 - sum(CASE WHEN (x.id % 10 = y.id % 10) = (x.id % 7 = y.id % 7)
                        THEN 1.0 ELSE 0.0 END) / count(*) AS v
  FROM snsr_rk x JOIN snsr_rk y ON y.rk = x.rk + 1 AND x.rk <= 500),
sgsr_e AS (
  SELECT src, dst, row_number() OVER (ORDER BY {sgsr_rank}, src, dst) AS rk
  FROM e0),
sgsr AS (
  SELECT 1.0 - sum(CASE WHEN (src % 10 = dst % 10) = (src % 7 = dst % 7)
                        THEN 1.0 ELSE 0.0 END) / count(*) AS v
  FROM sgsr_e WHERE rk <= 500),
dn_nodes AS (SELECT id FROM nodes WHERE id % 2 = 0),
dn_n AS (SELECT count(*)::DOUBLE AS n FROM dn_nodes),
dn_pa AS (SELECT id % 10 AS la, count(*)::DOUBLE AS s FROM dn_nodes GROUP BY 1),
dn_pb AS (SELECT id % 7 AS lb, count(*)::DOUBLE AS s FROM dn_nodes GROUP BY 1),
dn_cells AS (SELECT id % 10 AS la, id % 7 AS lb, count(*)::DOUBLE AS s
             FROM dn_nodes GROUP BY 1, 2),
dn_mi AS (SELECT sum((c.s / (SELECT n FROM dn_n))
                     * log2(c.s * (SELECT n FROM dn_n) / (pa.s * pb.s))) AS v
          FROM dn_cells c JOIN dn_pa pa USING (la) JOIN dn_pb pb USING (lb)),
dn_ha AS (SELECT -sum((s / (SELECT n FROM dn_n)) * log2(s / (SELECT n FROM dn_n))) AS v FROM dn_pa),
dn_hb AS (SELECT -sum((s / (SELECT n FROM dn_n)) * log2(s / (SELECT n FROM dn_n))) AS v FROM dn_pb)
SELECT
  floor((SELECT ua FROM cf1) * 1e6) / 1e6 AS coverf1_uavg,
  floor((SELECT wa FROM cf1) * 1e6) / 1e6 AS coverf1_wavg,
  floor((SELECT ua FROM chd) * 1e6) / 1e6 AS cover_hub_uavg,
  floor((SELECT v FROM snsr) * 1e6) / 1e6 AS snsr,
  floor((SELECT v FROM sgsr) * 1e6) / 1e6 AS sgsr,
  floor((1.0 - 2.0 * (SELECT v FROM dn_mi)
         / ((SELECT v FROM dn_ha) + (SELECT v FROM dn_hb))) * 1e6) / 1e6 AS dyn_nmi
"""


def _lp_utils_sql() -> str:
    """r7 linkprediction-utility variants on the sub200 graph: the
    distance-2 pair set (closed form: ≥1 common neighbor, not adjacent),
    ARI with the reference's set_union quirk (b = c = |union|),
    SameCommunityIndex over id%7, byCount top-50 threshold, the
    portable RandomLinkSampler kept set, and PrecisionRecall points.
    Float variants floor-quantize to 1e-6 (dyadic .5 rounding ties
    split Spark HALF_UP from DuckDB half-even)."""
    rls_rank = md5_mod_sql("src * 1000003 + dst", salt="rls11:")
    return f"""
WITH lp_e0 AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  WHERE a.l_partkey < 200 AND b.l_partkey < 200),
lp_edges AS MATERIALIZED (
  SELECT src, dst FROM lp_e0 UNION ALL SELECT dst, src FROM lp_e0),
lp_deg AS (SELECT src AS id, count(*) AS deg FROM lp_edges GROUP BY src),
lp_cand AS (
  SELECT a.src AS u, b.dst AS v, count(*) AS common
  FROM lp_edges a JOIN lp_edges b ON a.dst = b.src
  WHERE a.src < b.dst GROUP BY 1, 2),
lp_d2 AS MATERIALIZED (
  SELECT c.u, c.v, c.common FROM lp_cand c
  LEFT JOIN lp_e0 e ON e.src = c.u AND e.dst = c.v
  WHERE e.src IS NULL),
lp_ari AS MATERIALIZED (
  SELECT d.u, d.v,
         CASE WHEN (a * b + a * c + 2 * a * dd + b * b + b * dd + c * c + c * dd) <> 0
              THEN (2 * (a * dd - b * c))
                   / (a * b + a * c + 2 * a * dd + b * b + b * dd + c * c + c * dd)
              ELSE 0.0 END AS score
  FROM (
    SELECT d.u, d.v,
           CAST(d.common AS DOUBLE) AS a,
           CAST(du.deg + dv.deg - d.common AS DOUBLE) AS b,
           CAST(du.deg + dv.deg - d.common AS DOUBLE) AS c,
           CAST(200 - (du.deg + dv.deg - d.common) AS DOUBLE) AS dd
    FROM lp_d2 d JOIN lp_deg du ON d.u = du.id JOIN lp_deg dv ON d.v = dv.id
  ) d),
lp_pr_by AS (
  SELECT CAST(common AS DOUBLE) AS s,
         sum(CASE WHEN (u * v) % 3 = 0 THEN 1.0 ELSE 0.0 END) AS p,
         sum(CASE WHEN (u * v) % 3 = 0 THEN 0.0 ELSE 1.0 END) AS nn
  FROM lp_d2 GROUP BY 1),
lp_pr_cum AS (
  SELECT s,
         sum(p) OVER (ORDER BY s DESC) AS tp,
         sum(p + nn) OVER (ORDER BY s DESC) AS pp
  FROM lp_pr_by),
lp_pr_pts AS (
  SELECT tp / (SELECT sum(p) FROM lp_pr_by) AS recall, tp / pp AS precision, s
  FROM lp_pr_cum),
lp_pr AS (
  SELECT recall, precision FROM (
    SELECT recall, precision,
           row_number() OVER (PARTITION BY recall ORDER BY s ASC) AS rk
    FROM lp_pr_pts) WHERE rk = 1)
SELECT 'mlf2' AS metric, u, v, 1.0 AS score FROM lp_d2
UNION ALL
SELECT 'ari', u, v, floor(score * 1e6) / 1e6 FROM lp_ari
UNION ALL
SELECT 'same_comm', u, v,
       CASE WHEN u % 7 = v % 7 THEN 1.0 ELSE 0.0 END FROM lp_d2
UNION ALL
SELECT 'thresh', u, v, 1.0 FROM (
  SELECT u, v, row_number() OVER (ORDER BY score DESC, u ASC, v ASC) AS rk
  FROM lp_ari) WHERE rk <= 50
UNION ALL
SELECT 'rls', src AS u, dst AS v, 1.0 FROM (
  SELECT src, dst, row_number() OVER (ORDER BY {rls_rank}, src, dst) AS rk
  FROM lp_e0) WHERE rk <= 600
UNION ALL
SELECT 'pr', CAST(floor(recall * 1e6) AS BIGINT), CAST(-1 AS BIGINT),
       floor(precision * 1e6) / 1e6 FROM lp_pr
"""


def _seir_replay_ctes(
    t_max: int, trans_p: float, e_time: int, i_time: int, seed: int
) -> list[str]:
    """Chained CTEs replaying epidemic_simulation_seir
    (operators/simulation.py) sweep-for-sweep on the sub200 co-graph
    (``ioc`` must already exist): per round, round-start-I nodes contact
    neighbors under the portable md5 draw (integer threshold compare),
    E ages to I, I ages to R, census after the sweep."""
    threshold = int(trans_p * DEFAULT_PRIME)
    ctes = [
        "seir_e AS MATERIALIZED (SELECT src, dst FROM ioc UNION ALL SELECT dst, src FROM ioc)",
        "seir_zero AS (SELECT min(src) AS z FROM seir_e)",
        """seir_s0 AS MATERIALIZED (
  SELECT CAST(u.i AS BIGINT) AS id,
         CASE WHEN u.i = (SELECT z FROM seir_zero) THEN 2 ELSE 0 END AS state,
         CAST(0 AS BIGINT) AS ts
  FROM UNNEST(range(200)) AS u(i))""",
    ]
    for t in range(t_max):
        draw = md5_mod_sql("e.src * 1000003 + e.dst", salt=f"seir{seed}.{t}:")
        ctes.append(
            f"""seir_x{t} AS (
  SELECT DISTINCT e.dst AS id FROM seir_e e
  JOIN seir_s{t} i ON e.src = i.id
  WHERE i.state = 2 AND {draw} < {threshold})"""
        )
        ctes.append(
            f"""seir_s{t + 1} AS MATERIALIZED (
  SELECT s.id,
         CASE WHEN s.state = 1 AND {t} - s.ts >= {e_time} THEN 2
              WHEN s.state = 2 AND {t} - s.ts >= {i_time} THEN 3
              WHEN s.state = 0 AND x.id IS NOT NULL THEN 1
              ELSE s.state END AS state,
         CASE WHEN (s.state = 1 AND {t} - s.ts >= {e_time})
                OR (s.state = 2 AND {t} - s.ts >= {i_time})
                OR (s.state = 0 AND x.id IS NOT NULL)
              THEN CAST({t} AS BIGINT) ELSE s.ts END AS ts
  FROM seir_s{t} s LEFT JOIN seir_x{t} x ON s.id = x.id)"""
        )
    return ctes


def _seir_census_sql(t_max: int) -> str:
    """UNION ALL tail emitting the per-round 4-compartment census."""
    return "".join(
        f"""
UNION ALL
SELECT 'seir', CAST({t} AS BIGINT), CAST(gs.s AS BIGINT), CAST(count(x.id) AS DOUBLE)
FROM (VALUES (0), (1), (2), (3)) gs(s)
LEFT JOIN seir_s{t + 1} x ON x.state = gs.s GROUP BY gs.s"""
        for t in range(t_max)
    )


def _djb2_sql(key: str) -> str:
    """DuckDB expression replaying the reference's djb2 over the
    little-endian bytes of a non-negative int64, stopping at the first
    zero byte (``overlap/HashingOverlapper.cpp:17-26``) — the exact
    column expression networkit_spark.operators.coarsening._djb2
    computes in Spark."""
    bytes_ = ", ".join(f"CAST((({key}) >> {8 * i}) & 255 AS BIGINT)" for i in range(8))
    lst = f"[{bytes_}]"
    return (
        f"list_reduce(list_prepend(CAST(5381 AS BIGINT), "
        f"CASE WHEN list_position({lst}, 0) IS NULL THEN {lst} "
        f"ELSE {lst}[1:list_position({lst}, 0) - 1] END), (h, b) -> h * 33 + b)"
    )


def _graph_coarsen_sql() -> str:
    """Oracle for the coarsening/projection/overlap variant table: ppc
    keeps the original full-graph %10 contraction; mc/mcmap/proj replay
    MatchingCoarsening under the hash-dominant one-round matching
    (two row_number windows → both-endpoint-best edges, ordinal
    carried-node coarse ids); ov2/ov3 replay HashingOverlapper byte-wise
    djb2 + dense_rank compaction."""
    ov2_key = "(xor(id % 5, 65535) << 16) | xor(id % 7, 65535)"
    ov3_raw = " + ".join(
        f"({_djb2_sql(f'(id % {m}) * {c + 2}')} & 65535)"
        for c, m in enumerate((3, 4, 5))
    )
    return f"""
WITH {GRAPH_PRELUDE_SQL},
sc_e0 AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  WHERE a.l_partkey < 200 AND b.l_partkey < 200),
sc_nodes AS (SELECT CAST(u.i AS BIGINT) AS id FROM UNNEST(range(200)) AS u(i)),
sc_h AS MATERIALIZED (
  SELECT src, dst, {md5_mod_sql("src * 1000003 + dst", salt="mc:")} AS h FROM sc_e0),
sc_inc AS (
  SELECT src AS ep, src, dst, h FROM sc_h
  UNION ALL SELECT dst, src, dst, h FROM sc_h),
sc_best AS (
  SELECT ep, src, dst FROM (
    SELECT ep, src, dst,
           row_number() OVER (PARTITION BY ep ORDER BY h, src, dst) AS rk
    FROM sc_inc) WHERE rk = 1),
sc_match AS MATERIALIZED (
  SELECT src AS u, dst AS v FROM sc_best GROUP BY src, dst HAVING count(*) = 2),
sc_carried AS MATERIALIZED (
  SELECT id, row_number() OVER (ORDER BY id) - 1 AS coarse
  FROM sc_nodes WHERE id NOT IN (SELECT v FROM sc_match)),
sc_map AS MATERIALIZED (
  SELECT id AS node, coarse FROM sc_carried
  UNION ALL
  SELECT m.v, c.coarse FROM sc_match m JOIN sc_carried c ON m.u = c.id),
sc_ce AS (
  SELECT least(a.coarse, b.coarse) AS src, greatest(a.coarse, b.coarse) AS dst,
         sum(CAST((e.src + e.dst) % 11 + 1 AS DOUBLE)) AS w
  FROM sc_e0 e JOIN sc_map a ON e.src = a.node JOIN sc_map b ON e.dst = b.node
  GROUP BY 1, 2),
sc_ov2 AS (
  SELECT id, {_djb2_sql(ov2_key)} AS raw FROM sc_nodes),
sc_ov3 AS (
  SELECT id, {ov3_raw} AS raw FROM sc_nodes)
SELECT 'ppc' AS variant, src % 10 AS src, dst % 10 AS dst,
       round(sum(CAST(CASE WHEN src % 10 = dst % 10 THEN 0.5 ELSE 1.0 END AS DOUBLE)), 6) AS weight
FROM edges GROUP BY 1, 2, 3
UNION ALL SELECT 'mc', src, dst, round(w, 6) FROM sc_ce
UNION ALL SELECT 'mcmap', node, coarse, 1.0 FROM sc_map
UNION ALL SELECT 'proj', node, coarse % 7, 1.0 FROM sc_map
UNION ALL SELECT 'ov2', id, dense_rank() OVER (ORDER BY raw) - 1, 1.0 FROM sc_ov2
UNION ALL SELECT 'ov3', id, dense_rank() OVER (ORDER BY raw) - 1, 1.0 FROM sc_ov3
"""


def _dyn_replay_sql(dm_steps: int = 12, path_steps: int = 20, seed: int = 42) -> str:
    ctes = _dm_replay_ctes(dm_steps, seed) + _ba_replay_ctes(12, seed) + _ff_replay_ctes(12, 0.3, seed)
    # io:* variants — a round-trip is the identity map, so the oracle is
    # simply the sub200 canonical edge set (+ the exact weight formulas
    # stamped by q_dyn_replay; .25-step doubles are binary-exact in both
    # engines, so round(…,6) cannot diverge).
    ctes.append(
        """ioc AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  WHERE a.l_partkey < 200 AND b.l_partkey < 200
)"""
    )
    ctes += _seir_replay_ctes(t_max=12, trans_p=0.3, e_time=2, i_time=4, seed=7)
    io_unions = "".join(
        f"""
UNION ALL
SELECT '{tag}', src, dst, {wexpr} FROM ioc"""
        for tag, wexpr in [
            ("io:nkb", "round(1.0 + ((src * 7 + dst) % 5) / 4.0, 6)"),
            ("io:nkb_int", "CAST(1 + (src + dst) % 5 AS DOUBLE)"),
            ("io:thrill", "1.0"),
            ("io:graphtool", "1.0"),
            ("io:gexf", "round(1.0 + ((src * 7 + dst) % 5) / 4.0, 6)"),
            ("io:metis", "1.0"),
            ("io:edgelist", "1.0"),
        ]
    )
    return "WITH RECURSIVE " + ",\n".join(ctes) + f"""
SELECT 'orders' AS variant, o_custkey AS src, o_orderkey + 1000000 AS dst,
       CAST(1.0 AS DOUBLE) AS weight
FROM orders WHERE o_orderstatus <> 'F'
UNION ALL
SELECT 'path', CAST(u.i AS BIGINT), CAST(u.i + 1 AS BIGINT), 1.0
FROM UNNEST(range({path_steps})) AS u(i)
UNION ALL
SELECT 'dm', least(u, v), greatest(u, v), 1.0 FROM dme{3 + dm_steps}
UNION ALL
SELECT 'ba', least(a, b), greatest(a, b), 1.0 FROM bae{2 + 12}
UNION ALL
SELECT 'ff', least(u.e.a, u.e.b), greatest(u.e.a, u.e.b), 1.0
FROM ff_fin, UNNEST(ff_fin.adj) AS u(e){io_unions}{_seir_census_sql(12)}
UNION ALL
SELECT 'diff:rm', src, dst, 0.0 FROM ioc WHERE (src * dst) % 7 = 0
UNION ALL
SELECT 'diff:add', CAST(2 * u.i AS BIGINT), CAST(2 * u.i + 1 AS BIGINT), 9.0
FROM UNNEST(range(10)) AS u(i)
WHERE NOT EXISTS (SELECT 1 FROM ioc
                  WHERE src = 2 * u.i AND dst = 2 * u.i + 1)
UNION ALL
SELECT 'diff:wu', src, dst, CAST((src + dst) % 11 + 3 AS DOUBLE) FROM ioc
WHERE (src * dst) % 7 <> 0 AND (src + dst) % 3 = 0
"""


PPR_ITERS = 40  # measured PPR convergence at sf0.01 = iteration 19 (δ≤1e-6)
GCE_ROUNDS = 12  # mirrors q_graph_gce's max_iterations cap


def _nibble_sql(iters: int = PPR_ITERS, alpha: float = 0.5, tol: float = 1e-6) -> str:
    """CTE text replaying pagerank_nibble (operators/scd.py): power-
    iteration PPR unrolled with the same delta<=tol stopping rule (the
    scores at the FIRST converged iteration are used, extra iterations
    are dead CTEs), then the conductance sweep over the support ranked
    by score/wdeg. Returns a fragment ending in CTE ``nibble(id)``;
    expects e0 to exist."""
    ctes = [
        "edges AS MATERIALIZED (SELECT src, dst, CAST(1.0 AS DOUBLE) AS weight FROM e0 UNION ALL SELECT dst, src, 1.0 FROM e0)",
        "gwdeg AS MATERIALIZED (SELECT src AS id, sum(weight) AS wdeg FROM edges GROUP BY src)",
        "ed AS MATERIALIZED (SELECT e.src, e.dst, e.weight / w.wdeg AS frac FROM edges e JOIN gwdeg w ON w.id = e.src)",
        f"restart AS (SELECT CAST(0 AS BIGINT) AS id, CAST({1.0 - alpha} AS DOUBLE) AS restart)",
        "psc0 AS (SELECT id, restart AS score FROM restart)",
    ]
    for k in range(1, iters + 1):
        ctes.append(f"""pg{k} AS (SELECT e.dst AS id, sum(e.frac * s.score) AS gather
      FROM ed e JOIN psc{k - 1} s ON s.id = e.src GROUP BY e.dst)""")
        ctes.append(f"""psc{k} AS MATERIALIZED (SELECT coalesce(g.id, r.id) AS id,
      coalesce(r.restart, 0.0) + {alpha} * coalesce(g.gather, 0.0) AS score
      FROM pg{k} g FULL JOIN restart r ON r.id = g.id)""")
        ctes.append(f"""pdl{k} AS (SELECT sum(abs(coalesce(n.score, 0.0) - coalesce(o.score, 0.0))) AS d
      FROM psc{k} n FULL JOIN psc{k - 1} o ON o.id = n.id)""")
    alls = " UNION ALL ".join(
        f"SELECT {k} AS it, id, score FROM psc{k}" for k in range(1, iters + 1)
    )
    alld = " UNION ALL ".join(
        f"SELECT {k} AS it, d FROM pdl{k}" for k in range(1, iters + 1)
    )
    ctes.append(f"pallsc AS ({alls})")
    ctes.append(f"palld AS ({alld})")
    ctes.append(f"pstop AS (SELECT coalesce(min(it), {iters}) AS s FROM palld WHERE d <= {tol})")
    ctes.append("ppr AS MATERIALIZED (SELECT id, score FROM pallsc, pstop WHERE it = pstop.s)")
    ctes.append("supp AS (SELECT id, score FROM ppr WHERE score > 1e-9)")
    ctes.append("tv AS (SELECT sum(wdeg) AS total_vol FROM gwdeg)")
    ctes.append("""rk AS MATERIALIZED (SELECT s.id, w.wdeg,
      row_number() OVER (ORDER BY s.score / w.wdeg DESC, s.id ASC) AS rank
      FROM supp s JOIN gwdeg w ON w.id = s.id WHERE w.wdeg > 0)""")
    ctes.append("""ia AS (SELECT greatest(ru.rank, rv.rank) AS rank, CAST(count(*) AS DOUBLE) AS internal_w
      FROM e0 e JOIN rk ru ON ru.id = e.src JOIN rk rv ON rv.id = e.dst GROUP BY 1)""")
    ctes.append("""sweep AS (SELECT rk.id, rk.rank,
      sum(rk.wdeg) OVER (ORDER BY rk.rank ROWS UNBOUNDED PRECEDING) AS vol,
      2.0 * sum(coalesce(ia.internal_w, 0.0)) OVER (ORDER BY rk.rank ROWS UNBOUNDED PRECEDING) AS int2
      FROM rk LEFT JOIN ia ON ia.rank = rk.rank)""")
    ctes.append("""sphi AS (SELECT id, rank, CASE WHEN least(vol, tv.total_vol - vol) > 0
      THEN (vol - int2) / least(vol, tv.total_vol - vol)
      ELSE CAST('inf' AS DOUBLE) END AS phi FROM sweep, tv)""")
    ctes.append("bst AS (SELECT rank FROM sphi ORDER BY phi ASC, rank ASC LIMIT 1)")
    ctes.append("nibble AS (SELECT id FROM sphi, bst WHERE sphi.rank <= bst.rank)")
    return ",\n".join(ctes)


def _gce_sql(rounds: int = GCE_ROUNDS) -> str:
    """CTE text replaying gce (operators/scd.py, objective M) from seed
    0: per round the shell node with the best ΔQ (ties by smallest id)
    joins while ΔQ > 0; rejected rounds are self-stabilizing no-ops.
    All weights are 1.0 on this graph so the scalar state arithmetic is
    integer-valued doubles — cross-engine exact. Ends in ``com{rounds}``;
    expects e0 to exist."""
    inf = "CAST('inf' AS DOUBLE)"
    ctes = [
        "gsym AS MATERIALIZED (SELECT src, dst, CAST(1.0 AS DOUBLE) AS weight FROM e0 UNION ALL SELECT dst, src, 1.0 FROM e0)",
        "ggwdeg AS MATERIALIZED (SELECT src AS id, sum(weight) AS wdeg FROM gsym GROUP BY src)",
        "com0 AS (SELECT CAST(0 AS BIGINT) AS node)",
        """gst0 AS (SELECT
    coalesce((SELECT sum(s.weight) FROM gsym s
       WHERE s.src IN (SELECT node FROM com0) AND s.dst IN (SELECT node FROM com0)), 0.0) / 2.0 AS iw,
    coalesce((SELECT sum(s.weight) FROM gsym s
       WHERE s.src IN (SELECT node FROM com0) AND s.dst NOT IN (SELECT node FROM com0)), 0.0) AS cut)""",
        "gq0 AS (SELECT CASE WHEN cut > 0 THEN iw / cut ELSE 0.0 END AS q, iw, cut FROM gst0)",
    ]
    for k in range(1, rounds + 1):
        pq = k - 1
        ctes.append(f"""gsh{k} AS (
  SELECT t.node, t.intdeg, w.wdeg - t.intdeg AS extdeg FROM (
    SELECT s.src AS node, sum(s.weight) AS intdeg FROM gsym s
    WHERE s.dst IN (SELECT node FROM com{pq}) AND s.src NOT IN (SELECT node FROM com{pq})
    GROUP BY s.src) t JOIN ggwdeg w ON w.id = t.node)""")
        ctes.append(f"""gbst{k} AS (
  SELECT s.node, s.intdeg, s.extdeg,
    CASE WHEN (q.cut - s.intdeg + s.extdeg) > 0
         THEN (q.iw + s.intdeg) / (q.cut - s.intdeg + s.extdeg)
         ELSE {inf} END AS qnew
  FROM gsh{k} s, gq{pq} q ORDER BY qnew DESC, s.node ASC LIMIT 1)""")
        ctes.append(f"gacc{k} AS MATERIALIZED (SELECT b.* FROM gbst{k} b, gq{pq} q WHERE b.qnew - q.q > 0)")
        ctes.append(f"com{k} AS MATERIALIZED (SELECT node FROM com{pq} UNION ALL SELECT node FROM gacc{k})")
        ctes.append(f"""gq{k} AS MATERIALIZED (SELECT
    CASE WHEN ncut > 0 THEN niw / ncut ELSE {inf} END AS q, niw AS iw, ncut AS cut FROM (
      SELECT q.iw + coalesce((SELECT intdeg FROM gacc{k}), 0.0) AS niw,
             q.cut - coalesce((SELECT intdeg FROM gacc{k}), 0.0) + coalesce((SELECT extdeg FROM gacc{k}), 0.0) AS ncut
      FROM gq{pq} q) t)""")
    return ",\n".join(ctes)


TCE_ROUNDS = 8  # mirrors q_graph_scd's tce max_iterations cap


def _tce_sql(rounds: int = TCE_ROUNDS) -> str:
    """CTE text replaying tce (operators/scd.py, portable_sum mode) from
    seed 0: per round every shell node is scored by its triangle-
    reinforced attachment Σ_u (w + common)/(min(wdeg)·deg), the best
    (ties → smallest id) joins iff conductance improves, rejects are
    benched until an accepted neighbor re-opens them. The per-node score
    folds its per-u terms in ascending-u order (list_reduce), exactly
    the ordered fold Spark's portable_sum mode runs — so the float sums
    are bit-identical across engines; every other quantity is an
    integer-valued double. Ends in ``tcom{rounds}``; expects e0, gsym,
    ggwdeg (from _gce_sql) to exist."""
    ctes = [
        "tdeg AS MATERIALIZED (SELECT src AS id, count(*) AS deg FROM gsym GROUP BY src)",
        "tcom0 AS (SELECT CAST(0 AS BIGINT) AS node)",
        "trej0 AS (SELECT CAST(NULL AS BIGINT) AS v WHERE 1 = 0)",
        """tst0 AS (SELECT
    coalesce((SELECT sum(s.weight) FROM gsym s
       WHERE s.src IN (SELECT node FROM tcom0)), 0.0) AS vol,
    coalesce((SELECT sum(s.weight) FROM gsym s
       WHERE s.src IN (SELECT node FROM tcom0)
         AND s.dst NOT IN (SELECT node FROM tcom0)), 0.0) AS cut)""",
    ]
    for k in range(1, rounds + 1):
        p = k - 1
        ctes.append(f"""tsh{k} AS MATERIALIZED (
  SELECT s.src AS u, s.dst AS v, s.weight AS wuv FROM gsym s
  WHERE s.src IN (SELECT node FROM tcom{p})
    AND s.dst NOT IN (SELECT node FROM tcom{p})
    AND s.dst NOT IN (SELECT v FROM trej{p}))""")
        ctes.append(f"""ttr{k} AS (
  SELECT sh.u, sh.v, sum(least(b.weight, a.weight)) AS ts
  FROM tsh{k} sh
  JOIN gsym a ON a.src = sh.u
  JOIN gsym b ON b.src = sh.v AND b.dst = a.dst
  GROUP BY sh.u, sh.v)""")
        ctes.append(f"""tsc{k} AS MATERIALIZED (
  SELECT v,
    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(s ORDER BY u)),
                (a, b) -> a + b) AS score,
    sum(wuv) AS cut_v
  FROM (
    SELECT sh.v, sh.u, sh.wuv,
      (sh.wuv + coalesce(t.ts, 0.0))
        / (least(wv.wdeg, wu.wdeg) * dv.deg) AS s
    FROM tsh{k} sh
    LEFT JOIN ttr{k} t ON t.u = sh.u AND t.v = sh.v
    JOIN ggwdeg wu ON wu.id = sh.u
    JOIN ggwdeg wv ON wv.id = sh.v
    JOIN tdeg dv ON dv.id = sh.v) z
  GROUP BY v)""")
        ctes.append(f"""tbs{k} AS MATERIALIZED (
  SELECT z.v, z.score, z.cut_v, w.wdeg AS vvol
  FROM tsc{k} z JOIN ggwdeg w ON w.id = z.v
  ORDER BY z.score DESC, z.v ASC LIMIT 1)""")
        ctes.append(f"""tac{k} AS MATERIALIZED (
  SELECT b.* FROM tbs{k} b, tst{p} q
  WHERE q.vol > 0
    AND (q.cut + b.vvol - 2 * b.cut_v) / (q.vol + b.vvol) < q.cut / q.vol)""")
        ctes.append(
            f"tcom{k} AS MATERIALIZED (SELECT node FROM tcom{p} "
            f"UNION ALL SELECT v AS node FROM tac{k})"
        )
        ctes.append(f"""trej{k} AS MATERIALIZED (
  SELECT r.v FROM trej{p} r
  WHERE NOT EXISTS (SELECT 1 FROM tac{k} a JOIN gsym e
                    ON e.src = a.v AND e.dst = r.v)
  UNION ALL
  SELECT b.v FROM tbs{k} b WHERE NOT EXISTS (SELECT 1 FROM tac{k}))""")
        ctes.append(f"""tst{k} AS MATERIALIZED (
  SELECT q.vol + coalesce((SELECT vvol FROM tac{k}), 0.0) AS vol,
         q.cut + coalesce((SELECT vvol - 2 * cut_v FROM tac{k}), 0.0) AS cut
  FROM tst{p} q)""")
    return ",\n".join(ctes)


def _scd_sql() -> str:
    """(method, node) oracle for graph_scd: PageRankNibble + GCE + TCE
    replay."""
    rbfs_rank = md5_mod_sql("node", salt="rbfsl7:")
    return f"""WITH RECURSIVE e0 AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      WHERE a.l_partkey < 200 AND b.l_partkey < 200),
{_nibble_sql()},
{_gce_sql()},
{_tce_sql()},
rwalk(root, node, dist) AS (
  SELECT u.r, CAST(u.r AS BIGINT), CAST(0 AS BIGINT) FROM (SELECT UNNEST([0, 1]) AS r) u
  UNION
  SELECT w.root, e.dst, w.dist + 1 FROM rwalk w JOIN edges e ON w.node = e.src
  WHERE w.dist < 96),
rd AS MATERIALIZED (SELECT root, node, min(dist) AS dist FROM rwalk GROUP BY 1, 2),
rb_rk AS (
  SELECT root, node, dist,
         row_number() OVER (PARTITION BY root, dist ORDER BY {rbfs_rank}, node) AS rkl,
         (SELECT count(*) FROM rd dd WHERE dd.root = rd.root AND dd.dist < rd.dist) AS pc
  FROM rd),
rb0 AS MATERIALIZED (SELECT node FROM rb_rk WHERE root = 0 AND pc + rkl <= 40),
rb1 AS MATERIALIZED (SELECT node FROM rb_rk WHERE root = 1 AND pc + rkl <= 30),
sc AS (
  SELECT CASE WHEN v.vol > 0 AND (2 * m.m - v.vol) > 0
              THEN CAST(c.cut AS DOUBLE) / least(v.vol, 2 * m.m - v.vol)
              ELSE 1.0 END AS phi
  FROM (SELECT count(*) AS cut FROM edges e JOIN rb0 a ON e.src = a.node
        WHERE e.dst NOT IN (SELECT node FROM rb0)) c,
       (SELECT count(*) AS vol FROM edges e JOIN rb0 a ON e.src = a.node) v,
       (SELECT count(*) AS m FROM e0) m),
gtc0 AS (SELECT (SELECT count(*) FROM rb0 WHERE node % 5 = 0) AS ol,
                (SELECT count(*) FROM rb0) AS fsz),
gtc1 AS (SELECT (SELECT count(*) FROM rb1 WHERE node % 5 = 1) AS ol,
                (SELECT count(*) FROM rb1) AS fsz)
SELECT 'nibble' AS method, id AS node FROM nibble
UNION ALL
SELECT 'gce' AS method, node FROM com{GCE_ROUNDS}
UNION ALL
SELECT 'tce' AS method, node FROM tcom{TCE_ROUNDS}
UNION ALL
SELECT 'rbfs', node FROM rb0
UNION ALL
SELECT 'setcond', CAST(floor(phi * 1e6) AS BIGINT) FROM sc
UNION ALL
SELECT 'gtc', CAST(0 * 10000000
       + floor(CAST(ol AS DOUBLE) / (fsz + 40 - ol) * 1e6) AS BIGINT) FROM gtc0
UNION ALL
SELECT 'gtc', CAST(1 * 10000000
       + floor(CAST(ol AS DOUBLE) / (fsz + 40 - ol) * 1e6) AS BIGINT) FROM gtc1
"""


PLM_ROUNDS = 4  # mirrors q_graph_plm's max_rounds; levels fixed at 2


def _plm_level_ctes(level: int, rounds: int, gamma: float, gate_extra: str) -> list[str]:
    """One PLM local-moving phase as chained CTEs (mirror of
    operators/louvain.py::_local_moving with portable_hash). Expects
    ed{L}(src,dst,w), nl{L}, vol{L}(id,vol), t{L}(total), lab{L}_0.
    Implements the same quiet>=2 early stop by suppressing later rounds'
    move CTEs when two consecutive rounds moved nothing. Weights and
    volumes are integer/half-integer doubles, so the modularity-gain
    arithmetic is bit-identical across engines."""
    L = level
    ctes = []
    for r in range(1, rounds + 1):
        prev = f"lab{L}_{r - 1}"
        stops = ""
        if r >= 3:
            clauses = [
                f"NOT ((SELECT c FROM mc{L}_{k}) = 0 AND (SELECT c FROM mc{L}_{k + 1}) = 0)"
                for k in range(1, r - 1)
            ]
            stops = " AND " + " AND ".join(clauses)
        ctes.append(f"""cv{L}_{r} AS (SELECT l.label, sum(v.vol) AS cvol
  FROM {prev} l JOIN vol{L} v ON v.id = l.node GROUP BY l.label)""")
        ctes.append(f"""af{L}_{r} AS MATERIALIZED (SELECT e.src AS node, l.label AS cand, sum(e.w) AS aff
  FROM nl{L} e JOIN {prev} l ON l.node = e.dst GROUP BY e.src, l.label)""")
        ctes.append(f"""cd{L}_{r} AS (
  SELECT a.node, a.cand,
    (a.aff - coalesce(own.aff, 0.0)) / t.total
    + {gamma} * ((cvc.cvol - v.vol) - cvd.cvol) * v.vol / (2.0 * t.total * t.total) AS delta
  FROM af{L}_{r} a
  JOIN {prev} c ON c.node = a.node
  LEFT JOIN af{L}_{r} own ON own.node = a.node AND own.cand = c.label
  JOIN vol{L} v ON v.id = a.node
  JOIN cv{L}_{r} cvc ON cvc.label = c.label
  JOIN cv{L}_{r} cvd ON cvd.label = a.cand
  CROSS JOIN t{L} t
  WHERE ({_porthash_sql('a.node', f'plm{r - 1}:')} % 2 = 0) AND a.cand <> c.label)""")
        ctes.append(f"""mv{L}_{r} AS MATERIALIZED (SELECT node, cand AS new_label FROM (
   SELECT node, cand, delta, row_number() OVER (PARTITION BY node ORDER BY delta DESC, cand ASC) AS rn
   FROM cd{L}_{r}) z WHERE rn = 1 AND delta > 0{stops}{gate_extra})""")
        ctes.append(f"""lab{L}_{r} AS MATERIALIZED (SELECT l.node, coalesce(m.new_label, l.label) AS label
   FROM {prev} l LEFT JOIN mv{L}_{r} m ON m.node = l.node)""")
        ctes.append(f"mc{L}_{r} AS (SELECT count(*) AS c FROM mv{L}_{r})")
    return ctes


def _plm_sql(rounds: int = PLM_ROUNDS, gamma: float = 1.0) -> str:
    """(node, label) oracle for graph_plm: exact replay of the two-level
    portable-hash PLM — level-1 move rounds on the sub200 graph,
    ParallelPartitionCoarsening contraction (same-label non-loop weight
    halved into the supernode self-loop), level-2 move rounds gated on
    level 1 having moved AND contracted, then label prolongation."""
    mvsum = " + ".join(f"(SELECT c FROM mc1_{k})" for k in range(1, rounds + 1))
    ctes = [
        """e0 AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      WHERE a.l_partkey < 200 AND b.l_partkey < 200)""",
        "nodes AS MATERIALIZED (SELECT CAST(u.i AS BIGINT) AS id FROM UNNEST(range(200)) AS u(i))",
        "ed1 AS MATERIALIZED (SELECT src, dst, CAST(1.0 AS DOUBLE) AS w FROM e0 UNION ALL SELECT dst, src, 1.0 FROM e0)",
        "nl1 AS (SELECT * FROM ed1 WHERE src <> dst)",
        "vol1 AS MATERIALIZED (SELECT n.id, coalesce(d.wdeg, 0.0) AS vol FROM nodes n LEFT JOIN (SELECT src AS id, sum(w) AS wdeg FROM ed1 GROUP BY src) d ON d.id = n.id)",
        "t1 AS (SELECT sum(CASE WHEN src = dst THEN w ELSE w / 2 END) AS total FROM ed1)",
        "lab1_0 AS (SELECT id AS node, id AS label FROM nodes)",
    ]
    ctes += _plm_level_ctes(1, rounds, gamma, "")
    ctes += [
        f"flab AS MATERIALIZED (SELECT node, label FROM lab1_{rounds})",
        f"""lvl2go AS (SELECT (
    ({mvsum}) > 0
    AND (SELECT count(DISTINCT label) FROM flab) < (SELECT count(*) FROM nodes)) AS go)""",
        """ed2 AS MATERIALIZED (SELECT lu AS src, lv AS dst,
    sum(CASE WHEN lu = lv AND x.src <> x.dst THEN x.w / 2 ELSE x.w END) AS w
  FROM (SELECT e.src, e.dst, e.w, a.label AS lu, b.label AS lv
        FROM ed1 e JOIN flab a ON a.node = e.src JOIN flab b ON b.node = e.dst) x
  GROUP BY lu, lv)""",
        "nodes2 AS (SELECT DISTINCT label AS id FROM flab)",
        "nl2 AS (SELECT src, dst, w FROM ed2 WHERE src <> dst)",
        """vol2 AS MATERIALIZED (SELECT n.id,
    coalesce(d.wdeg, 0.0) + coalesce(l.loop_w, 0.0) AS vol
  FROM nodes2 n
  LEFT JOIN (SELECT src AS id, sum(w) AS wdeg FROM ed2 GROUP BY src) d ON d.id = n.id
  LEFT JOIN (SELECT src AS id, sum(w) AS loop_w FROM ed2 WHERE src = dst GROUP BY src) l ON l.id = n.id)""",
        "t2 AS (SELECT sum(CASE WHEN src = dst THEN w ELSE w / 2 END) AS total FROM ed2)",
        "lab2_0 AS (SELECT id AS node, id AS label FROM nodes2)",
    ]
    ctes += _plm_level_ctes(2, rounds, gamma, " AND (SELECT go FROM lvl2go)")
    return "WITH " + ",\n".join(ctes) + f"""
SELECT f.node, l2.label FROM flab f JOIN lab2_{rounds} l2 ON l2.node = f.label
"""


def _lpdo_sql(sweeps: int = LPDO_SWEEPS, buckets: int = 10) -> str:
    """(node, label) oracle for the lpdo graph_plm variant: exact replay
    of lp_degree_ordered(degree_buckets='log2') — per sweep, the 10
    possible ⌊log2(deg)⌋ classes fire in ascending order (empty classes
    are no-ops), each class reading the labels left by the previous one;
    dominant-label counts are integers, so the replay is exact."""
    ctes = [
        SUB200_PRELUDE_NOWALK_SQL.strip(),
        """ldg AS MATERIALIZED (SELECT n.id,
    CASE WHEN coalesce(d.c, 0) >= 1
         THEN length(bin(coalesce(d.c, 0))) - 1 ELSE -1 END AS bucket
  FROM nodes n LEFT JOIN (SELECT src AS id, count(*) AS c
                          FROM edges GROUP BY src) d USING (id))""",
        "ll0 AS (SELECT id AS node, id AS label FROM nodes)",
    ]
    idx = 0
    for _s in range(sweeps):
        for b in range(buckets):
            idx += 1
            ctes.append(f"""lc{idx} AS (
  SELECT e.dst AS node, l.label AS nl, count(*) AS c
  FROM edges e JOIN ll{idx - 1} l ON l.node = e.src
  WHERE e.dst IN (SELECT id FROM ldg WHERE bucket = {b})
  GROUP BY e.dst, l.label)""")
            ctes.append(f"""ld{idx} AS (SELECT node, nl AS dom FROM (
  SELECT node, nl,
    row_number() OVER (PARTITION BY node ORDER BY c DESC, nl ASC) AS rn
  FROM lc{idx}) z WHERE rn = 1)""")
            ctes.append(f"""ll{idx} AS MATERIALIZED (
  SELECT l.node, coalesce(d.dom, l.label) AS label
  FROM ll{idx - 1} l LEFT JOIN ld{idx} d ON d.node = l.node)""")
    return "WITH " + ",\n".join(ctes) + f"\nSELECT node, label FROM ll{idx}\n"


LME_ROUNDS = 3
AGGC_ROUNDS = 2
AGGC_INNER = 20  # local-max matching converges in 16 rounds at sf0.01; margin


def _aggc_sql(rounds: int = AGGC_ROUNDS, inner: int = AGGC_INNER) -> str:
    """(node, label) oracle for the aggc graph_plm variant: exact replay
    of agglomerative_clusterer(max_rounds=rounds) on sub200 — per outer
    round the Δmod edge scores (2·tw·w − vol_u·vol_v)/(2·tw)², a
    LocalMax matching replay over those scores, the contraction with the
    ParallelPartitionCoarsening w/2 self-loop convention, and the
    reference's discard-before-adopt stop conditions (cn ≥
    min_communities and matched/n > rel_repeat_threshold) folded into a
    per-round ok flag. All weights and volumes stay dyadic rationals
    (1.0 edges halved at most once per level), so every score both
    engines compute is bit-identical."""
    ctes = [
        SUB200_PRELUDE_NOWALK_SQL.strip(),
        "aed1 AS (SELECT src, dst, CAST(1.0 AS DOUBLE) AS weight FROM edges)",
        "anod1 AS (SELECT id FROM nodes)",
        "amap0 AS (SELECT id AS node, id AS label FROM nodes)",
        "aok0 AS (SELECT TRUE AS ok)",
    ]
    for r in range(1, rounds + 1):
        ctes.append(f"""atw{r} AS (SELECT coalesce(sum(
    CASE WHEN src = dst THEN weight ELSE weight / 2 END), 0.0) AS tw
  FROM aed{r})""")
        ctes.append(f"an{r} AS (SELECT count(*) AS n FROM anod{r})")
        ctes.append(f"""avol{r} AS (SELECT src AS id, sum(weight) AS vol
  FROM aed{r} WHERE src <> dst GROUP BY src)""")
        ctes.append(f"""acw{r} AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS src, greatest(src, dst) AS dst, weight
  FROM aed{r} WHERE src <> dst)""")
        ctes.append(f"""asc{r} AS MATERIALIZED (
  SELECT c.src, c.dst,
    (2.0 * t.tw * c.weight - vu.vol * vv.vol) / (4.0 * t.tw * t.tw) AS w
  FROM acw{r} c
  JOIN avol{r} vu ON vu.id = c.src
  JOIN avol{r} vv ON vv.id = c.dst
  CROSS JOIN atw{r} t)""")
        ctes.append(_localmax_rounds_sql(inner, "w", f"ag{r}_", f"asc{r}"))
        allm = " UNION ALL ".join(
            f"SELECT src, dst FROM ag{r}_cand{k}" for k in range(1, inner + 1)
        )
        ctes.append(f"amt{r} AS MATERIALIZED ({allm})")
        ctes.append(f"""aok{r} AS (SELECT
    (SELECT ok FROM aok{r - 1})
    AND c > 0 AND (n - c) >= 2 AND CAST(c AS DOUBLE) / n > 0.005 AS ok
  FROM (SELECT count(*) AS c FROM amt{r}), an{r})""")
        ctes.append(f"""alab{r} AS MATERIALIZED (
  SELECT n.id AS node, coalesce(m.rep, n.id) AS label
  FROM anod{r} n LEFT JOIN (
    SELECT src AS id, src AS rep FROM amt{r}
    UNION ALL SELECT dst, src FROM amt{r}) m USING (id))""")
        ctes.append(f"""amap{r} AS MATERIALIZED (
  SELECT mp.node,
    CASE WHEN (SELECT ok FROM aok{r}) THEN l2.label ELSE mp.label END AS label
  FROM amap{r - 1} mp LEFT JOIN alab{r} l2 ON l2.node = mp.label)""")
        if r < rounds:
            ctes.append(f"""aed{r + 1} AS MATERIALIZED (
  SELECT a.label AS src, b.label AS dst,
    sum(CASE WHEN a.label = b.label AND e.src <> e.dst
             THEN e.weight / 2 ELSE e.weight END) AS weight
  FROM aed{r} e JOIN alab{r} a ON a.node = e.src
  JOIN alab{r} b ON b.node = e.dst
  GROUP BY a.label, b.label)""")
            ctes.append(
                f"anod{r + 1} AS (SELECT DISTINCT label AS id FROM alab{r})"
            )
    return "WITH " + ",\n".join(ctes) + f"\nSELECT node, label FROM amap{rounds}\n"


def _lme_sql(rounds: int = LME_ROUNDS) -> str:
    """(node, label) oracle for the lme graph_plm variant: exact replay
    of louvain_map_equation(portable_hash=True) on sub200 — per round
    the cluster cut/volume tables, the md5 half-gating, and the
    reference fitnessChange formula under p·log(p/totalVolume). Every
    plogp INPUT is an integer-valued double (exact), and the operator's
    portable mode quantizes the delta to 1e-12 before compare — wide
    enough to absorb the ≤1-ulp cross-engine ln() difference, tight
    enough that distinct deltas never collide. sub200 has no self-loops,
    so the loop terms are literal zero."""

    def P(e: str) -> str:
        return (
            f"CASE WHEN ({e}) > 0 THEN (({e}) / t.tv) * ln(({e}) / t.tv) "
            f"ELSE 0.0 END"
        )

    move = (
        P("tc.tc + cdc + cdt")
        + f" + (({P('cut_t + cdt + vol_t + vol')} - {P('cut_t + vol_t')})"
        + f" - 2.0 * ({P('cut_t + cdt')} - {P('cut_t')}))"
    )
    stay = (
        P("tc.tc")
        + f" + (({P('cut_cur + vol_cur')} - {P('cut_cur + cdc + vol_cur - vol')})"
        + f" - 2.0 * ({P('cut_cur')} - {P('cut_cur + cdc')}))"
    )
    ctes = [
        SUB200_PRELUDE_NOWALK_SQL.strip(),
        "mle AS MATERIALIZED (SELECT src, dst, CAST(1.0 AS DOUBLE) AS weight FROM edges)",
        """mvol AS MATERIALIZED (SELECT n.id, coalesce(d.w, 0.0) AS vol
  FROM nodes n LEFT JOIN (SELECT src AS id, sum(weight) AS w
                          FROM mle GROUP BY src) d USING (id))""",
        "mtv AS (SELECT sum(vol) AS tv FROM mvol)",
        "mlab0 AS (SELECT id AS node, id AS label FROM nodes)",
    ]
    for r in range(rounds):
        p = f"mlab{r}"
        ctes.append(f"""mcc{r} AS (SELECT a.label, sum(e.weight) AS cut
  FROM mle e JOIN {p} a ON a.node = e.src JOIN {p} b ON b.node = e.dst
  WHERE a.label <> b.label GROUP BY a.label)""")
        ctes.append(f"""mcs{r} AS MATERIALIZED (
  SELECT cv.label, cv.cvol, coalesce(cc.cut, 0.0) AS cut
  FROM (SELECT l.label, sum(v.vol) AS cvol
        FROM {p} l JOIN mvol v ON v.id = l.node GROUP BY l.label) cv
  LEFT JOIN mcc{r} cc USING (label))""")
        ctes.append(f"mtc{r} AS (SELECT coalesce(sum(cut), 0.0) AS tc FROM mcs{r})")
        ctes.append(f"""maf{r} AS MATERIALIZED (
  SELECT e.src AS node, b.label AS cand, sum(e.weight) AS aff
  FROM mle e JOIN {p} b ON b.node = e.dst GROUP BY e.src, b.label)""")
        ctes.append(f"""mjn{r} AS (
  SELECT a.node, a.cand, a.aff, coalesce(own.aff, 0.0) AS w_cur, v.vol,
         sc.cvol AS vol_cur, sc.cut AS cut_cur,
         st.cvol AS vol_t, st.cut AS cut_t
  FROM maf{r} a
  JOIN {p} c ON c.node = a.node
  LEFT JOIN maf{r} own ON own.node = a.node AND own.cand = c.label
  JOIN mvol v ON v.id = a.node
  JOIN mcs{r} sc ON sc.label = c.label
  JOIN mcs{r} st ON st.label = a.cand
  WHERE ({_porthash_sql('a.node', f'lme{r}:')} % 2 = 0) AND a.cand <> c.label)""")
        ctes.append(f"""mdl{r} AS MATERIALIZED (
  SELECT j.node, j.cand, round(({move}) - ({stay}), 12) AS delta
  FROM (SELECT *, 2.0 * w_cur - vol + 2.0 * 0.0 AS cdc,
               vol - 2.0 * aff - 2.0 * 0.0 AS cdt FROM mjn{r}) j
  CROSS JOIN mtv t CROSS JOIN mtc{r} tc)""")
        ctes.append(f"""mmv{r} AS MATERIALIZED (SELECT node, cand AS new_label FROM (
  SELECT node, cand, delta,
    row_number() OVER (PARTITION BY node ORDER BY delta ASC, cand ASC) AS rn
  FROM mdl{r}) z WHERE rn = 1 AND delta < -1e-15)""")
        ctes.append(f"""mlab{r + 1} AS MATERIALIZED (
  SELECT l.node, coalesce(m.new_label, l.label) AS label
  FROM {p} l LEFT JOIN mmv{r} m ON m.node = l.node)""")
    return "WITH " + ",\n".join(ctes) + f"\nSELECT node, label FROM mlab{rounds}\n"


CG_ITERS = 20  # measured CG convergence at sf0.01 = 12 iterations (rs/bn 2.7e-9)


def _ctd_sql(iters: int = CG_ITERS, tol: float = 1e-4, n: int = 200) -> str:
    """(u, v, ectd) oracle for graph_ctd: replay of the conjugate-
    gradient Laplacian solve (operators/numerics.py::laplacian_solve /
    commute_time_distance). The pair is re-derived the same way (two
    smallest ids in the largest component); CG is unrolled with the same
    rs/bn <= tol² stop rule and every-4th-iteration demeaning. The
    scalar recurrence is identical; only float summation order differs
    across engines, and at sf0.01 convergence lands 3 orders below the
    threshold and the result is rounded to 4 decimals, far above the
    ~1e-9 cross-engine noise."""
    ctes = [
        """e0 AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      WHERE a.l_partkey < 200 AND b.l_partkey < 200)""",
        "edges AS MATERIALIZED (SELECT src, dst, CAST(1.0 AS DOUBLE) AS w FROM e0 UNION ALL SELECT dst, src, 1.0 FROM e0)",
        f"nodes AS MATERIALIZED (SELECT CAST(u.i AS BIGINT) AS id FROM UNNEST(range({n})) AS u(i))",
        """wkc(root, node) AS (
    SELECT id, id FROM nodes
    UNION
    SELECT w.root, e.dst FROM wkc w JOIN edges e ON w.node = e.src)""",
        "clab AS MATERIALIZED (SELECT node, min(root) AS label FROM wkc GROUP BY node)",
        "big AS (SELECT label FROM clab GROUP BY label ORDER BY count(*) DESC, label ASC LIMIT 1)",
        "pr AS MATERIALIZED (SELECT min(node) AS u, min(CASE WHEN node > (SELECT min(node) FROM clab, big WHERE clab.label = big.label) THEN node END) AS v FROM clab, big WHERE clab.label = big.label)",
        "vol AS (SELECT sum(w) AS v FROM edges)",
        "wdeg AS MATERIALIZED (SELECT src AS id, sum(w) AS wdeg FROM edges GROUP BY src)",
        """bv AS (SELECT n.id, CASE WHEN n.id = pr.u THEN 1.0 WHEN n.id = pr.v THEN -1.0 ELSE 0.0 END AS value
    FROM nodes n, pr)""",
        f"r0 AS MATERIALIZED (SELECT id, value - (SELECT sum(value) FROM bv) / {n} AS value FROM bv)",
        "x0 AS (SELECT id, 0.0 AS value FROM nodes)",
        "p0 AS (SELECT * FROM r0)",
        "rs0 AS (SELECT sum(value * value) AS s FROM r0)",
        "bn AS (SELECT greatest(s, 1e-300) AS s FROM rs0)",
    ]
    for k in range(1, iters + 1):
        pk, xk, rk = f"p{k - 1}", f"x{k - 1}", f"r{k - 1}"
        ctes.append(f"""ap{k} AS MATERIALIZED (SELECT x.id,
    coalesce(d.wdeg, 0.0) * x.value - coalesce(g.ax, 0.0) AS value
  FROM {pk} x
  LEFT JOIN wdeg d ON d.id = x.id
  LEFT JOIN (SELECT e.src AS id, sum(e.w * px.value) AS ax
             FROM edges e JOIN {pk} px ON px.id = e.dst GROUP BY e.src) g ON g.id = x.id)""")
        ctes.append(
            f"al{k} AS (SELECT (SELECT s FROM rs{k - 1}) / "
            f"(SELECT sum(a.value * p.value) FROM ap{k} a JOIN {pk} p ON p.id = a.id) AS a)"
        )
        ctes.append(
            f"xx{k} AS MATERIALIZED (SELECT x.id, x.value + (SELECT a FROM al{k}) * p.value AS value "
            f"FROM {xk} x JOIN {pk} p ON p.id = x.id)"
        )
        ctes.append(
            f"rr{k} AS MATERIALIZED (SELECT r.id, r.value - (SELECT a FROM al{k}) * a.value AS value "
            f"FROM {rk} r JOIN ap{k} a ON a.id = r.id)"
        )
        if k % 4 == 0:
            ctes.append(f"x{k} AS MATERIALIZED (SELECT id, value - (SELECT sum(value) FROM xx{k}) / {n} AS value FROM xx{k})")
            ctes.append(f"r{k} AS MATERIALIZED (SELECT id, value - (SELECT sum(value) FROM rr{k}) / {n} AS value FROM rr{k})")
        else:
            ctes.append(f"x{k} AS (SELECT * FROM xx{k})")
            ctes.append(f"r{k} AS (SELECT * FROM rr{k})")
        ctes.append(f"rs{k} AS MATERIALIZED (SELECT sum(value * value) AS s FROM r{k})")
        ctes.append(f"be{k} AS (SELECT (SELECT s FROM rs{k}) / (SELECT s FROM rs{k - 1}) AS b)")
        ctes.append(
            f"p{k} AS MATERIALIZED (SELECT r.id, r.value + (SELECT b FROM be{k}) * p.value AS value "
            f"FROM r{k} r JOIN {pk} p ON p.id = r.id)"
        )
    allrs = " UNION ALL ".join(f"SELECT {k} AS it, s FROM rs{k}" for k in range(0, iters + 1))
    allx = " UNION ALL ".join(f"SELECT {k} AS it, id, value FROM x{k}" for k in range(0, iters + 1))
    return "WITH RECURSIVE " + ",\n".join(ctes) + f""",
allrs AS ({allrs}),
allx AS ({allx}),
stop AS (SELECT coalesce(min(it), {iters}) AS s FROM allrs, bn WHERE allrs.s / bn.s <= {tol} * {tol}),
xf AS (SELECT id, value FROM allx, stop WHERE it = stop.s)
SELECT pr.u, pr.v,
  round(sqrt(vol.v * ((SELECT value FROM xf, pr WHERE id = pr.u) - (SELECT value FROM xf, pr WHERE id = pr.v))), 4) AS ectd
FROM pr, vol
"""


MATCHING_ROUNDS = 12  # measured convergence at sf0.01 = 7 rounds (both methods)


def _suitor_rounds_sql(rounds: int, weight_expr: str, prefix: str) -> str:
    """Chained-CTE replay of the synchronous Suitor propose/accept rounds
    (operators/matching.py::suitor_matching): per round every node whose
    endpoints are still unmatched proposes to its best live neighbor
    under (weight desc, id asc); mutual proposals match. Extra rounds
    past convergence are empty no-ops. Returns CTE list text; final
    matches are UNION of {prefix}m{r}."""
    p = prefix
    ctes = [
        f"{p}we AS MATERIALIZED (SELECT src, dst, {weight_expr} AS weight FROM e0)",
        f"{p}un0 AS (SELECT id FROM nodes)",
    ]
    for r in range(1, rounds + 1):
        ctes.append(f"""{p}live{r} AS (SELECT e.src, e.dst, e.weight FROM {p}we e
  JOIN {p}un{r - 1} a ON a.id = e.src JOIN {p}un{r - 1} b ON b.id = e.dst)""")
        ctes.append(f"""{p}sym{r} AS (SELECT src, dst, weight FROM {p}live{r}
  UNION ALL SELECT dst, src, weight FROM {p}live{r})""")
        ctes.append(f"""{p}prop{r} AS (SELECT src, dst FROM (
  SELECT src, dst, row_number() OVER (PARTITION BY src ORDER BY weight DESC, dst ASC) AS rn
  FROM {p}sym{r}) WHERE rn = 1)""")
        ctes.append(f"""{p}m{r} AS MATERIALIZED (SELECT a.src, a.dst FROM {p}prop{r} a
  JOIN {p}prop{r} b ON a.src = b.dst AND a.dst = b.src WHERE a.src < a.dst)""")
        ctes.append(f"""{p}un{r} AS MATERIALIZED (SELECT id FROM {p}un{r - 1}
  WHERE id NOT IN (SELECT src FROM {p}m{r} UNION ALL SELECT dst FROM {p}m{r}))""")
    return ",\n".join(ctes)


def _localmax_rounds_sql(
    rounds: int, weight_expr: str, prefix: str, src_table: str = "e0"
) -> str:
    """Chained-CTE replay of LocalMax matching rounds
    (operators/matching.py::local_max_matching): per round every edge
    that is its BOTH endpoints' best under (weight desc, src asc,
    dst asc) matches; matched endpoints' edges drop out. ``src_table``
    holds canonical (src, dst) rows; ``weight_expr`` scores them."""
    p = prefix
    ctes = [
        f"{p}live0 AS MATERIALIZED (SELECT src, dst, {weight_expr} AS weight "
        f"FROM {src_table})"
    ]
    for r in range(1, rounds + 1):
        ctes.append(f"""{p}inc{r} AS (SELECT src AS node, src, dst, weight FROM {p}live{r - 1}
  UNION ALL SELECT dst, src, dst, weight FROM {p}live{r - 1})""")
        ctes.append(f"""{p}best{r} AS (SELECT node, src, dst FROM (
  SELECT node, src, dst, row_number() OVER (PARTITION BY node ORDER BY weight DESC, src ASC, dst ASC) AS rn
  FROM {p}inc{r}) WHERE rn = 1)""")
        ctes.append(f"""{p}cand{r} AS MATERIALIZED (SELECT l.src, l.dst FROM {p}live{r - 1} l
  JOIN {p}best{r} bs ON bs.node = l.src AND bs.src = l.src AND bs.dst = l.dst
  JOIN {p}best{r} bd ON bd.node = l.dst AND bd.src = l.src AND bd.dst = l.dst)""")
        ctes.append(f"""{p}live{r} AS MATERIALIZED (SELECT l.src, l.dst, l.weight FROM {p}live{r - 1} l
  WHERE NOT EXISTS (SELECT 1 FROM {p}cand{r} c
    WHERE c.src = l.src OR c.dst = l.src OR c.src = l.dst OR c.dst = l.dst))""")
    return ",\n".join(ctes)


# PathGrowingMatcher single-row state-machine replay: the algorithm is
# inherently sequential (matching.py::path_growing_matcher mirrors
# PathGrowingMatcher.cpp), so the oracle carries the FULL state — live
# edge list, current path head, alternation flag, both matchings — in one
# recursive-CTE row and replays the documented tie-breaks exactly: start
# vertex = (max degree, min id) over live nodes, next edge = (max weight,
# min neighbor id), alternation persists across paths, ties between the
# two matchings return m2. Weights are small integers cast to double, so
# the final sum comparison is exact in both engines. One row per consumed
# edge ⇒ ≤ |V|/2 recursion steps on the sub200 graph.
_PGM_SQL = """
  pgm_el AS MATERIALIZED (
    SELECT list(struct_pack(s := src, d := dst,
                            w := CAST((src + dst) % 11 + 1 AS DOUBLE))
                ORDER BY src, dst) AS es
    FROM e0),
  pgm_st AS (
    SELECT 0 AS step,
           CAST(NULL AS BIGINT) AS cur,
           TRUE AS take1,
           CAST([] AS STRUCT(s BIGINT, d BIGINT, w DOUBLE)[]) AS m1,
           CAST([] AS STRUCT(s BIGINT, d BIGINT, w DOUBLE)[]) AS m2,
           (SELECT es FROM pgm_el) AS live
    UNION ALL
    SELECT pgm_st.step + 1,
           tp.pick.nb AS cur,
           NOT pgm_st.take1,
           CASE WHEN pgm_st.take1
                THEN list_append(pgm_st.m1, struct_pack(
                       s := least(tv.v, tp.pick.nb),
                       d := greatest(tv.v, tp.pick.nb),
                       w := tp.pick.w))
                ELSE pgm_st.m1 END,
           CASE WHEN pgm_st.take1 THEN pgm_st.m2
                ELSE list_append(pgm_st.m2, struct_pack(
                       s := least(tv.v, tp.pick.nb),
                       d := greatest(tv.v, tp.pick.nb),
                       w := tp.pick.w)) END,
           list_filter(pgm_st.live, e -> e.s <> tv.v AND e.d <> tv.v)
    FROM pgm_st,
      LATERAL (SELECT CASE
          WHEN pgm_st.cur IS NOT NULL AND len(list_filter(pgm_st.live,
               e -> e.s = pgm_st.cur OR e.d = pgm_st.cur)) > 0
          THEN pgm_st.cur
          ELSE (list_sort(list_transform(
                  list_distinct(list_concat(
                    list_transform(pgm_st.live, e -> e.s),
                    list_transform(pgm_st.live, e -> e.d))),
                  x -> struct_pack(
                    negdg := -len(list_filter(pgm_st.live,
                               e -> e.s = x OR e.d = x)),
                    id := x)))[1]).id
          END AS v) tv,
      LATERAL (SELECT (list_sort(list_transform(
                 list_filter(pgm_st.live, e -> e.s = tv.v OR e.d = tv.v),
                 e -> struct_pack(
                   negw := -e.w,
                   nb := CASE WHEN e.s = tv.v THEN e.d ELSE e.s END,
                   w := e.w)))[1]) AS pick) tp
    WHERE len(pgm_st.live) > 0
  ),
  pgm_fin AS (SELECT m1, m2 FROM pgm_st ORDER BY step DESC LIMIT 1),
  pgm_sel AS (
    SELECT CASE WHEN coalesce(list_sum(list_transform(m1, e -> e.w)), 0)
                   > coalesce(list_sum(list_transform(m2, e -> e.w)), 0)
                THEN m1 ELSE m2 END AS m
    FROM pgm_fin)
"""


def _matching_sql(rounds: int = MATCHING_ROUNDS) -> str:
    """(method, u, v) oracle for graph_matching: exact round replay of
    Suitor ((src+dst)%11+1 weights) and LocalMax ((src+dst)%3+1), plus
    the PathGrowingMatcher state-machine replay (same %11+1 weights)."""
    su = _suitor_rounds_sql(rounds, "CAST((src + dst) % 11 + 1 AS DOUBLE)", "st_")
    lm = _localmax_rounds_sql(rounds, "CAST((src + dst) % 3 + 1 AS DOUBLE)", "lm_")
    all_su = " UNION ALL ".join(
        f"SELECT src, dst FROM st_m{r}" for r in range(1, rounds + 1)
    )
    all_lm = " UNION ALL ".join(
        f"SELECT src, dst FROM lm_cand{r}" for r in range(1, rounds + 1)
    )
    pre = SUB200_PRELUDE_NOWALK_SQL
    return f"""WITH RECURSIVE {pre},
{su},
{lm},
{_PGM_SQL}
SELECT 'suitor' AS method, src AS u, dst AS v FROM ({all_su})
UNION ALL
SELECT 'local_max' AS method, src AS u, dst AS v FROM ({all_lm})
UNION ALL
SELECT 'pgm' AS method, un.e.s AS u, un.e.d AS v
FROM pgm_sel, UNNEST(pgm_sel.m) AS un(e)
"""


# Minimum spanning forest on the <200 subgraph with the gate's
# deterministic weights — cycle property under the tie-broken TOTAL order
# (weight, src, dst): an edge is in the unique MSF of that order iff its
# endpoints are NOT connected using only strictly-smaller edges. The Spark
# side (Borůvka with the same (weight, src, dst) pick order) produces the
# MSF of the same total order, so the sets coincide exactly.
_MSF_SUB200_SQL = f"""
WITH RECURSIVE e0full AS ({CO_EDGES_SQL}),
we AS MATERIALIZED (
  SELECT src, dst,
         CAST((src * 7 + dst * 13) % 97 + 1 AS DOUBLE) AS w,
         row_number() OVER (ORDER BY (src * 7 + dst * 13) % 97 + 1, src, dst) AS ord
  FROM e0full WHERE src < 200 AND dst < 200
),
reach(eid, node) AS (
  SELECT ord, src FROM we
  UNION
  SELECT r.eid, CASE WHEN s.src = r.node THEN s.dst ELSE s.src END
  FROM reach r JOIN we s ON (s.src = r.node OR s.dst = r.node) AND s.ord < r.eid
)
SELECT w.src, w.dst, round(w.w, 6) AS weight
FROM we w LEFT JOIN reach r ON r.eid = w.ord AND r.node = w.dst
WHERE r.node IS NULL
"""


# Overlapping NMI (max normalization) between the two deterministic
# covers of q_graph_partition_dist — mirrors community_quality.py::
# overlapping_nmi_distance (McDaid NMI, adjusted conditional entropies
# with the h(a)+h(d) >= h(b)+h(c) admissibility test, per-i minima
# initialized at H(X_i)).
_ONMI_SQL = """
WITH on_e0 AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
on_nodes AS MATERIALIZED (
  SELECT DISTINCT src AS id FROM (SELECT src FROM on_e0 UNION ALL SELECT dst FROM on_e0) z),
on_n AS (SELECT count(*)::DOUBLE AS n FROM on_nodes),
on_cx AS (SELECT id AS node, id % 10 AS i FROM on_nodes
  UNION ALL SELECT id, 10 FROM on_nodes WHERE id % 3 = 0),
on_cy AS (SELECT id AS node, id % 7 AS j FROM on_nodes
  UNION ALL SELECT id, 7 FROM on_nodes WHERE id % 5 = 0),
on_sx AS (SELECT i, count(*)::DOUBLE AS szx FROM on_cx GROUP BY i),
on_sy AS (SELECT j, count(*)::DOUBLE AS szy FROM on_cy GROUP BY j),
on_int AS (SELECT x.i, y.j, count(*)::DOUBLE AS isz
  FROM on_cx x JOIN on_cy y ON y.node = x.node GROUP BY x.i, y.j),
on_hx AS (SELECT sum(
    CASE WHEN szx > 0 THEN -szx * log2(szx / n) ELSE 0 END
  + CASE WHEN n - szx > 0 THEN -(n - szx) * log2((n - szx) / n) ELSE 0 END) AS v
  FROM on_sx, on_n),
on_hy AS (SELECT sum(
    CASE WHEN szy > 0 THEN -szy * log2(szy / n) ELSE 0 END
  + CASE WHEN n - szy > 0 THEN -(n - szy) * log2((n - szy) / n) ELSE 0 END) AS v
  FROM on_sy, on_n),
on_adj AS (SELECT t.i, t.j,
    ha + hb + hc + hd AS h_joint,
    CASE WHEN szy > 0 THEN -szy * log2(szy / n) ELSE 0 END
  + CASE WHEN n - szy > 0 THEN -(n - szy) * log2((n - szy) / n) ELSE 0 END AS h_bj,
    CASE WHEN szx > 0 THEN -szx * log2(szx / n) ELSE 0 END
  + CASE WHEN n - szx > 0 THEN -(n - szx) * log2((n - szx) / n) ELSE 0 END AS h_ai,
    ha, hb, hc, hd, szx, szy
  FROM (SELECT g.i, g.j, g.isz, sx.szx, sy.szy, n,
      CASE WHEN n + g.isz - sx.szx - sy.szy > 0
           THEN -(n + g.isz - sx.szx - sy.szy) * log2((n + g.isz - sx.szx - sy.szy) / n) ELSE 0 END AS ha,
      CASE WHEN sy.szy - g.isz > 0
           THEN -(sy.szy - g.isz) * log2((sy.szy - g.isz) / n) ELSE 0 END AS hb,
      CASE WHEN sx.szx - g.isz > 0
           THEN -(sx.szx - g.isz) * log2((sx.szx - g.isz) / n) ELSE 0 END AS hc,
      CASE WHEN g.isz > 0 THEN -g.isz * log2(g.isz / n) ELSE 0 END AS hd
    FROM on_int g JOIN on_sx sx ON sx.i = g.i JOIN on_sy sy ON sy.j = g.j, on_n) t),
on_cxy AS (SELECT sum(v) AS v FROM (
  SELECT sx.i, least(
      CASE WHEN sx.szx > 0 THEN -sx.szx * log2(sx.szx / n) ELSE 0 END
    + CASE WHEN n - sx.szx > 0 THEN -(n - sx.szx) * log2((n - sx.szx) / n) ELSE 0 END,
      coalesce(min(CASE WHEN a.ha + a.hd >= a.hb + a.hc
                        THEN a.h_joint - a.h_bj ELSE a.h_ai END), CAST('inf' AS DOUBLE))
    ) AS v
  FROM on_sx sx LEFT JOIN on_adj a ON a.i = sx.i, on_n GROUP BY sx.i, sx.szx, n) z),
on_cyx AS (SELECT sum(v) AS v FROM (
  SELECT sy.j, least(
      CASE WHEN sy.szy > 0 THEN -sy.szy * log2(sy.szy / n) ELSE 0 END
    + CASE WHEN n - sy.szy > 0 THEN -(n - sy.szy) * log2((n - sy.szy) / n) ELSE 0 END,
      coalesce(min(CASE WHEN a.ha + a.hd >= a.hb + a.hc
                        THEN a.h_joint - a.h_ai ELSE a.h_bj END), CAST('inf' AS DOUBLE))
    ) AS v
  FROM on_sy sy LEFT JOIN on_adj a ON a.j = sy.j, on_n GROUP BY sy.j, sy.szy, n) z),
on_mi AS (SELECT 0.5 * (((SELECT v FROM on_hx) - (SELECT v FROM on_cxy))
                      + ((SELECT v FROM on_hy) - (SELECT v FROM on_cyx))) AS v)
SELECT round(1.0 - least(greatest(
  (SELECT v FROM on_mi) / greatest((SELECT v FROM on_hx), (SELECT v FROM on_hy)),
  0.0), 1.0), 6) AS onmi_distance
"""


# PrefixJaccardScore on the <200 subgraph — mirrors
# operators/sparsification.py::prefix_jaccard_scores with triangle-count
# attributes: 0-based competition rank per ego (rank() - 1), partner
# excluded from both prefixes, max over present rank thresholds of the
# prefix Jaccard; the int/int division is exact in both engines.
_PREFIX_JACCARD_SUB200_SQL = """
WITH pj_e0 AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  WHERE a.l_partkey < 200 AND b.l_partkey < 200),
pj_edges AS MATERIALIZED (SELECT src, dst FROM pj_e0 UNION ALL SELECT dst, src FROM pj_e0),
comm AS (SELECT a.src AS u, b.src AS v, count(*) AS n
  FROM pj_edges a JOIN pj_edges b ON a.dst = b.dst AND a.src < b.src GROUP BY 1, 2),
ptri AS (SELECT e.src, e.dst, coalesce(c.n, 0) AS att
  FROM pj_e0 e LEFT JOIN comm c ON c.u = e.src AND c.v = e.dst),
pego AS (SELECT src AS ego, dst AS nbr, att FROM ptri
  UNION ALL SELECT dst, src, att FROM ptri),
prk AS MATERIALIZED (SELECT ego, nbr, rank() OVER (PARTITION BY ego ORDER BY att DESC) - 1 AS rk FROM pego),
pmu AS (SELECT e.src, e.dst, r.nbr AS w1, r.rk AS ru FROM pj_e0 e
  JOIN prk r ON r.ego = e.src WHERE r.nbr <> e.dst),
pmv AS (SELECT e.src, e.dst, r.nbr AS w1, r.rk AS rv FROM pj_e0 e
  JOIN prk r ON r.ego = e.dst WHERE r.nbr <> e.src),
pm AS MATERIALIZED (SELECT coalesce(u.src, v.src) AS src, coalesce(u.dst, v.dst) AS dst,
  coalesce(u.w1, v.w1) AS w1, u.ru, v.rv
  FROM pmu u FULL JOIN pmv v ON u.src = v.src AND u.dst = v.dst AND u.w1 = v.w1),
prs AS (SELECT DISTINCT src, dst, r FROM (
  SELECT src, dst, ru AS r FROM pm UNION ALL SELECT src, dst, rv FROM pm) z
  WHERE r IS NOT NULL),
pper AS (SELECT m.src, m.dst, s.r,
    sum(CASE WHEN m.ru <= s.r AND m.rv <= s.r THEN 1 ELSE 0 END) AS common,
    sum(CASE WHEN m.ru <= s.r OR m.rv <= s.r THEN 1 ELSE 0 END) AS total
  FROM pm m JOIN prs s ON s.src = m.src AND s.dst = m.dst GROUP BY 1, 2, 3),
psc AS (SELECT src, dst,
    max(CASE WHEN total > 0 THEN CAST(common AS DOUBLE) / total ELSE 0.0 END) AS score
  FROM pper GROUP BY src, dst)
SELECT e.src, e.dst, round(coalesce(p.score, 0.0), 6) AS score
FROM pj_e0 e LEFT JOIN psc p ON p.src = e.src AND p.dst = e.dst
"""


# Simmelian overlap (maxRank=5) on the <200 subgraph — mirrors
# operators/sparsification.py::simmelian_overlap_scores: neighbors ranked
# per ego by edge-triangle count (competition rank, ties share), overlap =
# common neighbors within both endpoints' top-5 sets.
_SIMMELIAN_SUB200_SQL = f"""
WITH e0full AS ({CO_EDGES_SQL}),
sube AS MATERIALIZED (SELECT src, dst FROM e0full WHERE src < 200 AND dst < 200),
tri AS (
  SELECT a.src AS a, a.dst AS b, b.dst AS c
  FROM sube a JOIN sube b ON a.src = b.src AND a.dst < b.dst
  JOIN sube c ON c.src = a.dst AND c.dst = b.dst
),
tpairs AS (
  SELECT a AS x, b AS y FROM tri
  UNION ALL SELECT a, c FROM tri UNION ALL SELECT b, c FROM tri
),
etri AS MATERIALIZED (
  SELECT sube.src, sube.dst, coalesce(t.n, 0) AS tri
  FROM sube LEFT JOIN (
    SELECT least(x, y) AS src, greatest(x, y) AS dst, count(*) AS n
    FROM tpairs GROUP BY 1, 2
  ) t USING (src, dst)
),
ego AS (
  SELECT src AS ego, dst AS nbr, tri FROM etri
  UNION ALL SELECT dst, src, tri FROM etri
),
top AS MATERIALIZED (
  SELECT ego, nbr FROM (
    SELECT ego, nbr, rank() OVER (PARTITION BY ego ORDER BY tri DESC) AS rk
    FROM ego
  ) WHERE rk <= 5
),
ov AS (
  SELECT e.src, e.dst, count(*) AS overlap
  FROM etri e
  JOIN top t1 ON t1.ego = e.src
  JOIN top t2 ON t2.ego = e.dst AND t2.nbr = t1.nbr
  GROUP BY e.src, e.dst
)
SELECT e.src, e.dst, round(coalesce(ov.overlap, 0)::DOUBLE, 6) AS score
FROM etri e LEFT JOIN ov USING (src, dst)
"""


# --------------------------------------------------------------------------
# round-3 oracles (merged rows + flipped/no-longer-rows-only entries)
# --------------------------------------------------------------------------


def _brandes_sql(
    levels: int,
    mode: str,
    roots_cte: str,
    walk_cap: int,
    use_sub200: bool,
    linear_scaling: bool = False,
    scale_expr: str | None = None,
    round_digits: int = 6,
) -> str:
    """Generate chained-CTE Brandes SQL (σ forward by BFS level, δ
    backward), shared by the exact, per-edge and sampled oracles.

    mode: 'node' → (id, score); 'edge' → canonical (src, dst, score).
    ``roots_cte`` must define roots(id). Levels is a measured upper bound
    on the BFS depth at the driver's sf (with headroom) — deeper levels
    are simply empty."""
    if use_sub200:
        prelude = SUB200_PRELUDE_SQL
        graph_nodes = "nodes"
    else:
        prelude = GRAPH_PRELUDE_SQL + f""",
  wk(root, node, dist) AS (
    SELECT id, id, CAST(0 AS BIGINT) FROM roots
    UNION
    SELECT wk.root, e.dst, wk.dist + 1
    FROM wk JOIN edges e ON wk.node = e.src WHERE wk.dist < {walk_cap}
  ),
  sp AS MATERIALIZED (SELECT root, node, min(dist) AS dist FROM wk GROUP BY root, node)"""
        graph_nodes = "nodes"
    ctes = [f"sg0 AS MATERIALIZED (SELECT id AS root, id AS node, CAST(1 AS DOUBLE) AS sigma FROM roots)"]
    for d in range(1, levels + 1):
        ctes.append(f"""
sg{d} AS MATERIALIZED (
  SELECT s.root, e.dst AS node, sum(s.sigma) AS sigma
  FROM sg{d - 1} s JOIN edges e ON s.node = e.src
  JOIN sp p ON p.root = s.root AND p.node = e.dst
  WHERE p.dist = {d}
  GROUP BY s.root, e.dst
)""")
    ctes.append(
        f"dl{levels} AS MATERIALIZED (SELECT root, node, CAST(0 AS DOUBLE) AS delta FROM sg{levels})"
    )
    for d in range(levels - 1, 0, -1):
        factor = f" * {d}.0 / {d + 1}.0" if linear_scaling else ""
        ctes.append(f"""
dl{d} AS MATERIALIZED (
  SELECT s.root, s.node, s.sigma,
         coalesce(sum((s.sigma / t.sigma) * (1.0 + t.delta){factor}), 0.0) AS delta
  FROM sg{d} s
  LEFT JOIN edges e ON e.src = s.node
  LEFT JOIN (SELECT x.root, x.node, x.sigma, y.delta
             FROM sg{d + 1} x JOIN dl{d + 1} y
               ON x.root = y.root AND x.node = y.node) t
    ON t.root = s.root AND t.node = e.dst
  GROUP BY s.root, s.node, s.sigma
)""")
    body = f"WITH RECURSIVE {prelude},\nroots AS ({roots_cte}),\n" + ",".join(ctes)
    scale = scale_expr or "1.0"
    if mode == "node":
        all_dl = " UNION ALL ".join(
            f"SELECT node, delta FROM dl{d}" for d in range(1, levels + 1)
        )
        return body + f""",
all_dl AS ({all_dl})
SELECT n.id, round(coalesce(s.v, 0.0) * {scale}, {round_digits}) AS score
FROM {graph_nodes} n LEFT JOIN (
  SELECT node, sum(delta) AS v FROM all_dl GROUP BY node
) s ON n.id = s.node
"""
    # edge mode: per-DAG-edge terms, canonical fold (linear scaling unused)
    ets = []
    for d in range(0, levels):
        ets.append(f"""
et{d} AS MATERIALIZED (
  SELECT e.src, e.dst, (s.sigma / t.sigma) * (1.0 + t.delta) AS term
  FROM sg{d} s JOIN edges e ON e.src = s.node
  JOIN (SELECT x.root, x.node, x.sigma, y.delta
        FROM sg{d + 1} x JOIN dl{d + 1} y ON x.root = y.root AND x.node = y.node) t
    ON t.root = s.root AND t.node = e.dst
)""")
    all_et = " UNION ALL ".join(f"SELECT * FROM et{d}" for d in range(0, levels))
    return body + "," + ",".join(ets) + f""",
all_et AS ({all_et})
SELECT least(src, dst) AS src, greatest(src, dst) AS dst,
       round(sum(term) * {scale}, {round_digits}) AS score
FROM all_et GROUP BY 1, 2
"""


def _oracle_sql_r3() -> dict[str, str]:
    out: dict[str, str] = {}

    out["graph_tri_stats"] = f"""
WITH {GRAPH_PRELUDE_SQL},
tri AS (
  SELECT a.src AS a, a.dst AS b, b.dst AS c
  FROM e0 a JOIN e0 b ON a.src = b.src AND a.dst < b.dst
  JOIN e0 c ON c.src = a.dst AND c.dst = b.dst
),
corners AS (
  SELECT a AS id FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri
),
cnt AS (SELECT id, count(*) AS t FROM corners GROUP BY id)
SELECT (SELECT count(*) FROM tri)::BIGINT AS total_triangles,
       round(2.0 * (SELECT coalesce(sum(t), 0) FROM cnt)
             / (SELECT sum(deg * (deg - 1)) FROM deg), 6) AS global_cc
"""

    out["graph_partition_quality"] = f"""
WITH {GRAPH_PRELUDE_SQL},
mm AS (SELECT count(*)::DOUBLE AS m FROM e0),
intra10 AS (SELECT count(*)::DOUBLE AS c FROM e0 WHERE src % 10 = dst % 10),
vols10 AS (SELECT id % 10 AS label, sum(deg)::DOUBLE AS cvol FROM deg GROUP BY 1),
cut2 AS (SELECT count(*)::DOUBLE AS c FROM e0 WHERE src % 2 <> dst % 2),
vols2 AS (SELECT id % 2 AS side, sum(deg)::DOUBLE AS vol FROM deg GROUP BY 1),
sizes AS (SELECT id % 10 AS label, count(*) AS sz FROM nodes GROUP BY 1),
ideg AS (SELECT src % 10 AS label, src, count(*) AS d
         FROM edges WHERE src % 10 = dst % 10 GROUP BY 1, 2),
mx AS (SELECT label, max(d) AS max_ideg FROM ideg GROUP BY label),
hd AS (SELECT avg(CASE WHEN s.sz > 1
                       THEN coalesce(m.max_ideg, 0)::DOUBLE / (s.sz - 1)
                       ELSE 1.0 END) AS v
       FROM sizes s LEFT JOIN mx m ON s.label = m.label),
intra_e AS (SELECT src % 10 AS label, count(*) AS i
            FROM e0 WHERE src % 10 = dst % 10 GROUP BY 1),
ipd_per AS (SELECT s.sz, coalesce(i.i, 0) AS i, s.sz * (s.sz - 1) / 2 AS possible
            FROM sizes s LEFT JOIN intra_e i ON s.label = i.label)
SELECT
  round((SELECT c FROM intra10) / (SELECT m FROM mm)
        - (SELECT sum(pow(cvol / (2 * (SELECT m FROM mm)), 2)) FROM vols10),
        6) AS modularity,
  round((SELECT count(*)::DOUBLE FROM e0 WHERE src % 10 <> dst % 10), 6) AS cut_weight,
  round((SELECT c FROM cut2) / (SELECT min(vol) FROM vols2), 6) AS conductance,
  round((SELECT v FROM hd), 6) AS hub_dominance,
  round((SELECT avg(CASE WHEN possible > 0 THEN i::DOUBLE / possible ELSE 1.0 END)
         FROM ipd_per), 6) AS ipd_avg,
  round((SELECT sum(i)::DOUBLE / sum(possible) FROM ipd_per), 6) AS ipd_global
"""

    out["graph_partition_dist"] = f"""
WITH {GRAPH_PRELUDE_SQL},
nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
pa AS (SELECT id % 10 AS la, count(*)::DOUBLE AS s FROM nodes GROUP BY 1),
pb AS (SELECT id % 7 AS lb, count(*)::DOUBLE AS s FROM nodes GROUP BY 1),
cells AS (SELECT id % 10 AS la, id % 7 AS lb, count(*)::DOUBLE AS s
          FROM nodes GROUP BY 1, 2),
mi AS (SELECT sum((c.s / (SELECT n FROM nn))
                  * log2(c.s * (SELECT n FROM nn) / (pa.s * pb.s))) AS v
       FROM cells c JOIN pa USING (la) JOIN pb USING (lb)),
ha AS (SELECT -sum((s / (SELECT n FROM nn)) * log2(s / (SELECT n FROM nn))) AS v FROM pa),
hb AS (SELECT -sum((s / (SELECT n FROM nn)) * log2(s / (SELECT n FROM nn))) AS v FROM pb),
ariparts AS (
  SELECT (SELECT sum(s * (s - 1) / 2) FROM cells) AS ri,
         (SELECT sum(s * (s - 1) / 2) FROM pa) AS sa,
         (SELECT sum(s * (s - 1) / 2) FROM pb) AS sb,
         (SELECT n FROM nn) * ((SELECT n FROM nn) - 1) / 2 AS denom,
         (SELECT n FROM nn) AS n
)
SELECT
  round(CAST(1.0 AS DOUBLE)
        - 2.0 * (SELECT v FROM mi) / ((SELECT v FROM ha) + (SELECT v FROM hb)),
        6) AS nmi_distance,
  (SELECT round(CAST(1.0 AS DOUBLE)
          - (ri - sa * sb / denom) / (0.5 * (sa + sb) - sa * sb / denom), 6)
   FROM ariparts) AS ari_distance,
  (SELECT round(CAST(1.0 AS DOUBLE)
          - 2.0 * ri / (n * (n - 1) - 2.0 * (n * (n - 1) / 2 + ri - sa - sb)), 6)
   FROM ariparts) AS jaccard_distance,
  (SELECT round(CAST(1.0 AS DOUBLE)
          - sum(CASE WHEN (src % 10 = dst % 10) = (src % 7 = dst % 7)
                     THEN 1 ELSE 0 END)::DOUBLE / count(*), 6)
   FROM e0) AS gs_rand_distance
"""

    _SPARSIFY_COMMON = f"""
WITH {GRAPH_PRELUDE_SQL},
tri AS (
  SELECT a.src AS a, a.dst AS b, b.dst AS c
  FROM e0 a JOIN e0 b ON a.src = b.src AND a.dst < b.dst
  JOIN e0 c ON c.src = a.dst AND c.dst = b.dst
),
pairs AS (
  SELECT a AS x, b AS y FROM tri
  UNION ALL SELECT a, c FROM tri UNION ALL SELECT b, c FROM tri
),
etri AS (
  SELECT e0.src, e0.dst, coalesce(t.n, 0) AS tri
  FROM e0 LEFT JOIN (
    SELECT least(x, y) AS src, greatest(x, y) AS dst, count(*) AS n
    FROM pairs GROUP BY 1, 2
  ) t USING (src, dst)
),
jac AS (
  SELECT e.src, e.dst,
         CASE WHEN du.deg + dv.deg - 2 - e.tri > 0
              THEN round(e.tri::DOUBLE / (du.deg + dv.deg - 2 - e.tri), 6)
              ELSE 0.0 END AS score
  FROM etri e JOIN deg du ON e.src = du.id JOIN deg dv ON e.dst = dv.id
),
ld_nbr AS (
  SELECT e.src AS ego, e.dst AS nbr, d1.deg AS ego_deg, d2.deg AS nbr_deg
  FROM edges e JOIN deg d1 ON e.src = d1.id JOIN deg d2 ON e.dst = d2.id
),
ld_ranked AS (
  SELECT ego, nbr, ego_deg,
         rank() OVER (PARTITION BY ego ORDER BY nbr_deg DESC) AS rk
  FROM ld_nbr
),
ld AS (
  SELECT src, dst, round(max(e), 6) AS score FROM (
    SELECT least(ego, nbr) AS src, greatest(ego, nbr) AS dst,
           CASE WHEN ego_deg > 1
                THEN CAST(1.0 AS DOUBLE) - ln(rk) / ln(ego_deg)
                ELSE CAST(1.0 AS DOUBLE) END AS e
    FROM ld_ranked
  ) GROUP BY src, dst
),
sim AS (
  SELECT e.src, e.dst,
         e.tri::DOUBLE / (du.deg + dv.deg - e.tri) AS sim
  FROM etri e JOIN deg du ON e.src = du.id JOIN deg dv ON e.dst = dv.id
),
egoviews AS (
  SELECT src AS ego, dst AS nbr, src, dst, sim FROM sim
  UNION ALL
  SELECT dst AS ego, src AS nbr, src, dst, sim FROM sim
),
ls_ranked AS (
  SELECT ego, src, dst,
         count(*) OVER (PARTITION BY ego) AS ego_deg,
         row_number() OVER (PARTITION BY ego ORDER BY sim DESC, nbr ASC) AS rk
  FROM egoviews
),
ls AS (
  SELECT src, dst, round(max(e), 6) AS score FROM (
    SELECT src, dst,
           CASE WHEN ego_deg > 1
                THEN CAST(1.0 AS DOUBLE) - ln(rk) / ln(ego_deg)
                ELSE CAST(1.0 AS DOUBLE) END AS e
    FROM ls_ranked
  ) GROUP BY src, dst
)
"""
    out["graph_sparsifiers"] = _SPARSIFY_COMMON + f""",
att AS MATERIALIZED (SELECT src, dst, CAST((src + dst) % 11 + 1 AS DOUBLE) AS a FROM e0),
asum AS MATERIALIZED (
  SELECT id, sum(a) AS s, count(*) AS d FROM (
    SELECT src AS id, a FROM att UNION ALL SELECT dst, a FROM att
  ) GROUP BY id),
attm AS (SELECT count(*) AS m FROM e0)
SELECT 'jaccard' AS method, src, dst, score FROM jac
UNION ALL SELECT 'local_degree', src, dst, score FROM ld
UNION ALL SELECT 'local_similarity', src, dst, score FROM ls
UNION ALL
SELECT 'gmean', t.src, t.dst, round(t.a / sqrt(su.s * sv.s), 6)
FROM att t JOIN asum su ON t.src = su.id JOIN asum sv ON t.dst = sv.id
UNION ALL
SELECT 'multiscale', t.src, t.dst,
       round(greatest(1.0 - pow(1.0 - t.a / su.s, su.d - 1),
                      1.0 - pow(1.0 - t.a / sv.s, sv.d - 1)), 6)
FROM att t JOIN asum su ON t.src = su.id JOIN asum sv ON t.dst = sv.id
UNION ALL
SELECT 'cct', e.src, e.dst,
       floor(CASE WHEN e.tri > 0
                  THEN e.tri::DOUBLE * ((SELECT count(*) FROM nodes) - 2)
                       / ((du.deg - 1) * (dv.deg - 1))
                  WHEN du.deg = 1 OR dv.deg = 1 THEN 1.0 ELSE 0.0 END * 1e6) / 1e6
FROM etri e JOIN deg du ON e.src = du.id JOIN deg dv ON e.dst = dv.id
UNION ALL
SELECT 'rescore', src, dst,
       round(CAST({md5_mod_sql("src * 1000003 + dst", salt="res5:")} AS DOUBLE)
             / {DEFAULT_PRIME}, 6)
FROM e0
UNION ALL
SELECT 'linearize', src, dst,
       round((row_number() OVER (ORDER BY a, src, dst) - 1)::DOUBLE
             / ((SELECT m FROM attm) - 1), 6)
FROM att
UNION ALL
SELECT 'normalize', t.src, t.dst, round(nf.factor * t.a + nf.offset, 6)
FROM att t CROSS JOIN (
  SELECT -((0.75 - 0.25) / (max(a) - min(a))) AS factor,
         0.75 - min(a) * (-((0.75 - 0.25) / (max(a) - min(a)))) AS offset
  FROM att
) nf
"""

    out["graph_hopplot"] = f"""
WITH RECURSIVE {SUB200_PRELUDE_SQL},
per AS (SELECT dist, count(*) AS c FROM sp WHERE dist > 0 GROUP BY dist),
hexact AS (
  SELECT 'exact' AS variant, CAST(dist AS INT) AS hop,
         CAST(sum(c) OVER (ORDER BY dist
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS DOUBLE) AS value
  FROM per),
-- Volume: 32 portable-hash root draws (dense ids are the identity on
-- 0..199); |B(s, r)| from the shared all-pairs sp table, /32 exact
vroots AS (SELECT CAST(u.i AS BIGINT) AS sid,
                  {_porthash_sql('u.i', 'vol42:')} % 200 AS node
           FROM UNNEST(range(32)) AS u(i)),
hvol AS (
  SELECT 'volume' AS variant, CAST(rr.r AS INT) AS hop,
         (SELECT count(*) FROM vroots v JOIN sp ON sp.root = v.node
          WHERE sp.dist <= rr.r)::DOUBLE / 32.0 AS value
  FROM (SELECT UNNEST([1, 2, 3]) AS r) rr),
-- NeighborhoodFunctionHeuristic on the LARGEST component: comp = min
-- reaching root (= min id in component); endpoints pinned exactly,
-- interior = cumulative round-half-even(hist*n/32) in pure integers
comp AS (SELECT node, min(root) AS comp FROM sp GROUP BY node),
big AS (SELECT comp FROM comp GROUP BY comp ORDER BY count(*) DESC, comp ASC LIMIT 1),
ccn AS MATERIALIZED (SELECT node AS id FROM comp JOIN big USING (comp)),
ncc AS (SELECT count(*) AS n FROM ccn),
mcc AS (SELECT count(*) AS m FROM e0
        WHERE src IN (SELECT id FROM ccn) AND dst IN (SELECT id FROM ccn)),
dia AS (SELECT max(sp.dist) AS d FROM sp
        WHERE sp.root IN (SELECT id FROM ccn)),
-- k = min(n_samples, |LCC|) like the library (sketches.py::
-- neighborhood_function_heuristic), so the oracle stays coupled to the
-- fixture size instead of silently assuming |LCC| > 32
kk AS (SELECT least(32, (SELECT n FROM ncc)) AS k),
nsamp AS (SELECT id FROM (
            SELECT id, row_number() OVER (
              ORDER BY {_porthash_sql('id', 'nfh42:')} ASC, id ASC) AS rn
            FROM ccn)
          WHERE rn <= (SELECT k FROM kk)),
hh2 AS (SELECT sp.dist AS d, count(*) AS c FROM sp
        WHERE sp.root IN (SELECT id FROM nsamp) AND sp.dist > 0
        GROUP BY sp.dist),
interior AS (
  SELECT dd.d,
         (dd.v // kk.k)
         + CASE WHEN dd.v % kk.k * 2 > kk.k THEN 1
                WHEN dd.v % kk.k * 2 = kk.k THEN (dd.v // kk.k) % 2
                ELSE 0 END AS rounded
  FROM (SELECT g.d, coalesce(hh2.c, 0) * (SELECT n FROM ncc) AS v
        FROM (SELECT UNNEST(range(2, (SELECT d FROM dia))) AS d) g
        LEFT JOIN hh2 ON hh2.d = g.d) dd, kk),
hnfh AS (
  SELECT 'nfh' AS variant, 1 AS hop, 2.0 * (SELECT m FROM mcc) AS value
  UNION ALL
  SELECT 'nfh', CAST(d AS INT),
         CAST(2 * (SELECT m FROM mcc)
              + sum(rounded) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED
                                   PRECEDING AND CURRENT ROW) AS DOUBLE)
  FROM interior
  UNION ALL
  -- hop=1 already covers a diameter-1 LCC; emitting the n(n-1) row
  -- there would duplicate it
  SELECT 'nfh', CAST((SELECT d FROM dia) AS INT),
         CAST((SELECT n FROM ncc) * ((SELECT n FROM ncc) - 1) AS DOUBLE)
  WHERE (SELECT d FROM dia) > 1)
SELECT * FROM hexact UNION ALL SELECT * FROM hvol UNION ALL SELECT * FROM hnfh
"""

    out["graph_partition_iic"] = f"""
WITH RECURSIVE {GRAPH_PRELUDE_SQL},
total AS (SELECT count(*)::DOUBLE AS vol FROM edges),
per AS (
  SELECT src % 10 AS label,
         sum(CASE WHEN src % 10 <> dst % 10 THEN 1.0 ELSE 0.0 END) AS cut,
         count(*)::DOUBLE AS vol
  FROM edges GROUP BY 1
),
sizes AS (SELECT id % 10 AS label, count(*) AS sz FROM nodes GROUP BY 1),
nn AS (SELECT count(*) AS n FROM nodes),
iic AS (
  SELECT avg(CASE WHEN least(p.vol, (SELECT vol FROM total) - p.vol) > 0
                  THEN p.cut / least(p.vol, (SELECT vol FROM total) - p.vol)
                  ELSE 0.0 END) AS v
  FROM sizes s LEFT JOIN per p USING (label)
),
iie AS (
  SELECT avg(coalesce(p.cut, 0.0) / least(s.sz, (SELECT n FROM nn) - s.sz)) AS v
  FROM sizes s LEFT JOIN per p USING (label)
),
cc(node, label) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.dst, cc.label FROM cc JOIN edges e ON cc.node = e.src
  WHERE cc.label < e.dst
),
comp AS (SELECT node, min(label) AS comp FROM cc GROUP BY node),
piece AS (SELECT c.node % 10 AS label, c.comp, count(*) AS psz
          FROM comp c GROUP BY 1, 2),
frag AS (
  SELECT avg(1.0 - mx.maxp::DOUBLE / s.sz) AS v
  FROM sizes s JOIN (SELECT label, max(psz) AS maxp FROM piece GROUP BY label) mx
  USING (label)
),
nbrw AS (
  SELECT e.src AS node, e.dst % 10 AS lv, count(*)::DOUBLE AS w
  FROM edges e GROUP BY 1, 2
),
stat AS (
  SELECT node,
         max(CASE WHEN lv = node % 10 THEN w ELSE 0 END) AS own_w,
         max(CASE WHEN lv <> node % 10 THEN w ELSE 0 END) AS other_max
  FROM nbrw GROUP BY node
),
stab AS (
  SELECT avg(CASE WHEN st.node IS NULL THEN 1.0
                  WHEN st.own_w > 0 AND st.other_max < st.own_w THEN 1.0
                  ELSE 0.0 END) AS v
  FROM nodes n LEFT JOIN stat st ON n.id = st.node
)
SELECT round((SELECT v FROM iic), 6) AS iic_avg,
       round((SELECT v FROM iie), 6) AS iie_avg,
       round((SELECT v FROM frag), 6) AS frag_avg,
       round((SELECT v FROM stab), 6) AS stable_frac
"""

    # KatzIndex: chained damped walk-count rounds for pairs (i, i+1), i<20
    katz_walk = [
        """
w1 AS MATERIALIZED (
  SELECT e.src AS u, e.dst AS w, CAST(1.0 AS DOUBLE) AS cnt
  FROM edges e WHERE e.src < 20
)"""
    ]
    for l in range(2, KATZ_INDEX_L + 1):
        katz_walk.append(f"""
w{l} AS MATERIALIZED (
  SELECT p.u, e.dst AS w, sum(p.cnt) AS cnt
  FROM w{l - 1} p JOIN edges e ON p.w = e.src
  GROUP BY p.u, e.dst
)""")
    katz_terms = " UNION ALL ".join(
        f"SELECT u, w AS v, {KATZ_INDEX_BETA} ** {l} * cnt AS s FROM w{l}"
        for l in range(1, KATZ_INDEX_L + 1)
    )
    out["graph_katz_index"] = f"""
WITH {GRAPH_PRELUDE_SQL},
{",".join(katz_walk)},
terms AS ({katz_terms}),
scores AS (SELECT u, v, sum(s) AS katz FROM terms GROUP BY u, v),
cand AS (SELECT CAST(u.i AS BIGINT) AS u, CAST(u.i + 1 AS BIGINT) AS v
         FROM UNNEST(range(20)) AS u(i))
SELECT c.u, c.v, round(coalesce(s.katz, 0.0), 6) AS katz
FROM cand c LEFT JOIN scores s ON c.u = s.u AND c.v = s.v
"""

    out["graph_roc"] = """
WITH e0 AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            WHERE a.l_partkey < 200 AND b.l_partkey < 200),
train AS (SELECT src, dst FROM e0 WHERE (src + dst) % 4 <> 0),
held AS (SELECT src, dst FROM e0 WHERE (src + dst) % 4 = 0),
tsym AS (SELECT src, dst FROM train UNION ALL SELECT dst, src FROM train),
cand AS (
  SELECT a.src AS u, b.src AS v, count(*)::DOUBLE AS score
  FROM tsym a JOIN tsym b ON a.dst = b.dst AND a.src < b.src
  GROUP BY 1, 2
),
cand2 AS (
  SELECT c.u, c.v, c.score FROM cand c
  LEFT JOIN train t ON c.u = t.src AND c.v = t.dst
  WHERE t.src IS NULL
),
scored AS (
  SELECT c.score, CASE WHEN h.src IS NULL THEN 0 ELSE 1 END AS label
  FROM cand2 c LEFT JOIN held h ON c.u = h.src AND c.v = h.dst
),
by_score AS (
  SELECT score AS s, sum(label)::DOUBLE AS p, sum(1 - label)::DOUBLE AS n
  FROM scored GROUP BY score
),
cumul AS (
  SELECT s, p, n,
         coalesce(sum(n) OVER (ORDER BY s
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0.0) AS n_below
  FROM by_score
)
SELECT round(sum(p * (n_below + n / 2))
             / ((SELECT sum(p) FROM by_score) * (SELECT sum(n) FROM by_score)),
             6) AS auc
FROM cumul
"""


    # --- chained fixed-round oracles (PLP / k-core H-index / Luby) ------
    plp_ctes = ["lab0 AS MATERIALIZED (SELECT id AS node, id AS label FROM nodes)"]
    for k in range(1, PLP_STEPS + 1):
        plp_ctes.append(f"""
v{k} AS MATERIALIZED (
  SELECT dst, label AS new_label,
         row_number() OVER (PARTITION BY dst ORDER BY w DESC, label ASC) AS rn
  FROM (SELECT e.dst, q.label, count(*)::DOUBLE AS w
        FROM edges e JOIN lab{k - 1} q ON e.src = q.node
        GROUP BY e.dst, q.label)
),
lab{k} AS MATERIALIZED (
  SELECT l.node, coalesce(v.new_label, l.label) AS label
  FROM lab{k - 1} l
  LEFT JOIN (SELECT dst AS node, new_label FROM v{k} WHERE rn = 1) v USING (node)
)""")
    out["graph_plp"] = (
        f"WITH {GRAPH_PRELUDE_SQL},\n"
        + ",".join(plp_ctes)
        + f"\nSELECT node, label FROM lab{PLP_STEPS}"
    )

    kcore_ctes = [
        "h0 AS MATERIALIZED (SELECT n.id, CAST(coalesce(d.deg, 0) AS BIGINT) AS h "
        "FROM nodes n LEFT JOIN deg d USING (id))"
    ]
    for k in range(1, KCORE_ROUNDS + 1):
        kcore_ctes.append(f"""
x{k} AS MATERIALIZED (
  SELECT node, max(least(rn, hv)) AS hn FROM (
    SELECT e.src AS node, q.h AS hv,
           row_number() OVER (PARTITION BY e.src ORDER BY q.h DESC, e.dst ASC) AS rn
    FROM edges e JOIN h{k - 1} q ON e.dst = q.id)
  GROUP BY node
),
h{k} AS MATERIALIZED (
  SELECT h.id, CAST(coalesce(x.hn, h.h) AS BIGINT) AS h
  FROM h{k - 1} h LEFT JOIN x{k} x ON h.id = x.node
)""")
    out["graph_kcore"] = (
        f"WITH {GRAPH_PRELUDE_SQL},\n"
        + ",".join(kcore_ctes)
        + f"\nSELECT id, h AS core FROM h{KCORE_ROUNDS}"
    )

    luby_ctes = ["live0 AS MATERIALIZED (SELECT id FROM nodes)"]
    win_names = []
    for r in range(1, LUBY_ROUNDS + 1):
        pri = md5_mod_sql("id", salt=f"luby42:{r - 1}:")
        win_names.append(f"win{r}")
        luby_ctes.append(f"""
p{r} AS MATERIALIZED (SELECT id, {pri} AS p FROM live{r - 1}),
win{r} AS MATERIALIZED (
  SELECT l.id FROM p{r} l
  WHERE NOT EXISTS (
    SELECT 1 FROM edges e JOIN p{r} q ON e.src = q.id
    WHERE e.dst = l.id AND (q.p > l.p OR (q.p = l.p AND q.id > l.id)))
),
live{r} AS MATERIALIZED (
  SELECT id FROM live{r - 1}
  WHERE id NOT IN (SELECT id FROM win{r})
    AND id NOT IN (SELECT e.dst FROM edges e JOIN win{r} w ON e.src = w.id)
)""")
    inset = " UNION ALL ".join(f"SELECT id FROM {w}" for w in win_names)
    out["graph_luby"] = (
        f"WITH {GRAPH_PRELUDE_SQL},\n"
        + ",".join(luby_ctes)
        + f""",
inset AS ({inset})
SELECT n.id, CASE WHEN i.id IS NULL THEN FALSE ELSE TRUE END AS in_set
FROM nodes n LEFT JOIN inset i USING (id)"""
    )

    # --- Brandes family: exact node / exact edge / 16-source estimate ---
    out["graph_betweenness"] = _brandes_sql(
        levels=6, mode="node", roots_cte="SELECT id FROM nodes",
        walk_cap=0, use_sub200=True,
    )
    out["graph_edge_betweenness"] = _brandes_sql(
        levels=6, mode="edge", roots_cte="SELECT id FROM nodes",
        walk_cap=0, use_sub200=True,
    )
    est_roots = (
        "SELECT id FROM nodes ORDER BY "
        + md5_mod_sql("id", salt="eb42:")
        + ", id LIMIT 16"
    )
    out["graph_betweenness_est"] = _variant_union("method", [
        ("est16", _brandes_sql(
            levels=5, mode="node", roots_cte=est_roots,
            walk_cap=8, use_sub200=False, linear_scaling=True,
            scale_expr="(2.0 * (SELECT count(*) FROM nodes) / 16.0)",
            round_digits=4,
        )),
        ("kpath", _kpath_sql()),
    ])

    # --- articulation points (graph_bicc): removal increases #components
    sub200_sparse = SUB200_PRELUDE_SQL.replace(
        "AND a.l_partkey < b.l_partkey\n         WHERE",
        "AND a.l_partkey < b.l_partkey\n           AND (a.l_partkey + b.l_partkey) % 4 = 0\n         WHERE",
    )
    out["graph_bicc"] = f"""
WITH RECURSIVE {sub200_sparse},
cc(node, label) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.dst, cc.label FROM cc JOIN edges e ON cc.node = e.src
  WHERE cc.label < e.dst
),
ncomp AS (SELECT count(DISTINCT lab) AS c
          FROM (SELECT node, min(label) AS lab FROM cc GROUP BY node)),
rcc(rv, node, label) AS (
  SELECT r.id, n.id, n.id FROM nodes r JOIN nodes n ON n.id <> r.id
  UNION
  SELECT rcc.rv, e.dst, rcc.label
  FROM rcc JOIN edges e ON rcc.node = e.src
  WHERE e.src <> rcc.rv AND e.dst <> rcc.rv AND rcc.label < e.dst
),
ncomp_v AS (
  SELECT rv, count(DISTINCT lab) AS c
  FROM (SELECT rv, node, min(label) AS lab FROM rcc GROUP BY rv, node)
  GROUP BY rv
)
SELECT rv AS id FROM ncomp_v WHERE c > (SELECT c FROM ncomp)
"""

    # --- greedy GroupDegree (k rounds of chained gain CTEs) -------------
    gd_ctes = [
        """g1 AS MATERIALIZED (SELECT id FROM deg ORDER BY deg DESC, id ASC LIMIT 1),
grp1 AS MATERIALIZED (SELECT id FROM g1),
cov1 AS MATERIALIZED (SELECT DISTINCT e.dst AS id FROM edges e JOIN grp1 g ON e.src = g.id
         WHERE e.dst NOT IN (SELECT id FROM grp1))"""
    ]
    for r in range(2, GROUP_DEGREE_K + 1):
        gd_ctes.append(f"""
gain{r} AS MATERIALIZED (
  SELECT n.id,
         coalesce(cnt.c, 0)
         - CASE WHEN n.id IN (SELECT id FROM cov{r - 1}) THEN 1 ELSE 0 END AS gain
  FROM nodes n LEFT JOIN (
    SELECT e.src AS id, count(*) AS c FROM edges e
    WHERE e.dst NOT IN (SELECT id FROM cov{r - 1})
      AND e.dst NOT IN (SELECT id FROM grp{r - 1})
      AND e.src NOT IN (SELECT id FROM grp{r - 1})
    GROUP BY e.src) cnt USING (id)
  WHERE n.id NOT IN (SELECT id FROM grp{r - 1})
),
pick{r} AS MATERIALIZED (SELECT id FROM gain{r} ORDER BY gain DESC, id ASC LIMIT 1),
grp{r} AS MATERIALIZED (SELECT id FROM grp{r - 1} UNION ALL SELECT id FROM pick{r}),
cov{r} AS MATERIALIZED (SELECT DISTINCT e.dst AS id FROM edges e JOIN grp{r} g ON e.src = g.id
           WHERE e.dst NOT IN (SELECT id FROM grp{r}))""")
    gd_ranks = " UNION ALL ".join(
        [f"SELECT 1 AS rank, id FROM g1"]
        + [f"SELECT {r}, id FROM pick{r}" for r in range(2, GROUP_DEGREE_K + 1)]
    )
    out["graph_group_degree"] = (
        f"WITH {GRAPH_PRELUDE_SQL},\n"
        + ",".join(gd_ctes)
        + f"\nSELECT CAST(rank AS INT) AS rank, id FROM ({gd_ranks})"
    )

    # --- greedy GroupCloseness over the walk-CTE distances --------------
    gc_ctes = [
        """sdeg AS MATERIALIZED (SELECT src AS id, count(*) AS deg FROM edges GROUP BY src),
fit1 AS MATERIALIZED (SELECT root AS id, sum(dist) AS farness FROM sp GROUP BY root),
pick1 AS MATERIALIZED (SELECT id FROM fit1 ORDER BY farness ASC, id ASC LIMIT 1),
grp1 AS MATERIALIZED (SELECT id FROM pick1),
best1 AS MATERIALIZED (SELECT node, dist AS bd FROM sp WHERE root = (SELECT id FROM pick1))"""
    ]
    for r in range(2, GROUP_CLOSENESS_K + 1):
        gc_ctes.append(f"""
fit{r} AS MATERIALIZED (
  SELECT s.root AS id,
         sum(least(s.dist, coalesce(b.bd, s.dist)))
         + (SELECT coalesce(sum(bd), 0) FROM best{r - 1})
         - sum(CASE WHEN b.bd IS NOT NULL THEN b.bd ELSE 0 END) AS farness
  FROM sp s LEFT JOIN best{r - 1} b ON s.node = b.node
  GROUP BY s.root
),
cand{r} AS MATERIALIZED (
  SELECT f.id, f.farness FROM fit{r} f
  LEFT JOIN sdeg d ON f.id = d.id
  LEFT JOIN best{r - 1} bb ON f.id = bb.node
  WHERE f.id NOT IN (SELECT id FROM grp{r - 1})
    AND coalesce(d.deg, 0) > 1
    AND NOT ((bb.bd = 1) AND (d.deg = 2))
    AND coalesce(bb.bd, 1) > 0
),
pick{r} AS MATERIALIZED (
  SELECT id FROM (
    SELECT id, 0 AS pri, farness FROM cand{r}
    UNION ALL
    SELECT n.id, 1, NULL FROM nodes n
    WHERE n.id NOT IN (SELECT id FROM grp{r - 1})
  ) ORDER BY pri ASC, farness ASC NULLS LAST, id ASC LIMIT 1
),
grp{r} AS MATERIALIZED (SELECT id FROM grp{r - 1} UNION ALL SELECT id FROM pick{r}),
best{r} AS MATERIALIZED (
  SELECT coalesce(b.node, s.node) AS node,
         least(coalesce(b.bd, s.dist), coalesce(s.dist, b.bd)) AS bd
  FROM best{r - 1} b
  FULL JOIN (SELECT node, dist FROM sp WHERE root = (SELECT id FROM pick{r})) s
    ON b.node = s.node
)""")
    gc_ranks = " UNION ALL ".join(
        f"SELECT {r} AS rank, id FROM pick{r}" for r in range(1, GROUP_CLOSENESS_K + 1)
    )
    out["graph_group_closeness"] = (
        f"WITH RECURSIVE {SUB200_PRELUDE_SQL},\n"
        + ",".join(gc_ctes)
        + f"\nSELECT CAST(rank AS INT) AS rank, id FROM ({gc_ranks})"
    )


    # --- text_all: the four text-pipeline tables joined per doc ---------
    langid_union = " UNION ALL ".join(
        f"SELECT doc_id, '{lang}' AS lang, "
        f"len(list_filter(t, x -> list_contains([{_sql_list(ws)}], x)))::DOUBLE "
        f"/ greatest(len(t), 1) AS score FROM toks"
        for lang, ws in sorted(_STOPWORDS.items())
    )
    all_sw_local = _sql_list([w for ws in _STOPWORDS.values() for w in ws])
    out["text_all"] = rf"""
WITH {_TOKS_SQL}, {_shingle_sql(4)},
tok_tbl AS (
  SELECT doc_id,
         len(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> ''))::BIGINT AS n_tokens,
         len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9'']+'), x -> x <> ''))::BIGINT AS n_words,
         length(text)::BIGINT AS n_chars
  FROM documents
),
lang_ranked AS (
  SELECT doc_id, lang, score,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang DESC) AS rn
  FROM ({langid_union})
),
lang_tbl AS (
  SELECT doc_id,
         CASE WHEN score > 0 THEN lang ELSE 'und' END AS lang_pred,
         round(score, 6) AS lang_score
  FROM lang_ranked WHERE rn = 1
),
q_base AS (
  SELECT d.doc_id, t,
         greatest(len(t), 1) AS n_toks,
         greatest(length(text), 1) AS n_chars,
         length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')) AS punct,
         length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS alpha,
         len(list_filter(t, x -> list_contains([{all_sw_local}], x))) AS sw_hits
  FROM documents d JOIN toks ON d.doc_id = toks.doc_id
),
q_r AS (
  SELECT doc_id,
         list_sum(list_transform(t, x -> length(x)))::DOUBLE / n_toks AS mean_word_len,
         punct::DOUBLE / n_chars AS punct_ratio,
         sw_hits::DOUBLE / n_toks AS stopword_ratio,
         alpha::DOUBLE / n_chars AS alpha_ratio
  FROM q_base
),
q_tbl AS (
  SELECT doc_id,
         round(mean_word_len, 6) AS mean_word_len,
         round(punct_ratio, 6) AS punct_ratio,
         round(stopword_ratio, 6) AS stopword_ratio,
         round(alpha_ratio, 6) AS alpha_ratio,
         round(least(stopword_ratio * 4, 1.0) * 0.4
               + least(alpha_ratio * 1.25, 1.0) * 0.4
               + (1 - least(punct_ratio * 5, 1.0)) * 0.2, 6) AS quality
  FROM q_r
),
fp_tbl AS (
  SELECT d.doc_id, fp.fingerprint
  FROM documents d LEFT JOIN (
    SELECT doc_id, min({md5_mod_sql("s", salt="fp:")}) AS fingerprint
    FROM sh GROUP BY doc_id
  ) fp ON d.doc_id = fp.doc_id
)
SELECT t.doc_id, t.n_tokens, t.n_words, t.n_chars,
       l.lang_pred, l.lang_score,
       q.mean_word_len, q.punct_ratio, q.stopword_ratio, q.alpha_ratio, q.quality,
       f.fingerprint
FROM tok_tbl t
JOIN lang_tbl l USING (doc_id)
JOIN q_tbl q USING (doc_id)
JOIN fp_tbl f USING (doc_id)
"""

    return out
