#!/usr/bin/env python
"""Round-8 auxiliary benchmark: per-query plan capture + isolated timing.

``bench.py`` is FROZEN for measurement (the driver re-runs the
round-start copy); this file holds the extra instrumentation the
optimization guide asks for — noop-sink isolation (§1.4), job labels
(§1.5), and ``explain("formatted")`` capture for the committed
``plans/r08/<query>_after.txt`` files.

Iterative kernels (pagerank, plp, components, betweenness, sssp) have no
single end-to-end plan — each superstep is its own job over checkpointed
state — so for those the capture builds the representative
first-superstep DataFrame from the same library internals the kernel
executes, and the timing numbers come from running the full kernel with
the same calls as bench.py.

Usage:
    python bench_extra.py                 # plans only (fast)
    python bench_extra.py --time          # plans + isolated timings
    PLAN_SUFFIX=after SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench_extra.py
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r08")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SUFFIX = os.environ.get("PLAN_SUFFIX", "after")


def dump(name: str, *dfs) -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    path = os.path.join(OUT_DIR, f"{name}_{SUFFIX}.txt")
    with open(path, "w") as f:
        for label, df in dfs:
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            f.write(f"==== {label} ====\n")
            f.write(buf.getvalue())
            f.write("\n")
    print(f"wrote {path}", file=sys.stderr)


def main() -> None:
    do_time = "--time" in sys.argv
    from pyspark.sql import functions as F

    from __spark_entry__ import _co_graph, _docs, _embs
    from networkit_spark.plans.edge_layout import partitioned_edges
    from networkit_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench-extra", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    timings: dict[str, float] = {}

    def noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def timed(name, fn):
        sc.setJobDescription(name)
        t0 = time.monotonic()
        fn()
        timings[name] = round(time.monotonic() - t0, 3)
        sc.setJobDescription(None)
        print(f"  {name}: {timings[name]}s", file=sys.stderr)

    # ---- load_graph: the r8 edge-build plan exactly as _co_graph composes it
    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).select(
        "l_orderkey", "l_partkey"
    )
    a = li.select("l_orderkey", F.col("l_partkey").alias("src")).repartition(
        cpus, "l_orderkey"
    )
    b = li.select("l_orderkey", F.col("l_partkey").alias("dst"))
    sym = (
        a.join(F.broadcast(b), "l_orderkey")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
    )
    edges_build = sym.dropDuplicates(["src", "dst"])
    dump("load_graph", ("edge build (pre-checkpoint)", edges_build))

    g = _co_graph(spark, SF_DIR).cache()
    if do_time:
        timed("load_graph(count)", lambda: g.edges.count())
    else:
        g.edges.count()
    n = g.num_nodes()

    # shared layouts (memoized; build charged to the first user)
    e_dst = partitioned_edges(g.edges, "dst")
    e_src = partitioned_edges(g.edges, "src")

    # ---- pagerank: one r8 superstep (broadcast-scores zero-shuffle form)
    from networkit_spark.operators.pagerank import pagerank

    out_deg = e_dst.groupBy("src").agg(F.sum("weight").alias("wdeg"))
    edges_deg = e_dst.join(F.broadcast(out_deg), "src").select(
        "src", "dst", (F.col("weight") / F.col("wdeg")).alias("frac")
    )
    scores = g.nodes.withColumn("score", F.lit(1.0 / n)).localCheckpoint(eager=True)
    gathered = (
        edges_deg.join(F.broadcast(scores.withColumnRenamed("id", "src")), "src")
        .groupBy("dst")
        .agg(F.sum(F.col("frac") * F.col("score")).alias("gather"))
    )
    new_scores = (
        scores.withColumnRenamed("score", "old")
        .join(F.broadcast(gathered.withColumnRenamed("dst", "id")), "id", "left")
        .select(
            "id",
            (F.lit(0.15 / n) + F.lit(0.85) * F.coalesce(F.col("gather"), F.lit(0.0))).alias(
                "score"
            ),
            "old",
        )
    )
    dump("pagerank", ("superstep (gather + update)", new_scores))
    if do_time:
        timed("pagerank", lambda: pagerank(g, damp=0.85, tol=1e-6))

    # ---- plp: one r8 vote + merge
    import importlib

    plp_mod = importlib.import_module("networkit_spark.operators.plp")
    labels = g.nodes.select(F.col("id").alias("node"), F.col("id").alias("label"))
    labels = labels.localCheckpoint(eager=True)
    winners = plp_mod._vote(e_dst.select("src", "dst", "weight"), labels, None, n=n)
    new_labels = labels.join(F.broadcast(winners), "node", "left").select(
        "node",
        F.coalesce("new_label", F.col("label")).alias("label"),
        (F.col("new_label").isNotNull() & (F.col("new_label") != F.col("label"))).alias("chg"),
    )
    dump("plp", ("superstep (vote + merge)", new_labels))
    if do_time:
        timed("plp", lambda: plp_mod.plp(g, max_iterations=10))

    # ---- components: one r8 round
    comp_mod = importlib.import_module("networkit_spark.operators.components")
    e0 = (
        g.edges.filter(F.col("src") != F.col("dst"))
        .select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    ss = comp_mod._small_star(comp_mod._large_star(e0, n), n)
    dump("components", ("one round (large-star -> small-star)", ss))
    if do_time:
        timed("components", lambda: comp_mod.connected_components(g).count())

    # ---- triangles: end-to-end plan (single non-iterative query)
    from networkit_spark.operators.triangles import total_triangles, triangles

    dump("triangles", ("triangles (wedge join + broadcast close)", triangles(g)))
    if do_time:
        timed("triangles", lambda: total_triangles(g))

    # ---- betweenness_est16: one forward level + one backward level (r8)
    from networkit_spark.operators.distance import estimate_betweenness

    sampled = (
        g.nodes.orderBy(F.xxhash64("id", F.lit(42)).asc()).limit(16).select("id")
        .localCheckpoint(eager=True)
    )
    level0 = sampled.select(
        F.col("id").alias("root"), F.col("id").alias("node"), F.lit(1.0).alias("sigma")
    ).localCheckpoint(eager=True)
    visited = level0.select("root", "node", F.lit(0).cast("long").alias("dist"), "sigma")
    msgs = (
        e_dst.select("src", "dst")
        .join(F.broadcast(level0.withColumnRenamed("node", "src")), "src")
        .groupBy("root", F.col("dst").alias("node"))
        .agg(F.sum("sigma").alias("sigma"))
    )
    nxt = msgs.join(
        F.broadcast(visited.select("root", "node")), ["root", "node"], "left_anti"
    )
    cur = nxt.select("root", "node", "sigma", F.lit(0.0).alias("delta"))
    prev = level0.select("root", F.col("node").alias("src"), F.col("sigma").alias("sigma_p"))
    terms = (
        e_src.select("src", "dst")
        .join(F.broadcast(cur.withColumnRenamed("node", "dst")), "dst")
        .join(F.broadcast(prev), ["root", "src"])
        .select(
            "root",
            "src",
            "dst",
            ((F.col("sigma_p") / F.col("sigma")) * (F.lit(1.0) + F.col("delta"))).alias("term"),
        )
    )
    delta = terms.groupBy("root", F.col("src").alias("node")).agg(F.sum("term").alias("delta"))
    dump(
        "betweenness_est16",
        ("forward BFS level (broadcast expand + anti-join)", nxt),
        ("backward Brandes level (broadcast terms -> delta)", delta),
    )
    if do_time:
        timed(
            "betweenness_est16",
            lambda: estimate_betweenness(g, n_samples=16, seed=42).count(),
        )

    # ---- sssp: one r8 relax round
    from networkit_spark.operators.distance import sssp

    dist0 = spark.createDataFrame([(0, 0.0)], "node long, dist double").localCheckpoint(
        eager=True
    )
    relax = (
        e_dst.select("src", "dst", "weight")
        .join(F.broadcast(dist0.withColumnRenamed("node", "src")), "src")
        .groupBy(F.col("dst").alias("node"))
        .agg(F.min(F.col("dist") + F.col("weight")).alias("cand"))
    )
    merged = (
        dist0.join(relax, "node", "full")
        .select(
            "node",
            F.least(
                F.coalesce("dist", F.lit(float("inf"))),
                F.coalesce("cand", F.lit(float("inf"))),
            ).alias("dist"),
            (F.col("dist").isNull() | (F.col("cand") < F.col("dist"))).alias("improved"),
        )
    )
    dump("sssp", ("relax round (broadcast frontier + merge)", merged))
    if do_time:
        src0 = g.nodes.orderBy("id").limit(1).collect()[0]["id"]
        timed("sssp", lambda: sssp(g.to_weighted(), int(src0)).count())

    # ---- pipeline queries: end-to-end plans + noop-isolated timings
    from networkit_spark.pipeline.dedup import minhash_lsh_candidates
    from networkit_spark.pipeline.similarity import cosine_topk
    from networkit_spark.pipeline.text import quality_scores

    docs = _docs(spark, SF_DIR).cache()
    docs.count()
    cand = minhash_lsh_candidates(docs)
    dump("dedup_minhash_lsh", ("candidates (distinct-shingle hashing)", cand))
    if do_time:
        timed("dedup_minhash_lsh(noop)", lambda: noop(minhash_lsh_candidates(docs)))
    qs = quality_scores(docs)
    dump("text_quality", ("quality_scores", qs))
    if do_time:
        timed("text_quality(noop)", lambda: noop(quality_scores(docs)))
    embs = _embs(spark, SF_DIR).cache()
    embs.count()
    topk = cosine_topk(embs, embs.filter(F.col("vec_id") < 10), k=5)
    dump("sim_cosine_topk", ("cosine_topk (precomputed norms)", topk))
    if do_time:
        timed(
            "sim_cosine_topk(noop)",
            lambda: noop(cosine_topk(embs, embs.filter(F.col("vec_id") < 10), k=5)),
        )

    if do_time:
        print(json.dumps({"sf_dir": SF_DIR, "cpus": cpus, "timings": timings}))


if __name__ == "__main__":
    main()
