#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line with per-query wall
seconds plus PageRank superstep throughput (edges/sec per superstep —
the BASELINE.md metric, edges/s = m / elapsed per
/root/reference/benchmark/Benchmark.py:303).

Noise robustness (round 7): every compute query runs
$SPARK_GRAFT_BENCH_REPS times in-process (default 3) and the JSON
carries per-query `queries_min` and `queries_median` alongside the
first-pass `queries`/`value` (kept as the cross-round-comparable
cold-ish reading). Two of the last three driver benches needed
exclusive-hardware re-runs to interpret a 30-60%% uniform slowdown on
git-unchanged kernels; the min over reps is the host-noise-resistant
number — read `value_min` first. `load_graph` is measured once (the
graph is memoized; a re-run would time the memo lookup, not the load).

Usage: python bench.py            # sf0.1, local[32]
       SPARK_GRAFT_CPUS=8 SPARK_GRAFT_BENCH_REPS=1 python bench.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from pyspark.sql import functions as F

    from __spark_entry__ import _co_graph, _docs, _embs
    from networkit_spark.operators.components import connected_components
    from networkit_spark.operators.pagerank import pagerank
    from networkit_spark.operators.plp import plp
    from networkit_spark.operators.triangles import total_triangles
    from networkit_spark.pipeline.dedup import minhash_lsh_candidates
    from networkit_spark.pipeline.similarity import cosine_topk
    from networkit_spark.pipeline.text import quality_scores
    from networkit_spark.session import get_spark

    spark = get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    mins: dict[str, float] = {}
    medians: dict[str, float] = {}
    extras: dict[str, object] = {}

    def timed(name, fn, n_reps=None):
        n = reps if n_reps is None else n_reps
        runs: list[float] = []
        out = None
        for _ in range(n):
            t0 = time.monotonic()
            out = fn()
            runs.append(round(time.monotonic() - t0, 3))
        timings[name] = runs[0]
        mins[name] = min(runs)
        medians[name] = round(statistics.median(runs), 3)
        print(f"  {name}: {runs}s", file=sys.stderr)
        return out

    # graph load: derive co-occurrence edges, symmetrize, cache.
    # _co_graph eager-localCheckpoints the edges; the extra .cache() puts
    # a COLUMNAR InMemoryRelation on top, which the seven downstream
    # graph queries scan repeatedly — measured faster end-to-end than
    # rescanning deserialized checkpoint blocks (A/B: 68s vs 77s total).
    def load():
        g = _co_graph(spark, sf_dir).cache()
        return g, g.edges.count()

    g, m_sym = timed("load_graph", load, n_reps=1)
    m = m_sym // 2  # canonical undirected edge count (no self-loops here)
    extras["edges"] = m
    extras["nodes"] = g.num_nodes()

    pr = timed("pagerank", lambda: pagerank(g, damp=0.85, tol=1e-6))
    extras["pagerank_iterations"] = pr.iterations
    extras["pagerank_converged"] = pr.converged
    # edges/sec per superstep over the symmetrized gather relation;
    # the _min variant divides by the noise-resistant best-of-reps time
    extras["pagerank_edges_per_sec_per_superstep"] = round(
        m_sym * pr.iterations / timings["pagerank"]
    )
    extras["pagerank_edges_per_sec_per_superstep_min"] = round(
        m_sym * pr.iterations / mins["pagerank"]
    )

    timed("components", lambda: connected_components(g).count())
    res = timed("plp", lambda: plp(g, max_iterations=10))
    extras["plp_iterations"] = res.iterations
    extras["triangles"] = timed("triangles", lambda: total_triangles(g))

    from networkit_spark.operators.distance import estimate_betweenness, sssp

    timed(
        "betweenness_est16",
        lambda: estimate_betweenness(g, n_samples=16, seed=42).count(),
    )
    src0 = g.nodes.orderBy("id").limit(1).collect()[0]["id"]
    timed("sssp", lambda: sssp(g.to_weighted(), int(src0)).count())

    docs = _docs(spark, sf_dir).cache()
    docs.count()
    timed("dedup_minhash_lsh", lambda: minhash_lsh_candidates(docs).count())
    timed("text_quality", lambda: quality_scores(docs).count())

    embs = _embs(spark, sf_dir).cache()
    embs.count()
    timed(
        "sim_cosine_topk",
        lambda: cosine_topk(embs, embs.filter(F.col("vec_id") < 10), k=5).count(),
    )

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "wall_seconds_headline_queries",
                "value": total,
                "value_min": round(sum(mins.values()), 3),
                "value_median": round(sum(medians.values()), 3),
                "unit": "sec",
                "reps": reps,
                "queries": timings,
                "queries_min": mins,
                "queries_median": medians,
                "sf": float(sf),
                "cpus": cpus,
                **extras,
            }
        )
    )


if __name__ == "__main__":
    main()
