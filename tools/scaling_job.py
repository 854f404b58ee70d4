"""spark-submit job: K PageRank supersteps over a pre-generated edge table.

Submitted by tools/bench_cluster_scaling.py to a local standalone cluster
(`--master spark://... --py-files networkit_spark.zip`); prints one JSON
line with per-superstep wall times. Arguments: <input_dir> <supersteps>.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import SparkSession

from networkit_spark.graph import Graph
from networkit_spark.operators.pagerank import pagerank
from networkit_spark.plans.superstep import SuperstepRunner


def main() -> None:
    path, supersteps = sys.argv[1], int(sys.argv[2])
    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    edges = spark.read.parquet(os.path.join(path, "edges"))
    nodes = spark.read.parquet(os.path.join(path, "nodes"))
    g = Graph(nodes=nodes, edges=edges, directed=True, weighted=False)
    m = edges.count()
    runner = SuperstepRunner(spark)
    t0 = time.monotonic()
    res = pagerank(g, damp=0.85, tol=0.0, max_iterations=supersteps, runner=runner)
    elapsed = time.monotonic() - t0
    steps = [mt["step_s"] for mt in runner.metrics]
    steady = sorted(steps[1:] or steps)
    steady_s = steady[len(steady) // 2]
    print(
        "RESULT "
        + json.dumps(
            {
                "executors": spark.conf.get("spark.cores.max", "?"),
                "edges": m,
                "supersteps": res.iterations,
                "elapsed_s": round(elapsed, 2),
                "step_s": [round(s, 2) for s in steps],
                "edges_per_sec_per_superstep": round(m * res.iterations / elapsed),
                "steady_edges_per_sec_per_superstep": round(m / steady_s),
            }
        )
    )


if __name__ == "__main__":
    main()
