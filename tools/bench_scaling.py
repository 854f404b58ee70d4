"""Two-parallelism scaling bench (north rule: efficiency ≥0.8 from N→4N).

No real cluster exists in this sandbox, so the two-cluster-size criterion
is evidenced by running the SAME job on the SAME input at two local
parallelism levels (local[8] vs local[32]) in fresh JVMs and comparing
PageRank superstep throughput (edges/sec per superstep):

    efficiency = throughput(32) / (4 × throughput(8))

The input is a seeded R-MAT graph (power-law skew — the adversarial case
for the gather aggregation), pre-generated once to parquet so both runs
read identical bytes.

Usage:
  python tools/bench_scaling.py            # orchestrate: gen + run 8 + run 32
  python tools/bench_scaling.py gen <dir> <scale> <edge_factor>
  python tools/bench_scaling.py run <dir> <cpus> <supersteps>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SCALE = int(os.environ.get("SCALING_RMAT_SCALE", "23"))
EDGE_FACTOR = int(os.environ.get("SCALING_RMAT_EF", "16"))
SUPERSTEPS = int(os.environ.get("SCALING_SUPERSTEPS", "8"))
SHUFFLE_PARTS = int(os.environ.get("SCALING_SHUFFLE_PARTS", "64"))
INPUT_DIR = os.environ.get("SCALING_INPUT_DIR", "/tmp/nk_scaling_input")
# N and 4N task slots. On a single shared-memory box the honest pair is
# one where the DRAM bandwidth can actually be provisioned 4x — 2→8 on a
# 32-core host; 8→32 additionally measures the box's bandwidth ceiling.
CPU_PAIR = tuple(
    int(x) for x in os.environ.get("SCALING_CPUS", "8,32").split(",")
)


def gen(path: str, scale: int, edge_factor: int) -> None:
    from networkit_spark.generators import rmat
    from networkit_spark.session import get_spark

    spark = get_spark("scaling-gen", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    g = rmat(spark, scale=scale, edge_factor=edge_factor, seed=42, directed=True)
    g.edges.write.mode("overwrite").parquet(os.path.join(path, "edges"))
    n = 1 << scale
    spark.range(n).select("id").write.mode("overwrite").parquet(os.path.join(path, "nodes"))
    m = spark.read.parquet(os.path.join(path, "edges")).count()
    print(json.dumps({"generated_edges": m, "nodes": n}))


def run(path: str, cpus: int, supersteps: int) -> None:
    from pyspark.sql import functions as F  # noqa: F401

    from networkit_spark.graph import Graph
    from networkit_spark.operators.pagerank import pagerank
    from networkit_spark.session import get_spark

    # shuffle partitioning is held CONSTANT across parallelism levels —
    # on a real cluster you scale executors, not the job's partitioning.
    # ActiveProcessorCount makes the JVM size its internal pools (GC,
    # netty, codegen) for N cores, so the "small cluster" run doesn't
    # silently borrow the whole box; the orchestrator additionally
    # tasksets the process to N physical cores.
    spark = get_spark(
        f"scaling-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=SHUFFLE_PARTS,
        extra_conf={
            "spark.driver.extraJavaOptions": f"-XX:ActiveProcessorCount={cpus}",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    from networkit_spark.plans.superstep import SuperstepRunner

    edges = spark.read.parquet(os.path.join(path, "edges"))
    nodes = spark.read.parquet(os.path.join(path, "nodes"))
    # edges parquet is already the directed edge set (weight included)
    g = Graph(nodes=nodes, edges=edges, directed=True, weighted=False)
    m = edges.count()
    runner = SuperstepRunner(spark)
    t0 = time.monotonic()
    res = pagerank(g, damp=0.85, tol=0.0, max_iterations=supersteps, runner=runner)
    elapsed = time.monotonic() - t0
    steps = [mt["step_s"] for mt in runner.metrics]
    steady = sorted(steps[1:] or steps)  # drop the warmup superstep
    steady_s = steady[len(steady) // 2]  # median: the VM has noisy neighbors
    print(
        json.dumps(
            {
                "cpus": cpus,
                "edges": m,
                "supersteps": res.iterations,
                "elapsed_s": round(elapsed, 2),
                "step_s": steps,
                "edges_per_sec_per_superstep": round(m * res.iterations / elapsed),
                "steady_edges_per_sec_per_superstep": round(m / steady_s),
            }
        )
    )


def orchestrate() -> None:
    env = dict(os.environ, PYTHONPATH=REPO)
    env.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    if not os.path.exists(os.path.join(INPUT_DIR, "edges", "_SUCCESS")):
        subprocess.run(
            [sys.executable, __file__, "gen", INPUT_DIR, str(SCALE), str(EDGE_FACTOR)],
            check=True,
            env=env,
        )
    results = {}
    for cpus in CPU_PAIR:
        # pin to N physical cores: without this, local[8]'s JVM helper
        # threads (GC, shuffle IO, parquet decode) spill onto all 32
        # cores and the "N-core" baseline is silently faster than a real
        # N-core machine — which understates scaling efficiency.
        cmd = [sys.executable, __file__, "run", INPUT_DIR, str(cpus), str(SUPERSTEPS)]
        if os.path.exists("/usr/bin/taskset"):
            cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
        out = subprocess.run(
            cmd,
            check=True,
            env=env,
            capture_output=True,
            text=True,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)
        print(line)
    lo, hi = CPU_PAIR
    factor = hi / lo
    t_lo = results[lo]["edges_per_sec_per_superstep"]
    t_hi = results[hi]["edges_per_sec_per_superstep"]
    s_lo = results[lo]["steady_edges_per_sec_per_superstep"]
    s_hi = results[hi]["steady_edges_per_sec_per_superstep"]
    summary = {
        "input": f"RMAT scale={SCALE} edge_factor={EDGE_FACTOR} seed=42 (directed)",
        "edges": results[hi]["edges"],
        "supersteps": SUPERSTEPS,
        "cpu_pair": [lo, hi],
        f"throughput_local{lo}": t_lo,
        f"throughput_local{hi}": t_hi,
        "whole_job_efficiency": round(t_hi / (factor * t_lo), 3),
        f"steady_throughput_local{lo}": s_lo,
        f"steady_throughput_local{hi}": s_hi,
        "steady_efficiency": round(s_hi / (factor * s_lo), 3),
        "meets_0.8_target": s_hi / (factor * s_lo) >= 0.8,
    }
    print(json.dumps(summary))


def reps(n_reps: int, out_path: str | None) -> None:
    """Run the full N→4N pair ``n_reps`` times back-to-back in one
    exclusive session and report the MEDIAN whole-job and steady
    efficiencies (the round-5/6 protocol point: no single noisy pair
    should require arguing from a discarded attempt). Writes the
    composite JSON to ``out_path`` when given."""
    import statistics

    env = dict(os.environ, PYTHONPATH=REPO)
    runs = []
    for i in range(n_reps):
        out = subprocess.run(
            [sys.executable, __file__],
            check=True,
            env=env,
            capture_output=True,
            text=True,
        )
        lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
        summary = json.loads(lines[-1])
        per_run = [json.loads(l) for l in lines[:-1]]
        runs.append({"summary": summary, "runs": per_run})
        print(json.dumps({"rep": i + 1, **summary}))
    whole = sorted(r["summary"]["whole_job_efficiency"] for r in runs)
    steady = sorted(r["summary"]["steady_efficiency"] for r in runs)
    composite = {
        "tool": (
            "tools/bench_scaling.py reps (taskset-pinned local[N], fresh JVM "
            f"per level, ActiveProcessorCount=N, shuffle partitions {SHUFFLE_PARTS})"
        ),
        "input": runs[0]["summary"]["input"],
        "cpu_pair": runs[0]["summary"]["cpu_pair"],
        "n_reps": n_reps,
        "whole_job_efficiency_all": [r["summary"]["whole_job_efficiency"] for r in runs],
        "steady_efficiency_all": [r["summary"]["steady_efficiency"] for r in runs],
        "whole_job_efficiency_median": statistics.median(whole),
        "steady_efficiency_median": statistics.median(steady),
        "meets_0.8_target": statistics.median(whole) >= 0.8,
        "reps": runs,
    }
    print(json.dumps({k: v for k, v in composite.items() if k != "reps"}))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(composite, f, indent=1)


if __name__ == "__main__":
    if len(sys.argv) == 1:
        orchestrate()
    elif sys.argv[1] == "gen":
        gen(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]))
    elif sys.argv[1] == "run":
        run(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]))
    elif sys.argv[1] == "reps":
        reps(int(sys.argv[2]), sys.argv[3] if len(sys.argv) > 3 else None)
    else:
        raise SystemExit(f"unknown mode {sys.argv[1]}")
