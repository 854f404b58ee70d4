"""Superstep checkpoint / lineage / metrics / resume.

NetworKit's iterative kernels are free while-loops over mutable arrays
(``centrality/PageRank.cpp:54-71``). In Spark each superstep extends the
logical plan; without truncation the lineage grows unboundedly and the
driver OOMs around a few hundred supersteps. The north rule additionally
requires that runs be *resumable mid-superstep with per-partition lineage
and metrics*.

Design:
- state is a per-node DataFrame (scores or labels);
- every ``cadence`` supersteps the state is written to
  ``<dir>/<run_id>/superstep=N/`` as Parquet (per-partition files = the
  per-partition lineage; Spark writes a ``_SUCCESS`` marker only when every
  partition committed, which is our atomicity guarantee);
- a ``metrics.jsonl`` row per superstep records (run_id, superstep, delta /
  updated count, rows, wall seconds);
- ``latest_complete()`` finds the newest superstep with ``_SUCCESS`` so a
  restarted driver resumes from it instead of superstep 0.

Between checkpoints we still cut lineage cheaply with
``localCheckpoint(eager=True)`` — executor-local, no HDFS round-trip.
On a real cluster the checkpoint dir lives on HDFS/S3/Iceberg; locally any
filesystem path works.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class SuperstepRunner:
    """Drives an iterative kernel with checkpointing and metrics."""

    def __init__(
        self,
        spark: SparkSession,
        checkpoint_dir: str | None = None,
        run_id: str | None = None,
        cadence: int = 5,
    ) -> None:
        self.spark = spark
        self.checkpoint_dir = checkpoint_dir
        self.run_id = run_id or uuid.uuid4().hex[:12]
        self.cadence = max(1, cadence)
        self.metrics: list[dict] = []
        self._live: list[DataFrame] = []
        self._t0 = time.monotonic()

    # ------------------------------------------------------------ paths
    def _run_dir(self) -> str:
        assert self.checkpoint_dir is not None
        return os.path.join(self.checkpoint_dir, self.run_id)

    def _step_dir(self, step: int) -> str:
        return os.path.join(self._run_dir(), f"superstep={step}")

    # ------------------------------------------------------------ state io
    def persist_step(self, state: DataFrame, step: int) -> DataFrame:
        """Persist superstep state; durably checkpoint every ``cadence`` steps.

        Between durable checkpoints the state is LAZILY local-checkpointed:
        the logical plan is truncated immediately (kernels like the
        large-star/small-star contraction reference their input 4-16× per
        round, so an untruncated plan grows EXPONENTIALLY in rounds and
        OOMs the driver on plan strings alone), while the actual computation
        happens on the caller's next action — always the convergence/metrics
        aggregate — so each superstep still costs ONE job. States older
        than two steps are unpersisted to bound executor memory (at
        |V| = billions the score vector is not free).

        CONTRACT for callers: any long-lived DataFrame whose lineage
        reads a persisted state (e.g. a coarsened graph built from a
        level's final labels) must be EAGERLY materialized
        (``localCheckpoint(eager=True)``) before two more persist_step
        calls age that state out — a lazy ``.cache()`` evicted under
        memory pressure would recompute into the truncated lineage and
        fail with "Checkpoint block not found".
        """
        if self.checkpoint_dir and step % self.cadence == 0:
            path = self._step_dir(step)
            state.write.mode("overwrite").parquet(path)
            out = self.spark.read.parquet(path)
        else:
            out = state.localCheckpoint(eager=False)
        self._live.append(out)
        if len(self._live) > 2:
            old = self._live.pop(0)
            try:
                old.unpersist(blocking=False)
            except Exception:
                pass
        return out

    def latest_complete(self) -> tuple[int, DataFrame] | None:
        """Newest superstep whose Parquet commit finished (_SUCCESS present)."""
        if not self.checkpoint_dir or not os.path.isdir(self._run_dir()):
            return None
        steps = []
        for name in os.listdir(self._run_dir()):
            if name.startswith("superstep=") and os.path.exists(
                os.path.join(self._run_dir(), name, "_SUCCESS")
            ):
                steps.append(int(name.split("=", 1)[1]))
        if not steps:
            return None
        best = max(steps)
        return best, self.spark.read.parquet(self._step_dir(best))

    # ------------------------------------------------------------ metrics
    def record(self, step: int, **kv) -> None:
        row = {
            "run_id": self.run_id,
            "superstep": step,
            "elapsed_s": round(time.monotonic() - self._t0, 4),
            **kv,
        }
        self.metrics.append(row)
        if self.checkpoint_dir:
            os.makedirs(self._run_dir(), exist_ok=True)
            with open(os.path.join(self._run_dir(), "metrics.jsonl"), "a") as f:
                f.write(json.dumps(row) + "\n")
