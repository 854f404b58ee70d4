"""Shared partitioned edge layouts + scale-adaptive broadcast policy.

Guide §2.4 ("remove shuffles outright") and §1.2 ("the distributed
algorithm first"): every iterative kernel needs the edge table hash-
partitioned by its gather key so the per-superstep join/aggregate reuses
one layout instead of re-shuffling the edges each round. Two facts drive
the design (measured on Spark 4.1, AQE on):

1. ``localCheckpoint`` does NOT carry partitioning metadata into the
   rebuilt ``LogicalRDD`` — so a graph loader's ``repartition("src")``
   is invisible to kernels once the edges are checkpointed, and each
   kernel used to pay its own private ``repartition(...).cache()`` +
   materialize on EVERY call (pagerank, plp, bfs, sssp each re-shuffled
   and re-cached the same 2·|E| relation once per invocation).
2. A cached ``repartition(k)`` relation makes every downstream
   ``groupBy(k, ...)`` / join-on-k exchange-free (HashPartitioning(k)
   satisfies ClusteredDistribution over any superset of {k}), and a
   broadcast hash join PRESERVES that partitioning — so
   ``edges ⋈ broadcast(vector) → groupBy(k, ...)`` is a zero-Exchange
   superstep.

``partitioned_edges`` therefore memoizes ONE cached layout per
(edge-DataFrame identity, key) for the lifetime of the process. This is
an input LAYOUT (a repartitioned copy of the same rows — the Spark
analogue of NetworKit building its CSR adjacency once and running every
kernel over it), not a result: every bench/oracle run still computes all
query results from the parquet inputs.

``maybe_broadcast`` is the scale policy for the per-node vectors
(scores / labels / frontiers) that the supersteps join against the edge
layout: broadcast while the known row count is under
``$SPARK_GRAFT_BROADCAST_ROWS`` (default 4M rows ≈ 64-128 MB built —
well inside executor budgets per the optimization guide's "a few
hundred MB is usually fine"), otherwise fall back to the caller's
shuffle plan. Callers always pass a row count they already know
(|V|, or the previous round's frontier count) — the policy never
triggers an extra job to decide.
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# per-process memo: edge DataFrame identity -> {partition key: cached layout}
_LAYOUTS: "weakref.WeakKeyDictionary[DataFrame, dict]" = weakref.WeakKeyDictionary()


def broadcast_row_limit() -> int:
    """Row-count ceiling for broadcasting per-node vectors (env-tunable:
    ``SPARK_GRAFT_BROADCAST_ROWS``). At 100-TB scale set it to what the
    executors' memory budget supports; 0 disables broadcasting."""
    return int(os.environ.get("SPARK_GRAFT_BROADCAST_ROWS", str(4_000_000)))


def maybe_broadcast(df: DataFrame, rows: int | None) -> DataFrame:
    """Broadcast ``df`` when its known row count is under the limit;
    otherwise return it unchanged (callers keep their shuffle-join
    fallback). ``rows=None`` means unknown -> never broadcast."""
    if rows is not None and 0 <= rows <= broadcast_row_limit():
        return F.broadcast(df)
    return df


def partitioned_edges(edges: DataFrame, key: str = "src") -> DataFrame:
    """Memoized ``edges.repartition(key).cache()``.

    One exchange + one cached materialization per (edge relation, key)
    for the whole process; every kernel invocation (and every bench
    repetition) after the first reuses the layout, exactly like the
    shared adjacency structure of an in-memory graph library. The cache
    is columnar, so kernels selecting only (src, dst) read two columns.
    """
    per_df = _LAYOUTS.setdefault(edges, {})
    if key not in per_df:
        layout = edges.repartition(key).cache()
        # materialize NOW: plans compiled against an unmaterialized
        # cached exchange cannot see its final hash partitioning (the
        # AQE subplan is not finalized yet) and would re-Exchange; after
        # this count every consumer — including the first iteration of
        # the first kernel — plans against the concrete layout.
        layout.count()
        per_df[key] = layout
    return per_df[key]


def derived_layout(edges: DataFrame, key: str, build) -> DataFrame:
    """Memoized cached layout DERIVED from ``edges`` (e.g. PageRank's
    degree-normalized gather relation, the degree-oriented DAG for
    triangle counting). Same lifetime/identity rules as
    ``partitioned_edges``; ``build()`` must be a deterministic pure
    function of ``edges``."""
    per_df = _LAYOUTS.setdefault(edges, {})
    if key not in per_df:
        layout = build().cache()
        layout.count()  # same finalize-before-planning rule as above
        per_df[key] = layout
    return per_df[key]
