"""Node2Vec — biased second-order random walks + Word2Vec embeddings.

Reference: ``embedding/Node2Vec.cpp`` (defaults P=1, Q=1, walkLength=80,
walksPerNode=10, dimensions=128 — ``include/networkit/embedding/
Node2Vec.hpp:30-38``): Alias-sampled p/q-biased walks feed a skip-gram
model.

Spark-first design (no alias tables, no per-node state on the driver):

- Walk state is a DataFrame (walk_id, prev, cur); one step =
  1. candidates: state ⋈ edges on cur = src → every neighbor;
  2. second-order bias α (Grover/Leskovec): 1/p if candidate == prev,
     1 if candidate adjacent to prev (one left join against the edge
     set on (prev, candidate)), else 1/q;
  3. WEIGHTED SAMPLING VIA GUMBEL-MAX: key = log(w·α) + Gumbel(hash),
     winner = row_number() over (partitionBy walk_id, orderBy key desc)
     == 1. A seeded hash Gumbel makes the draw deterministic at any
     parallelism — the distributed analogue of the reference's RNG.
- Walks accumulate as (walk_id, step, node) rows; the per-walk sequence
  is assembled once at the end (groupBy + array_sort), then handed to
  Spark MLlib's Word2Vec (skip-gram) — the same estimator family the
  reference delegates to.

Scale: per step one join against the cached edge table + one |frontier|
window; total work O(walks · walk_length · avg_degree) spread over the
cluster. Hub vertices produce large candidate groups — bounded by max
degree, the same bound the alias table costs in the reference.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from networkit_spark.graph import Graph


@dataclass
class Node2VecResult:
    walks: DataFrame  # (walk_id LONG, seq ARRAY<LONG>)
    embeddings: DataFrame | None  # (id LONG, vector ARRAY<FLOAT>) when fitted


def _gumbel(*cols):
    """Deterministic Gumbel(0,1) noise from hashed columns."""
    u = (F.xxhash64(*cols).cast("double") / F.lit(float(1 << 64))) + F.lit(0.5)
    # clamp away from {0,1} so the double log stays finite
    u = F.least(F.greatest(u, F.lit(1e-12)), F.lit(1.0 - 1e-12))
    return -F.log(-F.log(u))


def random_walks(
    g: Graph,
    walk_length: int = 80,
    walks_per_node: int = 10,
    p: float = 1.0,
    q: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """(walk_id, seq ARRAY<LONG>) — walks_per_node p/q-biased walks from
    every node. walk_id = node · walks_per_node + replica."""
    # walks follow OUT-edges as stored (undirected storage already holds
    # both orientations; directed walks respect direction)
    edges = g.edges.select("src", "dst", "weight").repartition("src").cache()
    edges.count()
    edge_keys = edges.select(
        F.col("src").alias("prev"), F.col("dst").alias("cand"), F.lit(1).alias("adj")
    ).dropDuplicates(["prev", "cand"])

    starts = (
        g.nodes.select(
            F.explode(
                F.sequence(
                    F.col("id") * walks_per_node,
                    F.col("id") * walks_per_node + walks_per_node - 1,
                )
            ).alias("walk_id"),
            F.col("id").alias("cur"),
        )
        .withColumn("prev", F.lit(None).cast("long"))
        .localCheckpoint(eager=True)
    )

    trail = starts.select("walk_id", F.lit(0).alias("step"), F.col("cur").alias("node"))
    state = starts
    w = Window.partitionBy("walk_id").orderBy(F.desc("key"))

    for step in range(1, walk_length):
        cands = state.join(
            edges.withColumnRenamed("src", "cur").withColumnRenamed("dst", "cand"),
            "cur",
        )
        if p != 1.0 or q != 1.0:
            cands = cands.join(edge_keys, ["prev", "cand"], "left")
            alpha = (
                F.when(F.col("cand") == F.col("prev"), F.lit(1.0 / p))
                .when(F.col("adj").isNotNull(), F.lit(1.0))
                .otherwise(F.lit(1.0 / q))
            )
            # first step has prev NULL: α = 1 (uniform first hop)
            alpha = F.when(F.col("prev").isNull(), F.lit(1.0)).otherwise(alpha)
        else:
            alpha = F.lit(1.0)
        scored = cands.select(
            "walk_id",
            "cand",
            "cur",
            (
                F.log(F.col("weight") * alpha)
                + _gumbel("walk_id", F.lit(step), F.col("cand"), F.lit(seed))
            ).alias("key"),
        )
        nxt = (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(
                "walk_id", F.col("cur").alias("prev"), F.col("cand").alias("cur")
            )
        )
        # dead-end walks (no out-neighbors) simply stop: inner join drops them
        state = nxt.localCheckpoint(eager=True)
        trail = trail.unionByName(
            state.select("walk_id", F.lit(step).alias("step"), F.col("cur").alias("node"))
        )
        if step % 8 == 0:
            trail = trail.localCheckpoint(eager=True)

    return (
        trail.groupBy("walk_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("step", "node"))),
                lambda s: s["node"],
            ).alias("seq")
        )
    )


def node2vec(
    g: Graph,
    walk_length: int = 80,
    walks_per_node: int = 10,
    p: float = 1.0,
    q: float = 1.0,
    dimensions: int = 128,
    window_size: int = 10,
    seed: int = 42,
    fit: bool = True,
) -> Node2VecResult:
    """Full Node2Vec: walks + skip-gram embedding (MLlib Word2Vec).

    ``fit=False`` returns walks only (the expensive distributed part) for
    callers that train elsewhere.
    """
    walks = random_walks(
        g,
        walk_length=walk_length,
        walks_per_node=walks_per_node,
        p=p,
        q=q,
        seed=seed,
    )
    if not fit:
        return Node2VecResult(walks=walks, embeddings=None)

    from pyspark.ml.feature import Word2Vec

    sentences = walks.select(
        F.transform(F.col("seq"), lambda x: x.cast("string")).alias("sent")
    )
    model = (
        Word2Vec(
            vectorSize=dimensions,
            windowSize=window_size,
            minCount=0,
            seed=seed,
            inputCol="sent",
            outputCol="vec",
        )
        .fit(sentences)
    )
    vectors = model.getVectors().select(
        F.col("word").cast("long").alias("id"),
        F.col("vector"),
    )
    return Node2VecResult(walks=walks, embeddings=vectors)
