"""Epidemic simulation on graphs.

Reference: ``simulation/EpidemicSimulationSEIR.cpp`` — the discrete-time
SEIR compartment model: per round, Exposed nodes become Infectious after
``e_time`` rounds, Infectious nodes contact every neighbor (each
Susceptible contact is exposed with probability ``trans_p``) and are
Removed after ``i_time`` rounds; a per-round census of the four
compartments is recorded.

Documented deviation (the house portable-draw re-architecture): the
reference draws ``Aux::Random::probability()`` per contact in thread
order, with short-circuit once a node is already Exposed
(``EpidemicSimulationSEIR.cpp:38-42``) — the draw *sequence* is
scheduler-dependent and not replayable. Here each (infectious u,
susceptible v, round t) contact draws independently via the portable
md5 hash, and v is exposed iff ANY of its contacts succeeds — the same
per-contact Bernoulli(transP) semantics, deterministic at any
parallelism, and SQL-replayable round-for-round.

Scale posture: state is one (id, state, ts) row per node; each round is
one join from the infectious frontier onto the edge relation plus a
left join back — the BFS-frontier shuffle shape. The per-round census
is an action anyway (the reference records it per round), so the state
is ``pin()``-ed every round by default: each round's job is O(1) plan
depth and the census collect is 4 longs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.functions.porthash import DEFAULT_PRIME, md5_mod
from networkit_spark.graph import Graph
from networkit_spark.plans.pin import pin

# State encoding (EpidemicSimulationSEIR.hpp:41: enum {S, E, I, R, U})
S, E, I, R = 0, 1, 2, 3


def epidemic_simulation_seir(
    g: Graph,
    t_max: int,
    trans_p: float = 0.5,
    e_time: int = 2,
    i_time: int = 7,
    zero: int | None = None,
    seed: int = 42,
    pin_every: int = 1,
) -> DataFrame:
    """Run the SEIR sweep for ``t_max`` rounds; returns the census
    (zero LONG, t LONG, state LONG, population LONG) — one row per
    (round, compartment), the reference's ``getData()`` rows
    (``EpidemicSimulationSEIR.cpp:72-97``).

    ``zero`` is the index-case node (defaults to the seeded
    ``random_node`` like the reference's ``GraphTools::randomNode``).
    Per-round semantics (``sweep``, ``EpidemicSimulationSEIR.cpp:45-67``,
    all transitions read the round-start state):

    - E with ``t − ts ≥ e_time`` → I;
    - I contacts every neighbor; each round-start-S neighbor v is
      exposed iff the portable draw for (u, v, t) clears ``trans_p``
      (draw < floor(trans_p · prime) — integer compare, exact in both
      engines);
    - I with ``t − ts ≥ i_time`` → R (after contacting);
    - census AFTER the sweep.

    A node promoted E→I in round t does not contact until t+1, exactly
    like the reference (its own sweep call does the promotion and the
    contact loop only runs in the I branch).
    """
    spark = g.edges.sparkSession
    if zero is None:
        from networkit_spark.graphtools import random_node

        zero = random_node(g, seed=seed)
    threshold = int(trans_p * DEFAULT_PRIME)

    sym = g.symmetrized_edges() if g.directed else g.edges
    edges = pin(sym.select("src", "dst").distinct())

    state = pin(
        g.nodes.select(
            "id",
            F.when(F.col("id") == zero, F.lit(I))
            .otherwise(F.lit(S))
            .cast("long")
            .alias("state"),
            F.lit(0).cast("long").alias("ts"),
        )
    )

    stats: list[tuple[int, int, int, int]] = []
    for t in range(t_max):
        infectious = state.filter(F.col("state") == I).select(
            F.col("id").alias("src")
        )
        exposed = (
            edges.join(infectious, "src")
            .filter(
                md5_mod(
                    F.col("src") * F.lit(1_000_003) + F.col("dst"),
                    salt=f"seir{seed}.{t}:",
                )
                < threshold
            )
            .select(F.col("dst").alias("id"))
            .distinct()
            .withColumn("hit", F.lit(1))
        )
        aged = F.col("t0") - F.col("ts")
        state = (
            state.withColumnRenamed("state", "s0")
            .join(exposed, "id", "left")
            .withColumn("t0", F.lit(t).cast("long"))
            .select(
                "id",
                F.when((F.col("s0") == E) & (aged >= e_time), F.lit(I))
                .when((F.col("s0") == I) & (aged >= i_time), F.lit(R))
                .when((F.col("s0") == S) & F.col("hit").isNotNull(), F.lit(E))
                .otherwise(F.col("s0"))
                .cast("long")
                .alias("state"),
                F.when(
                    ((F.col("s0") == E) & (aged >= e_time))
                    | ((F.col("s0") == I) & (aged >= i_time))
                    | ((F.col("s0") == S) & F.col("hit").isNotNull()),
                    F.col("t0"),
                )
                .otherwise(F.col("ts"))
                .alias("ts"),
            )
        )
        if (t + 1) % pin_every == 0 or t == t_max - 1:
            state = pin(state)
        census = {
            int(r["state"]): int(r["n"])
            for r in state.groupBy("state").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        for s in (S, E, I, R):
            stats.append((int(zero), t, s, census.get(s, 0)))

    return spark.createDataFrame(
        stats, "zero long, t long, state long, population long"
    )
