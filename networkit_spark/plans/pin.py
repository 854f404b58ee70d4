"""Hard plan-lineage cut for iterative multi-state kernels.

Spark 4's ``DataFrame.localCheckpoint`` truncates RDD lineage but the
resulting ``LogicalRDD`` node still carries metadata derived from the
ORIGIN logical plan (constraints/statistics). When an iterative kernel
keeps several interdependent checkpointed states (residual arcs +
heights + excess in max-flow; preorder + low/high tables in
Tarjan-Vishkin), that retained metadata compounds across rounds and
Catalyst ANALYSIS/PLANNING time grows exponentially — measured on the
push-relabel kernel: round 8 ≈ 3 s, round 9 ≈ 20 s of pure planning
while execution stayed at 0.03 s.

``pin`` materializes via ``localCheckpoint`` and then rebuilds the
DataFrame from the checkpointed JVM RDD, which resets the logical plan
to a bare scan. The rebuild goes through ``javaRDD``/``createDataFrame``
ON THE JVM — rows never cross into Python, the conversion is one
distributed RowEncoder pass over already-materialized blocks.

Use it instead of bare ``localCheckpoint`` wherever a round's state
update JOINS several previously-checkpointed states. Single-state
chains (PageRank scores, PLP labels) don't need it — their planning
stays flat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def pin(df: DataFrame) -> DataFrame:
    """Materialize ``df`` and cut BOTH RDD lineage and logical-plan
    metadata. Returns a DataFrame whose plan is a bare RDD scan.

    The plan rebuild uses classic-Spark JVM internals (``_jdf`` /
    ``_jsparkSession``), which do not exist under Spark Connect. There
    we fall back to plain ``localCheckpoint`` — lineage is still cut,
    only the origin-plan metadata trim is lost (Connect keeps plans
    server-side, where the pathology has a different profile anyway).
    """
    d = df.localCheckpoint(eager=True)
    spark = d.sparkSession
    if not hasattr(d, "_jdf") or not hasattr(spark, "_jsparkSession"):
        return d
    jdf = d._jdf
    jnew = spark._jsparkSession.createDataFrame(jdf.javaRDD(), jdf.schema())
    return DataFrame(jnew, spark)
