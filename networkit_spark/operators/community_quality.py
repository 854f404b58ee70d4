"""Partition quality measures and clustering tools (module ``community/``).

- ``modularity``: coverage − expected coverage
  (``community/Modularity.cpp:25-85``). Cluster volume = Σ weightedDegree
  with self-loop weight counted TWICE (``:45-52``); expected coverage =
  Σ (vol_c / 2m')² with 2m' = total volume (``:60-64``).
- ``coverage``: intra-cluster edge-weight fraction (``community/Coverage.cpp``).
- ``edge_cut``: total weight of inter-cluster edges.
- ``num_subsets`` / ``compact_labels`` / ``subset_sizes``: the Partition
  accessor family (``structures/Partition.hpp:147-308``).
- ``equal_clusterings``: equality up to relabeling via bidirectional
  label-functional check (``GraphClusteringTools.cpp:99-115``) — the
  reference's own parity oracle for CC/PLP.
- ``coarsen``: ParallelPartitionCoarsening (``coarsening/
  ParallelPartitionCoarsening.cpp``): contract the graph by a partition —
  one join-groupBy; the building block for Louvain-style recursion.

All are one or two join-aggregations over the edge table — Catalyst
broadcasts the label map when it fits, sort-merge joins otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from networkit_spark.graph import Graph


def _labeled_edges(g: Graph, labels: DataFrame) -> DataFrame:
    """Edges with both endpoint labels attached: (src, dst, weight, lu, lv)."""
    return (
        g.edges.join(
            labels.select(F.col("node").alias("src"), F.col("label").alias("lu")), "src"
        )
        .join(
            labels.select(F.col("node").alias("dst"), F.col("label").alias("lv")), "dst"
        )
    )


def coverage(g: Graph, labels: DataFrame) -> float:
    """Fraction of edge weight that is intra-cluster."""
    e = _labeled_edges(g, labels)
    row = e.agg(
        F.sum(
            F.when(F.col("lu") == F.col("lv"), F.col("weight")).otherwise(0.0)
        ).alias("intra"),
        F.sum("weight").alias("total"),
    ).collect()[0]
    return (row["intra"] or 0.0) / row["total"] if row["total"] else 0.0


def modularity(g: Graph, labels: DataFrame) -> float:
    """Modularity.getQuality (``Modularity.cpp:25-85``)."""
    e = _labeled_edges(g, labels)
    # intra-cluster weight & total weight in NetworKit convention
    # (undirected storage holds both orientations; self-loop rows once).
    # coverage denominator = total edge weight counted once per edge.
    agg = e.agg(
        F.sum(
            F.when(
                F.col("lu") == F.col("lv"),
                F.when(F.col("src") == F.col("dst"), F.col("weight")).otherwise(
                    F.col("weight") / 2.0
                ),
            ).otherwise(0.0)
        ).alias("intra"),
        F.sum(
            F.when(F.col("src") == F.col("dst"), F.col("weight")).otherwise(
                F.col("weight") / 2.0
            )
        ).alias("total"),
    ).collect()[0]
    total = agg["total"] or 0.0
    if total == 0.0:
        return 0.0
    cov = (agg["intra"] or 0.0) / total
    # cluster volumes: Σ wdeg(v) + extra self-loop weight (counted twice;
    # wdeg already includes the loop once — Modularity.cpp:45-52)
    loops = g.edges.filter(F.col("src") == F.col("dst")).select(
        F.col("src").alias("id"), F.col("weight").alias("loop_w")
    )
    vol = (
        g.degrees()
        .join(loops.groupBy("id").agg(F.sum("loop_w").alias("loop_w")), "id", "left")
        .select(
            "id",
            (F.col("wdeg") + F.coalesce(F.col("loop_w"), F.lit(0.0))).alias("vol"),
            )
        .join(labels.withColumnRenamed("node", "id"), "id")
        .groupBy("label")
        .agg(F.sum("vol").alias("cvol"))
    )
    total_vol = 2.0 * total
    exp_cov = (
        vol.agg(F.sum(F.pow(F.col("cvol") / F.lit(total_vol), 2))).collect()[0][0]
        or 0.0
    )
    return cov - exp_cov


def edge_cut(g: Graph, labels: DataFrame) -> float:
    """Total weight of inter-cluster edges (``community/EdgeCut.cpp``),
    each undirected edge counted once."""
    e = _labeled_edges(g, labels)
    row = e.filter(F.col("lu") != F.col("lv")).agg(
        F.sum(F.col("weight") / (F.lit(1.0) if g.directed else F.lit(2.0)))
    ).collect()[0]
    return row[0] or 0.0


def num_subsets(labels: DataFrame) -> int:
    """Partition::numberOfSubsets (``Partition.hpp:252``)."""
    return labels.select(F.countDistinct("label")).collect()[0][0]


def subset_sizes(labels: DataFrame) -> DataFrame:
    return labels.groupBy("label").agg(F.count(F.lit(1)).alias("size"))


def compact_labels(labels: DataFrame, buckets: int = 256) -> DataFrame:
    """Partition::compact (``Partition.hpp:192``): relabel to 0..k-1 in
    ascending order of the old label id.

    Two-phase rank — a global ``Window.orderBy`` funnels every distinct
    label through ONE task, which is the classic dense-id scale-killer.
    Instead: range-bucket by label, rank within each bucket in parallel,
    then add exclusive-prefix-sum bucket offsets (``buckets`` rows,
    computed driver-side)."""
    distinct = labels.select("label").distinct()
    lo_hi = distinct.agg(
        F.min("label").alias("lo"), F.max("label").alias("hi")
    ).collect()[0]
    if lo_hi["lo"] is None:
        return labels.select("node", "label")
    lo, hi = int(lo_hi["lo"]), int(lo_hi["hi"])
    span = max(hi - lo + 1, 1)
    bucket = ((F.col("label") - F.lit(lo)) * F.lit(buckets) / F.lit(span)).cast(
        "long"
    )
    bucketed = distinct.withColumn(
        "bucket", F.least(bucket, F.lit(buckets - 1))
    )
    counts = {
        int(r["bucket"]): int(r["n"])
        for r in bucketed.groupBy("bucket").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = {}, 0
    for b in range(buckets):
        offsets[b] = acc
        acc += counts.get(b, 0)
    spark = labels.sparkSession
    off_df = spark.createDataFrame(
        [(b, offsets[b]) for b in sorted(offsets)], "bucket long, off long"
    )
    w = Window.partitionBy("bucket").orderBy("label")
    remap = (
        bucketed.withColumn("rk", F.row_number().over(w) - 1)
        .join(F.broadcast(off_df), "bucket")
        .select("label", (F.col("rk") + F.col("off")).cast("long").alias("new_label"))
    )
    return labels.join(remap, "label").select(
        "node", F.col("new_label").alias("label")
    )


def equal_clusterings(a: DataFrame, b: DataFrame) -> bool:
    """GraphClusteringTools::equalClusterings (``:99-115``): partitions are
    equal iff the label maps are bijective images of each other."""
    j = a.withColumnRenamed("label", "la").join(
        b.withColumnRenamed("label", "lb"), "node"
    )
    bad_a = j.groupBy("la").agg(F.countDistinct("lb").alias("k")).filter("k > 1").count()
    bad_b = j.groupBy("lb").agg(F.countDistinct("la").alias("k")).filter("k > 1").count()
    return bad_a == 0 and bad_b == 0


def _contingency(a: DataFrame, b: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame, int]:
    """Shared contingency table for partition-similarity measures:
    (cell sizes |C∩D|, sizes of a's clusters, sizes of b's clusters, n)."""
    j = a.withColumnRenamed("label", "la").join(
        b.withColumnRenamed("label", "lb"), "node"
    )
    cells = j.groupBy("la", "lb").agg(F.count(F.lit(1)).alias("s")).cache()
    sa = cells.groupBy("la").agg(F.sum("s").alias("s"))
    sb = cells.groupBy("lb").agg(F.sum("s").alias("s"))
    n = cells.agg(F.sum("s")).collect()[0][0] or 0
    return cells, sa, sb, int(n)


def nmi_distance(a: DataFrame, b: DataFrame) -> float:
    """NMIDistance (``community/NMIDistance.cpp:30-120``): 1 − NMI with
    NMI = 2·MI/(H(a)+H(b)), MI = Σ (|C∩D|/n)·log₂(|C∩D|·n/(|C|·|D|)),
    H = −Σ P log₂ P. Contingency table = one join + groupBy."""
    cells, sa, sb, n = _contingency(a, b)
    if n == 0:
        return 0.0
    mi_df = (
        cells.join(sa.withColumnRenamed("s", "sc"), "la")
        .join(sb.withColumnRenamed("s", "sd"), "lb")
        .agg(
            F.sum(
                (F.col("s") / F.lit(float(n)))
                * F.log2(F.col("s") * F.lit(float(n)) / (F.col("sc") * F.col("sd")))
            )
        )
    )
    mi = mi_df.collect()[0][0] or 0.0

    def entropy(sizes: DataFrame) -> float:
        v = sizes.agg(
            F.sum(-(F.col("s") / F.lit(float(n))) * F.log2(F.col("s") / F.lit(float(n))))
        ).collect()[0][0]
        return v or 0.0

    h_sum = entropy(sa) + entropy(sb)
    if abs(h_sum) < 1e-12:
        return 0.0
    return 1.0 - (2.0 * mi) / h_sum


def adjusted_rand_dissimilarity(a: DataFrame, b: DataFrame) -> float:
    """AdjustedRandMeasure (``community/AdjustedRandMeasure.cpp:10-55``):
    1 − ARI with the permutation-model expected index."""
    cells, sa, sb, n = _contingency(a, b)
    if n < 2:
        return 0.0

    def pairs(df: DataFrame) -> float:
        v = df.agg(F.sum(F.col("s") * (F.col("s") - 1) / 2)).collect()[0][0]
        return float(v or 0)

    rand_index = pairs(cells)
    sum_a, sum_b = pairs(sa), pairs(sb)
    denom = n * (n - 1) / 2
    max_index = 0.5 * (sum_a + sum_b)
    expected = sum_a * sum_b / denom
    if max_index == 0 or max_index == expected:
        return 0.0
    return 1.0 - (rand_index - expected) / (max_index - expected)


def rand_dissimilarity(a: DataFrame, b: DataFrame) -> float:
    """NodeStructuralRandMeasure (``community/NodeStructuralRandMeasure.cpp``):
    fraction of node pairs on which the two partitions disagree,
    1 − (s11 + s00)/(n·(n−1)/2), computed from the contingency table."""
    cells, sa, sb, n = _contingency(a, b)
    if n < 2:
        return 0.0

    def pairs(df: DataFrame) -> float:
        v = df.agg(F.sum(F.col("s") * (F.col("s") - 1) / 2)).collect()[0][0]
        return float(v or 0)

    total = n * (n - 1) / 2
    s11 = pairs(cells)  # together in both
    same_a, same_b = pairs(sa), pairs(sb)
    # together in exactly one partition:
    disagree = (same_a - s11) + (same_b - s11)
    return disagree / total


def conductance(g: Graph, labels: DataFrame) -> float:
    """Conductance of a 2-partition (``community/Conductance.cpp:15-55``):
    cut weight / min(vol(S₀), vol(S₁)), volumes = Σ weightedDegree."""
    k = num_subsets(labels)
    if k != 2:
        raise ValueError(f"conductance requires a 2-partition, got {k} subsets")
    vols = (
        g.degrees()
        .join(labels.withColumnRenamed("node", "id"), "id")
        .groupBy("label")
        .agg(F.sum("wdeg").alias("vol"))
        .collect()
    )
    denom = min(float(r["vol"]) for r in vols)
    if denom == 0.0:
        return 0.0
    return edge_cut(g, labels) / denom


def coarsen(g: Graph, labels: DataFrame) -> Graph:
    """Contract g by a partition: supernode per label
    (``coarsening/ParallelPartitionCoarsening.cpp``).

    Weight conventions preserve total edge weight and node volumes so
    modularity on the coarse graph equals modularity of the induced fine
    partition (the invariant Louvain levels rely on): for undirected
    symmetric storage, an intra-cluster non-loop edge appears in both
    orientations and must contribute its weight ONCE to the supernode
    self-loop — hence the w/2 on same-label non-loop rows."""
    e = _labeled_edges(g, labels)
    if not g.directed:
        contrib = F.when(
            (F.col("lu") == F.col("lv")) & (F.col("src") != F.col("dst")),
            F.col("weight") / 2.0,
        ).otherwise(F.col("weight"))
    else:
        contrib = F.col("weight")
    e = e.groupBy(F.col("lu").alias("src"), F.col("lv").alias("dst")).agg(
        F.sum(contrib).alias("weight")
    )
    nodes = labels.select(F.col("label").alias("id")).distinct()
    return Graph(nodes=nodes, edges=e, directed=g.directed, weighted=True)


def hub_dominance(g: Graph, labels: DataFrame) -> float:
    """PartitionHubDominance unweighted average
    (``community/PartitionHubDominance.cpp``): per non-empty cluster,
    maxInternalDegree/(size−1) (1 for singletons), averaged."""
    sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("sz"))
    e = _labeled_edges(g.remove_self_loops(), labels)
    internal = (
        e.filter(F.col("lu") == F.col("lv"))
        .groupBy(F.col("lu").alias("label"), F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).alias("ideg"))
        .groupBy("label")
        .agg(F.max("ideg").alias("max_ideg"))
    )
    per = sizes.join(internal, "label", "left").select(
        F.when(
            F.col("sz") > 1,
            F.coalesce("max_ideg", F.lit(0)) / (F.col("sz") - 1),
        )
        .otherwise(F.lit(1.0))
        .alias("dom")
    )
    row = per.agg(F.avg("dom")).collect()[0]
    return float(row[0] or 0.0)


def intrapartition_density(g: Graph, labels: DataFrame) -> dict:
    """IntrapartitionDensity (``community/IntrapartitionDensity.cpp``):
    per-cluster internal density intra/(s(s−1)/2) (1 when no pair),
    returns {'unweighted_avg', 'global'}."""
    sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("sz"))
    e = _labeled_edges(g.remove_self_loops(), labels)
    intra = (
        e.filter((F.col("lu") == F.col("lv")) & (F.col("src") < F.col("dst")))
        .groupBy(F.col("lu").alias("label"))
        .agg(F.count(F.lit(1)).alias("intra"))
    )
    per = sizes.join(intra, "label", "left").select(
        "sz",
        F.coalesce("intra", F.lit(0)).alias("intra"),
        (F.col("sz") * (F.col("sz") - 1) / 2).alias("possible"),
    )
    row = per.agg(
        F.avg(
            F.when(F.col("possible") > 0, F.col("intra") / F.col("possible")).otherwise(
                F.lit(1.0)
            )
        ).alias("unweighted"),
        F.sum("intra").alias("isum"),
        F.sum("possible").alias("psum"),
    ).collect()[0]
    return {
        "unweighted_avg": float(row["unweighted"] or 0.0),
        "global": float(row["isum"] / row["psum"]) if row["psum"] else 0.0,
    }


def jaccard_dissimilarity(a: DataFrame, b: DataFrame) -> float:
    """JaccardMeasure (``community/JaccardMeasure.cpp``):
    1 − 2·s11 / (n(n−1) − 2·s00) over node pairs (0 when the divisor
    vanishes), from the shared contingency table."""
    cells, sa, sb, n = _contingency(a, b)
    if n < 2:
        return 0.0

    def pairs(df: DataFrame) -> float:
        v = df.agg(F.sum(F.col("s") * (F.col("s") - 1) / 2)).collect()[0][0]
        return float(v or 0)

    s11 = pairs(cells)
    s00 = n * (n - 1) / 2 + s11 - (pairs(sa) + pairs(sb))
    divisor = n * (n - 1) - 2.0 * s00
    if divisor <= 0:
        return 0.0
    return 1.0 - (2.0 * s11) / divisor


def graph_structural_rand_dissimilarity(g: Graph, a: DataFrame, b: DataFrame) -> float:
    """GraphStructuralRandMeasure (``community/GraphStructuralRandMeasure.cpp``):
    1 − (e11 + e00)/m over EDGES (agree = together in both, or apart in
    both); each undirected edge counted once."""
    la = a.withColumnRenamed("label", "la")
    lb = b.withColumnRenamed("label", "lb")
    e = (
        g.canonical_undirected_edges()
        .join(la.withColumnRenamed("node", "src").withColumnRenamed("la", "la_u"), "src")
        .join(la.withColumnRenamed("node", "dst").withColumnRenamed("la", "la_v"), "dst")
        .join(lb.withColumnRenamed("node", "src").withColumnRenamed("lb", "lb_u"), "src")
        .join(lb.withColumnRenamed("node", "dst").withColumnRenamed("lb", "lb_v"), "dst")
    )
    row = e.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum(
            F.when(
                ((F.col("la_u") == F.col("la_v")) & (F.col("lb_u") == F.col("lb_v")))
                | ((F.col("la_u") != F.col("la_v")) & (F.col("lb_u") != F.col("lb_v"))),
                1,
            ).otherwise(0)
        ).alias("agree"),
    ).collect()[0]
    if not row["m"]:
        raise ValueError("graph-structural rand is undefined for edgeless graphs")
    return 1.0 - float(row["agree"]) / float(row["m"])


def isolated_interpartition_conductance(g: Graph, labels: DataFrame) -> dict:
    """IsolatedInterpartitionConductance
    (``community/IsolatedInterpartitionConductance.cpp:16-62``): per
    cluster c, cut(c) / min(vol(c), totalVol − vol(c)); returns the
    reference's summary statistics. One labeled-edge join + two aggs —
    broadcast label map when small, sort-merge otherwise; nothing here
    scales worse than the edge scan."""
    e = _labeled_edges(g, labels)
    # our undirected storage holds both orientations, so grouping by lu
    # alone already credits each inter-cluster edge to BOTH clusters and
    # sums each endpoint's incident weight into its cluster volume —
    # exactly the reference's forEdges double-accounting.
    per = e.groupBy("lu").agg(
        F.sum(F.when(F.col("lu") != F.col("lv"), F.col("weight")).otherwise(0.0)).alias(
            "cut"
        ),
        F.sum("weight").alias("vol"),
    )
    total_vol = float(g.edges.agg(F.sum("weight")).collect()[0][0] or 0.0)
    sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("sz"))
    vals = (
        per.join(sizes.withColumnRenamed("label", "lu"), "lu")
        .select(
            F.col("lu").alias("cluster"),
            "sz",
            F.when(
                F.least(F.col("vol"), F.lit(total_vol) - F.col("vol")) > 0,
                F.col("cut") / F.least(F.col("vol"), F.lit(total_vol) - F.col("vol")),
            )
            .otherwise(0.0)
            .alias("value"),
        )
    )
    return _measure_summary(vals, labels)


def isolated_interpartition_expansion(g: Graph, labels: DataFrame) -> dict:
    """IsolatedInterpartitionExpansion
    (``community/IsolatedInterpartitionExpansion.cpp:16-55``): per
    cluster c, cut(c) / min(|c|, n − |c|)."""
    n = labels.count()
    e = _labeled_edges(g, labels)
    per = e.groupBy("lu").agg(
        F.sum(F.when(F.col("lu") != F.col("lv"), F.col("weight")).otherwise(0.0)).alias(
            "cut"
        )
    )
    sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("sz"))
    vals = (
        sizes.join(per.withColumnRenamed("lu", "label"), "label", "left")
        .select(
            F.col("label").alias("cluster"),
            "sz",
            (
                F.coalesce("cut", F.lit(0.0))
                / F.least(F.col("sz"), F.lit(n) - F.col("sz"))
            ).alias("value"),
        )
    )
    return _measure_summary(vals, labels)


def partition_fragmentation(g: Graph, labels: DataFrame) -> dict:
    """PartitionFragmentation (``community/PartitionFragmentation.cpp``):
    per cluster, 1 − (largest connected piece of the cluster) / |cluster|
    where pieces come from intersecting the partition with the graph's
    connected components. Reuses the large-star/small-star CC kernel."""
    from networkit_spark.operators.components import connected_components

    cc = connected_components(g).withColumnRenamed("label", "cc")
    ints = labels.join(cc, "node")
    piece_sizes = ints.groupBy("label", "cc").agg(F.count(F.lit(1)).alias("psz"))
    sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("sz"))
    vals = (
        piece_sizes.groupBy("label")
        .agg(F.max("psz").alias("maxp"))
        .join(sizes, "label")
        .select(
            F.col("label").alias("cluster"),
            "sz",
            (F.lit(1.0) - F.col("maxp") / F.col("sz")).alias("value"),
        )
    )
    return _measure_summary(vals, labels)


def stable_partition_nodes(g: Graph, labels: DataFrame) -> dict:
    """StablePartitionNodes (``community/StablePartitionNodes.cpp:18-55``):
    a node is stable iff it is isolated, or its own-label neighbor weight
    is positive and strictly exceeds every other label's neighbor weight.
    Returns the summary dict plus ``stable_fraction`` (global share of
    stable nodes). One neighbor-label aggregation — no iteration."""
    nbr = (
        g.symmetrized_edges() if g.directed else g.edges
    ).join(
        labels.select(F.col("node").alias("dst"), F.col("label").alias("lv")), "dst"
    )
    per_label_w = nbr.groupBy(F.col("src").alias("node"), "lv").agg(
        F.sum("weight").alias("w")
    )
    own = labels.withColumnRenamed("label", "own")
    joined = per_label_w.join(own, "node")
    stat = joined.groupBy("node").agg(
        F.max(F.when(F.col("lv") == F.col("own"), F.col("w")).otherwise(0.0)).alias(
            "own_w"
        ),
        F.max(F.when(F.col("lv") != F.col("own"), F.col("w")).otherwise(0.0)).alias(
            "other_max"
        ),
    )
    marked = (
        labels.join(stat, "node", "left")
        .select(
            "node",
            "label",
            F.when(F.col("own_w").isNull(), F.lit(True))  # isolated: stable
            .otherwise(
                (F.col("own_w") > 0) & (F.col("other_max") < F.col("own_w"))
            )
            .alias("stable"),
        )
    )
    per_cluster = marked.groupBy(F.col("label").alias("cluster")).agg(
        F.count(F.lit(1)).alias("sz"),
        F.avg(F.col("stable").cast("double")).alias("value"),
    )
    out = _measure_summary(per_cluster, labels)
    total = marked.agg(
        F.avg(F.col("stable").cast("double")).alias("f")
    ).collect()[0]["f"]
    out["stable_fraction"] = float(total or 0.0)
    return out


def _measure_summary(vals: DataFrame, labels: DataFrame) -> dict:
    """The reference's shared LocalPartitionEvaluation summary: unweighted
    average over non-empty clusters, size-weighted average over nodes,
    min, max (``community/LocalPartitionEvaluation.hpp`` contract)."""
    n = labels.count()
    row = vals.agg(
        F.avg("value").alias("unweighted_avg"),
        (F.sum(F.col("value") * F.col("sz")) / F.lit(float(n))).alias("weighted_avg"),
        F.min("value").alias("min"),
        F.max("value").alias("max"),
    ).collect()[0]
    return {
        "unweighted_avg": float(row["unweighted_avg"] or 0.0),
        "weighted_avg": float(row["weighted_avg"] or 0.0),
        "min": float(row["min"] or 0.0),
        "max": float(row["max"] or 0.0),
    }


def permanence(g: Graph, labels: DataFrame) -> DataFrame:
    """PermanenceCentrality (``centrality/PermanenceCentrality.cpp:112-160``):
    per node, I/(E_max · deg) − (1 − C_in) where I = same-community
    neighbors, E_max = largest single external community's neighbor count
    (floored at 1), C_in = clustering among the internal neighbors.

    Plan: one neighbor-label aggregation + one internal-wedge join —
    the wedge join is the LCC cost envelope (bounded by Σ d_int²)."""
    sym = (g.symmetrized_edges() if g.directed else g.edges).filter(
        F.col("src") != F.col("dst")
    ).select("src", "dst").dropDuplicates(["src", "dst"])
    lab = labels.select(F.col("node").alias("id"), "label")
    nbr = (
        sym.join(lab.withColumnRenamed("id", "src").withColumnRenamed("label", "lu"), "src")
        .join(lab.withColumnRenamed("id", "dst").withColumnRenamed("label", "lv"), "dst")
    )
    per_label = nbr.groupBy(F.col("src").alias("id"), "lu", "lv").agg(
        F.count(F.lit(1)).alias("c")
    )
    agg = per_label.groupBy("id").agg(
        F.sum(F.when(F.col("lu") == F.col("lv"), F.col("c")).otherwise(0)).alias("i"),
        F.max(F.when(F.col("lu") != F.col("lv"), F.col("c")).otherwise(0)).alias(
            "emax"
        ),
        F.sum("c").alias("deg"),
    )
    # internal clustering: triangles among internal neighbors
    internal = nbr.filter(F.col("lu") == F.col("lv")).select(
        F.col("src").alias("id"), F.col("dst").alias("y")
    )
    wedges = (
        internal.join(internal.withColumnRenamed("y", "z"), "id")
        .filter(F.col("y") < F.col("z"))
    )
    tri = (
        wedges.join(
            sym.select(F.col("src").alias("y"), F.col("dst").alias("z")), ["y", "z"],
            "left_semi",
        )
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("t"))
    )
    out = (
        lab.join(agg, "id", "left")
        .join(tri, "id", "left")
        .select(
            "id",
            F.coalesce("i", F.lit(0)).alias("i"),
            F.greatest(F.coalesce("emax", F.lit(0)), F.lit(1)).alias("emax"),
            F.coalesce("deg", F.lit(0)).alias("deg"),
            F.coalesce("t", F.lit(0)).alias("t"),
        )
    )
    cin = F.when(
        F.col("i") >= 2,
        F.col("t") / (0.5 * F.col("i") * (F.col("i") - 1)),
    ).otherwise(F.lit(0.0))
    perm = F.when(
        F.col("deg") > 0,
        F.col("i") / (F.col("emax") * F.col("deg")) - (F.lit(1.0) - cin),
    ).otherwise(F.lit(0.0))
    return out.select("id", perm.alias("permanence"))


def overlapping_nmi_distance(
    cover_x: DataFrame,
    cover_y: DataFrame,
    n: int,
    normalization: str = "max",
) -> float:
    """Overlapping NMI dissimilarity between two covers
    (``community/OverlappingNMIDistance.cpp``, McDaid-Greene-Hurley NMI):
    1 − NMI with the chosen normalization (``min`` / ``geometric_mean``
    / ``arithmetic_mean`` / ``max`` / ``joint_entropy``; default max,
    like the reference).

    Covers are (node, subset) DataFrames — a node may belong to any
    number of subsets. All statistics are three aggregations (per-subset
    sizes ×2 + one intersection groupBy); the per-(i, j) adjusted
    conditional entropies and the per-i minima are column expressions,
    so nothing node-scaled ever reaches the driver.
    """
    import math

    cx = cover_x.select(
        F.col(cover_x.columns[0]).cast("long").alias("node"),
        F.col(cover_x.columns[1]).cast("long").alias("i"),
    ).dropDuplicates()
    cy = cover_y.select(
        F.col(cover_y.columns[0]).cast("long").alias("node"),
        F.col(cover_y.columns[1]).cast("long").alias("j"),
    ).dropDuplicates()
    sx = cx.groupBy("i").agg(F.count(F.lit(1)).alias("szx"))
    sy = cy.groupBy("j").agg(F.count(F.lit(1)).alias("szy"))
    inter = cx.join(cy, "node").groupBy("i", "j").agg(F.count(F.lit(1)).alias("isz"))

    def h(w, nn):  # column partial entropy -w*log2(w/n)
        return F.when(w > 0, -w.cast("double") * F.log2(w.cast("double") / nn)).otherwise(0.0)

    def entropy_col(size):
        return h(size, float(n)) + h(F.lit(n) - size, float(n))

    x_empty = sx.limit(1).count() == 0
    y_empty = sy.limit(1).count() == 0
    if x_empty != y_empty:
        return 1.0
    if x_empty and y_empty:
        return 0.0

    hx = float(sx.agg(F.sum(entropy_col(F.col("szx")))).collect()[0][0] or 0.0)
    hy = float(sy.agg(F.sum(entropy_col(F.col("szy")))).collect()[0][0] or 0.0)

    def cond_entropy(sizes_a, sizes_b, a_col, b_col, sz_a, sz_b):
        """H(A|B) = Σ_i min(H(A_i), min_j H*(A_i|B_j) over intersecting j)."""
        pairs = (
            inter.join(sizes_a, a_col)
            .join(sizes_b, b_col)
        )
        a = F.lit(n) + F.col("isz") - F.col(sz_a) - F.col(sz_b)
        b = F.col(sz_b) - F.col("isz")
        c = F.col(sz_a) - F.col("isz")
        d = F.col("isz")
        h_joint = h(a, float(n)) + h(b, float(n)) + h(c, float(n)) + h(d, float(n))
        adjusted = F.when(
            h(a, float(n)) + h(d, float(n)) >= h(b, float(n)) + h(c, float(n)),
            h_joint - entropy_col(F.col(sz_b)),
        ).otherwise(entropy_col(F.col(sz_a)))
        best = pairs.groupBy(a_col).agg(F.min(adjusted).alias("m"))
        per_i = (
            sizes_a.join(best, a_col, "left")
            .select(F.least(entropy_col(F.col(sz_a)), F.coalesce("m", F.lit(float("inf")))).alias("v"))
        )
        return float(per_i.agg(F.sum("v")).collect()[0][0] or 0.0)

    h_x_given_y = cond_entropy(sx, sy, "i", "j", "szx", "szy")
    h_y_given_x = cond_entropy(sy, sx, "j", "i", "szy", "szx")
    mi = 0.5 * ((hx - h_x_given_y) + (hy - h_y_given_x))

    hx_c = max(hx, 0.0)
    hy_c = max(hy, 0.0)
    if hx_c == 0.0 and hy_c == 0.0:
        nmi = 1.0
    elif (hx_c == 0.0 or hy_c == 0.0) and normalization in ("min", "geometric_mean"):
        nmi = 0.0
    else:
        if normalization == "min":
            nmi = mi / min(hx_c, hy_c)
        elif normalization == "geometric_mean":
            nmi = mi / math.sqrt(hx_c * hy_c)
        elif normalization == "arithmetic_mean":
            nmi = 2.0 * mi / (hx_c + hy_c)
        elif normalization == "max":
            nmi = mi / max(hx_c, hy_c)
        elif normalization == "joint_entropy":
            nmi = mi / (hx_c + hy_c - mi)
        else:
            raise ValueError(f"unknown normalization {normalization!r}")
    if math.isnan(nmi):
        nmi = 0.0
    nmi = min(max(nmi, 0.0), 1.0)
    return 1.0 - nmi


def partition_intersection(a: DataFrame, b: DataFrame) -> DataFrame:
    """PartitionIntersection (``community/PartitionIntersection.cpp``):
    the coarsest partition refining both inputs — nodes share a cluster
    iff they share one in A AND in B. Returns (node, label) with label =
    the smallest node id of each intersection cell (the same canonical
    labeling as the component kernels)."""
    pa = a.select(
        F.col(a.columns[0]).cast("long").alias("node"),
        F.col(a.columns[1]).cast("long").alias("la"),
    )
    pb = b.select(
        F.col(b.columns[0]).cast("long").alias("node"),
        F.col(b.columns[1]).cast("long").alias("lb"),
    )
    cells = pa.join(pb, "node")
    reps = cells.groupBy("la", "lb").agg(F.min("node").alias("label"))
    return cells.join(reps, ["la", "lb"]).select("node", "label")


# --------------------------------------------------------------------------
# round-7 cover measures + sampled Rand + dynamic NMI
# --------------------------------------------------------------------------


def _cover_summary(vals: DataFrame, memberships: int) -> dict:
    """LocalCoverEvaluation summary (``community/LocalCoverEvaluation``
    contract): unweighted average over non-empty clusters, average
    weighted by cluster size over total MEMBERSHIPS (not nodes — a node
    counts once per subset it belongs to), min, max. ``vals``:
    (subset, value, sz)."""
    row = vals.agg(
        F.avg("value").alias("ua"),
        (F.sum(F.col("value") * F.col("sz")) / F.lit(float(memberships))).alias("wa"),
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
    ).collect()[0]
    return {
        "unweighted_avg": float(row["ua"] or 0.0),
        "weighted_avg": float(row["wa"] or 0.0),
        "min": float(row["mn"] or 0.0),
        "max": float(row["mx"] or 0.0),
    }


def cover_f1_similarity(g: Graph, cover: DataFrame, reference: DataFrame) -> dict:
    """CoverF1Similarity (``community/CoverF1Similarity.cpp:14-77``):
    per cluster of ``cover``, the best F1 against any overlapping
    reference cluster (precision = overlap/|ref cluster|, recall =
    overlap/|cluster|). Covers are (node, subset) membership tables.
    Returns the LocalCoverEvaluation summary dict + ``values``
    (subset, value, sz). Plan: one membership join → per-(subset, ref)
    overlap counts → per-subset max — two shuffles."""
    c = cover.select("node", F.col("subset").alias("cs"))
    r = reference.select("node", F.col("subset").alias("rs"))
    csz = c.groupBy("cs").agg(F.count(F.lit(1)).alias("csz"))
    rsz = r.groupBy("rs").agg(F.count(F.lit(1)).alias("rsz"))
    overlap = (
        c.join(r, "node")
        .groupBy("cs", "rs")
        .agg(F.count(F.lit(1)).alias("ol"))
        .join(csz, "cs")
        .join(rsz, "rs")
    )
    f1 = overlap.withColumn(
        "f1",
        2.0
        * (F.col("ol") / F.col("rsz"))
        * (F.col("ol") / F.col("csz"))
        / (F.col("ol") / F.col("rsz") + F.col("ol") / F.col("csz")),
    )
    best = f1.groupBy("cs").agg(F.max("f1").alias("value"))
    vals = (
        csz.join(best, "cs", "left")
        .fillna(0.0, subset=["value"])
        .select(F.col("cs").alias("subset"), "value", F.col("csz").alias("sz"))
    )
    memberships = c.count()
    out = _cover_summary(vals, memberships)
    out["values"] = vals
    return out


def cover_hub_dominance(g: Graph, cover: DataFrame) -> dict:
    """CoverHubDominance (``community/CoverHubDominance.cpp:7-64``):
    per subset, max internal degree / (size − 1) (1 for singletons);
    internal = neighbor shares the subset. Summary dict + ``values``."""
    c = cover.select("node", "subset")
    sizes = c.groupBy("subset").agg(F.count(F.lit(1)).alias("sz"))
    e = (g.symmetrized_edges() if g.directed else g.edges).filter(
        F.col("src") != F.col("dst")
    )
    internal = (
        e.join(c.select(F.col("node").alias("src"), "subset"), "src")
        .join(c.select(F.col("node").alias("dst"), F.col("subset").alias("s2")), "dst")
        .filter(F.col("subset") == F.col("s2"))
        .groupBy("subset", "src")
        .agg(F.count(F.lit(1)).alias("ideg"))
        .groupBy("subset")
        .agg(F.max("ideg").alias("mx"))
    )
    vals = sizes.join(internal, "subset", "left").select(
        "subset",
        F.when(F.col("sz") > 1, F.coalesce("mx", F.lit(0)) / (F.col("sz") - 1))
        .otherwise(F.lit(1.0))
        .alias("value"),
        "sz",
    )
    out = _cover_summary(vals, c.count())
    out["values"] = vals
    return out


def sampled_node_structural_rand_dissimilarity(
    a: DataFrame, b: DataFrame, max_samples: int = 1000, seed: int = 42
) -> float:
    """SampledNodeStructuralRandMeasure
    (``community/SampledNodeStructuralRandMeasure.cpp``): the node-pair
    Rand dissimilarity estimated from ``max_samples`` sampled pairs.
    The reference draws pairs with its sequential RNG; here the sample
    is the ``max_samples`` smallest md5-ranked node pairs drawn from a
    deterministic pairing of hash-shuffled nodes — uniform, seeded, and
    identical at any parallelism (documented deviation)."""
    from networkit_spark.functions.porthash import md5_mod

    nodes = a.select("node").join(b.select("node"), "node")
    ranked = nodes.select(
        "node", md5_mod(F.col("node"), salt=f"snsr{seed}:").alias("h")
    ).withColumn("rk", F.row_number().over(Window.orderBy("h", "node")))
    pairs = (
        ranked.alias("x")
        .join(
            ranked.alias("y"),
            (F.col("y.rk") == F.col("x.rk") + 1)
            & (F.col("x.rk") <= max_samples),  # rank filter, not limit:
            # limit() on an unordered join picks arbitrary rows
        )
        .select(F.col("x.node").alias("u"), F.col("y.node").alias("v"))
    )
    la = a.withColumnRenamed("label", "l")
    lb = b.withColumnRenamed("label", "m")
    j = (
        pairs.join(la.select(F.col("node").alias("u"), F.col("l").alias("lu")), "u")
        .join(la.select(F.col("node").alias("v"), F.col("l").alias("lv")), "v")
        .join(lb.select(F.col("node").alias("u"), F.col("m").alias("mu")), "u")
        .join(lb.select(F.col("node").alias("v"), F.col("m").alias("mv")), "v")
    )
    row = j.agg(
        F.sum(
            F.when(
                ((F.col("lu") == F.col("lv")) & (F.col("mu") == F.col("mv")))
                | ((F.col("lu") != F.col("lv")) & (F.col("mu") != F.col("mv"))),
                1.0,
            ).otherwise(0.0)
        ).alias("agree"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    if not row["n"]:
        return 0.0
    return 1.0 - float(row["agree"]) / float(row["n"])


def sampled_graph_structural_rand_dissimilarity(
    g: Graph, a: DataFrame, b: DataFrame, max_samples: int = 1000, seed: int = 42
) -> float:
    """SampledGraphStructuralRandMeasure
    (``community/SampledGraphStructuralRandMeasure.cpp``): Rand
    dissimilarity over sampled EDGES. Sample = the ``max_samples``
    smallest md5-ranked canonical edges (uniform over edges; the
    reference's node-then-neighbor draw is degree-biased — documented
    deviation, both estimate the same edge-pair agreement rate)."""
    from networkit_spark.functions.porthash import md5_mod

    edges = (
        g.canonical_undirected_edges()
        .withColumn(
            "h",
            md5_mod(F.col("src") * F.lit(1_000_003) + F.col("dst"), salt=f"sgsr{seed}:"),
        )
        .orderBy("h", "src", "dst")
        .limit(max_samples)
        .select(F.col("src").alias("u"), F.col("dst").alias("v"))
    )
    la = a.withColumnRenamed("label", "l")
    lb = b.withColumnRenamed("label", "m")
    j = (
        edges.join(la.select(F.col("node").alias("u"), F.col("l").alias("lu")), "u")
        .join(la.select(F.col("node").alias("v"), F.col("l").alias("lv")), "v")
        .join(lb.select(F.col("node").alias("u"), F.col("m").alias("mu")), "u")
        .join(lb.select(F.col("node").alias("v"), F.col("m").alias("mv")), "v")
    )
    row = j.agg(
        F.sum(
            F.when(
                ((F.col("lu") == F.col("lv")) & (F.col("mu") == F.col("mv")))
                | ((F.col("lu") != F.col("lv")) & (F.col("mu") != F.col("mv"))),
                1.0,
            ).otherwise(0.0)
        ).alias("agree"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    if not row["n"]:
        return 0.0
    return 1.0 - float(row["agree"]) / float(row["n"])


def dynamic_nmi_distance(g: Graph, old: DataFrame, new: DataFrame) -> float:
    """DynamicNMIDistance (``community/DynamicNMIDistance.cpp:9-100``):
    NMI distance between two clustering snapshots restricted to the
    nodes present in BOTH (isInBoth) and in the new graph — exactly the
    inner join :func:`nmi_distance` already computes, with the node set
    additionally filtered to g's."""
    ids = g.nodes.select(F.col("id").alias("node"))
    return nmi_distance(old.join(ids, "node"), new.join(ids, "node"))
