"""Biconnected components — distributed Tarjan-Vishkin.

Reference: ``components/BiconnectedComponents.cpp`` (sequential
Hopcroft-Tarjan DFS) and ``components/test/BiconnectedComponentsGTest.cpp``
(tiny fixture: 9 nodes / 11 edges → 4 components). A DFS is inherently
sequential, so we use the Tarjan-Vishkin (1985) construction instead —
the classic PARALLEL biconnectivity algorithm, which works over ANY
rooted spanning forest:

1. spanning forest (Borůvka, O(log n) rounds) + root = min node per tree;
2. parent/depth via BFS over tree edges (O(height) rounds);
3. subtree sizes ``nd`` bottom-up, preorder ``pre`` top-down (sibling
   prefix-sums via a per-parent window — bounded by max degree);
4. ``low``/``high`` = min/max preorder reachable from each subtree via a
   single non-tree hop, bottom-up;
5. auxiliary graph on tree edges (each identified by its child vertex):
   - rule A: non-tree edge (u, w) with u, w unrelated in the tree →
     aux edge {e_u, e_w};
   - rule B: tree edge (v, w), v non-root → aux edge {e_v, e_w} iff
     low(w) < pre(v) or high(w) ≥ pre(v) + nd(v) (some edge escapes
     v's subtree from inside w's);
6. connected components of the auxiliary graph (reuse the
   large-star/small-star kernel) = biconnected components; non-tree
   edges inherit the component of their deeper endpoint's tree edge.

Scale shape: every step is a keyed join/agg over the edge or vertex
table; the per-parent preorder window is the only skew-sensitive spot
(bounded by max degree — the same bound as the triangle orientation).
Rounds: O(log n) Borůvka + O(tree height) for the traversals. On
small-world graphs height ≈ diameter; on pathological chains it is O(n),
the documented trade-off shared with every BFS-depth-bound kernel here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.pin import pin


def _bfs_forest(spark, sym: DataFrame, roots: DataFrame):
    """BFS spanning forest over the FULL graph: (node, parent, depth) —
    parent = the MINIMUM discoverer (deterministic at any parallelism).
    One traversal replaces the round-2 Borůvka-forest + tree-BFS pair:
    the parent pointers ARE the spanning forest, at O(diameter) rounds
    with no per-round component contraction."""
    frontier = roots.select(
        F.col("id").alias("node"), F.lit(None).cast("long").alias("parent"),
        F.lit(0).alias("depth"),
    ).transform(pin)
    acc = frontier
    depth = 0
    while True:
        depth += 1
        nxt = (
            sym.join(
                frontier.select(F.col("node").alias("src"), F.col("node").alias("p")),
                "src",
            )
            .join(acc.select(F.col("node").alias("dst")), "dst", "left_anti")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("p").alias("parent"))
            .select("node", "parent", F.lit(depth).alias("depth"))
        )
        nxt = nxt.transform(pin)
        if nxt.isEmpty():
            break
        acc = acc.unionByName(nxt).transform(pin)
        frontier = nxt
    return acc, depth - 1


def biconnected_components(g: Graph) -> DataFrame:
    """(src, dst, comp) — biconnected-component id per canonical
    undirected edge (src < dst, self-loops dropped). Component ids are
    canonical: the minimum child-vertex id among the component's tree
    edges (relabel-invariant comparisons should use co-membership)."""
    from networkit_spark.operators.components import connected_components

    spark = g.edges.sparkSession
    edges = g.canonical_undirected_edges().select("src", "dst").localCheckpoint(
        eager=True
    )
    sym_all = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).transform(pin)

    comp = connected_components(g)  # (node, label = min member)
    roots = comp.filter(F.col("node") == F.col("label")).select(
        F.col("node").alias("id")
    )

    par, height = _bfs_forest(spark, sym_all, roots)
    par = par.transform(pin)
    tree = par.filter(F.col("parent").isNotNull()).select(
        F.least("parent", "node").alias("src"),
        F.greatest("parent", "node").alias("dst"),
    ).transform(pin)

    # subtree sizes bottom-up: iterate depths from deepest to 0
    cur = None  # (node, nd) finalized for depth > d
    for d in range(height, -1, -1):
        lvl = par.filter(F.col("depth") == d).select("node", "parent")
        if cur is None:
            child_sum = spark.createDataFrame([], "parent long, s long")
        else:
            child_sum = cur.join(
                par.select("node", "parent"), "node"
            ).groupBy("parent").agg(F.sum("nd").alias("s"))
        lvl_nd = lvl.join(
            child_sum.withColumnRenamed("parent", "node"), "node", "left"
        ).select("node", "parent", (F.lit(1) + F.coalesce("s", F.lit(0))).alias("nd"))
        cur = (
            lvl_nd.select("node", "nd")
            if cur is None
            else cur.unionByName(lvl_nd.select("node", "nd"))
        )
        cur = cur.transform(pin)
    nd = cur  # (node, nd)

    # preorder top-down: pre(c) = pre(parent) + 1 + Σ nd(earlier siblings)
    w_sib = (
        Window.partitionBy("parent")
        .orderBy("node")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    child_off = (
        par.filter(F.col("parent").isNotNull())
        .join(nd, "node")
        .withColumn("sib_off", F.coalesce(F.sum("nd").over(w_sib), F.lit(0)))
        .select("node", "parent", "depth", "sib_off")
    ).transform(pin)

    pre = par.filter(F.col("depth") == 0).select(
        "node", F.lit(0).cast("long").alias("pre")
    ).transform(pin)
    for d in range(1, height + 1):
        lvl = child_off.filter(F.col("depth") == d)
        lvl_pre = lvl.join(
            pre.select(F.col("node").alias("parent"), F.col("pre").alias("ppre")),
            "parent",
        ).select(
            "node", (F.col("ppre") + 1 + F.col("sib_off")).alias("pre")
        )
        pre = pre.unionByName(lvl_pre).transform(pin)

    vinfo = (
        par.join(nd, "node").join(pre, "node").select("node", "parent", "depth", "nd", "pre")
    ).transform(pin)

    # non-tree edges (canonical) = edges minus tree
    nontree = edges.join(tree, ["src", "dst"], "left_anti").transform(pin)
    nontree_sym = nontree.unionByName(
        nontree.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )

    # low/high: base = min/max(pre(self), pre of non-tree neighbors)
    nb = nontree_sym.join(
        vinfo.select(F.col("node").alias("dst"), F.col("pre").alias("npre")), "dst"
    ).groupBy(F.col("src").alias("node")).agg(
        F.min("npre").alias("nmin"), F.max("npre").alias("nmax")
    )
    lowhigh = (
        vinfo.join(nb, "node", "left")
        .select(
            "node",
            "parent",
            "depth",
            F.least("pre", F.coalesce("nmin", F.col("pre"))).alias("low"),
            F.greatest("pre", F.coalesce("nmax", F.col("pre"))).alias("high"),
        )
    )
    cur = None  # (node, low, high) finalized for depth > d
    for d in range(height, -1, -1):
        lvl = lowhigh.filter(F.col("depth") == d)
        if cur is not None:
            agg = (
                cur.join(par.select("node", "parent"), "node")
                .groupBy("parent")
                .agg(F.min("low").alias("clow"), F.max("high").alias("chigh"))
            )
            lvl = lvl.join(
                agg.withColumnRenamed("parent", "node"), "node", "left"
            ).select(
                "node",
                F.least("low", F.coalesce("clow", F.col("low"))).alias("low"),
                F.greatest("high", F.coalesce("chigh", F.col("high"))).alias("high"),
            )
        else:
            lvl = lvl.select("node", "low", "high")
        cur = lvl if cur is None else cur.unionByName(lvl)
        cur = cur.transform(pin)
    lh = cur  # (node, low, high)

    info = vinfo.join(lh.select("node", "low", "high"), "node").localCheckpoint(
        eager=True
    )

    iu = info.select(
        F.col("node").alias("src"),
        F.col("pre").alias("pre_u"),
        F.col("nd").alias("nd_u"),
    )
    iw = info.select(
        F.col("node").alias("dst"),
        F.col("pre").alias("pre_w"),
        F.col("nd").alias("nd_w"),
    )
    nt = nontree.join(iu, "src").join(iw, "dst")
    unrelated = nt.filter(
        ~(
            (F.col("pre_u") <= F.col("pre_w"))
            & (F.col("pre_w") < F.col("pre_u") + F.col("nd_u"))
        )
        & ~(
            (F.col("pre_w") <= F.col("pre_u"))
            & (F.col("pre_u") < F.col("pre_w") + F.col("nd_w"))
        )
    )
    aux_a = unrelated.select(F.col("src").alias("a"), F.col("dst").alias("b"))

    # rule B over tree edges (v=parent of w, v non-root)
    tb = (
        info.filter(F.col("parent").isNotNull())
        .select(
            F.col("node").alias("w"),
            F.col("parent").alias("v"),
            F.col("low").alias("low_w"),
            F.col("high").alias("high_w"),
        )
        .join(
            info.select(
                F.col("node").alias("v"),
                F.col("parent").alias("v_parent"),
                F.col("pre").alias("pre_v"),
                F.col("nd").alias("nd_v"),
            ),
            "v",
        )
        .filter(F.col("v_parent").isNotNull())
        .filter(
            (F.col("low_w") < F.col("pre_v"))
            | (F.col("high_w") >= F.col("pre_v") + F.col("nd_v"))
        )
    )
    aux_b = tb.select(F.col("v").alias("a"), F.col("w").alias("b"))

    aux_nodes = info.filter(F.col("parent").isNotNull()).select(
        F.col("node").alias("id")
    )
    aux_edges = aux_a.unionByName(aux_b).select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    )
    aux_g = Graph(
        nodes=aux_nodes,
        edges=aux_edges.unionByName(
            aux_edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ),
        directed=False,
        weighted=False,
    )
    aux_cc = connected_components(aux_g).select(
        F.col("node").alias("child"), F.col("label").alias("comp")
    ).transform(pin)

    # tree edge (parent(w), w) → comp(w); emit canonical
    tree_lab = (
        info.filter(F.col("parent").isNotNull())
        .join(aux_cc, info["node"] == aux_cc["child"])
        .select(
            F.least("parent", "node").alias("src"),
            F.greatest("parent", "node").alias("dst"),
            "comp",
        )
    )
    # non-tree related edge → comp of the DEEPER endpoint (the descendant);
    # unrelated → comp of either endpoint (rule A put them in one comp)
    desc = F.when(
        (F.col("pre_u") <= F.col("pre_w"))
        & (F.col("pre_w") < F.col("pre_u") + F.col("nd_u")),
        F.col("dst"),
    ).otherwise(F.col("src"))
    nt_lab = nt.select("src", "dst", desc.alias("child")).join(aux_cc, "child").select(
        "src", "dst", "comp"
    )
    return tree_lab.unionByName(nt_lab)


def number_of_biconnected_components(g: Graph) -> int:
    return biconnected_components(g).select("comp").distinct().count()


def articulation_points(g: Graph) -> DataFrame:
    """(id) — vertices whose incident edges span ≥ 2 biconnected
    components (the standard characterization; isolated vertices and
    single-component vertices excluded)."""
    lab = biconnected_components(g)
    incident = lab.select(F.col("src").alias("id"), "comp").unionByName(
        lab.select(F.col("dst").alias("id"), "comp")
    )
    return (
        incident.groupBy("id")
        .agg(F.countDistinct("comp").alias("k"))
        .filter(F.col("k") >= 2)
        .select("id")
    )
