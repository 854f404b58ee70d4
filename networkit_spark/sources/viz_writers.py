"""Layout output writers — GML-with-coordinates, Kinemage, EPS.

Reference: ``viz/GraphLayoutAlgorithm.hpp`` (``writeGraphToGML``,
``writeKinemage``) and ``viz/PostscriptWriter.cpp``.

Same posture as ``sources/readers.py``: every writer builds one text
row per drawable block (embedded newlines keep blocks atomic), range-
sorts by (section, keys), and writes distributed ``.text(path)`` part
files — concatenating parts in name order yields the canonical
document; no driver collect. The only driver-sized piece is the EPS
bounding box (one 4-value aggregate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph

# viz/PostscriptWriter.cpp:fromCyclicRotation — the 24-color wheel
_PS_COLORS = [
    (1.0, 0.0, 0.0), (1.0, 0.5, 0.0), (1.0, 1.0, 0.0), (0.5, 1.0, 0.0),
    (0.0, 1.0, 0.0), (0.0, 1.0, 0.5), (0.0, 1.0, 1.0), (0.0, 0.5, 1.0),
    (0.0, 0.0, 1.0), (0.5, 0.0, 1.0), (1.0, 0.0, 1.0), (1.0, 0.0, 0.5),
    (0.6, 0.0, 0.0), (0.6, 0.3, 0.0), (0.6, 0.6, 0.0), (0.3, 0.6, 0.0),
    (0.0, 0.6, 0.0), (0.0, 0.6, 0.3), (0.0, 0.6, 0.6), (0.0, 0.3, 0.6),
    (0.0, 0.0, 0.6), (0.3, 0.0, 0.6), (0.6, 0.0, 0.6), (0.6, 0.0, 0.3),
]


def _wrap_rows(spark, header: str, footer: str):
    return spark.createDataFrame(
        [(header, 0, 0, 0), (footer, 3, 0, 0)],
        "value string, ord int, k1 long, k2 long",
    )


def _write_blocks(spark, header, node_lines, edge_lines, footer, path,
                  edges_first=False):
    n_ord, e_ord = (2, 1) if edges_first else (1, 2)
    parts = (
        _wrap_rows(spark, header, footer)
        .unionByName(node_lines.withColumn("ord", F.lit(n_ord)))
        .unionByName(edge_lines.withColumn("ord", F.lit(e_ord)))
    )
    (
        parts.orderBy("ord", "k1", "k2")
        .select("value")
        .write.mode("overwrite")
        .text(path)
    )


def write_gml_layout(g: Graph, coords: DataFrame, path: str) -> None:
    """GML with per-node ``graphics [ x .. y .. (z ..) ]`` blocks
    (``GraphLayoutAlgorithm.hpp:writeGraphToGML``) — coordinates are
    scaled ×50 like the reference. ``coords`` is (id, pos array<double>)
    of dim 2 or 3 (the reference returns false outside that range; we
    raise)."""
    dim = len(coords.select("pos").first()["pos"])
    if dim not in (2, 3):
        raise ValueError(f"write_gml_layout needs dim 2 or 3, got {dim}")
    fifty = lambda i: F.format_string(  # noqa: E731
        "%.6f", F.lit(50.0) * F.element_at("pos", i)
    )
    z_part = (
        F.concat(F.lit("\n      z "), fifty(3)) if dim == 3 else F.lit("")
    )
    n_lines = coords.select(
        F.concat(
            F.lit("  node [\n    id "), F.col("id"),
            F.lit("\n    graphics\n    [ x "), fifty(1),
            F.lit("\n      y "), fifty(2), z_part,
            F.lit("\n    ]\n  ]"),
        ).alias("value"),
        F.col("id").alias("k1"),
        F.lit(0).alias("k2"),
    )
    e = g.edges if g.directed else g.canonical_undirected_edges()
    e_lines = e.select(
        F.concat(
            F.lit("  edge [\n    source "), F.col("src"),
            F.lit("\n    target "), F.col("dst"), F.lit("\n  ]"),
        ).alias("value"),
        F.col("src").alias("k1"),
        F.col("dst").alias("k2"),
    )
    header = "graph [" + ("\n  directed 1" if g.directed else "")
    _write_blocks(g.edges.sparkSession, header, n_lines, e_lines, "]", path)


def write_kinemage(g: Graph, coords: DataFrame, path: str) -> None:
    """Kinemage 3-D scene (``GraphLayoutAlgorithm.hpp:writeKinemage``):
    a balllist of node points, then a vectorlist of edges (``P`` start
    line + end line per edge). 3-D coordinates required."""
    dim = len(coords.select("pos").first()["pos"])
    if dim != 3:
        raise ValueError(f"write_kinemage needs dim 3, got {dim}")
    c = lambda i: F.format_string("%.6f", F.element_at("pos", i))  # noqa: E731
    xyz = F.concat_ws(" ", c(1), c(2), c(3))
    n_lines = coords.select(
        F.concat(F.lit("{a}"), xyz).alias("value"),
        F.col("id").alias("k1"),
        F.lit(0).alias("k2"),
    )
    pos = coords.select("id", "pos")
    e = g.edges if g.directed else g.canonical_undirected_edges()
    seg = (
        e.join(pos.withColumnRenamed("id", "src"), "src")
        .withColumnRenamed("pos", "p1")
        .join(pos.withColumnRenamed("id", "dst"), "dst")
        .withColumnRenamed("pos", "p2")
    )
    fmt = lambda col, i: F.format_string(  # noqa: E731
        "%.6f", F.element_at(col, i)
    )
    e_lines = seg.select(
        F.concat(
            F.lit("P "),
            F.concat_ws(" ", fmt("p1", 1), fmt("p1", 2), fmt("p1", 3)),
            F.lit("\n"),
            F.concat_ws(" ", fmt("p2", 1), fmt("p2", 2), fmt("p2", 3)),
        ).alias("value"),
        F.col("src").alias("k1"),
        F.col("dst").alias("k2"),
    )
    name = path[path.rfind("/"):] if "/" in path else path
    header = "\n".join([
        "@whitebackground", "@zoom 1.0", "@zslab 240", "@center 0 0 0",
        "@master{points}", "@group{" + name + "}",
        "@balllist {a} color= blue master={points} radius= 0.05",
    ])
    # edges section header rides as the footer of the node section
    e_header = "\n@subgroup {edges} dominant\n@vectorlist {edges} color= white"
    spark = g.edges.sparkSession
    parts = (
        _wrap_rows(spark, header, "")
        .unionByName(n_lines.withColumn("ord", F.lit(1)))
        .unionByName(
            spark.createDataFrame(
                [(e_header, 2, 0, 0)],
                "value string, ord int, k1 long, k2 long",
            )
        )
        .unionByName(e_lines.withColumn("ord", F.lit(2)).withColumn(
            "k1", F.col("k1") + 1  # keep the section header first
        ))
    )
    (
        parts.orderBy("ord", "k1", "k2").select("value")
        .write.mode("overwrite").text(path)
    )


def write_postscript(
    g: Graph,
    coords: DataFrame,
    path: str,
    partition: DataFrame | None = None,
    torus: bool = False,
) -> None:
    """EPS drawing (``viz/PostscriptWriter.cpp``): edges first, then
    node dots, colored by ``partition`` (node, label) through the
    24-color cyclic wheel; same-cluster edges take the cluster color,
    cross-cluster edges grey. Without a partition every node is cluster
    0 (the reference's ``makeOneClustering``). ``torus=True`` wraps edge
    vectors across the 1020-pt square like the reference's wrap-around
    branch. Coordinates are affinely mapped onto the square from one
    global min/max aggregate (the only driver-side piece)."""
    pos = coords.select(
        "id",
        F.element_at("pos", 1).alias("x"),
        F.element_at("pos", 2).alias("y"),
    )
    box = pos.agg(
        F.min("x").alias("x0"), F.max("x").alias("x1"),
        F.min("y").alias("y0"), F.max("y").alias("y1"),
    ).first()
    size = 1020.0
    sx = (size - 0.0) / (box["x1"] - box["x0"]) if box["x1"] > box["x0"] else 1.0
    sy = (size - 0.0) / (box["y1"] - box["y0"]) if box["y1"] > box["y0"] else 1.0
    adj = pos.select(
        "id",
        ((F.col("x") - F.lit(box["x0"])) * F.lit(sx)).alias("x"),
        ((F.col("y") - F.lit(box["y0"])) * F.lit(sy)).alias("y"),
    )
    lab = (
        partition.select("node", "label")
        if partition is not None
        else g.nodes.select(F.col("id").alias("node"), F.lit(0).alias("label"))
    )
    adj = adj.join(
        lab.withColumnRenamed("node", "id"), "id", "left"
    )  # label null == the reference's `none`

    color_arr = F.array(*[
        F.lit("%.3f %.3f %.3f" % c) for c in _PS_COLORS
    ])

    def cluster_color(label_col):
        return F.element_at(
            color_arr, (label_col % len(_PS_COLORS)).cast("int") + 1
        )

    e = g.edges if g.directed else g.canonical_undirected_edges()
    seg = (
        e.join(
            adj.select(
                F.col("id").alias("src"), F.col("x").alias("x1"),
                F.col("y").alias("y1"), F.col("label").alias("lu"),
            ),
            "src",
        ).join(
            adj.select(
                F.col("id").alias("dst"), F.col("x").alias("x2"),
                F.col("y").alias("y2"), F.col("label").alias("lv"),
            ),
            "dst",
        )
    )
    if torus:
        half, full = size / 2.0, size
        wrap = lambda d: F.when(d > half, d - full).when(  # noqa: E731
            d < -half, d + full
        ).otherwise(d)
        seg = seg.withColumn(
            "x2", F.col("x1") + wrap(F.col("x2") - F.col("x1"))
        ).withColumn("y2", F.col("y1") + wrap(F.col("y2") - F.col("y1")))
    same = (
        F.col("lu").isNotNull() & (F.col("lu") == F.col("lv"))
    )
    e_lines = seg.select(
        F.concat(
            F.when(same, F.concat(cluster_color(F.col("lu")), F.lit(" c ")))
            .otherwise(F.lit("0.800 0.800 0.800 c 1.000 w ")),
            F.format_string(
                "p %.3f %.3f m %.3f %.3f l s",
                F.col("x1"), F.col("y1"), F.col("x2"), F.col("y2"),
            ),
        ).alias("value"),
        F.col("src").alias("k1"),
        F.col("dst").alias("k2"),
    )
    n_lines = adj.select(
        F.concat(
            F.when(
                F.col("label").isNotNull(),
                F.concat(cluster_color(F.col("label")), F.lit(" c ")),
            ).otherwise(F.lit("0.000 0.000 0.000 c ")),
            F.format_string(
                "p %.3f %.3f 2.000 0.00 360.00 a s", F.col("x"), F.col("y")
            ),
        ).alias("value"),
        F.col("id").alias("k1"),
        F.lit(0).alias("k2"),
    )
    header = "\n".join([
        "%!PS-Adobe-3.0 EPSF-3.0" if torus else "%!PS-Adobe-1.0",
        "%%Title: networkit_spark visualization",
        "%%%%BoundingBox: 0.000 0.000 %.3f %.3f" % (size, size),
        "%%EndComments",
    ] + ([] if torus else ["%%EndProlog", "gsave"]) + [
        "/p {newpath} bind def",
        "/m {moveto} bind def",
        "/r {rmoveto} bind def",
        "/k {rlineto} bind def",
        "/l {lineto} bind def",
        "/n {rlineto} bind def",
        "/c {setrgbcolor} bind def",
        "/s {stroke} bind def",
        "/w {setlinewidth} bind def",
        "/h {show} bind def",
        "/a {arc closepath fill} bind def",
        "/b {closepath eofill} bind def",
        "0.000 0.000 0.000 c",
    ])
    footer = "" if torus else "grestore"
    _write_blocks(
        g.edges.sparkSession, header, n_lines, e_lines, footer, path,
        edges_first=True,
    )


def write_gephi_stream(
    g: Graph,
    path: str,
    values: DataFrame | None = None,
    attribute_name: str = "value",
) -> None:
    """Gephi Streaming-protocol export as a JSON-lines file
    (``networkit/gephi/streaming.py`` + ``pyclient.py``): the exact
    event lines the reference POSTs to a live Gephi master — ``an``
    node events with the deterministic ceil(√n) grid layout
    (NODE_AREA_SIZE 2000, ``streaming.py:_exportNodes``; node numbers
    are the ascending-id ordinals), then ``ae`` edge events with the
    reference's edge-id convention ('u->v' directed, 'min-max'
    undirected), then optional ``cn`` attribute events
    (``exportNodeValues``). A file of these lines pipes straight into
    the plugin (curl --data-binary per line) — the HTTP client itself
    is out of scope in a batch engine. Distributed ordered text write
    like every writer in this module."""
    import math

    spark = g.edges.sparkSession
    n = g.num_nodes()
    side = 0 if n == 0 else int(math.ceil(math.sqrt(n)))
    step = 2000.0 / side if side else 0.0
    off = 1000.0
    from pyspark.sql import Window as _W

    ordn = g.nodes.withColumn(
        "i", F.row_number().over(_W.orderBy("id")) - 1
    )
    x = (F.col("i") % side) * step - off if side else F.lit(0.0)
    y = (F.col("i") / side).cast("long") * step - off if side else F.lit(0.0)
    an = ordn.select(
        F.concat(
            F.lit('{"an": {"'),
            F.col("id").cast("string"),
            F.lit('": {"size": 2.0, "r": 0.6, "g": 0.6, "b": 0.6, "x": '),
            x.cast("string"),
            F.lit(', "y": '),
            y.cast("string"),
            F.lit("}}}"),
        ).alias("value"),
        F.lit(0).alias("ord"),
        F.col("id").alias("k1"),
        F.lit(0).alias("k2"),
    )
    if g.directed:
        e = g.edges
        eid = F.concat(F.col("src").cast("string"), F.lit("->"), F.col("dst").cast("string"))
        directed_flag = "true"
    else:
        e = g.canonical_undirected_edges()
        eid = F.concat(F.col("src").cast("string"), F.lit("-"), F.col("dst").cast("string"))
        directed_flag = "false"
    ae = e.select(
        F.concat(
            F.lit('{"ae": {"'),
            eid,
            F.lit('": {"source": "'),
            F.col("src").cast("string"),
            F.lit('", "target": "'),
            F.col("dst").cast("string"),
            F.lit(f'", "directed": {directed_flag}}}}}}}'),
        ).alias("value"),
        F.lit(1).alias("ord"),
        F.col("src").alias("k1"),
        F.col("dst").alias("k2"),
    )
    out = an.unionByName(ae)
    if values is not None:
        cn = values.select(
            F.concat(
                F.lit('{"cn": {"'),
                F.col("node").cast("string"),
                F.lit(f'": {{"{attribute_name}": '),
                F.col("value").cast("string"),
                F.lit("}}}"),
            ).alias("value"),
            F.lit(2).alias("ord"),
            F.col("node").alias("k1"),
            F.lit(0).alias("k2"),
        )
        out = out.unionByName(cn)
    out.orderBy("ord", "k1", "k2").select("value").write.mode("overwrite").text(path)
