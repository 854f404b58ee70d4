"""Edge-list readers — Spark-native equivalents of the ``io/`` module.

- ``read_edge_list``: configurable text edge list (separator, comment
  prefix, firstNode offset) — ``io/EdgeListReader.cpp`` semantics.
- ``read_snap``: whitespace pairs, ``#`` comments, dedupes multi-edges and
  remaps ids to dense 0..n-1 (``io/SNAPGraphReader.cpp:18-111``).
- ``read_metis``: METIS adjacency format (header "n m [fmt]", 1-based
  neighbor lists) — ``io/METISGraphReader.cpp``.

All of these are ``spark.read`` scans + column ops; the remap is the
rank-join from ids.py. Writers: ``write_edge_list`` (csv) and Parquet via
plain ``df.write`` — our native format is Parquet adjacency (SURVEY §2.1).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.ids import remap_edges


def read_edge_list(
    spark: SparkSession,
    path: str,
    separator: str = "\t",
    comment_prefix: str = "#",
    first_node: int = 0,
    directed: bool = False,
    continuous: bool = True,
    weighted: bool = False,
) -> Graph:
    """EdgeListReader (``io/EdgeListReader.hpp:38``)."""
    df = spark.read.csv(path, sep=separator, comment=comment_prefix or None)
    cols = [F.col("_c0").cast("long"), F.col("_c1").cast("long")]
    if weighted and "_c2" in df.columns:
        cols.append(F.col("_c2").cast("double").alias("weight"))
    e = df.select(*cols).toDF(*(["src", "dst", "weight"][: len(cols)]))
    if first_node:
        e = e.withColumn("src", F.col("src") - first_node).withColumn(
            "dst", F.col("dst") - first_node
        )
    if not continuous:
        e, _ = remap_edges(e)
    return Graph.from_edges(e, directed=directed, weighted=weighted)


def read_snap(
    spark: SparkSession,
    path: str,
    directed: bool = False,
    return_mapping: bool = False,
) -> Graph | tuple[Graph, "DataFrame"]:
    """SNAPGraphReader: whitespace pairs, # comments, dedupe, dense remap
    (``io/SNAPGraphReader.cpp:18-111``). The remap is deterministic
    sort-order, not the reference's single-threaded first-seen order (see
    ``ids.py`` module docstring); ``return_mapping=True`` additionally
    returns the (key, id) frame so callers can translate back to external
    ids for relabel-invariant parity checks."""
    lines = spark.read.text(path).filter(
        ~F.col("value").startswith("#") & (F.trim("value") != "")
    )
    parts = F.split(F.trim(F.col("value")), r"\s+")
    e = lines.select(
        parts.getItem(0).cast("long").alias("src"),
        parts.getItem(1).cast("long").alias("dst"),
    )
    e, mapping = remap_edges(e)
    g = Graph.from_edges(e, directed=directed, dedupe=True)
    if return_mapping:
        return g, mapping
    return g


def read_metis(spark: SparkSession, path: str) -> Graph:
    """METISGraphReader: line i (1-based, after header) lists neighbors of
    node i-1 as 1-based ids (``io/METISGraphReader.cpp``)."""
    # zipWithIndex is distributed (per-partition counts + offsets) —
    # unlike a global row_number window, which funnels the whole file
    # through a single task; line order follows file byte order.
    rdd = spark.sparkContext.textFile(path).zipWithIndex()
    numbered = spark.createDataFrame(
        rdd.map(lambda t: (t[0], t[1] + 1)), "value string, ln long"
    )
    body = numbered.filter(
        (F.col("ln") > 1) & (~F.col("value").startswith("%"))
    )
    e = (
        body.select(
            (F.col("ln") - 2).alias("src"),
            F.explode(
                F.filter(F.split(F.trim("value"), r"\s+"), lambda x: x != "")
            ).alias("nbr"),
        )
        .select("src", (F.col("nbr").cast("long") - 1).alias("dst"))
        .filter(F.col("src") <= F.col("dst"))  # undirected, stored twice in file
    )
    header = numbered.filter(F.col("ln") == 1).select("value").collect()[0][0]
    n = int(header.split()[0])
    nodes = spark.range(n).select("id")
    return Graph.from_edges(e, nodes=nodes)


def write_edge_list(g: Graph, path: str, separator: str = "\t") -> None:
    """EdgeListWriter: one canonical row per edge."""
    e = g.canonical_undirected_edges() if not g.directed else g.edges.select("src", "dst")
    e.select(
        F.concat_ws(separator, F.col("src"), F.col("dst")).alias("value")
    ).write.mode("overwrite").text(path)


def write_partition(labels, path: str) -> None:
    """PartitionWriter analogue: persist a (node, label) partition as
    Parquet — the engine's native partition format (the reference's text
    format at ``io/PartitionWriter.cpp`` is line-ordered and therefore
    inherently sequential; Parquet keeps it distributed + schema'd)."""
    labels.select("node", "label").write.mode("overwrite").parquet(path)


def read_partition(spark: SparkSession, path: str):
    """Read a Parquet partition written by ``write_partition``."""
    return spark.read.parquet(path).select("node", "label")


def read_partition_text(spark: SparkSession, path: str):
    """Legacy PartitionReader (``io/PartitionReader.cpp``): text file where
    LINE i holds the subset id of node i. The format itself is
    line-ordered, so this is a small-file compatibility path: a single
    file's lines are zipped with their index (deterministic for one
    file — splits follow byte order). Use Parquet partitions at scale."""
    rdd = spark.sparkContext.textFile(path).zipWithIndex()
    return spark.createDataFrame(
        rdd.map(lambda t: (int(t[1]), int(t[0].strip()))), "node long, label long"
    )


def read_konect(spark: SparkSession, path: str) -> Graph:
    """KONECTGraphReader (``io/KONECTGraphReader.cpp``): '%' header gives
    sym/asym (undirected/directed); data lines are ``src dst [weight]``;
    node ids are remapped densely like the reference (remapNodes)."""
    lines = spark.read.text(path)
    header = [
        r["value"]
        for r in lines.filter(F.col("value").startswith("%")).limit(1).collect()
    ]
    directed = True
    if header:
        toks = header[0].lstrip("%").split()
        if toks and toks[0] in ("sym", "bip"):
            directed = False
    data = (
        lines.filter(~F.col("value").startswith("%"))
        .select(F.split(F.trim(F.col("value")), r"\s+").alias("p"))
        .filter(F.size("p") >= 2)
        .select(
            F.col("p")[0].alias("src_key"),
            F.col("p")[1].alias("dst_key"),
            F.when(F.size("p") >= 3, F.col("p")[2].cast("double"))
            .otherwise(F.lit(1.0))
            .alias("weight"),
        )
    )
    remapped, _ = remap_edges(data, "src_key", "dst_key")
    # KONECT 'multiple' handling: default discard duplicates
    return Graph.from_edges(remapped, directed=directed, dedupe=True)


def read_gml(spark: SparkSession, path: str) -> Graph:
    """GMLGraphReader (``io/GMLGraphReader.cpp``) for machine-written GML
    (the GMLGraphWriter layout: one key per line, ``source`` immediately
    followed by ``target``). Lines are indexed and source/target paired
    by adjacent index — distributed, no driver-side parser."""
    rdd = spark.sparkContext.textFile(path).zipWithIndex()
    lines = spark.createDataFrame(
        rdd.map(lambda t: (t[1], t[0].strip())), "ln long, value string"
    ).cache()
    directed = (
        lines.filter(F.col("value").rlike(r"^directed\s+1$")).limit(1).count() > 0
    )
    nodes = lines.filter(F.col("value").rlike(r"^id\s+\d+$")).select(
        F.regexp_extract("value", r"^id\s+(\d+)$", 1).cast("long").alias("id")
    )
    src = lines.filter(F.col("value").rlike(r"^source\s+\d+$")).select(
        "ln",
        F.regexp_extract("value", r"^source\s+(\d+)$", 1).cast("long").alias("src"),
    )
    dst = lines.filter(F.col("value").rlike(r"^target\s+\d+$")).select(
        (F.col("ln") - 1).alias("ln"),
        F.regexp_extract("value", r"^target\s+(\d+)$", 1).cast("long").alias("dst"),
    )
    edges = src.join(dst, "ln").select("src", "dst")
    return Graph.from_edges(edges, directed=directed, nodes=nodes)


def write_gml(g: Graph, path: str) -> None:
    """GMLGraphWriter (``io/GMLGraphWriter.cpp``) — node blocks then edge
    blocks, one canonical edge each. DISTRIBUTED: the line DataFrame is
    range-sorted by (section, keys) and written directly — no driver
    collect (the round-2 writer collected the whole graph). Each block is
    one text row (embedded newlines), so blocks never split across part
    files; concatenating parts in name order yields the canonical
    document, and ``read_gml`` round-trips the multi-file layout."""
    n_lines = g.nodes.select(
        F.concat(F.lit("  node [\n    id "), F.col("id"), F.lit("\n  ]")).alias("value"),
        F.lit(1).alias("ord"),
        F.col("id").alias("k1"),
        F.lit(0).alias("k2"),
    )
    e = g.edges if g.directed else g.canonical_undirected_edges()
    e_lines = e.select(
        F.concat(
            F.lit("  edge [\n    source "),
            F.col("src"),
            F.lit("\n    target "),
            F.col("dst"),
            F.lit("\n  ]"),
        ).alias("value"),
        F.lit(2).alias("ord"),
        F.col("src").alias("k1"),
        F.col("dst").alias("k2"),
    )
    header = "graph [" + ("\n  directed 1" if g.directed else "")
    spark = g.edges.sparkSession
    wrap = spark.createDataFrame(
        [(header, 0, 0, 0), ("]", 3, 0, 0)], "value string, ord int, k1 long, k2 long"
    )
    (
        wrap.unionByName(n_lines)
        .unionByName(e_lines)
        .orderBy("ord", "k1", "k2")
        .select("value")
        .write.mode("overwrite")
        .text(path)
    )


def read_graphml(spark: SparkSession, path: str) -> Graph:
    """GraphML reader for machine-written files with one <node>/<edge>
    element per line (the common writer layout, incl. our own
    ``write_graphml``): ids are extracted by regex, edge elements carry
    source/target on one line — a distributed line parse, no XML DOM.
    (networkit's GraphMLIO is likewise a minimal non-validating parser.)"""
    lines = spark.read.text(path)
    directed = (
        lines.filter(F.col("value").rlike('edgedefault="directed"')).limit(1).count() > 0
    )
    nodes = lines.filter(F.col("value").rlike(r'<node[^>]*id="n?\d+"')).select(
        F.regexp_extract("value", r'id="n?(\d+)"', 1).cast("long").alias("id")
    )
    e = lines.filter(F.col("value").rlike(r"<edge[^>]*source=")).select(
        F.regexp_extract("value", r'source="n?(\d+)"', 1).cast("long").alias("src"),
        F.regexp_extract("value", r'target="n?(\d+)"', 1).cast("long").alias("dst"),
    )
    return Graph.from_edges(e, directed=directed, nodes=nodes)


def write_graphml(g: Graph, path: str) -> None:
    """Minimal GraphML writer (one element per line; node ids n<i>).
    DISTRIBUTED like ``write_gml`` — ordered write, no driver collect."""
    spark = g.edges.sparkSession
    default = "directed" if g.directed else "undirected"
    head = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<graphml xmlns="http://graphml.graphdrawing.org/xmlns">',
        f'  <graph id="G" edgedefault="{default}">',
    ]
    n_lines = g.nodes.select(
        F.concat(F.lit('    <node id="n'), F.col("id"), F.lit('"/>')).alias("value"),
        F.lit(1).alias("ord"), F.col("id").alias("k1"), F.lit(0).alias("k2"),
    )
    e = g.edges if g.directed else g.canonical_undirected_edges()
    e_lines = e.select(
        F.concat(
            F.lit('    <edge source="n'), F.col("src"),
            F.lit('" target="n'), F.col("dst"), F.lit('"/>'),
        ).alias("value"),
        F.lit(2).alias("ord"), F.col("src").alias("k1"), F.col("dst").alias("k2"),
    )
    tail = ["  </graph>", "</graphml>"]
    wrap = spark.createDataFrame(
        [(v, 0, i, 0) for i, v in enumerate(head)]
        + [(v, 3, i, 0) for i, v in enumerate(tail)],
        "value string, ord int, k1 long, k2 long",
    )
    (
        wrap.unionByName(n_lines)
        .unionByName(e_lines)
        .orderBy("ord", "k1", "k2")
        .select("value")
        .write.mode("overwrite")
        .text(path)
    )


def read_matrix_market(spark: SparkSession, path: str) -> Graph:
    """MatrixMarketReader (``io/MatrixMarketReader.cpp``): '%%MatrixMarket
    matrix coordinate …' header, '%' comments, first data line is the
    size triple 'rows cols nnz', then 1-based 'i j [value]' entries.
    Symmetric banner ⇒ undirected."""
    lines = spark.read.text(path)
    header = [
        r["value"]
        for r in lines.filter(F.col("value").startswith("%%")).limit(1).collect()
    ]
    symmetric = bool(header) and "symmetric" in header[0]
    data = (
        lines.filter(~F.col("value").startswith("%"))
        .select(F.split(F.trim("value"), r"\s+").alias("p"))
        .filter(F.size("p") >= 2)
    )
    # drop the size line: it is the unique row where no other row shares
    # its position — identified instead by taking rows AFTER the max
    # entry count heuristic is fragile; the reference skips the first
    # non-comment line, so do exactly that via a filtered zipWithIndex.
    rdd = spark.sparkContext.textFile(path).zipWithIndex()
    numbered = spark.createDataFrame(
        rdd.map(lambda t: (t[0], t[1])), "value string, ln long"
    ).filter(~F.col("value").startswith("%"))
    first_ln = numbered.agg(F.min("ln")).collect()[0][0]
    body = numbered.filter(F.col("ln") > first_ln).select(
        F.split(F.trim("value"), r"\s+").alias("p")
    )
    e = body.select(
        (F.col("p")[0].cast("long") - 1).alias("src"),
        (F.col("p")[1].cast("long") - 1).alias("dst"),
        F.when(F.size("p") >= 3, F.col("p")[2].cast("double"))
        .otherwise(F.lit(1.0))
        .alias("weight"),
    )
    return Graph.from_edges(
        e, directed=not symmetric, weighted=True, dedupe=True
    )


def write_dot(g: Graph, path: str) -> None:
    """DotGraphWriter (``io/DotGraphWriter.cpp``): distributed ordered
    text write, same multi-part layout contract as ``write_gml``."""
    spark = g.edges.sparkSession
    arrow = " -> " if g.directed else " -- "
    kw = "digraph" if g.directed else "graph"
    e = g.edges if g.directed else g.canonical_undirected_edges()
    e_lines = e.select(
        F.concat(F.lit("  "), F.col("src"), F.lit(arrow), F.col("dst"), F.lit(";")).alias(
            "value"
        ),
        F.lit(1).alias("ord"),
        F.col("src").alias("k1"),
        F.col("dst").alias("k2"),
    )
    wrap = spark.createDataFrame(
        [(kw + " G {", 0, 0, 0), ("}", 2, 0, 0)],
        "value string, ord int, k1 long, k2 long",
    )
    (
        wrap.unionByName(e_lines)
        .orderBy("ord", "k1", "k2")
        .select("value")
        .write.mode("overwrite")
        .text(path)
    )


def write_cover(cover, path: str) -> None:
    """CoverWriter analogue: persist an OVERLAPPING partition — rows
    (node, subset), a node may appear in several subsets — as Parquet
    (``io/CoverWriter.cpp`` writes line-per-subset text, inherently
    sequential; Parquet keeps it distributed)."""
    cover.select("node", "subset").write.mode("overwrite").parquet(path)


def read_cover(spark: SparkSession, path: str):
    """Read a Parquet cover written by ``write_cover``."""
    return spark.read.parquet(path).select("node", "subset")


def read_cover_text(spark: SparkSession, path: str):
    """Legacy CoverReader (``io/CoverReader.cpp``): LINE i lists the
    subsets of node i (space-separated). Small-file compatibility tier,
    like ``read_partition_text``."""
    rdd = spark.sparkContext.textFile(path).zipWithIndex()
    df = spark.createDataFrame(
        rdd.map(lambda t: (int(t[1]), t[0].strip())), "node long, subsets string"
    )
    return df.select(
        "node",
        F.explode(
            F.filter(F.split("subsets", r"\s+"), lambda x: x != "")
        ).alias("subset_s"),
    ).select("node", F.col("subset_s").cast("long").alias("subset"))


def write_metis(g: Graph, path: str) -> None:
    """METISGraphWriter (``io/METISGraphWriter.cpp``): header 'n m', then
    line i = the 1-based neighbor list of node i-1. Line order IS the
    node order, produced by the same distributed ordered-text layout as
    ``write_gml`` (parts concatenate in name order). Assumes continuous
    ids 0..n-1 (compact first via ``ids.compact`` otherwise)."""
    spark = g.edges.sparkSession
    n = g.num_nodes()
    m = g.canonical_undirected_edges().count()
    sym = (g.symmetrized_edges() if g.directed else g.edges).filter(
        F.col("src") != F.col("dst")
    ).select("src", "dst").dropDuplicates(["src", "dst"])
    adj = (
        g.nodes.join(sym.withColumnRenamed("src", "id"), "id", "left")
        .groupBy("id")
        .agg(
            F.concat_ws(
                " ", F.sort_array(F.collect_list(F.col("dst") + 1))
            ).alias("value")
        )
        .select("value", F.lit(1).alias("ord"), F.col("id").alias("k1"))
    )
    wrap = spark.createDataFrame(
        [(f"{n} {m}", 0, 0)], "value string, ord int, k1 long"
    )
    (
        wrap.unionByName(adj)
        .orderBy("ord", "k1")
        .select("value")
        .write.mode("overwrite")
        .text(path)
    )


def write_snap(g: Graph, path: str) -> None:
    """SNAP-style edge-list writer (inverse of ``read_snap``): '# header'
    comment + whitespace-separated pairs, distributed ordered write."""
    spark = g.edges.sparkSession
    e = g.edges.select("src", "dst") if g.directed else g.canonical_undirected_edges()
    lines = e.select(
        F.concat_ws("\t", "src", "dst").alias("value"),
        F.lit(1).alias("ord"),
        F.col("src").alias("k1"),
        F.col("dst").alias("k2"),
    )
    wrap = spark.createDataFrame(
        [("# Directed graph" if g.directed else "# Undirected graph", 0, 0, 0)],
        "value string, ord int, k1 long, k2 long",
    )
    (
        wrap.unionByName(lines)
        .orderBy("ord", "k1", "k2")
        .select("value")
        .write.mode("overwrite")
        .text(path)
    )


def read_edge_list_partition(
    spark: SparkSession, path: str, first_node: int = 1, sep: str = "\t"
):
    """EdgeListPartitionReader (``io/EdgeListPartitionReader.cpp``):
    lines ``<node><sep><subset>`` (default firstNode=1, tab separator
    per the header); '#'-prefixed lines skip. Returns (node, label)."""
    lines = spark.read.text(path)
    parts = F.split(F.col("value"), sep)
    return (
        lines.filter(~F.col("value").startswith("#") & (F.length("value") > 0))
        .select(
            (parts.getItem(0).cast("long") - first_node).alias("node"),
            parts.getItem(1).cast("long").alias("label"),
        )
        .filter(F.col("node").isNotNull() & F.col("label").isNotNull())
    )


def write_edge_list_partition(
    labels, path: str, first_node: int = 1, sep: str = "\t"
) -> None:
    """Inverse of :func:`read_edge_list_partition` (one text part,
    node-ordered — partitions are driver-sized artifacts in the
    reference's formats)."""
    (
        labels.select(
            F.concat(
                (F.col("node") + first_node).cast("string"),
                F.lit(sep),
                F.col("label").cast("string"),
            ).alias("value")
        )
        .orderBy("value")
        .coalesce(1)
        .write.mode("overwrite")
        .text(path)
    )


def read_edge_list_cover(spark: SparkSession, path: str, first_node: int = 1):
    """EdgeListCoverReader (``io/EdgeListCoverReader.cpp``): lines
    ``<node> <subset> [<subset> ...]``; '#' comments skip. Returns the
    cover as (node, subset) rows."""
    lines = spark.read.text(path)
    toks = F.split(F.trim(F.col("value")), r"\s+")
    return (
        lines.filter(~F.col("value").startswith("#") & (F.length(F.trim("value")) > 0))
        .select(
            (toks.getItem(0).cast("long") - first_node).alias("node"),
            F.explode(F.slice(toks, 2, 1_000_000)).alias("subset_str"),
        )
        .select("node", F.col("subset_str").cast("long").alias("subset"))
        .filter(F.col("subset").isNotNull())
    )


def read_snap_edge_list_partition(spark: SparkSession, path: str):
    """SNAPEdgeListPartitionReader (``io/SNAPEdgeListPartitionReader.cpp``):
    each non-comment line lists one community's RAW node ids; the
    community id is the 1-based LINE NUMBER (the reference's ``++i``
    counts every line, comments and blanks included). Returns
    (node, subset) with raw ids — compose with the SNAP reader's remap
    to get dense ids. Line numbers come from ``zipWithIndex`` (byte
    order of one file — same caveat as ``read_partition_text``)."""
    rdd = spark.sparkContext.textFile(path).zipWithIndex()
    rows = rdd.flatMap(
        lambda t: [
            (int(tok), int(t[1]) + 1)
            for tok in (
                t[0].split() if t[0] and not t[0].startswith("#") else []
            )
        ]
    )
    return spark.createDataFrame(rows, "node long, subset long")


def write_binary_edge_list_partition(
    labels, path: str, first_node: int = 0, width: int = 4
) -> None:
    """BinaryEdgeListPartitionWriter
    (``io/BinaryEdgeListPartitionWriter.cpp``): little-endian
    fixed-width (4/8) pairs ``(node + firstNode, subset)`` in node
    order."""
    if width not in (4, 8):
        raise ValueError("Width must be 4 or 8")
    rows = labels.select("node", "label").orderBy("node").collect()
    max_label = max((int(r["label"]) for r in rows), default=0)
    if width == 4 and max_label > 0xFFFFFFFF:
        raise ValueError("partition upper bound needs width 8")
    import struct

    fmt = "<I" if width == 4 else "<Q"
    with open(path, "wb") as f:
        for r in rows:
            f.write(struct.pack(fmt, int(r["node"]) + first_node))
            f.write(struct.pack(fmt, int(r["label"])))


def read_binary_edge_list_partition(
    spark: SparkSession, path: str, first_node: int = 0, width: int = 4
):
    """BinaryEdgeListPartitionReader
    (``io/BinaryEdgeListPartitionReader.cpp``): consecutive
    little-endian (node, subset) pairs of ``width`` bytes each."""
    if width not in (4, 8):
        raise ValueError("Error: width must be 4 or 8")
    import struct

    fmt = "<I" if width == 4 else "<Q"
    rows = []
    with open(path, "rb") as f:
        data = f.read()
    step = width
    for off in range(0, len(data) - 2 * step + 1, 2 * step):
        (u,) = struct.unpack_from(fmt, data, off)
        (c,) = struct.unpack_from(fmt, data, off + step)
        rows.append((int(u) - first_node, int(c)))
    return spark.createDataFrame(rows, "node long, label long")


def write_dot_partition(g: Graph, labels, path: str) -> None:
    """DotPartitionWriter (``io/DotPartitionWriter.cpp``): undirected
    .dot with every non-isolated node filled by its cluster's hue —
    hues are idx/|clusters| over the distinct cluster ids ascending
    (the reference's ordered-set scan). Distributed ordered text write,
    same multi-part layout contract as :func:`write_dot`."""
    spark = g.edges.sparkSession
    deg = (
        (g.symmetrized_edges() if g.directed else g.edges)
        .filter(F.col("src") != F.col("dst"))
        .groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).alias("d"))
    )
    lab = labels.select("node", "label").join(deg.select("node"), "node")
    # hue map: ascending distinct cluster id -> idx/|clusters|
    from pyspark.sql import Window as _W

    dl = lab.select("label").distinct()
    k = dl.count()
    hue = dl.withColumn(
        "hue", (F.row_number().over(_W.orderBy("label")) - 1) / F.lit(float(k or 1))
    )
    n_lines = lab.join(hue, "label").select(
        F.concat(
            F.col("node").cast("string"),
            F.lit(' [style=filled, color="'),
            F.col("hue").cast("string"),
            F.lit(',0.99,0.99", label='),
            F.col("label").cast("string"),
            F.lit("];"),
        ).alias("value"),
        F.lit(1).alias("ord"),
        F.col("node").alias("k1"),
        F.lit(0).alias("k2"),
    )
    e = g.canonical_undirected_edges()
    e_lines = e.select(
        F.concat(F.col("src"), F.lit(" -- "), F.col("dst"), F.lit(";")).alias("value"),
        F.lit(2).alias("ord"),
        F.col("src").alias("k1"),
        F.col("dst").alias("k2"),
    )
    wrap = spark.createDataFrame(
        [("graph {", 0, 0, 0), ("}", 3, 0, 0)],
        "value string, ord int, k1 long, k2 long",
    )
    (
        wrap.unionByName(n_lines)
        .unionByName(e_lines)
        .orderBy("ord", "k1", "k2")
        .select("value")
        .write.mode("overwrite")
        .text(path)
    )
