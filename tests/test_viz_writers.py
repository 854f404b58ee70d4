"""Layout writer tests — GML-with-graphics, Kinemage, PostScript.

Reference semantics pinned: ``viz/GraphLayoutAlgorithm.hpp``
(writeGraphToGML ×50 coordinate scale, writeKinemage balllist/vectorlist
shape) and ``viz/PostscriptWriter.cpp`` (affine map onto the 1020-pt
square, 24-color cluster wheel, grey cross-cluster edges, torus wrap).
Each writer emits distributed text parts; concatenating parts in name
order is the canonical document (same convention as write_gml).
"""

import glob

import pytest

from networkit_spark.graph import Graph
from networkit_spark.sources.viz_writers import (
    write_gml_layout,
    write_kinemage,
    write_postscript,
)


def _doc(path: str) -> str:
    parts = sorted(glob.glob(path + "/part-*"))
    assert parts, f"no part files under {path}"
    return "\n".join(
        open(p).read().rstrip("\n") for p in parts if open(p).read().strip()
    )


def _coords(spark, rows, dim):
    return spark.createDataFrame(
        [(i, [float(v) for v in p]) for i, p in rows],
        "id long, pos array<double>",
    )


def test_gml_layout_blocks_and_scale(spark, tmp_path):
    g = Graph.of(spark, [(0, 1), (1, 2)], n=3)
    coords = _coords(spark, [(0, (0.0, 0.5)), (1, (1.0, 1.5)), (2, (-2.0, 0.25))], 2)
    path = str(tmp_path / "layout.gml")
    write_gml_layout(g, coords, path)
    doc = _doc(path)
    assert doc.startswith("graph [")
    assert doc.rstrip().endswith("]")
    # reference scales coordinates by 50 (GraphLayoutAlgorithm.hpp)
    assert "x 50.000000" in doc and "y 75.000000" in doc  # node 1
    assert "x -100.000000" in doc  # node 2
    assert doc.count("node [") == 3 and doc.count("edge [") == 2
    # node blocks precede edge blocks
    assert doc.index("node [") < doc.index("edge [")
    # 2-D layout has no z lines
    assert "\n      z " not in doc
    # round-trips through the plain GML reader (graphics blocks ignored)
    from networkit_spark.sources.readers import read_gml

    g2 = read_gml(spark, path)
    assert g2.num_nodes() == 3 and g2.num_edges() == 2


def test_gml_layout_3d_and_dim_guard(spark, tmp_path):
    g = Graph.of(spark, [(0, 1)], n=2)
    c3 = _coords(spark, [(0, (1.0, 2.0, 3.0)), (1, (4.0, 5.0, 6.0))], 3)
    path = str(tmp_path / "l3.gml")
    write_gml_layout(g, c3, path)
    doc = _doc(path)
    assert "z 150.000000" in doc and "z 300.000000" in doc
    c1 = _coords(spark, [(0, (1.0,)), (1, (2.0,))], 1)
    with pytest.raises(ValueError, match="dim 2 or 3"):
        write_gml_layout(g, c1, str(tmp_path / "bad.gml"))


def test_kinemage_structure(spark, tmp_path):
    g = Graph.of(spark, [(0, 1), (1, 2), (2, 0)], n=3)
    coords = _coords(
        spark, [(0, (0.0, 0.0, 0.0)), (1, (1.0, 0.0, 0.0)), (2, (0.0, 1.0, 0.0))], 3
    )
    path = str(tmp_path / "scene.kin")
    write_kinemage(g, coords, path)
    doc = _doc(path)
    assert doc.startswith("@whitebackground")
    assert "@balllist {a}" in doc and "@vectorlist {edges}" in doc
    # one {a} point per node, one P start line per edge
    assert doc.count("{a}") >= 3  # header mentions none; 3 ball points
    assert doc.count("\nP ") + doc.startswith("P ") == 3
    # balllist section precedes the vectorlist
    assert doc.index("{a}0.000000") < doc.index("@vectorlist")
    with pytest.raises(ValueError, match="dim 3"):
        write_kinemage(
            g, _coords(spark, [(i, (0.0, 0.0)) for i in range(3)], 2), path
        )


def test_postscript_colors_and_box(spark, tmp_path):
    g = Graph.of(spark, [(0, 1), (2, 3), (1, 2)], n=4)
    coords = _coords(
        spark,
        [(0, (0.0, 0.0)), (1, (1.0, 0.0)), (2, (0.0, 1.0)), (3, (1.0, 1.0))],
        2,
    )
    part = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 1), (3, 1)], "node long, label long"
    )
    path = str(tmp_path / "plot.eps")
    write_postscript(g, coords, path, partition=part)
    doc = _doc(path)
    assert doc.startswith("%!PS-Adobe-1.0")
    assert "%%BoundingBox: 0.000 0.000 1020.000 1020.000" in doc
    # corners map affinely onto the square
    assert "p 0.000 0.000 2.000 0.00 360.00 a s" in doc
    assert "p 1020.000 1020.000 2.000 0.00 360.00 a s" in doc
    # cluster 0 red, cluster 1 orange (wheel slots 0/1): 2 dots + the
    # same-cluster edge each
    assert doc.count("1.000 0.000 0.000 c p") == 3
    assert doc.count("1.000 0.500 0.000 c p") == 3
    # same-cluster edges colored, the cross edge grey
    lines = [l for l in doc.splitlines() if " m " in l and " l s" in l]
    assert len(lines) == 3
    grey = [l for l in lines if l.startswith("0.800 0.800 0.800 c")]
    assert len(grey) == 1  # (1,2) crosses the clusters
    # edges drawn before node dots (PostscriptWriter draws edges first)
    assert doc.index(" l s") < doc.index(" a s")
    assert doc.rstrip().endswith("grestore")


def test_postscript_default_clustering_and_torus(spark, tmp_path):
    g = Graph.of(spark, [(0, 1)], n=2)
    coords = _coords(spark, [(0, (0.0, 0.0)), (1, (10.0, 0.0))], 2)
    p1 = str(tmp_path / "one.eps")
    write_postscript(g, coords, p1)
    doc = _doc(p1)
    # makeOneClustering: every node cluster 0 == red dots, edge red too
    assert doc.count("1.000 0.000 0.000 c p") == 3  # 2 dots + 1 edge
    # torus mode: the 0..1020 horizontal edge wraps to a short vector
    p2 = str(tmp_path / "torus.eps")
    write_postscript(g, coords, p2, torus=True)
    tdoc = _doc(p2)
    assert tdoc.startswith("%!PS-Adobe-3.0 EPSF-3.0")
    edge = [l for l in tdoc.splitlines() if " m " in l and " l s" in l][0]
    # dx wrapped from +1020 to 0 -> endpoint x == start x - 0 == 0-1020+1020
    assert "p 0.000 0.000 m -0.000 0.000 l s" in edge or (
        "p 0.000 0.000 m 0.000 0.000 l s" in edge
    )


def test_gephi_stream_export(spark, tmp_path):
    import glob
    import json

    from networkit_spark.graph import Graph
    from networkit_spark.sources.viz_writers import write_gephi_stream
    from pyspark.sql import functions as F

    g = Graph.of(spark, [(0, 1), (1, 2), (2, 3)], n=4)
    vals = g.nodes.select(
        F.col("id").alias("node"), (F.col("id") % 2).cast("double").alias("value")
    )
    p = str(tmp_path / "gs")
    write_gephi_stream(g, p, values=vals, attribute_name="community")
    lines = [
        json.loads(l)
        for f in sorted(glob.glob(p + "/part-*"))
        for l in open(f).read().splitlines()
        if l
    ]
    kinds = [list(e)[0] for e in lines]
    assert kinds.count("an") == 4 and kinds.count("ae") == 3
    assert kinds.count("cn") == 4
    # grid layout: n=4 -> side 2, step 1000, offset 1000 (streaming.py)
    an = {k: v for e in lines if "an" in e for k, v in e["an"].items()}
    assert an["0"]["x"] == -1000.0 and an["3"]["x"] == 0.0 and an["3"]["y"] == 0.0
    ae = {k: v for e in lines if "ae" in e for k, v in e["ae"].items()}
    assert set(ae) == {"0-1", "1-2", "2-3"}
    assert all(v["directed"] is False for v in ae.values())
    # directed edge-id convention
    gd = Graph.of(spark, [(1, 0)], directed=True, n=2)
    write_gephi_stream(gd, p)
    lines2 = [
        json.loads(l)
        for f in sorted(glob.glob(p + "/part-*"))
        for l in open(f).read().splitlines()
        if l
    ]
    ae2 = {k for e in lines2 if "ae" in e for k in e["ae"]}
    assert ae2 == {"1->0"}
