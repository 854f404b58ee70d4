"""Structured Streaming event ingestion (foreachBatch -> apply_events)."""

import json
import os
import tempfile

from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.streaming.dynamics import EVENT_SCHEMA, run_event_stream


def test_run_event_stream_folds_batches(spark):
    tmp = tempfile.mkdtemp()
    src = os.path.join(tmp, "events")
    ck = os.path.join(tmp, "ck")
    os.makedirs(src)
    # two files -> (at least) two micro-batches in file order is not
    # guaranteed, but fold order within seq is what apply_events uses
    batch1 = [
        {"seq": 1, "type": "EDGE_ADDITION", "u": 0, "v": 1, "w": 1.0},
        {"seq": 2, "type": "EDGE_ADDITION", "u": 1, "v": 2, "w": 1.0},
        {"seq": 3, "type": "EDGE_WEIGHT_UPDATE", "u": 0, "v": 1, "w": 5.0},
    ]
    batch2 = [
        {"seq": 4, "type": "EDGE_REMOVAL", "u": 1, "v": 2, "w": None},
        {"seq": 5, "type": "EDGE_ADDITION", "u": 2, "v": 3, "w": 2.0},
    ]
    with open(os.path.join(src, "a.json"), "w") as f:
        f.write("\n".join(json.dumps(r) for r in batch1))
    with open(os.path.join(src, "b.json"), "w") as f:
        f.write("\n".join(json.dumps(r) for r in batch2))
    # file source drains oldest-mtime first; pin the order explicitly so
    # the EDGE_REMOVAL batch is guaranteed to fold after the additions
    now = 1_700_000_000
    os.utime(os.path.join(src, "a.json"), (now, now))
    os.utime(os.path.join(src, "b.json"), (now + 100, now + 100))

    nodes = spark.range(4).select("id")
    empty = spark.createDataFrame([], "src long, dst long, weight double")
    base = Graph(nodes=nodes, edges=empty, directed=False)

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    g = run_event_stream(stream, base, ck)
    edges = {
        (r["src"], r["dst"]): r["weight"]
        for r in g.edges.filter(F.col("src") < F.col("dst")).collect()
    }
    assert edges == {(0, 1): 5.0, (2, 3): 2.0}, edges
