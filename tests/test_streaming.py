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


def test_streaming_degree_counts_stateful(spark):
    """applyInPandasWithState degree maintenance: two micro-batches of
    edge add/remove events; state carries across batches and the final
    emitted values equal the batch-computed degrees."""
    import tempfile
    import time

    from networkit_spark.streaming.stateful import streaming_degree_counts

    tmp = tempfile.mkdtemp()
    src = os.path.join(tmp, "edges")
    ck = os.path.join(tmp, "ck")
    os.makedirs(src)
    b1 = [
        {"src": 0, "dst": 1, "weight": 1.0, "sign": 1},
        {"src": 1, "dst": 2, "weight": 2.0, "sign": 1},
    ]
    b2 = [
        {"src": 0, "dst": 1, "weight": 1.0, "sign": -1},
        {"src": 2, "dst": 3, "weight": 4.0, "sign": 1},
    ]
    with open(os.path.join(src, "a.json"), "w") as f:
        f.write("\n".join(json.dumps(r) for r in b1))
    with open(os.path.join(src, "b.json"), "w") as f:
        f.write("\n".join(json.dumps(r) for r in b2))
    now = 1_700_000_000
    os.utime(os.path.join(src, "a.json"), (now, now))
    os.utime(os.path.join(src, "b.json"), (now + 100, now + 100))

    stream = (
        spark.readStream.schema("src long, dst long, weight double, sign int")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    out = streaming_degree_counts(stream)
    q = (
        out.writeStream.queryName(f"deg_state_{int(time.time())}")
        .outputMode("update")
        .format("memory")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql(f"SELECT * FROM {q.name}").collect()
    # last emission per id wins
    final = {}
    for r in rows:
        final[r["id"]] = (r["degree"], r["wdeg"])
    assert final[0] == (0, 0.0)  # added then removed
    assert final[1][0] == 1 and abs(final[1][1] - 2.0) < 1e-12
    assert final[2][0] == 2 and abs(final[2][1] - 6.0) < 1e-12
    assert final[3] == (1, 4.0)


def test_windowed_event_counts_stream_with_watermark(spark, tmp_path):
    """windowed_event_counts through a REAL file stream: availableNow
    micro-batches + watermark produce exactly the batch aggregation of
    the same rows (replayable source ⇒ exactly-once), and the streaming
    plan carries the watermark/state semantics (append mode finalizes
    windows past the watermark)."""
    import datetime as dt
    import os

    from networkit_spark.streaming.stateful import windowed_event_counts

    rows = []
    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    for i in range(200):
        rows.append(
            (base + dt.timedelta(minutes=7 * i), f"t{i % 3}", float(i % 11))
        )
    src = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    in_dir = os.path.join(tmp_path, "in")
    src.repartition(4).write.mode("overwrite").parquet(in_dir)

    stream = spark.readStream.schema(
        "ts timestamp, event_type string, value double"
    ).parquet(in_dir)
    out = windowed_event_counts(stream)
    ckpt = os.path.join(tmp_path, "ckpt")
    q = (
        out.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in windowed_event_counts(src).collect()
    }
    assert got == want and len(want) > 20
