"""Custom stateful streaming operators — ``applyInPandasWithState``.

``run_event_stream`` (dynamics.py) folds event micro-batches into a
Graph with ``foreachBatch``; the operators here instead keep PER-KEY
state inside Structured Streaming's state store, the pattern for
operators whose semantics the built-in windowed aggregations can't
express (reference analogue: the ``Dyn*`` kernels consuming
``GraphEvent`` streams one update at a time).

Scale shape: state is (key → fixed-size record), partitioned by the
grouping key across executors; each micro-batch touches only the keys
it contains. Arrow moves whole per-key batches, so there is no per-row
Python overhead, and the state store checkpoints with the query — the
operator resumes mid-stream like every other superstep in this engine.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEGREE_STATE_SCHEMA = "degree long, wdeg double"
DEGREE_OUT_SCHEMA = "id long, degree long, wdeg double"


def streaming_degree_counts(edge_events: DataFrame) -> DataFrame:
    """Continuously-maintained per-node degree over a STREAM of edge
    events (rows: src, dst, weight, sign) — sign +1 adds an edge, −1
    removes one. Each endpoint's (degree, weighted degree) lives in the
    state store; every micro-batch emits the updated rows only.

    The input may be any streaming DataFrame with those columns; both
    endpoints are counted (undirected convention, matching
    ``Graph.degrees`` on the symmetrized relation).
    """
    ends = edge_events.select(
        F.col("src").alias("id"), "weight", "sign"
    ).unionByName(edge_events.select(F.col("dst").alias("id"), "weight", "sign"))

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (node,) = key
        if state.exists:
            deg, wdeg = state.get
        else:
            deg, wdeg = 0, 0.0
        for pdf in pdfs:
            deg += int(pdf["sign"].sum())
            wdeg += float((pdf["weight"] * pdf["sign"]).sum())
        state.update((deg, wdeg))
        yield pd.DataFrame({"id": [node], "degree": [deg], "wdeg": [wdeg]})

    return ends.groupBy("id").applyInPandasWithState(
        update,
        outputStructType=DEGREE_OUT_SCHEMA,
        stateStructType=DEGREE_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark_delay: str = "2 hours",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Watermarked tumbling-window aggregation over a STREAMING event
    DataFrame: per (window, event_type), event count and value sum.

    This is the built-in late-data path — ``withWatermark`` bounds how
    long a window stays open, so state is windows-within-the-watermark
    only, evicted as the watermark advances (contrast
    :func:`streaming_degree_counts`, whose per-key state never expires
    by design). Works identically on a batch DataFrame (the watermark
    is a no-op there) — the gate row ``events_hourly`` calls this
    function in batch mode and hash-checks it against the epoch-bucket
    SQL oracle.

    Scale shape: one shuffle on (window, type); partial aggregation is
    map-side; the state store holds only open windows. Late rows older
    than ``watermark_delay`` are dropped by the engine, the documented
    Structured Streaming contract.
    """
    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(
            F.window(F.col(ts_col), window_duration).alias("window"),
            F.col(type_col).alias("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
