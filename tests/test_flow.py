"""Guard tests for the driver-sequential flow-based community kernels."""

from __future__ import annotations

import pytest

from networkit_spark.graph import Graph


def test_cut_clustering_max_nodes_guard(spark):
    """cut_clustering is driver-sequential; the max_nodes cap bounds its
    driver state and raises with an explicit opt-out on larger graphs,
    while small-graph results are unchanged by the guard plumbing."""
    from networkit_spark.operators.flow import cut_clustering

    g = Graph.of(
        spark,
        [(0, 1, 3.0), (1, 2, 3.0), (0, 2, 3.0), (3, 4, 3.0), (2, 3, 0.5)],
        n=5,
        weighted=True,
    )
    with pytest.raises(ValueError, match="max_nodes"):
        cut_clustering(g, alpha=1.0, max_nodes=3)
    capped = {r["node"]: r["label"] for r in cut_clustering(g, alpha=1.0).collect()}
    uncapped = {
        r["node"]: r["label"]
        for r in cut_clustering(g, alpha=1.0, max_nodes=None).collect()
    }
    assert capped == uncapped and len(capped) == 5
