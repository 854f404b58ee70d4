"""Centrality ranking: score descending, ties broken by node id ascending
(``centrality/Centrality.cpp:29-41``)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ranking(scores: DataFrame, id_col: str = "id", score_col: str = "score") -> DataFrame:
    return scores.orderBy(F.desc(score_col), F.asc(id_col))


def centralization(scores: DataFrame, n: int, score_col: str = "score") -> float:
    """Freeman centralization (``centrality/Centrality.cpp:58-75``):
    Σ(max − score) / ((n−1)·max′) simplified to the reference's formula
    Σ(max − c_i) for the unnormalized numerator."""
    mx = scores.agg(F.max(score_col)).collect()[0][0]
    s = scores.agg(F.sum(F.lit(mx) - F.col(score_col))).collect()[0][0]
    return float(s)
