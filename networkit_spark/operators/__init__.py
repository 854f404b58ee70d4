from networkit_spark.operators.pagerank import PageRankResult, pagerank
from networkit_spark.operators.components import connected_components
from networkit_spark.operators.plp import plp
from networkit_spark.operators.triangles import (
    triangle_count_per_node,
    triangle_count_per_edge,
    triangles,
    local_clustering_coefficient,
    global_clustering_coefficient,
    avg_local_clustering_coefficient,
)
from networkit_spark.operators.degrees import degree_centrality
from networkit_spark.operators.ranking import ranking

__all__ = [
    "pagerank",
    "PageRankResult",
    "connected_components",
    "plp",
    "triangles",
    "triangle_count_per_node",
    "triangle_count_per_edge",
    "local_clustering_coefficient",
    "global_clustering_coefficient",
    "avg_local_clustering_coefficient",
    "degree_centrality",
    "ranking",
]
