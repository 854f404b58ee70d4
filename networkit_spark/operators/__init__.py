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
from networkit_spark.operators.kcore import core_decomposition
from networkit_spark.operators.ranking import ranking
from networkit_spark.operators.linkprediction import (
    common_neighbor_scores,
    degree_assortativity,
    preferential_attachment,
)
from networkit_spark.operators.sketches import (
    effective_diameter_approx,
    neighborhood_function,
)
from networkit_spark.operators.sparsification import (
    global_threshold_filter,
    jaccard_similarity_scores,
)
from networkit_spark.operators.spectral import eigenvector_centrality, katz_centrality
from networkit_spark.operators.traversal import bfs

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
    "core_decomposition",
    "eigenvector_centrality",
    "katz_centrality",
    "bfs",
    "common_neighbor_scores",
    "degree_assortativity",
    "preferential_attachment",
    "neighborhood_function",
    "effective_diameter_approx",
    "jaccard_similarity_scores",
    "global_threshold_filter",
    "ranking",
]
