from networkit_spark.operators.pagerank import PageRankResult, pagerank
from networkit_spark.operators.components import connected_components
from networkit_spark.operators.louvain import agglomerative_clusterer, louvain_map_equation, plm
from networkit_spark.operators.plp import lp_degree_ordered, plp
from networkit_spark.operators.triangles import (
    triangle_count_per_node,
    triangle_count_per_edge,
    triangles,
    local_clustering_coefficient,
    global_clustering_coefficient,
    avg_local_clustering_coefficient,
)
from networkit_spark.operators.degrees import degree_centrality, local_partition_coverage
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
    neighborhood_function_heuristic,
)
from networkit_spark.operators.sparsification import (
    global_threshold_filter,
    jaccard_similarity_scores,
    prefix_jaccard_scores,
)
from networkit_spark.operators.spectral import eigenvector_centrality, katz_centrality
from networkit_spark.operators.traversal import bfs
from networkit_spark.operators.bicc import (
    articulation_points,
    biconnected_components,
)
from networkit_spark.operators.components import weakly_connected_components
from networkit_spark.operators.distance import (
    approx_betweenness,
    approx_closeness,
    bidirectional_bfs,
    apsp_update_additions,
    betweenness,
    closeness_centrality,
    diameter_exact,
    estimate_betweenness,
    incomplete_dijkstra,
    k_path_centrality,
    kadabra_betweenness,
    harmonic_closeness,
    multi_source_bfs,
    sssp,
    volume,
)
from networkit_spark.operators.flow import cut_clustering, max_flow, min_cut_source_side
from networkit_spark.operators.group_centrality import (
    ged_walk_group,
    ged_walk_score,
    group_closeness,
    group_closeness_grow_shrink,
    group_closeness_local_search,
    group_closeness_local_swaps,
    group_degree,
    group_harmonic_closeness,
)
from networkit_spark.operators.matching import (
    local_max_matching,
    luby_independent_set,
    random_maximum_spanning_forest,
    spanning_forest,
    suitor_matching,
    union_maximum_spanning_forest,
    path_growing_matcher,
)
from networkit_spark.operators.numerics import (
    approx_electrical_closeness,
    commute_time_distance,
    laplacian_solve,
    spanning_edge_centrality,
    spanning_edge_centrality_jl,
)
from networkit_spark.operators.randomization import (
    degree_preserving_shuffle,
    edge_switching,
    global_curveball,
)
from networkit_spark.operators.reachability import (
    affected_nodes,
    all_simple_paths,
    reachable_nodes,
)
from networkit_spark.operators.scd import clique_detect, gce, pagerank_nibble, tce
from networkit_spark.operators.spectral import laplacian_centrality
from networkit_spark.operators.layout import (
    centered_pivot_distances,
    num_edge_crossings,
    pivot_mds,
)
from networkit_spark.operators.lamg import LamgHierarchy, lamg_hierarchy, lamg_solve
from networkit_spark.operators.coarsening import (
    hashing_overlapper,
    matching_coarsening,
    project_back,
    project_back_to_finest,
)
from networkit_spark.operators.simulation import epidemic_simulation_seir
from networkit_spark.operators.edgescores import (
    chance_corrected_triangle_score,
    edge_score_as_weight,
    edge_score_blender,
    edge_score_linearizer,
    edge_score_normalizer,
    geometric_mean_score,
    multiscale_score,
    random_edge_score,
    random_node_edge_score,
)
from networkit_spark.operators.coloring import (
    adjacency_eigenvectors,
    bfs_sample,
    spectral_coloring,
)

__all__ = [
    "pagerank",
    "PageRankResult",
    "connected_components",
    "plp",
    "lp_degree_ordered",
    "plm",
    "agglomerative_clusterer",
    "louvain_map_equation",
    "triangles",
    "triangle_count_per_node",
    "triangle_count_per_edge",
    "local_clustering_coefficient",
    "global_clustering_coefficient",
    "avg_local_clustering_coefficient",
    "degree_centrality",
    "local_partition_coverage",
    "core_decomposition",
    "eigenvector_centrality",
    "katz_centrality",
    "bfs",
    "common_neighbor_scores",
    "degree_assortativity",
    "preferential_attachment",
    "neighborhood_function",
    "neighborhood_function_heuristic",
    "effective_diameter_approx",
    "jaccard_similarity_scores",
    "prefix_jaccard_scores",
    "global_threshold_filter",
    "ranking",
    "articulation_points",
    "biconnected_components",
    "weakly_connected_components",
    "approx_betweenness",
    "bidirectional_bfs",
    "apsp_update_additions",
    "betweenness",
    "approx_closeness",
    "closeness_centrality",
    "diameter_exact",
    "estimate_betweenness",
    "incomplete_dijkstra",
    "k_path_centrality",
    "kadabra_betweenness",
    "harmonic_closeness",
    "multi_source_bfs",
    "volume",
    "sssp",
    "max_flow",
    "min_cut_source_side",
    "cut_clustering",
    "group_closeness",
    "group_closeness_grow_shrink",
    "group_closeness_local_search",
    "group_closeness_local_swaps",
    "group_harmonic_closeness",
    "ged_walk_group",
    "ged_walk_score",
    "group_degree",
    "local_max_matching",
    "path_growing_matcher",
    "luby_independent_set",
    "random_maximum_spanning_forest",
    "spanning_forest",
    "suitor_matching",
    "union_maximum_spanning_forest",
    "approx_electrical_closeness",
    "commute_time_distance",
    "laplacian_solve",
    "spanning_edge_centrality",
    "spanning_edge_centrality_jl",
    "degree_preserving_shuffle",
    "edge_switching",
    "global_curveball",
    "reachable_nodes",
    "all_simple_paths",
    "affected_nodes",
    "clique_detect",
    "gce",
    "tce",
    "pagerank_nibble",
    "laplacian_centrality",
    "pivot_mds",
    "num_edge_crossings",
    "centered_pivot_distances",
    "lamg_hierarchy",
    "lamg_solve",
    "LamgHierarchy",
    "matching_coarsening",
    "project_back",
    "project_back_to_finest",
    "hashing_overlapper",
    "epidemic_simulation_seir",
    "adjacency_eigenvectors",
    "spectral_coloring",
    "bfs_sample",
    "edge_score_as_weight",
    "edge_score_blender",
    "edge_score_linearizer",
    "edge_score_normalizer",
    "geometric_mean_score",
    "random_edge_score",
    "multiscale_score",
    "chance_corrected_triangle_score",
    "random_node_edge_score",
]
