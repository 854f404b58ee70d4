from networkit_spark.sources.source_table import synthesize_source_table
from networkit_spark.sources.extract import extract_edges, dependency_graph
from networkit_spark.sources.readers import read_edge_list, read_snap, read_metis

__all__ = [
    "synthesize_source_table",
    "extract_edges",
    "dependency_graph",
    "read_edge_list",
    "read_snap",
    "read_metis",
]
