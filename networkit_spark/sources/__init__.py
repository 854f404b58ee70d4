from networkit_spark.sources.source_table import synthesize_source_table
from networkit_spark.sources.extract import extract_edges, dependency_graph
from networkit_spark.sources.readers import read_edge_list, read_snap, read_metis
from networkit_spark.sources.nkb import (
    read_networkit_binary,
    write_networkit_binary,
)
from networkit_spark.sources.exotic import (
    read_gexf,
    read_graphtool_binary,
    read_thrill,
    write_gexf,
    write_graphtool_binary,
    write_thrill,
)

__all__ = [
    "synthesize_source_table",
    "extract_edges",
    "dependency_graph",
    "read_edge_list",
    "read_snap",
    "read_metis",
    "read_networkit_binary",
    "write_networkit_binary",
    "read_thrill",
    "write_thrill",
    "read_graphtool_binary",
    "write_graphtool_binary",
    "read_gexf",
    "write_gexf",
]
