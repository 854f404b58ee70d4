"""networkit_spark — a from-scratch PySpark-native link-graph analytics engine.

Re-expresses the query/data-processing capabilities of NetworKit
(kit-parco/networkit, reference at /root/reference) as an idiomatic
Apache Spark DataFrame engine:

- Graph data model: ``nodes(id LONG)`` + ``edges(src LONG, dst LONG,
  weight DOUBLE)`` DataFrames (SURVEY.md §1; reference
  ``include/networkit/graph/Graph.hpp:97``).
- Kernels are shuffle-based supersteps expressed with pyspark.sql
  join/groupBy aggregations — distributed SpMV — never per-row Python
  (reference iterates OpenMP loops over mutable adjacency arrays;
  ``Graph.hpp:1770``).
- Skew (power-law hubs) handled by degree-ordered orientation for
  wedge joins, AQE skew-join splitting, and map-side partial
  aggregation for the gather step.

Nothing in this package is a translation of the reference C++; file:line
citations in docstrings point at the *semantics* being matched.
"""

from networkit_spark.graph import Graph
from networkit_spark.session import get_spark

__all__ = ["Graph", "get_spark"]
__version__ = "0.1.0"
