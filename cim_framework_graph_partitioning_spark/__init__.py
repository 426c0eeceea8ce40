"""PySpark-native link-graph analytics engine.

A from-scratch rebuild (NOT a port) of the query/data-processing
capabilities of the reference graph partitioner
(``Nerovix/cim-framework-graph-partitioning``, surveyed in SURVEY.md):
edge-table derivation from a source-code corpus, PageRank, connected
components, label propagation, triangle counting, and a CIM-style
balanced graph partitioner (gain-scored move loop with driver-side
convergence), all expressed as idiomatic Spark DataFrame dataflow with
vectorized pandas/Arrow UDFs — no per-row Python anywhere.
"""

__version__ = "0.1.0"
