"""graph_data_science_spark — a PySpark-native link-graph analytics engine.

A from-scratch Spark implementation of the query/data-processing
capabilities of Neo4j Graph Data Science (reference at /root/reference,
studied for WHAT it computes, not how): PageRank (+ArticleRank,
Eigenvector), weakly connected components, label propagation, triangle
counting, degree centrality, similarity/link-prediction functions, a graph
catalog with projection/filtering/generation, plus large-scale
training-data pipeline operators (dedup, ANN, text analysis, multimodal
plumbing).

Architecture is idiomatic Spark: DataFrames + Catalyst for every
relational step, a BSP superstep driver with per-superstep checkpointing
for iterative algorithms, and per-partition CSR blocks processed by
vectorized pandas/Arrow UDFs for the gather-scatter hot loop.
"""

from graph_data_science_spark.plans.graph import Graph
from graph_data_science_spark.operators.pregel import PregelEngine

__version__ = "0.1.0"

__all__ = ["Graph", "PregelEngine", "__version__"]
