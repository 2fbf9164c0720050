from graph_data_science_spark.sources.corpus import synthetic_corpus
from graph_data_science_spark.sources.extract import build_import_graph, extract_import_edges
from graph_data_science_spark.sources.generator import random_graph

__all__ = [
    "synthetic_corpus",
    "extract_import_edges",
    "build_import_graph",
    "random_graph",
]
