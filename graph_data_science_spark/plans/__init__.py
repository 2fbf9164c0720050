from graph_data_science_spark.plans.graph import Graph, Orientation, Aggregation

__all__ = ["Graph", "Orientation", "Aggregation"]
