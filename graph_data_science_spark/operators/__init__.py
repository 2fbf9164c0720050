from graph_data_science_spark.operators.pregel import PregelEngine, PregelResult

__all__ = ["PregelEngine", "PregelResult"]
