from graph_data_science_spark.streaming.checkpoint import CheckpointManager

__all__ = ["CheckpointManager"]
