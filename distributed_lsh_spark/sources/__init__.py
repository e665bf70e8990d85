from distributed_lsh_spark.sources.checkpoint import CheckpointManager

__all__ = ["CheckpointManager"]
