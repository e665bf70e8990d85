from distributed_lsh_spark.operators.candidates import candidate_pairs
from distributed_lsh_spark.operators.verify import verify_pairs
from distributed_lsh_spark.operators.connected_components import connected_components

__all__ = ["candidate_pairs", "verify_pairs", "connected_components"]
