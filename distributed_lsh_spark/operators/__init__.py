from distributed_lsh_spark.operators.candidates import candidate_pairs
from distributed_lsh_spark.operators.verify import verify_pairs
from distributed_lsh_spark.operators.connected_components import connected_components
from distributed_lsh_spark.operators.weighting import (
    cluster_safe_split, soft_dedup_weights, temperature_mixture,
)
from distributed_lsh_spark.operators.lm_quality import bigram_lm_scores
from distributed_lsh_spark.operators.classifier import hashed_linear_score
from distributed_lsh_spark.operators.mirrors import mirror_host_pairs
from distributed_lsh_spark.operators.blocklist import blocklist_filter
from distributed_lsh_spark.operators.containment import containment_pairs

__all__ = [
    "candidate_pairs", "verify_pairs", "connected_components",
    "soft_dedup_weights", "cluster_safe_split", "temperature_mixture",
    "bigram_lm_scores", "hashed_linear_score", "mirror_host_pairs",
    "blocklist_filter", "containment_pairs",
]
