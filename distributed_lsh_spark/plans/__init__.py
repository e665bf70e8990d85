from distributed_lsh_spark.plans.planner import (
    collision_probability,
    plan_bands,
    reference_parameters,
)

__all__ = ["collision_probability", "plan_bands", "reference_parameters"]
