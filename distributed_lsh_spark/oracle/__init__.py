from distributed_lsh_spark.oracle.xxh64 import xxh64, xxh64_long, spark_xxhash64_string
from distributed_lsh_spark.oracle.dedup import DedupOracle

__all__ = ["xxh64", "xxh64_long", "spark_xxhash64_string", "DedupOracle"]
