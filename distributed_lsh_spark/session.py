"""SparkSession factory for local testing and the CLI.

Local mode = one JVM, N executor threads; on a real cluster the same conf
applies except shuffle partitions scale with total cores and
spark.driver.memory moves to executor memory.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from distributed_lsh_spark.conf import spark_conf_pairs


def get_spark(
    app_name: str = "distributed_lsh_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)
    builder = SparkSession.builder.master(f"local[{cores}]").appName(app_name)
    for k, v in spark_conf_pairs(shuffle_partitions):
        builder = builder.config(k, v)
    builder = builder.config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
