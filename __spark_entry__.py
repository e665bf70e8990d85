"""Driver contract for the spark-graft builder (PySpark target).

`entry` runs the flagship dedup query (LSH near-dup pairs) on sf0.001;
`queries`/`oracle_sql` expose the operator catalog from
distributed_lsh_spark.entry_queries, each Spark query paired with an
ANSI-SQL DuckDB oracle (column names aligned on both sides).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: LSH near-duplicate pairs on /root/testdata/sf0.001."""
    from distributed_lsh_spark.entry_queries import q_minhash_lsh_dup_pairs

    return q_minhash_lsh_dup_pairs(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from distributed_lsh_spark.entry_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from distributed_lsh_spark.entry_queries import ORACLE_SQL

    return dict(ORACLE_SQL)
