"""Composed streaming ingest: exact-before-LSH, the batch pipeline's
ordering (pipeline.run_dedup exact_first=True) re-expressed as two chained
streaming stages:

  stage 1  stateful exact dedup (`stateful.py`, applyInPandasWithState):
           every arriving row is labeled (canonical_id, is_dup) against
           per-content-hash state; byte-identical re-crawls never reach
           the LSH stages — the canonical web-scale hot key is cut at
           the front door, and signature CPU is only ever spent once per
           distinct page.
  stage 2  incremental near-dup stream (`dedup_stream.py`, foreachBatch
           against the persisted band index) over ONLY the rows stage 1
           marked unique (`is_dup = false`).

Both stages checkpoint independently; re-invoking `run_ingest` after new
file drops resumes each from its own checkpoint (state store for stage 1,
band index for stage 2) and processes only the new data.

Cluster semantics: stage 1's first-seen canonical may differ from batch
mode's global-min representative when a lower doc_id arrives later, but
the (member -> canonical) exact edges connect the same components either
way, so `ingest_clusters` (min-id labeling over exact + near edges)
matches batch `run_dedup` exactly — pinned by the parity test.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_lsh_spark.conf import DedupConfig, DEFAULT_CONFIG
from distributed_lsh_spark.operators.connected_components import connected_components
from distributed_lsh_spark.streaming.dedup_stream import incremental_dedup_stream
from distributed_lsh_spark.streaming.stateful import OUT_SCHEMA, run_stateful_dedup


def run_ingest(spark: SparkSession, input_dir: str, state_dir: str,
               cfg: DedupConfig = DEFAULT_CONFIG,
               schema: str = "doc_id long, text string",
               max_files_per_trigger: int = 1,
               timeout_s: int = 240) -> None:
    """Drain currently-available drops in `input_dir` through both stages
    (availableNow).  State layout: `state_dir`/exact (stage 1 labeled rows
    + state-store checkpoint), `state_dir`/near (stage 2 sigs/band_index/
    pairs + checkpoint)."""
    exact_dir = os.path.join(state_dir, "exact")
    q1 = run_stateful_dedup(spark, input_dir, exact_dir, schema=schema,
                            max_files_per_trigger=max_files_per_trigger)
    q1.awaitTermination(timeout_s)

    q2 = incremental_dedup_stream(
        spark, os.path.join(exact_dir, "labeled"),
        os.path.join(state_dir, "near"), cfg,
        schema=OUT_SCHEMA, available_now=True,
        max_files_per_trigger=max_files_per_trigger,
        where="is_dup = false")
    q2.awaitTermination(timeout_s)


def ingest_clusters(spark: SparkSession, state_dir: str) -> DataFrame:
    """clusters(doc_id, cluster_id) over everything ingested so far:
    exact (member -> canonical) edges ∪ verified near-dup pairs ->
    connected components, min doc_id per component — the same labeling as
    batch `run_dedup`."""
    labeled = spark.read.parquet(os.path.join(state_dir, "exact", "labeled"))
    exact_edges = (labeled.where("is_dup")
                   .select(F.col("canonical_id").alias("id_a"),
                           F.col("doc_id").alias("id_b")))
    pairs_dir = os.path.join(state_dir, "near", "pairs")
    near_edges = spark.read.parquet(pairs_dir).select("id_a", "id_b") \
        if os.path.isdir(pairs_dir) else \
        spark.createDataFrame([], "id_a long, id_b long")
    return connected_components(exact_edges.unionByName(near_edges))
