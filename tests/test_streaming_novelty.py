"""Streaming novelty twin (incremental_novelty_stream): under monotone
doc_id ingest the cumulative per-doc scores must equal the batch
q_ngram_novelty rule (global min-doc_id first-claimant) on the union of
batches, each doc scored exactly once in its own arrival batch; restart
mid-stream must not rescore or double-emit."""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N = 5


def _docs() -> dict[int, str]:
    """12 docs: 3 is a verbatim copy of 0 (novelty 0), 7 copies 2's
    first half (partial novelty), 9 copies 0 but arrives in the later
    batch (cross-batch dup), the rest are unique filler."""
    out = {}
    for i in range(12):
        out[i] = " ".join(f"d{i}w{j}" for j in range(24))
    out[3] = out[0]
    out[7] = " ".join(out[2].split()[:12]) + " " + \
        " ".join(f"q7x{j}" for j in range(12))
    out[9] = out[0]
    return out


def _batch_scores(spark, docs) -> dict[int, tuple[int, int, float]]:
    """The batch query's rule (min doc_id claims a gram) recomputed over
    the union — same frames as entry_queries.q_ngram_novelty."""
    from pyspark.sql import functions as F

    from distributed_lsh_spark.operators.decontam import doc_ngram_hashes

    df = spark.createDataFrame(list(docs.items()),
                               "doc_id long, text string")
    g = doc_ngram_hashes(df, N)
    first = g.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    per = (g.join(first, "g")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_grams"),
                 F.sum(F.when(F.col("first_doc") == F.col("doc_id"), 1)
                        .otherwise(0)).cast("bigint").alias("n_novel")))
    return {r["doc_id"]: (r["n_grams"], r["n_novel"],
                          round(r["n_novel"] / r["n_grams"], 6))
            for r in per.collect()}


def _drop(spark, docs, ids, path):
    spark.createDataFrame([(i, docs[i]) for i in ids],
                          "doc_id long, text string") \
         .coalesce(1).write.parquet(path)


def _stream_rows(spark, state_dir):
    return spark.read.parquet(os.path.join(state_dir, "novelty")).collect()


def test_novelty_stream_matches_batch_rule(spark, tmp_path):
    from distributed_lsh_spark.streaming.dedup_stream import (
        incremental_novelty_stream,
    )

    docs = _docs()
    input_dir = str(tmp_path / "incoming")
    state_dir = str(tmp_path / "state")
    os.makedirs(input_dir)
    # monotone ingest: 0-5 then 6-11 (stream first-arrival == batch
    # min-doc_id)
    _drop(spark, docs, list(range(6)), os.path.join(input_dir, "drop0"))
    _drop(spark, docs, list(range(6, 12)), os.path.join(input_dir, "drop1"))

    q = incremental_novelty_stream(spark, input_dir + "/*", state_dir, n=N,
                                   available_now=True,
                                   max_files_per_trigger=1)
    q.awaitTermination(240)

    rows = _stream_rows(spark, state_dir)
    got = {r["doc_id"]: (r["n_grams"], r["n_novel"], r["novelty"])
           for r in rows}
    assert len(rows) == len(got) == 12, "one row per doc, exactly once"
    assert got == _batch_scores(spark, docs)
    # the planted structure actually fires: copy of an earlier doc
    # scores 0, the half-copy sits strictly between, fresh docs score 1
    assert got[3][2] == 0.0 and got[9][2] == 0.0
    assert 0.0 < got[7][2] < 1.0
    assert got[0][2] == 1.0 and got[11][2] == 1.0
    # arrival-batch lineage
    arrival = {i: 0 if i < 6 else 1 for i in docs}
    assert all(r["batch_id"] == arrival[r["doc_id"]] for r in rows)


def test_novelty_stream_restart_is_exactly_once(spark, tmp_path):
    from distributed_lsh_spark.streaming.dedup_stream import (
        incremental_novelty_stream,
    )

    docs = _docs()
    input_dir = str(tmp_path / "incoming")
    state_dir = str(tmp_path / "state")
    os.makedirs(input_dir)
    _drop(spark, docs, list(range(6)), os.path.join(input_dir, "drop0"))
    q = incremental_novelty_stream(spark, input_dir + "/*", state_dir, n=N,
                                   available_now=True,
                                   max_files_per_trigger=1)
    q.awaitTermination(240)

    _drop(spark, docs, list(range(6, 12)), os.path.join(input_dir, "drop1"))
    q2 = incremental_novelty_stream(spark, input_dir + "/*", state_dir, n=N,
                                    available_now=True,
                                    max_files_per_trigger=1)
    q2.awaitTermination(240)

    rows = _stream_rows(spark, state_dir)
    got = {r["doc_id"]: (r["n_grams"], r["n_novel"],
                         r["novelty"]) for r in rows}
    assert len(rows) == 12, "restart must not re-emit batch-0 docs"
    assert got == _batch_scores(spark, docs)
