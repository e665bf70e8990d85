"""Streaming DSIR twin (incremental_dsir_stream): prefix scores must
match the batch operator run on each ingested prefix exactly (integer
parity — the final batch's docs thereby score bit-identically to the
full-corpus batch query), restart must not change history, and
compaction must bound the count partitions."""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DIM = 64

TARGET = [(900, "alpha beta gamma delta alpha beta"),
          (901, "alpha beta gamma delta epsilon zeta")]


def _batches():
    b0 = [(0, "alpha beta gamma delta eta"),
          (1, "stock market crash panic sell"),
          (2, "alpha beta spam spam spam")]
    b1 = [(10, "alpha beta gamma delta theta"),
          (11, "win free money click now")]
    b2 = [(20, "alpha beta gamma delta iota"),
          (21, "alpha beta gamma delta kappa")]
    return [b0, b1, b2]


def _drop(spark, rows, path):
    spark.createDataFrame(rows, "doc_id long, text string") \
        .coalesce(1).write.parquet(path)


def _scores(spark, state_dir):
    out = spark.read.parquet(os.path.join(state_dir, "scores"))
    return {r.doc_id: (r.batch_id, r.n_grams, r.logw_micro, r.key_micro)
            for r in out.collect()}


def _batch_prefix_scores(spark, prefix_rows):
    """The batch operator over the prefix — the stream's contract."""
    from distributed_lsh_spark.operators.dsir import dsir_weights

    raw = spark.createDataFrame(prefix_rows, "doc_id long, text string")
    tgt = spark.createDataFrame(TARGET, "doc_id long, text string")
    return {r.doc_id: (r.n_grams, r.logw_micro, r.key_micro)
            for r in dsir_weights(raw, tgt, dim=DIM).collect()}


def _target_df(spark):
    return spark.createDataFrame(TARGET, "doc_id long, text string")


def test_dsir_stream_prefix_parity(spark, tmp_path):
    from distributed_lsh_spark.streaming.dedup_stream import (
        incremental_dsir_stream,
    )

    batches = _batches()
    input_dir = str(tmp_path / "incoming")
    state_dir = str(tmp_path / "state")
    os.makedirs(input_dir)
    for i, b in enumerate(batches):
        _drop(spark, b, os.path.join(input_dir, f"d{i}"))

    q = incremental_dsir_stream(spark, input_dir + "/*", state_dir,
                                _target_df(spark), dim=DIM,
                                available_now=True,
                                max_files_per_trigger=1,
                                compact_every=2)
    q.awaitTermination(240)

    got = _scores(spark, state_dir)
    assert set(got) == {d for b in batches for d, _ in b}
    # each batch's docs score EXACTLY as the batch operator run on the
    # prefix ending at that batch (integer arithmetic end to end)
    prefix: list = []
    for i, b in enumerate(batches):
        prefix = prefix + b
        want = _batch_prefix_scores(spark, prefix)
        for doc_id, _ in b:
            assert got[doc_id][0] == i, doc_id       # emitted in own batch
            assert got[doc_id][1:] == want[doc_id], doc_id
    # count partitions bounded by the compaction (merged + later ids)
    parts = [p for p in os.listdir(os.path.join(state_dir, "counts"))
             if p.startswith("batch_id=")]
    assert len(parts) <= 3


def test_dsir_stream_restart_parity(spark, tmp_path):
    from distributed_lsh_spark.streaming.dedup_stream import (
        incremental_dsir_stream,
    )

    batches = _batches()
    input_dir = str(tmp_path / "incoming")
    state_dir = str(tmp_path / "state")
    os.makedirs(input_dir)
    _drop(spark, batches[0], os.path.join(input_dir, "d0"))
    q = incremental_dsir_stream(spark, input_dir + "/*", state_dir,
                                _target_df(spark), dim=DIM,
                                available_now=True,
                                max_files_per_trigger=1)
    q.awaitTermination(240)
    first = _scores(spark, state_dir)

    for i in (1, 2):
        _drop(spark, batches[i], os.path.join(input_dir, f"d{i}"))
    q2 = incremental_dsir_stream(spark, input_dir + "/*", state_dir,
                                 _target_df(spark), dim=DIM,
                                 available_now=True,
                                 max_files_per_trigger=1)
    q2.awaitTermination(240)
    got = _scores(spark, state_dir)

    for d in first:                                  # history unchanged
        assert got[d] == first[d]
    want = _batch_prefix_scores(
        spark, [r for b in batches for r in b])
    for doc_id, _ in batches[2]:                     # final batch == batch op
        assert got[doc_id][1:] == want[doc_id]
