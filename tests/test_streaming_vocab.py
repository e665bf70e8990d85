"""Streaming vocabulary-HLL twin (incremental_vocab_stream): the running
register-merged estimate after the final batch must equal the batch
query's estimate over the union of ingested data EXACTLY (register
algebra is order-free); restart mid-stream and compaction must not
change it."""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F


def _docs() -> list[tuple[int, str, str]]:
    rows = []
    for i in range(40):
        src = f"s{i % 3}"
        text = " ".join(f"w{src}{(i * 7 + j) % 61}" for j in range(30))
        rows.append((i, text, src))
    return rows


def _batch_expected(spark, rows):
    from distributed_lsh_spark.functions.sketch import (
        hll_registers, hll_summary,
    )

    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    toks = (df.select("source",
                      F.explode(F.split(F.regexp_replace(
                          F.lower("text"), "[^a-z0-9]+", " "), " "))
                      .alias("token"))
            .where(F.col("token") != ""))
    return sorted(map(tuple, hll_summary(
        hll_registers(toks, ["source"], "token"), ["source"]).collect()))


def _drop(spark, rows, path):
    spark.createDataFrame(rows, "doc_id long, text string, source string") \
        .coalesce(1).write.parquet(path)


def _final_summary(spark, state_dir):
    out = spark.read.parquet(os.path.join(state_dir, "vocab"))
    last = out.agg(F.max("batch_id")).collect()[0][0]
    return sorted(map(tuple, out.where(F.col("batch_id") == last)
                      .select("source", "hll_estimate", "v_zero")
                      .collect()))


def test_vocab_stream_matches_batch_sketch(spark, tmp_path):
    from distributed_lsh_spark.streaming.dedup_stream import (
        incremental_vocab_stream,
    )

    rows = _docs()
    input_dir = str(tmp_path / "incoming")
    state_dir = str(tmp_path / "state")
    os.makedirs(input_dir)
    _drop(spark, rows[:15], os.path.join(input_dir, "drop0"))
    _drop(spark, rows[15:30], os.path.join(input_dir, "drop1"))
    _drop(spark, rows[30:], os.path.join(input_dir, "drop2"))

    q = incremental_vocab_stream(spark, input_dir + "/*", state_dir,
                                 available_now=True,
                                 max_files_per_trigger=1,
                                 compact_every=2)
    q.awaitTermination(240)

    assert _final_summary(spark, state_dir) == _batch_expected(spark, rows)
    # compaction bounded the register partitions (compact_every + 1)
    parts = [n for n in os.listdir(os.path.join(state_dir, "registers"))
             if n.startswith("batch_id=")]
    assert len(parts) <= 3


def test_vocab_stream_restart_parity(spark, tmp_path):
    from distributed_lsh_spark.streaming.dedup_stream import (
        incremental_vocab_stream,
    )

    rows = _docs()
    input_dir = str(tmp_path / "incoming")
    state_dir = str(tmp_path / "state")
    os.makedirs(input_dir)
    _drop(spark, rows[:20], os.path.join(input_dir, "drop0"))
    q = incremental_vocab_stream(spark, input_dir + "/*", state_dir,
                                 available_now=True,
                                 max_files_per_trigger=1)
    q.awaitTermination(240)

    _drop(spark, rows[20:], os.path.join(input_dir, "drop1"))
    q2 = incremental_vocab_stream(spark, input_dir + "/*", state_dir,
                                  available_now=True,
                                  max_files_per_trigger=1)
    q2.awaitTermination(240)

    assert _final_summary(spark, state_dir) == _batch_expected(spark, rows)
