"""Streaming log-histogram quantile twin (incremental_length_stream):
the running summed-histogram quantiles after the final batch must equal
the batch sketch over the union EXACTLY (integer sums + integer rank
rule are order-free); restart and ADDITIVE compaction (coverage-rule
consistency, not merge idempotence) must not change it."""

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
        n = 5 + (i * 13) % 90          # lengths spanning several octaves
        text = " ".join(f"w{j}" for j in range(n))
        rows.append((i, text, src))
    return rows


def _batch_expected(spark, rows):
    from distributed_lsh_spark.functions.sketch import (
        histogram_quantiles, log_histogram,
    )
    from distributed_lsh_spark.functions.text import normalized_tokens

    df = spark.createDataFrame(rows,
                               "doc_id long, text string, source string")
    lens = df.select("source", F.size(normalized_tokens("text"))
                     .cast("long").alias("n_tok"))
    return sorted(map(tuple, histogram_quantiles(
        log_histogram(lens, ["source"], "n_tok"), ["source"]).collect()))


def _drop(spark, rows, path):
    spark.createDataFrame(rows, "doc_id long, text string, source string") \
        .coalesce(1).write.parquet(path)


def _final_summary(spark, state_dir):
    out = spark.read.parquet(os.path.join(state_dir, "quantiles"))
    last = out.agg(F.max("batch_id")).collect()[0][0]
    return sorted(map(tuple, out.where(F.col("batch_id") == last)
                      .select("source", "q_pm", "value").collect()))


def test_length_stream_matches_batch_sketch(spark, tmp_path):
    from distributed_lsh_spark.streaming.dedup_stream import (
        incremental_length_stream,
    )

    rows = _docs()
    input_dir = str(tmp_path / "incoming")
    state_dir = str(tmp_path / "state")
    os.makedirs(input_dir)
    for i in range(4):
        _drop(spark, rows[i * 10:(i + 1) * 10],
              os.path.join(input_dir, f"drop{i}"))

    q = incremental_length_stream(spark, input_dir + "/*", state_dir,
                                  available_now=True,
                                  max_files_per_trigger=1,
                                  compact_every=2)
    q.awaitTermination(240)

    assert _final_summary(spark, state_dir) == _batch_expected(spark, rows)
    # additive compaction bounded the histogram partitions AND conserved
    # the total doc count (sums are exact, never dropped or doubled)
    parts = [n for n in os.listdir(os.path.join(state_dir, "hist"))
             if n.startswith("batch_id=")]
    assert len(parts) <= 3
    total = (spark.read.parquet(os.path.join(state_dir, "hist"))
             .agg(F.sum("cnt")).collect()[0][0])
    assert total == len(rows)


def test_length_stream_restart_parity(spark, tmp_path):
    from distributed_lsh_spark.streaming.dedup_stream import (
        incremental_length_stream,
    )

    rows = _docs()
    input_dir = str(tmp_path / "incoming")
    state_dir = str(tmp_path / "state")
    os.makedirs(input_dir)
    _drop(spark, rows[:20], os.path.join(input_dir, "drop0"))
    q = incremental_length_stream(spark, input_dir + "/*", state_dir,
                                  available_now=True,
                                  max_files_per_trigger=1)
    q.awaitTermination(240)

    _drop(spark, rows[20:], os.path.join(input_dir, "drop1"))
    q2 = incremental_length_stream(spark, input_dir + "/*", state_dir,
                                   available_now=True,
                                   max_files_per_trigger=1)
    q2.awaitTermination(240)

    assert _final_summary(spark, state_dir) == _batch_expected(spark, rows)


def test_additive_crash_window_is_invisible(spark, tmp_path):
    """The compaction crash window (merged partition written, stale
    deletes unfinished) leaves duplicate MASS on disk; the coverage-rule
    read must return the same totals as before the crash, and the next
    compaction must clean the stale partitions."""
    from distributed_lsh_spark.streaming.dedup_stream import (
        additive_consistent_view, compact_additive_index,
    )

    d = str(tmp_path / "hist")
    for b in range(3):
        (spark.createDataFrame([("s", 5, 10 + b)],
                               "source string, bin_id long, cnt long")
         .withColumn("batch_id", F.lit(b))
         .write.mode("append").partitionBy("batch_id").parquet(d))
    view, stale = additive_consistent_view(spark, d)
    assert stale == []
    want = view.agg(F.sum("cnt")).collect()[0][0]   # 10+11+12 = 33

    # compaction at batch 3 merges batches 0-2 into batch_id=-3 ...
    assert compact_additive_index(spark, d, 3)
    # ... simulate the crash window by RESTORING a stale positive
    # partition alongside the merged one
    (spark.createDataFrame([("s", 5, 10)],
                           "source string, bin_id long, cnt long")
     .withColumn("batch_id", F.lit(0))
     .write.mode("append").partitionBy("batch_id").parquet(d))
    view2, stale2 = additive_consistent_view(spark, d)
    assert view2.agg(F.sum("cnt")).collect()[0][0] == want   # no double count
    assert [b for b, _ in stale2] == [0]

    # the next compaction folds the consistent view and deletes the
    # stale leftover; totals still conserved
    assert compact_additive_index(spark, d, 5)
    view3, stale3 = additive_consistent_view(spark, d)
    assert stale3 == []
    assert view3.agg(F.sum("cnt")).collect()[0][0] == want
    parts = [n for n in os.listdir(d) if n.startswith("batch_id=")]
    assert parts == ["batch_id=-5"]


def test_cms_stream_matches_batch_sketch_and_never_undercounts(
        spark, tmp_path):
    from distributed_lsh_spark.functions.sketch import cms_cells, cms_lookup
    from distributed_lsh_spark.streaming.dedup_stream import (
        incremental_cms_stream,
    )

    rows = [(i, " ".join(f"t{(i * 7 + j) % 23}" for j in range(12)))
            for i in range(30)]
    probes = ["t0", "t5", "t22", "absent"]
    input_dir = str(tmp_path / "incoming")
    state_dir = str(tmp_path / "state")
    os.makedirs(input_dir)
    for i in range(3):
        spark.createDataFrame(rows[i * 10:(i + 1) * 10],
                              "doc_id long, text string") \
            .coalesce(1).write.parquet(os.path.join(input_dir, f"d{i}"))

    q = incremental_cms_stream(spark, input_dir + "/*", state_dir, probes,
                               available_now=True, max_files_per_trigger=1,
                               compact_every=2)
    q.awaitTermination(240)

    out = spark.read.parquet(os.path.join(state_dir, "counts"))
    last = out.agg(F.max("batch_id")).collect()[0][0]
    got = {r["term"]: r["cms_count"]
           for r in out.where(F.col("batch_id") == last).collect()}

    # parity with the batch sketch over the union
    df = spark.createDataFrame(rows, "doc_id long, text string")
    toks = (df.select(F.explode(F.split("text", " ")).alias("token"))
            .where(F.col("token") != ""))
    want = {r["token"]: r["cms_count"]
            for r in cms_lookup(
                cms_cells(toks, [], "token"),
                spark.createDataFrame([(p,) for p in probes],
                                      "token string"), "token").collect()}
    assert got == want

    # never undercounts the true running frequency
    import collections
    truth = collections.Counter(
        t for _, text in rows for t in text.split())
    for p in probes:
        assert got[p] >= truth.get(p, 0)
    assert got["absent"] >= 0
