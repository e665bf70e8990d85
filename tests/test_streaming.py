"""Structured Streaming: incremental dedup over arriving files matches the
batch pipeline on the same corpus (batch/stream parity)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from distributed_lsh_spark.conf import DEFAULT_CONFIG as CFG
from distributed_lsh_spark.oracle.dedup import DedupOracle
from distributed_lsh_spark.streaming.dedup_stream import incremental_dedup_stream


def test_incremental_dedup_matches_batch(spark, tiny_corpus, tmp_path):
    docs = tiny_corpus.texts_by_id()
    ids = sorted(docs)
    input_dir = str(tmp_path / "incoming")
    state_dir = str(tmp_path / "state")
    os.makedirs(input_dir)

    # two file drops (two micro-batches): first half, then the rest
    half = len(ids) // 2
    spark.createDataFrame([(i, docs[i]) for i in ids[:half]],
                          "doc_id long, text string") \
         .coalesce(1).write.parquet(os.path.join(input_dir, "drop1"))
    spark.createDataFrame([(i, docs[i]) for i in ids[half:]],
                          "doc_id long, text string") \
         .coalesce(1).write.parquet(os.path.join(input_dir, "drop2"))

    q = incremental_dedup_stream(
        spark, input_dir + "/*", state_dir, CFG, available_now=True,
        max_files_per_trigger=1)
    q.awaitTermination(240)

    got = {(r["id_a"], r["id_b"])
           for r in spark.read.parquet(os.path.join(state_dir, "pairs")).collect()}
    oracle = DedupOracle(CFG, docs)
    assert got == set(oracle.verified_pairs())

    # the persisted band index (the incrementality carrier: later batches
    # JOIN it instead of recomputing history) holds every batch's keys
    bdir = os.path.join(state_dir, "band_index")
    batches = {f for f in os.listdir(bdir) if f.startswith("batch_id=")}
    assert len(batches) >= 2, "each micro-batch must append its band keys"
    idx = spark.read.parquet(bdir)
    assert idx.count() == len(ids) * CFG.num_bands


def test_has_band_history_is_fs_agnostic(spark, tmp_path):
    """The history probe must work on Hadoop-style URIs, not just bare
    local paths — `file:/...` is the simplest URI os.path.isdir rejects."""
    import os

    from distributed_lsh_spark.streaming.dedup_stream import has_band_history

    d = tmp_path / "band_index"
    assert not has_band_history(spark, str(d))
    assert not has_band_history(spark, f"file:{d}")
    (d / "batch_id=0").mkdir(parents=True)
    assert has_band_history(spark, str(d))
    uri = f"file:{d}"
    assert not os.path.isdir(uri)          # the old probe's failure mode
    assert has_band_history(spark, uri)    # the Hadoop API handles it
    # a dir with non-partition content is still "no history"
    d2 = tmp_path / "other"
    (d2 / "stuff").mkdir(parents=True)
    assert not has_band_history(spark, str(d2))


def test_incremental_simhash_matches_batch(spark, tiny_corpus, tmp_path):
    """Streaming SimHash twin: accumulated stream pairs == one-shot batch
    simhash_dup_pairs over the full corpus (cross-batch pairs included)."""
    from distributed_lsh_spark.operators.simhash_exact import (
        oracle_simhash_pairs,
    )
    from distributed_lsh_spark.streaming.dedup_stream import (
        incremental_simhash_stream,
    )

    docs = {i: t for i, t in list(tiny_corpus.texts_by_id().items())[:120]}
    ids = sorted(docs)
    input_dir = str(tmp_path / "incoming")
    state_dir = str(tmp_path / "state")
    os.makedirs(input_dir)
    # round-robin split: planted dup clusters have ADJACENT ids, so this
    # guarantees cross-batch pairs (the new-vs-history join must find them)
    chunks = [[i for i in ids if i % 3 == n] for n in range(3)]
    for n, chunk in enumerate(chunks):
        spark.createDataFrame([(i, docs[i]) for i in chunk],
                              "doc_id long, text string") \
             .coalesce(1).write.parquet(os.path.join(input_dir, f"drop{n}"))

    # compact_every=2: batch 2's pre-pass merges partitions {0,1} -> {1},
    # so parity here also covers the compacted-index read path
    q = incremental_simhash_stream(spark, input_dir + "/*", state_dir,
                                   k=5, available_now=True,
                                   max_files_per_trigger=1, compact_every=2)
    q.awaitTermination(240)

    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in spark.read.parquet(
               os.path.join(state_dir, "pairs")).collect()}
    expect = oracle_simhash_pairs(docs, k=5, hamming_threshold=3)
    assert got == expect
    assert expect, "fixture must contain simhash-near pairs"
    # pairs whose members arrived in DIFFERENT batches prove the
    # new-vs-history join works
    assert any(a % 3 != b % 3 for a, b in expect), \
        "fixture should plant cross-batch pairs"


def test_incremental_substring_matches_batch(spark, tiny_corpus, tmp_path):
    """Streaming substring twin: accumulated stream pairs == one-shot
    oracle_substring_pairs over the full corpus."""
    from distributed_lsh_spark.operators.substring import (
        oracle_substring_pairs,
    )
    from distributed_lsh_spark.streaming.dedup_stream import (
        incremental_substring_stream,
    )

    docs = tiny_corpus.texts_by_id()
    ids = sorted(docs)
    input_dir = str(tmp_path / "incoming")
    state_dir = str(tmp_path / "state")
    os.makedirs(input_dir)
    chunks = [[i for i in ids if i % 3 == n] for n in range(3)]
    for n, chunk in enumerate(chunks):
        spark.createDataFrame([(i, docs[i]) for i in chunk],
                              "doc_id long, text string") \
             .coalesce(1).write.parquet(os.path.join(input_dir, f"drop{n}"))

    q = incremental_substring_stream(spark, input_dir + "/*", state_dir,
                                     window=50, guarantee=10, min_shared=2,
                                     available_now=True,
                                     max_files_per_trigger=1, compact_every=2)
    q.awaitTermination(240)

    got = {(r["id_a"], r["id_b"]): r["n_shared_fps"]
           for r in spark.read.parquet(
               os.path.join(state_dir, "pairs")).collect()}
    expect = oracle_substring_pairs(docs, window=50, guarantee=10,
                                    min_shared=2)
    assert got == expect
    assert expect, "fixture must contain long-repeat pairs"
    assert any(a % 3 != b % 3 for a, b in expect), \
        "fixture should plant cross-batch pairs"


def test_stream_index_compaction_bounds_partitions(spark, tiny_corpus, tmp_path):
    """Index maintenance: with compact_every=N the band index never holds
    more than N+1 batch_id= partitions (vs one per batch forever), and
    batch/stream parity still holds through multiple compaction cycles."""
    docs = {i: t for i, t in list(tiny_corpus.texts_by_id().items())[:120]}
    ids = sorted(docs)
    input_dir = str(tmp_path / "incoming")
    state_dir = str(tmp_path / "state")
    os.makedirs(input_dir)
    n_drops = 6
    chunks = [[i for i in ids if i % n_drops == n] for n in range(n_drops)]
    for n, chunk in enumerate(chunks):
        spark.createDataFrame([(i, docs[i]) for i in chunk],
                              "doc_id long, text string") \
             .coalesce(1).write.parquet(os.path.join(input_dir, f"drop{n}"))

    q = incremental_dedup_stream(
        spark, input_dir + "/*", state_dir, CFG, available_now=True,
        max_files_per_trigger=1, compact_every=2)
    q.awaitTermination(240)

    # 6 batches, compactions at 2 and 4 -> partitions {-4, 4, 5} remain
    # (merged partitions carry fresh negative ids; see compact_batch_index)
    bdir = os.path.join(state_dir, "band_index")
    parts = {f for f in os.listdir(bdir) if f.startswith("batch_id=")}
    assert len(parts) <= 3, f"compaction must bound partitions, got {parts}"
    sdir = os.path.join(state_dir, "sigs")
    sparts = {f for f in os.listdir(sdir) if f.startswith("batch_id=")}
    assert len(sparts) <= 3

    # no rows lost or duplicated by the merges
    idx = spark.read.parquet(bdir)
    assert idx.count() == len(ids) * CFG.num_bands
    assert idx.dropDuplicates(["doc_id", "band_id", "band_hash"]).count() \
        == len(ids) * CFG.num_bands

    # parity across compaction cycles
    got = {(r["id_a"], r["id_b"])
           for r in spark.read.parquet(os.path.join(state_dir, "pairs")).collect()}
    oracle = DedupOracle(CFG, docs)
    assert got == set(oracle.verified_pairs())


def test_compaction_self_heals_duplicate_rows(spark, tmp_path):
    """Crash window: if a previous compaction wrote the merged partition
    but died before deleting the stale ones, the index briefly holds
    duplicate rows.  The next compaction must dedup on the index key and
    leave exactly one partition with the distinct row set."""
    from distributed_lsh_spark.streaming.dedup_stream import (
        compact_batch_index,
    )

    d = str(tmp_path / "band_index")
    rows = [(i, i % 4, 1000 + i % 7) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, band_id int, band_hash long")
    # batch 0 and batch 1 partitions, where batch 1 ALSO contains all of
    # batch 0's rows (the half-compacted crash state)
    df.where("doc_id < 20").withColumn("batch_id", F.lit(0)) \
      .write.partitionBy("batch_id").mode("append").parquet(d)
    df.withColumn("batch_id", F.lit(1)) \
      .write.partitionBy("batch_id").mode("append").parquet(d)
    assert spark.read.parquet(d).count() == 60          # 20 duplicated

    assert compact_batch_index(spark, d, current_batch_id=2,
                               dedup_cols=["doc_id", "band_id", "band_hash"])
    parts = {f for f in os.listdir(d) if f.startswith("batch_id=")}
    # merged partition carries a FRESH id (-current) so the overwrite can
    # never delete an existing committed partition mid-commit
    assert parts == {"batch_id=-2"}
    healed = spark.read.parquet(d)
    assert healed.count() == 40                         # duplicates gone
    got = {(r["doc_id"], r["band_id"], r["band_hash"])
           for r in healed.collect()}
    assert got == set(rows)
    # fewer than two mergeable partitions -> no-op (replayed-batch case)
    assert not compact_batch_index(spark, d, current_batch_id=2,
                                   dedup_cols=["doc_id", "band_id", "band_hash"])


def test_incremental_simhash_stream_restart(spark, tiny_corpus, tmp_path):
    """Stream restart: a NEW query over the same state dir picks up the
    persisted key index + checkpoint and finds pairs spanning the
    pre-restart and post-restart batches."""
    from distributed_lsh_spark.operators.simhash_exact import (
        oracle_simhash_pairs,
    )
    from distributed_lsh_spark.streaming.dedup_stream import (
        incremental_simhash_stream,
    )

    docs = {i: t for i, t in list(tiny_corpus.texts_by_id().items())[:90]}
    ids = sorted(docs)
    input_dir = str(tmp_path / "incoming")
    state_dir = str(tmp_path / "state")
    os.makedirs(input_dir)
    first = [i for i in ids if i % 2 == 0]
    second = [i for i in ids if i % 2 == 1]
    spark.createDataFrame([(i, docs[i]) for i in first],
                          "doc_id long, text string") \
         .coalesce(1).write.parquet(os.path.join(input_dir, "drop0"))

    q = incremental_simhash_stream(spark, input_dir + "/*", state_dir,
                                   k=5, available_now=True)
    q.awaitTermination(240)

    # restart: second half arrives after the first query terminated
    spark.createDataFrame([(i, docs[i]) for i in second],
                          "doc_id long, text string") \
         .coalesce(1).write.parquet(os.path.join(input_dir, "drop1"))
    q2 = incremental_simhash_stream(spark, input_dir + "/*", state_dir,
                                    k=5, available_now=True)
    q2.awaitTermination(240)

    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in spark.read.parquet(
               os.path.join(state_dir, "pairs")).collect()}
    expect = oracle_simhash_pairs(docs, k=5, hamming_threshold=3)
    assert got == expect
    assert any(a % 2 != b % 2 for a, b in expect), \
        "fixture should span the restart boundary"
