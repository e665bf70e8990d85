"""Streaming cluster-label maintenance (incremental_dedup_stream with
maintain_labels=True): the continuously-folded labels must equal a
one-shot connected-components over every pair the stream has verified —
across batches, and across a stop/restart."""

from __future__ import annotations

import os

from distributed_lsh_spark.conf import DEFAULT_CONFIG as CFG
from distributed_lsh_spark.streaming.dedup_stream import (
    current_labels,
    incremental_dedup_stream,
)


def _drop(spark, docs, ids, input_dir, name):
    spark.createDataFrame([(i, docs[i]) for i in ids],
                          "doc_id long, text string") \
         .coalesce(1).write.parquet(os.path.join(input_dir, name))


def _batch_cc(spark, state_dir):
    from distributed_lsh_spark.operators.connected_components import (
        connected_components,
    )

    pairs = spark.read.parquet(os.path.join(state_dir, "pairs")) \
        .select("id_a", "id_b")
    return {r.doc_id: r.cluster_id
            for r in connected_components(pairs).collect()}


def test_stream_labels_match_batch_cc_and_survive_restart(
        spark, tiny_corpus, tmp_path):
    docs = tiny_corpus.texts_by_id()
    ids = sorted(docs)
    input_dir = str(tmp_path / "incoming")
    state_dir = str(tmp_path / "state")
    os.makedirs(input_dir)

    third = len(ids) // 3
    _drop(spark, docs, ids[:third], input_dir, "drop1")
    _drop(spark, docs, ids[third:2 * third], input_dir, "drop2")
    q = incremental_dedup_stream(
        spark, input_dir + "/*", state_dir, CFG, available_now=True,
        max_files_per_trigger=1, maintain_labels=True)
    q.awaitTermination(240)

    labels_dir = os.path.join(state_dir, "labels")
    got = {r.doc_id: r.cluster_id
           for r in current_labels(spark, labels_dir).collect()}
    assert got == _batch_cc(spark, state_dir)
    assert got, "corpus plants dups — labels must be non-empty"

    # restart: a third drop folds cross-restart merges into the standing
    # labels read back from the delta dir
    _drop(spark, docs, ids[2 * third:], input_dir, "drop3")
    q2 = incremental_dedup_stream(
        spark, input_dir + "/*", state_dir, CFG, available_now=True,
        max_files_per_trigger=1, maintain_labels=True)
    q2.awaitTermination(240)

    got2 = {r.doc_id: r.cluster_id
            for r in current_labels(spark, labels_dir).collect()}
    want2 = _batch_cc(spark, state_dir)
    assert got2 == want2
    assert len(got2) >= len(got)
    # deltas stay deltas: the dir must hold strictly fewer rows than
    # batches x labeled docs (only changed rows are appended)
    raw = spark.read.parquet(labels_dir)
    n_batches = raw.select("batch_id").distinct().count()
    assert raw.count() < n_batches * max(len(got2), 1) or n_batches == 1


def test_empty_edge_batch_is_noop(spark):
    from distributed_lsh_spark.operators.connected_components import (
        connected_components,
    )
    from distributed_lsh_spark.operators.snapshot import (
        incremental_components,
    )

    labels = connected_components(
        spark.createDataFrame([(0, 1)], "id_a long, id_b long"))
    out = incremental_components(
        labels, spark.createDataFrame([], "id_a long, id_b long"))
    assert {r.doc_id: r.cluster_id for r in out.collect()} == {0: 0, 1: 0}
