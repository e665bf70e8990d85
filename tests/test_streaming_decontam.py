"""Streaming decontamination twin: per-batch verdicts must equal the
batch operator's verdicts on the union of batches (doc-local rule),
exactly-once emission, restart, and the short-eval whole-text fallback."""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

EVAL_TOKENS = " ".join(f"e{j}" for j in range(20))
EVAL_SHORT = "short quiz answer"


def _docs() -> dict[int, str]:
    """10 docs: 1 and 6 embed 13 consecutive eval tokens (contaminated
    under the any-hit rule), 3 is a verbatim copy of the SHORT eval text
    (whole-text-gram fallback), the rest are unique filler."""
    contaminated_span = " ".join(f"e{j}" for j in range(3, 16))
    out = {}
    for i in range(10):
        filler = " ".join(f"d{i}w{j}" for j in range(30))
        if i in (1, 6):
            out[i] = f"{filler} {contaminated_span} tail{i}"
        elif i == 3:
            out[i] = EVAL_SHORT
        else:
            out[i] = filler
    return out


def _drop(spark, docs, ids, path):
    spark.createDataFrame([(i, docs[i]) for i in ids],
                          "doc_id long, text string") \
         .coalesce(1).write.parquet(path)


def _eval_df(spark):
    return spark.createDataFrame([(EVAL_TOKENS,), (EVAL_SHORT,)],
                                 "text string")


def _batch_verdict(spark, docs) -> set[int]:
    from distributed_lsh_spark.operators.decontam import (
        contaminated_ids, eval_ngram_inventory)

    all_df = spark.createDataFrame(list(docs.items()),
                                   "doc_id long, text string")
    inv = eval_ngram_inventory(_eval_df(spark))
    return {r["doc_id"] for r in contaminated_ids(all_df, inv).collect()}


def test_decontam_stream_matches_batch_verdicts(spark, tmp_path):
    from distributed_lsh_spark.streaming.dedup_stream import (
        incremental_decontam_stream,
    )

    docs = _docs()
    input_dir = str(tmp_path / "incoming")
    state_dir = str(tmp_path / "state")
    os.makedirs(input_dir)
    for b in range(2):
        _drop(spark, docs, [i for i in docs if i % 2 == b],
              os.path.join(input_dir, f"drop{b}"))

    q = incremental_decontam_stream(spark, input_dir + "/*", state_dir,
                                    _eval_df(spark), available_now=True,
                                    max_files_per_trigger=1)
    q.awaitTermination(240)

    rows = spark.read.parquet(os.path.join(state_dir, "removed")).collect()
    got = [r["doc_id"] for r in rows]
    expect = _batch_verdict(spark, docs)
    assert set(got) == expect == {1, 3, 6}
    assert len(got) == len(set(got)), "verdict emitted more than once"
    # doc-local rule: every verdict lands in the doc's own arrival batch
    arrival = {i: i % 2 for i in docs}
    assert all(r["batch_id"] == arrival[r["doc_id"]] for r in rows)


def test_decontam_stream_restart_is_exactly_once(spark, tmp_path):
    from distributed_lsh_spark.streaming.dedup_stream import (
        incremental_decontam_stream,
    )

    docs = _docs()
    input_dir = str(tmp_path / "incoming")
    state_dir = str(tmp_path / "state")
    os.makedirs(input_dir)
    _drop(spark, docs, [0, 1, 2, 3], os.path.join(input_dir, "drop0"))
    q = incremental_decontam_stream(spark, input_dir + "/*", state_dir,
                                    _eval_df(spark), available_now=True,
                                    max_files_per_trigger=1)
    q.awaitTermination(240)

    _drop(spark, docs, [4, 5, 6, 7, 8, 9], os.path.join(input_dir, "drop1"))
    q2 = incremental_decontam_stream(spark, input_dir + "/*", state_dir,
                                     _eval_df(spark), available_now=True,
                                     max_files_per_trigger=1)
    q2.awaitTermination(240)

    rows = spark.read.parquet(os.path.join(state_dir, "removed")).collect()
    got = [r["doc_id"] for r in rows]
    assert set(got) == _batch_verdict(spark, docs)
    assert len(got) == len(set(got))


def test_decontam_stream_threshold_rule(spark, tmp_path):
    """threshold > 0: a doc sharing ONE gram out of many survives, the
    heavy-overlap docs still fall — per-doc ratio, batch-independent."""
    from distributed_lsh_spark.operators.decontam import (
        contaminated_ids, eval_ngram_inventory)
    from distributed_lsh_spark.streaming.dedup_stream import (
        incremental_decontam_stream,
    )

    docs = _docs()
    # doc 8 gains exactly 13 eval tokens at the END of 30 filler tokens:
    # 1 shared gram of 31 distinct grams ≈ 3.2% < 25% -> survives
    docs[8] = docs[8] + " " + " ".join(f"e{j}" for j in range(3, 16))
    input_dir = str(tmp_path / "incoming")
    state_dir = str(tmp_path / "state")
    os.makedirs(input_dir)
    _drop(spark, docs, list(docs), os.path.join(input_dir, "drop0"))

    q = incremental_decontam_stream(spark, input_dir + "/*", state_dir,
                                    _eval_df(spark), threshold=0.25,
                                    available_now=True)
    q.awaitTermination(240)

    got = {r["doc_id"] for r in
           spark.read.parquet(os.path.join(state_dir, "removed")).collect()}
    all_df = spark.createDataFrame(list(docs.items()),
                                   "doc_id long, text string")
    inv = eval_ngram_inventory(_eval_df(spark))
    expect = {r["doc_id"]
              for r in contaminated_ids(all_df, inv,
                                        threshold=0.25).collect()}
    assert got == expect
    assert 8 not in got
    assert 3 in got, "whole-text eval copy is 100% overlap"
