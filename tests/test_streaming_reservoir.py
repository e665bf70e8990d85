"""Streaming reservoir twin (incremental_reservoir_stream): the running
per-stratum sample must equal the true per-stratum top-n md5 ranks of
the ingested union (pure-Python oracle), survive restart, tolerate
re-ingested ids, and retain at most two snapshot partitions."""

from __future__ import annotations

import hashlib
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N = 3


def _rank(doc_id: int) -> int:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16)


def _py_sample(rows):
    """stratum -> [(rank, id)] — true top-N per stratum, distinct ids."""
    strata: dict[str, dict[int, int]] = {}
    for doc_id, lang in rows:
        strata.setdefault(lang, {})[doc_id] = _rank(doc_id)
    return {s: sorted((r, i) for i, r in ids.items())[:N]
            for s, ids in strata.items()}


def _batches():
    b0 = [(i, "en" if i % 2 == 0 else "de") for i in range(10)]
    b1 = [(i + 100, "en" if i % 3 == 0 else "fr") for i in range(10)]
    # batch 2 re-ingests two batch-0 ids (must not double-occupy slots)
    b2 = [(200, "en"), (0, "en"), (1, "de"), (201, "de")]
    return [b0, b1, b2]


def _drop(spark, rows, path):
    spark.createDataFrame([(d, f"text {d}", s) for d, s in rows],
                          "doc_id long, text string, lang string") \
        .coalesce(1).write.parquet(path)


def _got(spark, state_dir):
    from distributed_lsh_spark.streaming.dedup_stream import current_sample

    cur = current_sample(spark, state_dir)
    out: dict[str, list] = {}
    for r in cur.orderBy("stratum", "sample_rank").collect():
        out.setdefault(r.stratum, []).append((r._rk, r.id))
    return out


def test_reservoir_stream_matches_python_topn(spark, tmp_path):
    from distributed_lsh_spark.streaming.dedup_stream import (
        incremental_reservoir_stream,
    )

    batches = _batches()
    input_dir = str(tmp_path / "incoming")
    state_dir = str(tmp_path / "state")
    os.makedirs(input_dir)
    for i, b in enumerate(batches):
        _drop(spark, b, os.path.join(input_dir, f"d{i}"))

    q = incremental_reservoir_stream(spark, input_dir + "/*", state_dir,
                                     n=N, available_now=True,
                                     max_files_per_trigger=1)
    q.awaitTermination(240)

    want = _py_sample([r for b in batches for r in b])
    assert _got(spark, state_dir) == want
    # snapshot retention: current + immediate predecessor only
    parts = [p for p in os.listdir(os.path.join(state_dir, "sample"))
             if p.startswith("batch_id=")]
    assert len(parts) <= 2


def test_reservoir_stream_restart_parity(spark, tmp_path):
    from distributed_lsh_spark.streaming.dedup_stream import (
        incremental_reservoir_stream,
    )

    batches = _batches()
    input_dir = str(tmp_path / "incoming")
    state_dir = str(tmp_path / "state")
    os.makedirs(input_dir)
    _drop(spark, batches[0], os.path.join(input_dir, "d0"))
    q = incremental_reservoir_stream(spark, input_dir + "/*", state_dir,
                                     n=N, available_now=True,
                                     max_files_per_trigger=1)
    q.awaitTermination(240)
    assert _got(spark, state_dir) == _py_sample(batches[0])

    for i in (1, 2):
        _drop(spark, batches[i], os.path.join(input_dir, f"d{i}"))
    q2 = incremental_reservoir_stream(spark, input_dir + "/*", state_dir,
                                      n=N, available_now=True,
                                      max_files_per_trigger=1)
    q2.awaitTermination(240)
    assert _got(spark, state_dir) == \
        _py_sample([r for b in batches for r in b])
