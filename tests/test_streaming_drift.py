"""Streaming drift twin (incremental_drift_stream): every batch's JSD
vs the archive-so-far must match a pure-Python replay exactly (to the
ln-quantization pico-unit), a planted mixture shift must spike, and
restart must not change history."""

from __future__ import annotations

import math
import os
import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F


def _toks(text):
    import re
    return [t for t in re.sub("[^a-z0-9]+", " ", text.lower()).split() if t]


def _py_jsd(batch_texts, archive_texts):
    cb, ca = Counter(), Counter()
    for t in batch_texts:
        cb.update(_toks(t))
    for t in archive_texts:
        ca.update(_toks(t))
    vocab = set(cb) | set(ca)
    nb, na, v = sum(cb.values()), sum(ca.values()), len(vocab)
    total, best = 0, None
    for w in sorted(vocab):
        pb = (cb.get(w, 0) + 1) / (nb + v)
        pa = (ca.get(w, 0) + 1) / (na + v)
        m = (pa + pb) / 2
        c = round((pa * math.log(pa / m) + pb * math.log(pb / m)) * 0.5e12)
        total += c
        if best is None or (c, w) >= best:
            best = (c, w)
    return total, best[1], best[0], len(vocab)


def _batches():
    base = ["spark join shuffle table row", "hash table scan filter row",
            "agg window sort merge join"]
    b0 = [base[i % 3] + f" doc{i}" for i in range(8)]
    b1 = [base[(i + 1) % 3] + f" doc{i + 8}" for i in range(8)]
    # batch 2 carries a planted mixture shift
    b2 = [base[i % 3] + " spamspam spamspam spamspam" for i in range(8)]
    return [b0, b1, b2]


def _drop(spark, texts, start_id, path):
    spark.createDataFrame(
        [(start_id + i, t) for i, t in enumerate(texts)],
        "doc_id long, text string").coalesce(1).write.parquet(path)


def _scores(spark, state_dir):
    out = spark.read.parquet(os.path.join(state_dir, "drift"))
    return {r["batch_id"]: (r["jsd_micro"], r["top_token"],
                            r["top_contrib_micro"])
            for r in out.collect()}


def test_drift_stream_matches_python_replay(spark, tmp_path):
    from distributed_lsh_spark.streaming.dedup_stream import (
        incremental_drift_stream,
    )

    batches = _batches()
    input_dir = str(tmp_path / "incoming")
    state_dir = str(tmp_path / "state")
    os.makedirs(input_dir)
    for i, b in enumerate(batches):
        _drop(spark, b, i * 100, os.path.join(input_dir, f"d{i}"))

    q = incremental_drift_stream(spark, input_dir + "/*", state_dir,
                                 available_now=True,
                                 max_files_per_trigger=1,
                                 compact_every=2)
    q.awaitTermination(240)

    got = _scores(spark, state_dir)
    assert got[0] == (None, None, None)          # no archive yet
    for b in (1, 2):
        want = _py_jsd(batches[b], [t for x in batches[:b] for t in x])
        # each per-token quantization can differ by at most one
        # pico-unit at a libm rounding boundary
        assert abs(got[b][0] - want[0]) <= want[3]
        assert got[b][1] == want[1]
        assert abs(got[b][2] - want[2]) <= 1
    # the planted mixture shift spikes and its token tops the ranking
    assert got[2][0] > got[1][0]
    assert got[2][1] == "spamspam"


def test_drift_stream_restart_parity(spark, tmp_path):
    from distributed_lsh_spark.streaming.dedup_stream import (
        incremental_drift_stream,
    )

    batches = _batches()
    input_dir = str(tmp_path / "incoming")
    state_dir = str(tmp_path / "state")
    os.makedirs(input_dir)
    _drop(spark, batches[0], 0, os.path.join(input_dir, "d0"))
    q = incremental_drift_stream(spark, input_dir + "/*", state_dir,
                                 available_now=True,
                                 max_files_per_trigger=1)
    q.awaitTermination(240)
    first = _scores(spark, state_dir)

    for i in (1, 2):
        _drop(spark, batches[i], i * 100, os.path.join(input_dir, f"d{i}"))
    q2 = incremental_drift_stream(spark, input_dir + "/*", state_dir,
                                  available_now=True,
                                  max_files_per_trigger=1)
    q2.awaitTermination(240)
    got = _scores(spark, state_dir)

    assert got[0] == first[0]                    # history unchanged
    want = _py_jsd(batches[2], batches[0] + batches[1])
    assert got[2][1] == want[1]
    assert abs(got[2][0] - want[0]) <= want[3]
