"""Bloom-decision line dedup (operators/bloom_dedup.py): engine flags vs
a pure-Python sequential Bloom replay, the exact-dup ⊆ flagged invariant,
and the streaming twin (monotone parity, first-arrival semantics,
bounded state, restart)."""

from __future__ import annotations

import hashlib
import os
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

RANK_POS_SPACE = 1 << 20


def _lines(text: str) -> list[str]:
    toks = [t for t in re.sub(r"[^a-z0-9]+", " ", text.lower()).split(" ")
            if t]
    return [" ".join(toks[i:i + 8]) for i in range(0, len(toks), 8)]


def _positions(line: str, m: int, k: int) -> list[int]:
    hx = hashlib.md5(line.encode()).hexdigest()
    h1 = int(hx[0:15], 16) % m
    h2 = int(hx[16:31], 16) % (m - 1) + 1
    return [(h1 + i * h2) % m for i in range(k)]


def _python_bloom_flags(docs: dict[int, str], m: int, k: int,
                        order: list[tuple[int, int, str]] | None = None,
                        ) -> dict[tuple[int, int], bool]:
    """Replay a single-threaded Bloom filter: occurrences in (doc_id,
    pos) order (or an explicit order), query-then-add."""
    if order is None:
        order = [(d, p, ln) for d in sorted(docs)
                 for p, ln in enumerate(_lines(docs[d]))]
    bits: set[int] = set()
    flags = {}
    for d, p, line in order:
        pos = _positions(line, m, k)
        flags[(d, p)] = all(b in bits for b in pos)
        bits.update(pos)
    return flags


SHARED = "alpha beta gamma delta epsilon zeta eta theta"


def _docs(n: int = 12) -> dict[int, str]:
    out = {}
    for i in range(n):
        filler = " ".join(f"d{i}w{j}" for j in range(24))
        if i in (2, 7):
            out[i] = f"{SHARED} {filler}"
        elif i == 4:
            out[i] = f"{SHARED} " + " ".join(f"d4x{j}" for j in range(8)) \
                + f" {SHARED} {filler}"
        else:
            out[i] = filler
    return out


def _engine_flags(spark, docs: dict[int, str], m: int, k: int):
    from pyspark.sql import functions as F

    from distributed_lsh_spark.functions.text import doc_lines
    from distributed_lsh_spark.operators.bloom_dedup import (
        bloom_flag_occurrences,
    )

    df = spark.createDataFrame(list(docs.items()),
                               "doc_id long, text string")
    lines = (doc_lines(df)
             .withColumn("rk", F.col("doc_id") * F.lit(RANK_POS_SPACE)
                         + F.col("pos")))
    flags = bloom_flag_occurrences(lines, m, k, key_col="line",
                                   rank_col="rk")
    rows = lines.join(flags, "rk") \
        .select("doc_id", "pos", "flagged", "line").collect()
    return {(r["doc_id"], r["pos"]): (r["flagged"], r["line"])
            for r in rows}


def test_bloom_flags_match_python_replay(spark):
    """Distributed min-setter form == single-threaded Bloom replay, at a
    small m where false positives provably occur."""
    docs = _docs(40)
    m, k = 256, 2  # 40 docs x ~4 lines x 2 bits vs 256 slots: FP-dense
    got = _engine_flags(spark, docs, m, k)
    expect = _python_bloom_flags(docs, m, k)
    assert {o: f for o, (f, _) in got.items()} == expect
    # exact duplicates must be flagged (the no-false-negative direction)
    seen: set[str] = set()
    n_fp = 0
    for d in sorted(docs):
        for p, line in enumerate(_lines(docs[d])):
            if line in seen:
                assert got[(d, p)][0], f"exact dup not flagged: {(d, p)}"
            elif got[(d, p)][0]:
                n_fp += 1
            seen.add(line)
    assert n_fp > 0, "m=256 was sized to force false positives"


def test_bloom_large_m_degenerates_to_exact(spark):
    """At m >> n x k the FP term vanishes and Bloom flags equal the
    exact keep-first removal set."""
    docs = _docs(12)
    got = _engine_flags(spark, docs, m=1 << 24, k=2)
    seen: set[str] = set()
    for d in sorted(docs):
        for p, line in enumerate(_lines(docs[d])):
            assert got[(d, p)][0] == (line in seen), (d, p)
            seen.add(line)


def _drop(spark, docs, ids, path):
    spark.createDataFrame([(i, docs[i]) for i in ids],
                          "doc_id long, text string") \
         .coalesce(1).write.parquet(path)


def test_streaming_bloom_monotone_parity_and_state_bound(spark, tmp_path):
    """Monotone ingest (doc_ids non-decreasing across batches): the
    cumulative streamed flags equal the batch operator's global replay;
    every occurrence emits exactly once; positions state is bounded by m
    through compaction cycles."""
    from pyspark.sql import functions as F

    from distributed_lsh_spark.streaming.dedup_stream import (
        incremental_bloom_line_stream,
    )

    docs = _docs(30)
    m, k = 512, 2
    input_dir = str(tmp_path / "incoming")
    state_dir = str(tmp_path / "state")
    os.makedirs(input_dir)
    ids = sorted(docs)
    for n, lo in enumerate(range(0, 30, 10)):  # monotone: 0-9, 10-19, 20-29
        _drop(spark, docs, ids[lo:lo + 10],
              os.path.join(input_dir, f"drop{n}"))

    q = incremental_bloom_line_stream(spark, input_dir + "/*", state_dir,
                                      m=m, k=k, available_now=True,
                                      max_files_per_trigger=1,
                                      compact_every=2)
    q.awaitTermination(240)

    rows = spark.read.parquet(os.path.join(state_dir, "flags")).collect()
    got = {(r["doc_id"], r["pos"]): r["flagged"] for r in rows}
    assert len(rows) == len(got), "occurrence emitted more than once"
    assert got == _python_bloom_flags(docs, m, k)

    posf = spark.read.parquet(os.path.join(state_dir, "positions"))
    n_pos_rows = posf.count()
    assert n_pos_rows <= m, "positions state must be bounded by m"
    assert n_pos_rows == posf.select("bpos").dropDuplicates().count()
    # and the state equals the replay's final bit set
    bits: set[int] = set()
    for d in sorted(docs):
        for line in _lines(docs[d]):
            bits.update(_positions(line, m, k))
    assert {r["bpos"] for r in posf.collect()} == bits

    # restart with one more (monotone) batch: verdicts append exactly once
    more = {40: docs[2]}  # full copy of doc 2 -> every line flagged
    _drop(spark, more, [40], os.path.join(input_dir, "drop3"))
    q2 = incremental_bloom_line_stream(spark, input_dir + "/*", state_dir,
                                       m=m, k=k, available_now=True,
                                       max_files_per_trigger=1,
                                       compact_every=2)
    q2.awaitTermination(240)
    rows2 = spark.read.parquet(os.path.join(state_dir, "flags")) \
        .where(F.col("doc_id") == 40).collect()
    assert rows2 and all(r["flagged"] for r in rows2)
    total = spark.read.parquet(os.path.join(state_dir, "flags")).count()
    assert total == len(rows) + len(rows2), "restart must not re-emit"


def test_streaming_bloom_first_arrival_semantics(spark, tmp_path):
    """Under NON-monotone interleaving the stream applies first-ARRIVAL
    order: a line landing first from a HIGH doc_id flags the LOW doc_id
    copy that arrives later — the opposite of the batch rank order."""
    from distributed_lsh_spark.streaming.dedup_stream import (
        incremental_bloom_line_stream,
    )

    docs = {9: SHARED, 1: SHARED}
    input_dir = str(tmp_path / "incoming")
    state_dir = str(tmp_path / "state")
    os.makedirs(input_dir)
    _drop(spark, docs, [9], os.path.join(input_dir, "drop0"))
    _drop(spark, docs, [1], os.path.join(input_dir, "drop1"))

    q = incremental_bloom_line_stream(spark, input_dir + "/*", state_dir,
                                      m=1 << 16, k=2, available_now=True,
                                      max_files_per_trigger=1)
    q.awaitTermination(240)
    rows = spark.read.parquet(os.path.join(state_dir, "flags")).collect()
    flags = {r["doc_id"]: r["flagged"] for r in rows}
    assert flags == {9: False, 1: True}
