"""Streaming line-dedup twin: parity with the batch removal semantics,
exactly-once emission (including retroactive occurrences), restart."""

from __future__ import annotations

import os
import re
import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SHARED = "alpha beta gamma delta epsilon zeta eta theta"  # one full 8-token line


def _docs() -> dict[int, str]:
    """12 docs; 2 and 7 start with the SHARED line (cross-batch dup under
    i % 3 chunking), 4 carries it twice at aligned positions (within-doc
    dup), the rest are unique filler."""
    out = {}
    for i in range(12):
        filler = " ".join(f"d{i}w{j}" for j in range(24))
        if i in (2, 7):
            out[i] = f"{SHARED} {filler}"
        elif i == 4:
            eight = " ".join(f"d4x{j}" for j in range(8))
            out[i] = f"{SHARED} {eight} {SHARED} {filler}"
        else:
            out[i] = filler
    return out


def _removed_oracle(docs: dict[int, str]) -> set[tuple[int, int]]:
    cnt: Counter = Counter()
    occs = []
    for d, text in docs.items():
        toks = [t for t in re.sub(r"[^a-z0-9]+", " ", text.lower()).split(" ")
                if t]
        lines = [" ".join(toks[i:i + 8]) for i in range(0, len(toks), 8)]
        for p, line in enumerate(lines):
            occs.append((d, p, line))
            cnt[line] += 1
    return {(d, p) for d, p, line in occs if cnt[line] >= 2}


def _drop(spark, docs, ids, path):
    spark.createDataFrame([(i, docs[i]) for i in ids],
                          "doc_id long, text string") \
         .coalesce(1).write.parquet(path)


def test_incremental_line_dedup_matches_batch(spark, tmp_path):
    from distributed_lsh_spark.streaming.dedup_stream import (
        incremental_line_dedup_stream,
    )

    docs = _docs()
    input_dir = str(tmp_path / "incoming")
    state_dir = str(tmp_path / "state")
    os.makedirs(input_dir)
    for n in range(3):
        _drop(spark, docs, [i for i in docs if i % 3 == n],
              os.path.join(input_dir, f"drop{n}"))

    q = incremental_line_dedup_stream(spark, input_dir + "/*", state_dir,
                                      available_now=True,
                                      max_files_per_trigger=1,
                                      compact_every=2)
    q.awaitTermination(240)

    rows = spark.read.parquet(os.path.join(state_dir, "removed")).collect()
    got = [(r["doc_id"], r["pos"]) for r in rows]
    expect = _removed_oracle(docs)
    assert set(got) == expect
    assert len(got) == len(set(got)), "occurrence emitted more than once"
    # doc 2 (batch 0) must be removed RETROACTIVELY when doc 7 (batch 1,
    # under the modulo chunking 7 % 3 == 1) repeats its line
    by_occ = {(r["doc_id"], r["pos"]): r["batch_id"] for r in rows}
    assert by_occ[(2, 0)] > 0, "retroactive occurrence must emit later"
    assert (4, 0) in by_occ and (4, 2) in by_occ, "within-doc dup removed"
    # index stays bounded by compaction
    idx = Path(state_dir) / "line_index"
    parts = [p for p in idx.iterdir() if p.name.startswith("batch_id=")]
    assert len(parts) <= 3


def test_incremental_line_dedup_restart(spark, tmp_path):
    from distributed_lsh_spark.streaming.dedup_stream import (
        incremental_line_dedup_stream,
    )

    docs = _docs()
    input_dir = str(tmp_path / "incoming")
    state_dir = str(tmp_path / "state")
    os.makedirs(input_dir)
    _drop(spark, docs, [i for i in docs if i % 3 == 0],
          os.path.join(input_dir, "drop0"))
    q = incremental_line_dedup_stream(spark, input_dir + "/*", state_dir,
                                      available_now=True,
                                      max_files_per_trigger=1)
    q.awaitTermination(240)

    _drop(spark, docs, [i for i in docs if i % 3 != 0],
          os.path.join(input_dir, "drop1"))
    q2 = incremental_line_dedup_stream(spark, input_dir + "/*", state_dir,
                                       available_now=True,
                                       max_files_per_trigger=1)
    q2.awaitTermination(240)

    rows = spark.read.parquet(os.path.join(state_dir, "removed")).collect()
    got = [(r["doc_id"], r["pos"]) for r in rows]
    assert set(got) == _removed_oracle(docs)
    assert len(got) == len(set(got))


# ---------------------------------------------------------------------------
# keep-first twin (Dolma semantics): monotone, no retroactive emission
# ---------------------------------------------------------------------------

def _norm_lines(text: str) -> list[str]:
    toks = [t for t in re.sub(r"[^a-z0-9]+", " ", text.lower()).split(" ")
            if t]
    return [" ".join(toks[i:i + 8]) for i in range(0, len(toks), 8)]


def _keep_first_oracle(docs, batches) -> set[tuple[int, int]]:
    """First-ARRIVAL rule: batches in order, within a batch by (doc_id,
    pos) — under monotone batches this equals the batch query's global
    min-(doc_id, pos) rule."""
    seen: set[str] = set()
    removed: set[tuple[int, int]] = set()
    for batch in batches:
        for d in sorted(batch):
            for p, line in enumerate(_norm_lines(docs[d])):
                if line in seen:
                    removed.add((d, p))
                else:
                    seen.add(line)
    return removed


def test_keep_first_stream_first_arrival_semantics(spark, tmp_path):
    from distributed_lsh_spark.streaming.dedup_stream import (
        incremental_line_dedup_keep_first_stream,
    )

    docs = _docs()
    batches = [[i for i in docs if i % 3 == n] for n in range(3)]
    input_dir = str(tmp_path / "incoming")
    state_dir = str(tmp_path / "state")
    os.makedirs(input_dir)
    for n, b in enumerate(batches):
        _drop(spark, docs, b, os.path.join(input_dir, f"drop{n}"))

    q = incremental_line_dedup_keep_first_stream(
        spark, input_dir + "/*", state_dir, available_now=True,
        max_files_per_trigger=1, compact_every=2)
    q.awaitTermination(240)

    rows = spark.read.parquet(os.path.join(state_dir, "removed")).collect()
    got = [(r["doc_id"], r["pos"]) for r in rows]
    assert set(got) == _keep_first_oracle(docs, batches)
    assert len(got) == len(set(got)), "occurrence emitted more than once"
    # under the %3 interleaving the SHARED line first arrives in batch 1
    # at (4, 0): that occurrence survives; (4, 2) and (7, 0) die in their
    # own batch; (2, 0) — the batch query's global winner — arrives LAST
    # and dies.  No retroactive emission: every removal lands in the
    # batch its doc arrived in.
    by_occ = {(r["doc_id"], r["pos"]): r["batch_id"] for r in rows}
    assert (4, 0) not in by_occ
    assert by_occ[(2, 0)] == 2 and by_occ[(7, 0)] == 1
    arrival = {d: n for n, b in enumerate(batches) for d in b}
    assert all(b == arrival[d] for (d, _p), b in by_occ.items()), \
        "keep-first must never emit retroactively"
    # the index holds one row per DISTINCT line, bounded by compaction
    idx = Path(state_dir) / "line_index"
    parts = [p for p in idx.iterdir() if p.name.startswith("batch_id=")]
    assert len(parts) <= 3
    idx_df = spark.read.parquet(str(idx))
    n_distinct_lines = len({ln for d in docs.values() for ln in _norm_lines(d)})
    assert idx_df.select("lk").distinct().count() == n_distinct_lines


def test_keep_first_stream_matches_global_rule_under_monotone_ingest(
        spark, tmp_path):
    from distributed_lsh_spark.streaming.dedup_stream import (
        incremental_line_dedup_keep_first_stream,
    )

    docs = _docs()
    batches = [[0, 1, 2, 3], [4, 5, 6, 7], [8, 9, 10, 11]]
    input_dir = str(tmp_path / "incoming")
    state_dir = str(tmp_path / "state")
    os.makedirs(input_dir)
    for n, b in enumerate(batches):
        _drop(spark, docs, b, os.path.join(input_dir, f"drop{n}"))

    q = incremental_line_dedup_keep_first_stream(
        spark, input_dir + "/*", state_dir, available_now=True,
        max_files_per_trigger=1)
    q.awaitTermination(240)

    rows = spark.read.parquet(os.path.join(state_dir, "removed")).collect()
    got = {(r["doc_id"], r["pos"]) for r in rows}
    # monotone ingest: first-arrival == the batch query's global
    # min-(doc_id, pos) rule — (2, 0) keeps the SHARED line here
    assert got == _keep_first_oracle(docs, batches)
    assert (2, 0) not in got
    assert {(4, 0), (4, 2), (7, 0)} <= got


def test_keep_first_stream_restart(spark, tmp_path):
    from distributed_lsh_spark.streaming.dedup_stream import (
        incremental_line_dedup_keep_first_stream,
    )

    docs = _docs()
    batches = [[0, 1, 2, 3], [4, 5, 6, 7], [8, 9, 10, 11]]
    input_dir = str(tmp_path / "incoming")
    state_dir = str(tmp_path / "state")
    os.makedirs(input_dir)
    _drop(spark, docs, batches[0], os.path.join(input_dir, "drop0"))
    q = incremental_line_dedup_keep_first_stream(
        spark, input_dir + "/*", state_dir, available_now=True,
        max_files_per_trigger=1)
    q.awaitTermination(240)

    for n in (1, 2):
        _drop(spark, docs, batches[n], os.path.join(input_dir, f"drop{n}"))
    q2 = incremental_line_dedup_keep_first_stream(
        spark, input_dir + "/*", state_dir, available_now=True,
        max_files_per_trigger=1)
    q2.awaitTermination(240)

    rows = spark.read.parquet(os.path.join(state_dir, "removed")).collect()
    got = [(r["doc_id"], r["pos"]) for r in rows]
    assert set(got) == _keep_first_oracle(docs, batches)
    assert len(got) == len(set(got))
