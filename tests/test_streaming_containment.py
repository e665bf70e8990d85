"""Streaming containment twin: accumulated stream pairs (scores included)
match the one-shot batch operator over the full corpus; exactly-once
emission; restart over persisted state."""

from __future__ import annotations

import os
import random
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from distributed_lsh_spark.conf import DEFAULT_CONFIG as CFG

TAU = CFG.jaccard_threshold


def _docs() -> dict[int, str]:
    """Unique docs; 1 is embedded verbatim inside 30 (cross-batch under
    i % 3 chunking: 1 % 3 == 1, 30 % 3 == 0) and 5 inside 7 (same batch
    at i % 3 == 1... 5 % 3 == 2, 7 % 3 == 1 — also cross-batch); 20/21
    are a symmetric near-dup pair within one batch (i % 3 == 2 for 20?
    20 % 3 == 2, 21 % 3 == 0 — cross-batch too).  The assertions below
    only require >= 1 cross-batch pair, so the chunking arithmetic is
    not load-bearing."""
    rng = random.Random(13)
    vocab = [f"s{i:04d}" for i in range(3000)]
    docs = {d: " ".join(rng.choice(vocab) for _ in range(60))
            for d in range(12)}
    pre = " ".join(rng.choice(vocab) for _ in range(60))
    post = " ".join(rng.choice(vocab) for _ in range(60))
    docs[30] = f"{pre} {docs[1]} {post}"
    docs[7] = f"{docs[5]} " + " ".join(rng.choice(vocab) for _ in range(100))
    base = [rng.choice(vocab) for _ in range(80)]
    near = list(base)
    near[40] = rng.choice(vocab)
    docs[20] = " ".join(base)
    docs[21] = " ".join(near)
    return docs


def _batch_expect(spark, docs):
    from distributed_lsh_spark.functions.signature import with_signatures
    from distributed_lsh_spark.operators.containment import containment_pairs

    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    return {(r["id_a"], r["id_b"]): (r["containment"], r["jaccard"],
                                     r["contained_id"])
            for r in containment_pairs(with_signatures(df, CFG),
                                       tau=TAU, df_cap=None).collect()}


def _drop(spark, docs, ids, path):
    spark.createDataFrame([(i, docs[i]) for i in ids],
                          "doc_id long, text string") \
         .coalesce(1).write.parquet(path)


def test_incremental_containment_matches_batch(spark, tmp_path):
    from distributed_lsh_spark.streaming.dedup_stream import (
        incremental_containment_stream,
    )

    docs = _docs()
    ids = sorted(docs)
    input_dir = str(tmp_path / "incoming")
    state_dir = str(tmp_path / "state")
    os.makedirs(input_dir)
    for n in range(3):
        _drop(spark, docs, [i for i in ids if i % 3 == n],
              os.path.join(input_dir, f"drop{n}"))

    q = incremental_containment_stream(spark, input_dir + "/*", state_dir,
                                       tau=TAU, available_now=True,
                                       max_files_per_trigger=1,
                                       compact_every=2)
    q.awaitTermination(240)

    rows = spark.read.parquet(os.path.join(state_dir, "pairs")).collect()
    got = {(r["id_a"], r["id_b"]): (r["containment"], r["jaccard"],
                                    r["contained_id"]) for r in rows}
    expect = _batch_expect(spark, docs)
    assert expect, "fixture must contain containment pairs"
    assert set(got) == set(expect)
    assert len(rows) == len(got), "pair emitted more than once"
    for pair, (cont, jac, contained) in expect.items():
        g = got[pair]
        assert abs(g[0] - cont) < 1e-12 and abs(g[1] - jac) < 1e-12
        assert g[2] == contained
    # an asymmetric planted pair crosses batches AND sits below the
    # Jaccard threshold (the class the MinHash twin cannot emit)
    assert any(a % 3 != b % 3 and got[(a, b)][1] < TAU for a, b in got), \
        "fixture should plant a cross-batch Jaccard-missed pair"


def test_incremental_containment_stream_restart(spark, tmp_path):
    from distributed_lsh_spark.streaming.dedup_stream import (
        incremental_containment_stream,
    )

    docs = _docs()
    ids = sorted(docs)
    input_dir = str(tmp_path / "incoming")
    state_dir = str(tmp_path / "state")
    os.makedirs(input_dir)
    _drop(spark, docs, [i for i in ids if i % 2 == 0],
          os.path.join(input_dir, "drop0"))

    q = incremental_containment_stream(spark, input_dir + "/*", state_dir,
                                       tau=TAU, available_now=True)
    q.awaitTermination(240)

    _drop(spark, docs, [i for i in ids if i % 2 == 1],
          os.path.join(input_dir, "drop1"))
    q2 = incremental_containment_stream(spark, input_dir + "/*", state_dir,
                                        tau=TAU, available_now=True)
    q2.awaitTermination(240)

    got = {(r["id_a"], r["id_b"]) for r in
           spark.read.parquet(os.path.join(state_dir, "pairs")).collect()}
    expect = set(_batch_expect(spark, docs))
    assert got == expect
    assert any(a % 2 != b % 2 for a, b in got), \
        "fixture should span the restart boundary"
