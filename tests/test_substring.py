"""Winnowed-fingerprint substring dedup: the engine's per-position
selection formula == the SWA definition (oracle), the published guarantee
holds under adversarial contexts, Spark == oracle on the fixture corpus,
and long-repeat docs pair up."""

from __future__ import annotations

import random

from distributed_lsh_spark.operators.substring import (
    oracle_substring_pairs, oracle_window_fingerprints,
    oracle_winnow_positions, substring_dup_pairs, window_fingerprints,
)


def test_winnow_definition_monotone_hashes():
    """Monotonically increasing hashes: every window's min is its first
    element, so every window-start position is selected (the pre-fix
    selection rule chose NOTHING here — the recall hole ADVICE.md flagged)."""
    wh = list(range(10, 30))
    assert oracle_winnow_positions(wh, guarantee=5) == list(range(1, 17))


def test_winnow_definition_short_runs():
    # fewer hashes than the guarantee: one run, rightmost minimum
    assert oracle_winnow_positions([7, 3, 3, 9], guarantee=10) == [3]
    assert oracle_winnow_positions([5], guarantee=4) == [1]
    assert oracle_winnow_positions([], guarantee=4) == []


def test_winnowing_guarantee_micro():
    span = " ".join(f"w{i}" for i in range(80))
    a = "x1 x2 x3 " + span + " y1 y2"
    b = "z9 z8 " + span + " q5"
    fps_a = {fp for _, fp in oracle_window_fingerprints(a, window=50, guarantee=10)}
    fps_b = {fp for _, fp in oracle_window_fingerprints(b, window=50, guarantee=10)}
    assert fps_a & fps_b, "shared 80-token span must share a fingerprint"


def test_winnowing_guarantee_randomized_contexts():
    """SWA guarantee: ANY shared verbatim span of >= W + g - 1 tokens yields
    >= 1 shared fingerprint, regardless of the surrounding context (the
    pre-fix rule let a small hash in the preceding context suppress every
    in-span selection)."""
    W, g = 20, 5
    rng = random.Random(1234)
    vocab = [f"tok{i:04d}" for i in range(500)]
    span = " ".join(rng.choice(vocab) for _ in range(W + g - 1))
    for trial in range(25):
        ctx_a = " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 60)))
        ctx_b = " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 60)))
        tail_a = " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 60)))
        tail_b = " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 60)))
        a = " ".join(x for x in (ctx_a, span, tail_a) if x)
        b = " ".join(x for x in (ctx_b, span, tail_b) if x)
        fps_a = {fp for _, fp in oracle_window_fingerprints(a, W, g)}
        fps_b = {fp for _, fp in oracle_window_fingerprints(b, W, g)}
        assert fps_a & fps_b, f"trial {trial}: guarantee violated"


def test_spark_matches_oracle(spark, tiny_corpus):
    """Engine (L/R per-position formula in SQL) == oracle (windows-by-
    definition) on the fixture corpus — validates the formula derivation."""
    docs = tiny_corpus.texts_by_id()
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")

    got_fps = {(r["doc_id"], r["pos"], r["fp"])
               for r in window_fingerprints(df, window=50, guarantee=10).collect()}
    expect_fps = {(d, pos, fp) for d, t in docs.items()
                  for pos, fp in oracle_window_fingerprints(t, 50, 10)}
    assert got_fps == expect_fps

    got_pairs = {(r["id_a"], r["id_b"]): r["n_shared_fps"]
                 for r in substring_dup_pairs(df, window=50, guarantee=10,
                                              min_shared=2).collect()}
    assert got_pairs == oracle_substring_pairs(docs, 50, 10, 2)


def test_spark_matches_oracle_short_docs(spark):
    """Docs whose window count is below the guarantee (g_eff = n_windows
    path) and ties: engine formula must still match the definition."""
    docs = {
        1: " ".join(f"t{i}" for i in range(22)),          # 3 window hashes, g=5
        2: " ".join(f"t{i}" for i in range(20)),          # exactly 1 window
        3: " ".join(["dup"] * 30),                         # all-identical hashes
        4: "too short",                                    # no windows
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {(r["doc_id"], r["pos"], r["fp"])
           for r in window_fingerprints(df, window=20, guarantee=5).collect()}
    expect = {(d, pos, fp) for d, t in docs.items()
              for pos, fp in oracle_window_fingerprints(t, 20, 5)}
    assert got == expect


def test_longrep_docs_detected(spark, tiny_corpus):
    ids = {i for i, r in enumerate(tiny_corpus.rows) if r["kind"] == "longrep"}
    assert len(ids) >= 2
    docs = tiny_corpus.texts_by_id()
    pairs = oracle_substring_pairs(docs, window=50, guarantee=10, min_shared=2)
    hit = {p for p in pairs if p[0] in ids and p[1] in ids}
    assert hit, "long-repeat docs must share winnowed fingerprints"
