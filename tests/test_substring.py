"""Winnowed-fingerprint substring dedup: Spark == oracle; long-repeat docs
from the fixture corpus pair up while whole-doc-unique docs don't."""

from __future__ import annotations

from distributed_lsh_spark.operators.substring import (
    oracle_substring_pairs, oracle_window_fingerprints,
    substring_dup_pairs, window_fingerprints,
)


def test_winnowing_guarantee_micro():
    span = " ".join(f"w{i}" for i in range(80))
    a = "x1 x2 x3 " + span + " y1 y2"
    b = "z9 z8 " + span + " q5"
    fps_a = {fp for _, fp in oracle_window_fingerprints(a, window=50, guarantee=10)}
    fps_b = {fp for _, fp in oracle_window_fingerprints(b, window=50, guarantee=10)}
    assert fps_a & fps_b, "shared 80-token span must share a fingerprint"


def test_spark_matches_oracle(spark, tiny_corpus):
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


def test_longrep_docs_detected(spark, tiny_corpus):
    ids = {i for i, r in enumerate(tiny_corpus.rows) if r["kind"] == "longrep"}
    assert len(ids) >= 2
    docs = tiny_corpus.texts_by_id()
    pairs = oracle_substring_pairs(docs, window=50, guarantee=10, min_shared=2)
    hit = {p for p in pairs if p[0] in ids and p[1] in ids}
    assert hit, "long-repeat docs must share winnowed fingerprints"
