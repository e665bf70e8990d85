"""Suffix-array construction and exact longest-shared-span: SA vs
brute-force suffix sort, cross-span vs the O(n*m) DP, engine vs oracle."""

from __future__ import annotations

import random

import numpy as np

from distributed_lsh_spark.functions.suffix import (
    kasai_lcp, max_cross_span, oracle_max_span_dp, suffix_array,
)


def test_suffix_array_matches_bruteforce():
    rng = random.Random(7)
    for n, alpha in [(1, 1), (2, 1), (30, 2), (100, 5), (200, 50), (500, 3)]:
        s = np.array([rng.randrange(alpha) for _ in range(n)], dtype=np.int64)
        sa = suffix_array(s)
        brute = sorted(range(n), key=lambda i: s[i:].tolist())
        assert sa.tolist() == brute, (n, alpha)


def test_kasai_lcp_matches_bruteforce():
    rng = random.Random(8)
    s = np.array([rng.randrange(3) for _ in range(200)], dtype=np.int64)
    sa = suffix_array(s)
    lcp = kasai_lcp(s, sa)
    for r in range(len(s) - 1):
        a, b = s[sa[r]:].tolist(), s[sa[r + 1]:].tolist()
        k = 0
        while k < min(len(a), len(b)) and a[k] == b[k]:
            k += 1
        assert lcp[r] == k, r


def test_max_cross_span_matches_dp():
    rng = random.Random(9)
    vocab = [f"t{i}" for i in range(30)]
    for trial in range(40):
        a = [rng.choice(vocab) for _ in range(rng.randint(0, 60))]
        b = [rng.choice(vocab) for _ in range(rng.randint(0, 60))]
        if trial % 3 == 0 and a and b:           # plant a shared span
            span = [rng.choice(vocab) for _ in range(rng.randint(5, 25))]
            pa, pb = rng.randrange(len(a) + 1), rng.randrange(len(b) + 1)
            a = a[:pa] + span + a[pa:]
            b = b[:pb] + span + b[pb:]
        assert max_cross_span(a, b) == oracle_max_span_dp(a, b), trial
    assert max_cross_span([], ["x"]) == 0
    assert max_cross_span(["x"], ["x"]) == 1


def test_span_pairs_engine_matches_oracle(spark, tiny_corpus):
    from distributed_lsh_spark.operators.substring import (
        oracle_substring_span_pairs, substring_span_pairs,
    )

    docs = tiny_corpus.texts_by_id()
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {(r["id_a"], r["id_b"]): r["max_span"]
           for r in substring_span_pairs(df, window=50, guarantee=10).collect()}
    expect = oracle_substring_span_pairs(docs, window=50, guarantee=10)
    assert got == expect
    assert expect, "fixture long-repeat docs must produce span pairs"
    # the fixture plants a 200-token shared span
    assert max(expect.values()) >= 200
