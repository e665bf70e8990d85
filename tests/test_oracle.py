"""Pure-Python oracle unit tests (no Spark) — hash parity pins, MinHash
determinism, union-find, Jaccard micro-examples."""

from __future__ import annotations

from distributed_lsh_spark.conf import DEFAULT_CONFIG, PRIME_31
from distributed_lsh_spark.functions.hashing import minhash_params
from distributed_lsh_spark.oracle.dedup import (
    DedupOracle, UnionFind, jaccard, hamming, minhash_sig, normalize_tokens,
    shingle_set, simhash_fp,
)
from distributed_lsh_spark.oracle.xxh64 import (
    spark_xxhash64_long, spark_xxhash64_string,
)


# Values pinned from a live Spark 4.1.2 session (xxhash64 default seed 42).
SPARK_PINS_STR = {
    "": -7444071767201028348,
    "abc": 1423657621850124518,
    "hello world this is a longer string exceeding thirty-two bytes for sure":
        7996056445561978995,
    "exactly8": -3436099630531429714,
    "twelve bytes": 5082792474226008580,
}
SPARK_PINS_LONG = {123456789: 3415128141240069951, -42: -6086559926526557199}


def test_xxh64_string_parity_pins():
    for s, expect in SPARK_PINS_STR.items():
        assert spark_xxhash64_string(s) == expect


def test_xxh64_long_parity_pins():
    for v, expect in SPARK_PINS_LONG.items():
        assert spark_xxhash64_long(v) == expect


def test_minhash_params_deterministic_and_in_range():
    a1, b1 = minhash_params(128, 42)
    a2, b2 = minhash_params(128, 42)
    assert a1 == a2 and b1 == b2
    assert all(1 <= x < PRIME_31 for x in a1)
    assert all(0 <= x < PRIME_31 for x in b1)
    a3, _ = minhash_params(128, 43)
    assert a3 != a1


def test_normalize_and_shingles():
    assert normalize_tokens("Hello, WORLD!!  42") == ["hello", "world", "42"]
    assert normalize_tokens("") == []
    assert normalize_tokens("...") == []
    # short doc -> one whole-doc shingle
    s = shingle_set("one two three", 5)
    assert len(s) == 1
    # k-grams: n tokens -> n-k+1 shingles (all distinct here)
    s = shingle_set("a b c d e f g", 5)
    assert len(s) == 3


def test_minhash_identical_docs_identical_sigs():
    cfg = DEFAULT_CONFIG
    sh = shingle_set("the quick brown fox jumps over the lazy dog wow", cfg.shingle_k)
    assert minhash_sig(sh, cfg) == minhash_sig(list(sh), cfg)
    assert minhash_sig([], cfg) == [PRIME_31] * cfg.num_perm


def test_minhash_estimates_jaccard():
    cfg = DEFAULT_CONFIG
    base = [f"tok{i}" for i in range(300)]
    t1 = " ".join(base)
    t2 = " ".join(base[:285] + [f"sub{i}" for i in range(15)])  # ~5% edits
    s1, s2 = shingle_set(t1, cfg.shingle_k), shingle_set(t2, cfg.shingle_k)
    true_j = jaccard(s1, s2)
    m1, m2 = minhash_sig(s1, cfg), minhash_sig(s2, cfg)
    est = sum(a == b for a, b in zip(m1, m2)) / cfg.num_perm
    assert abs(est - true_j) < 0.15


def test_simhash_similar_docs_close():
    base = [f"tok{i}" for i in range(300)]
    s1 = shingle_set(" ".join(base), 5)
    s2 = shingle_set(" ".join(base[:297] + ["x", "y", "z"]), 5)
    s3 = shingle_set(" ".join(f"other{i}" for i in range(300)), 5)
    near = hamming(simhash_fp(s1), simhash_fp(s2))
    far = hamming(simhash_fp(s1), simhash_fp(s3))
    assert near < far
    assert simhash_fp(s1) == simhash_fp(list(s1))


def test_union_find_min_label():
    uf = UnionFind()
    for a, b in [(5, 3), (3, 9), (20, 21), (1, 9)]:
        uf.union(a, b)
    assert uf.find(5) == uf.find(9) == uf.find(1) == uf.find(3) == 1
    assert uf.find(21) == 20


def test_oracle_end_to_end_micro():
    cfg = DEFAULT_CONFIG
    docs = {
        1: "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        2: "alpha beta gamma delta epsilon zeta eta theta iota kappa",   # exact dup of 1
        3: "alpha beta gamma delta epsilon zeta eta theta iota lambda",  # near dup
        4: "totally different words entirely here nothing shared at all ok",
    }
    oc = DedupOracle(cfg, docs)
    ver = oc.verified_pairs()
    assert (1, 2) in ver and ver[(1, 2)] == 1.0
    assert all(4 not in p for p in ver)
    cl = oc.clusters()
    assert cl[1] == cl[2] == 1
    assert 4 not in cl
