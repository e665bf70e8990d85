"""Exact chunk-LSH SimHash search: fingerprint parity (JVM md5_h64 chain ==
pure Python), pigeonhole exactness (chunk join == brute force), and the
md5_h64 primitive itself across Spark and DuckDB."""

from __future__ import annotations

import duckdb

from distributed_lsh_spark.functions.md5hash import duck_h64, py_md5_h64
from distributed_lsh_spark.operators.simhash_exact import (
    oracle_simhash_pairs, py_simhash_md5, simhash_dup_pairs, simhash_md5,
)


def test_md5_h64_cross_engine(spark):
    strs = ["", "a", "hello world", "xyz", "tok0001 tok0002", "ünïcode ok"]
    expect = {s: py_md5_h64(s) for s in strs}
    df = spark.createDataFrame([(s,) for s in strs], "s string")
    from distributed_lsh_spark.functions.md5hash import spark_h64
    from pyspark.sql import functions as F
    got_spark = {r["s"]: r["h"]
                 for r in df.select("s", F.expr(spark_h64("s")).alias("h")).collect()}
    assert got_spark == expect
    con = duckdb.connect()
    for s in strs:
        (got,) = con.sql(
            f"with t(s) as (select ?::VARCHAR) select {duck_h64('s')} from t",
            params=[s]).fetchone()
        assert got == expect[s], s


def test_simhash_md5_matches_python(spark, tiny_corpus):
    docs = dict(list(tiny_corpus.texts_by_id().items())[:60])
    docs.update({900: "", 901: "one", 902: "two words here", 903: "a b c d e f"})
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {r["doc_id"]: r["simhash"] for r in simhash_md5(df, k=5).collect()}
    assert got == {d: py_simhash_md5(t, 5) for d, t in docs.items()}


def test_chunk_join_equals_bruteforce(spark, tiny_corpus):
    """Pigeonhole: hamming <= 3 with >= h+1 chunks => some (c-h)-subset of
    chunks matches exactly, so the multi-index join must return EXACTLY the
    brute-force pair set — for both the degenerate c = h+1 (single-chunk
    keys) and the default c = 6 (composite keys)."""
    docs = tiny_corpus.texts_by_id()
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    expect = oracle_simhash_pairs(docs, k=5, hamming_threshold=3)
    for c in (4, 6):
        got = {(r["id_a"], r["id_b"]): r["hamming"]
               for r in simhash_dup_pairs(df, k=5, hamming_threshold=3,
                                          n_chunks=c).collect()}
        assert got == expect, f"n_chunks={c}"
    assert expect, "fixture must contain simhash-near pairs"


def test_composite_keys_bound_candidate_blowup(spark):
    """Scale guard: 5k fingerprints that all AGREE on one 16-bit region but
    differ by >> h elsewhere.  Single-chunk keys (c = h+1) put all 5k in one
    bucket -> ~12.5M candidate pairs; the default composite keys (c=6, m=3)
    must generate candidates near the true-pair count instead."""
    import numpy as np

    from distributed_lsh_spark.operators.simhash_exact import (
        simhash_chunk_candidates,
    )

    rng = np.random.default_rng(7)
    n = 5000
    # bits 0..15 fixed; bits 16..63 random -> expected pairwise hamming ~24
    fps = (rng.integers(0, 1 << 48, size=n, dtype=np.uint64) << np.uint64(16)) \
        | np.uint64(0xABCD)
    fps = fps.astype(np.int64)
    df = spark.createDataFrame(
        [(i, int(v)) for i, v in enumerate(fps)], "doc_id long, simhash long")
    n_cands = simhash_chunk_candidates(df, hamming_threshold=3,
                                       n_chunks=6).count()
    # true near-pairs are ~0; allow a loose slack for random 33-bit
    # composite-key collisions, but nothing remotely quadratic (12.5M)
    assert n_cands < 5000, n_cands
