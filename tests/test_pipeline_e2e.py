"""End-to-end golden tests on the planted-truth pages corpus
(SURVEY.md §5 item 3): dup-pair recall >= 0.99 vs brute force, planted
pairs recovered, cluster agreement with the oracle, hot-key cap behavior."""

from __future__ import annotations

import pytest

from distributed_lsh_spark.conf import DEFAULT_CONFIG as CFG
from distributed_lsh_spark.fixtures import pages_spark_df
from distributed_lsh_spark.oracle.dedup import DedupOracle
from distributed_lsh_spark.pipeline import build_stages, run_dedup


@pytest.fixture(scope="module")
def corpus_df(spark, tiny_corpus):
    return pages_spark_df(spark, tiny_corpus)


@pytest.fixture(scope="module")
def oracle(tiny_corpus):
    return DedupOracle(CFG, tiny_corpus.texts_by_id())


def test_recall_vs_bruteforce(spark, corpus_df, oracle):
    got = {(r["id_a"], r["id_b"])
           for r in build_stages(corpus_df, CFG).verified.collect()}
    truth = set(oracle.exact_pairs())
    assert truth, "fixture must plant dup pairs"
    recall = len(got & truth) / len(truth)
    assert recall >= 0.99
    # precision is 1.0 by construction (exact verification)
    assert got <= truth


def test_planted_pairs_recovered(spark, corpus_df, oracle, tiny_corpus):
    got = {(r["id_a"], r["id_b"])
           for r in build_stages(corpus_df, CFG).verified.collect()}
    sh = oracle.shingles
    from distributed_lsh_spark.oracle.dedup import jaccard
    planted_above = {
        (a, b) for a, b in tiny_corpus.truth_pairs
        if jaccard(sh[a], sh[b]) >= CFG.jaccard_threshold
    }
    missing = planted_above - got
    assert not missing, f"missed planted pairs: {sorted(missing)[:5]}"


def test_borderline_docs_do_not_pair(spark, corpus_df, oracle, tiny_corpus):
    got = {(r["id_a"], r["id_b"])
           for r in build_stages(corpus_df, CFG).verified.collect()}
    border = {i for i, r in enumerate(tiny_corpus.rows) if r["kind"] == "border"}
    for a, b in got:
        if a in border or b in border:
            base_pairs = {(min(i, r["base_id"]), max(i, r["base_id"]))
                          for i, r in enumerate(tiny_corpus.rows)
                          if r["kind"] == "border" and r["base_id"] is not None}
            assert (a, b) not in base_pairs, "borderline doc paired with its base"


def test_clusters_match_oracle(spark, corpus_df, oracle):
    got = {r["doc_id"]: r["cluster_id"] for r in run_dedup(corpus_df, CFG).collect()}
    assert got == oracle.clusters()


def test_hot_key_cap_limits_pairs(spark, tiny_corpus):
    """With the cap ON and below the hot-bucket size, pair count from the
    hot bucket is bounded by num_bands * C(cap, 2) instead of C(n, 2)
    (A4/T4 analogue) — and, because the cap ordering is BAND-DEPENDENT,
    the union of the per-band capped cliques still covers and connects
    every member of the identical-doc family."""
    from distributed_lsh_spark.functions.hashing import band_keys, with_minhash
    from distributed_lsh_spark.functions.text import with_shingle_hashes
    from distributed_lsh_spark.operators.candidates import candidate_pairs
    from distributed_lsh_spark.oracle.dedup import UnionFind

    df = pages_spark_df(spark, tiny_corpus)
    docs = with_shingle_hashes(df.select("doc_id", "text"), k=CFG.shingle_k)
    bands = band_keys(with_minhash(docs, CFG), CFG)
    hot_n = sum(1 for r in tiny_corpus.rows if r["kind"] == "hot")
    assert hot_n >= 8
    cap = 5
    capped = candidate_pairs(bands, CFG, cap=cap)
    hot_ids = {i for i, r in enumerate(tiny_corpus.rows) if r["kind"] == "hot"}
    hot_pairs = [(r["id_a"], r["id_b"]) for r in capped.collect()
                 if r["id_a"] in hot_ids and r["id_b"] in hot_ids]
    assert len(hot_pairs) <= CFG.num_bands * cap * (cap - 1) // 2
    assert len(hot_pairs) < hot_n * (hot_n - 1) // 2 or hot_n <= cap
    # the per-band subsets differ, so the capped union connects the family
    uf = UnionFind()
    for a, b in hot_pairs:
        uf.union(a, b)
    touched = {d for p in hot_pairs for d in p}
    assert touched == hot_ids, "band-dependent cap must cover every member"
    assert len({uf.find(d) for d in hot_ids}) == 1, "family must stay connected"
    # uncapped finds all hot pairs
    full = candidate_pairs(bands, CFG, cap=None)
    hot_full = [r for r in full.collect()
                if r["id_a"] in hot_ids and r["id_b"] in hot_ids]
    assert len(hot_full) == hot_n * (hot_n - 1) // 2


def test_resume_idempotence_same_result(spark, corpus_df):
    """Permutation/recompute invariance: running the pipeline twice yields
    identical labels (SURVEY.md §5 item 4)."""
    a = sorted((r["doc_id"], r["cluster_id"]) for r in run_dedup(corpus_df, CFG).collect())
    b = sorted((r["doc_id"], r["cluster_id"]) for r in run_dedup(corpus_df, CFG).collect())
    assert a == b
