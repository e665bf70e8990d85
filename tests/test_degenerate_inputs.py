"""Degenerate corpus inputs through the FULL pipeline, engine-vs-oracle:
empty text, punctuation-only docs (equal shingle sets — they legitimately
cluster), unicode, 1-token docs, duplicate rows, and the empty DataFrame.
"""

from __future__ import annotations

import pytest

from distributed_lsh_spark.conf import DEFAULT_CONFIG as CFG
from distributed_lsh_spark.oracle.dedup import DedupOracle
from distributed_lsh_spark.pipeline import build_stages, run_dedup

DOCS = {
    1: "",                                         # empty text
    2: "...",                                      # punctuation-only -> no tokens
    3: "!!! ??? ;;;",                              # punctuation-only too
    4: "tokenless",                                # single token
    5: "tokenless",                                # exact duplicate row content
    6: "héllo wörld ünïcode ça va très bien oui",  # unicode folds to ascii-ish tokens
    7: "hello world unicode a va tres bien oui",   # near its normalized twin
    8: "the quick brown fox jumps over the lazy dog again and again today",
    9: "the quick brown fox jumps over the lazy dog again and again tonight",
}


def _df(spark, docs):
    return spark.createDataFrame(sorted(docs.items()),
                                 "doc_id long, text string")


def test_degenerate_corpus_engine_matches_oracle(spark):
    df = _df(spark, DOCS)
    oracle = DedupOracle(CFG, DOCS)

    got_pairs = {(r["id_a"], r["id_b"])
                 for r in build_stages(df, CFG).verified.collect()}
    assert got_pairs == set(oracle.verified_pairs())

    got_clusters = {r["doc_id"]: r["cluster_id"]
                    for r in run_dedup(df, CFG).collect()}
    assert got_clusters == oracle.clusters()

    # sanity on the semantics, not just parity: the two identical docs
    # cluster together, and the near-identical long sentences do too
    assert got_clusters[4] == got_clusters[5]
    assert got_clusters[8] == got_clusters[9]


def test_empty_dataframe_through_pipeline(spark):
    df = spark.createDataFrame([], "doc_id long, text string")
    assert build_stages(df, CFG).verified.count() == 0
    assert run_dedup(df, CFG).count() == 0


@pytest.mark.parametrize("text", ["", "...", "x"])
def test_single_doc_corpus(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    assert build_stages(df, CFG).verified.count() == 0
    # clusters contract: singletons (docs in no dup pair) are excluded
    assert run_dedup(df, CFG).count() == 0


def test_line_chunker_degenerate_and_exact(spark):
    """doc_lines (the shared batch/stream line chunker): empty and
    punctuation-only docs yield no lines; the greedy regexp chunking
    equals manual 8-token array chunking, including the short tail."""
    import re

    from distributed_lsh_spark.functions.text import LINE_TOKENS, doc_lines

    docs = {
        1: "",
        2: "... !!! ;;;",
        3: "solo",
        4: " ".join(f"w{i}" for i in range(17)),   # 8 + 8 + 1 tail
        5: "Héllo, Wörld!  Ça va; très bien---oui " * 5,
    }
    df = spark.createDataFrame(sorted(docs.items()),
                               "doc_id long, text string")
    got = {}
    for r in doc_lines(df).collect():
        got.setdefault(r["doc_id"], []).append((r["pos"], r["line"]))
    for d in got:
        got[d] = [line for _, line in sorted(got[d])]

    for d, text in docs.items():
        toks = [t for t in re.sub(r"[^a-z0-9]+", " ", text.lower()).split(" ")
                if t]
        expect = [" ".join(toks[i:i + LINE_TOKENS])
                  for i in range(0, len(toks), LINE_TOKENS)]
        assert got.get(d, []) == expect, d
    assert 1 not in got and 2 not in got
    assert len(got[4]) == 3 and got[4][2] == "w16"


def test_funnel_degenerate_corpus(spark):
    """The funnel over the degenerate corpus (empty / punctuation-only /
    duplicate texts): exact tier collapses the identical pair, the
    near-dup tier matches the oracle's cluster collapse over the exact
    survivors, and metrics stay coherent."""
    from distributed_lsh_spark.operators.funnel import curation_funnel

    res = curation_funnel(_df(spark, DOCS), CFG)
    exact_ids = sorted(r["doc_id"] for r in res.tiers["exact"].collect())
    assert exact_ids == [1, 2, 3, 4, 6, 7, 8, 9]   # doc 5 == doc 4 bytes
    survivors = {r["doc_id"] for r in res.survivors.collect()}
    oc = DedupOracle(CFG, {i: DOCS[i] for i in exact_ids})
    non_reps = {d for d, c in oc.clusters().items() if d != c}
    assert survivors == set(exact_ids) - non_reps
    m = {r["tier"]: r for r in res.metrics.collect()}
    assert m["exact"]["docs_removed"] == 1
    assert m["near_dup"]["docs_out"] == len(survivors)


def test_token_rarity_counts_on_degenerate_corpus(spark, tmp_path):
    """token_rarity over a corpus holding token-less docs: those docs
    yield NO rows (no occurrences), hapax/rare accounting exact."""
    import collections
    import re

    src = str(tmp_path / "documents.parquet")
    _df(spark, DOCS).write.parquet(src)
    from distributed_lsh_spark.entry_queries import q_token_rarity

    rows = {r["doc_id"]: r for r in
            q_token_rarity(spark, str(tmp_path)).collect()}
    assert set(rows) == {4, 5, 6, 7, 8, 9}          # 1-3 have no tokens
    tf = collections.Counter()
    for t in DOCS.values():
        tf.update(x for x in re.split(r"[^a-z0-9]+", t.lower()) if x)
    assert sum(r["n_hapax"] for r in rows.values()) \
        == sum(1 for c in tf.values() if c == 1)
    assert rows[4]["n_tokens"] == 1
    assert rows[4]["max_tf"] == 2                   # "tokenless" ×2 (docs 4+5)
