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


def test_containment_degenerate_corpus(spark):
    """Containment over the degenerate corpus: empty/punctuation-only
    docs (equal whole-doc shingle sets) are MUTUAL containment pairs,
    exact-duplicate rows pair at containment 1.0, and every score obeys
    containment >= jaccard with contained_id the smaller-set side."""
    from distributed_lsh_spark.functions.signature import with_signatures
    from distributed_lsh_spark.operators.containment import containment_pairs
    from distributed_lsh_spark.oracle.dedup import shingle_set

    rows = containment_pairs(with_signatures(_df(spark, DOCS), CFG),
                             tau=0.8).collect()
    sets = {d: set(shingle_set(t, CFG.shingle_k)) for d, t in DOCS.items()}
    for r in rows:
        sa, sb = sets[r["id_a"]], sets[r["id_b"]]
        inter = len(sa & sb)
        assert abs(r["containment"] - inter / min(len(sa), len(sb))) < 1e-12
        assert abs(r["jaccard"] - inter / len(sa | sb)) < 1e-12
        assert r["containment"] >= r["jaccard"] - 1e-12
        small = r["id_a"] if len(sa) <= len(sb) else r["id_b"]
        assert r["contained_id"] == small
    got = {(r["id_a"], r["id_b"]) for r in rows}
    assert (4, 5) in got            # byte-identical rows
    assert (1, 2) in got and (2, 3) in got  # token-less whole-doc shingles
    # empty frame flows through
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert containment_pairs(with_signatures(empty, CFG)).count() == 0


def test_strip_boilerplate_degenerate_corpus(spark):
    """Boilerplate stripping over the degenerate corpus (one host):
    7 of 9 docs carry >= 1 line, the shared 'tokenless' line (2/9 docs
    = 22% < 30%) survives, nothing is removed, and every doc comes back
    with its normalized stream intact."""
    import re

    from distributed_lsh_spark.operators.boilerplate import (
        strip_host_boilerplate,
    )
    from pyspark.sql import functions as F

    df = _df(spark, DOCS).withColumn("host", F.lit("h"))
    got = {r["doc_id"]: r for r in strip_host_boilerplate(df).collect()}
    assert len(got) == len(DOCS)
    assert all(r["n_removed"] == 0 for r in got.values())
    for d, t in DOCS.items():
        toks = [x for x in re.split(r"[^a-z0-9]+", t.lower()) if x]
        expect = " ".join(" ".join(toks[i:i + 8])
                          for i in range(0, len(toks), 8))
        assert got[d]["clean_text"] == expect
