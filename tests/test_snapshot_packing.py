"""Round-4 additions: quality-aware cluster representatives
(operators/funnel.select_representatives + the funnel rep_rank policy),
incremental snapshot dedup (operators/snapshot.py), and token-budget
sequence packing (operators/packing.py) — each pinned against a
plain-Python replay on planted inputs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_lsh_spark.conf import DEFAULT_CONFIG as CFG
from distributed_lsh_spark.operators.funnel import (curation_funnel,
                                                    select_representatives)
from distributed_lsh_spark.operators.packing import pack_sequences, pack_summary
from distributed_lsh_spark.operators.snapshot import dedup_against_corpus
from distributed_lsh_spark.oracle.dedup import DedupOracle, jaccard


# ------------------------------------------------------------------ reps

def test_select_representatives_argmax_and_ties(spark):
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)],
        "doc_id long, cluster_id long")
    # cluster 1: doc 2 wins on rank; cluster 10: rank tie -> lowest doc_id
    ranked = spark.createDataFrame(
        [(1, 5), (2, 9), (3, 9 - 2), (10, 4), (11, 4)],
        "doc_id long, q long")
    out = {r["cluster_id"]: r for r in
           select_representatives(clusters, ranked, ["q"]).collect()}
    assert out[1]["rep_doc"] == 2 and out[1]["rep_q"] == 9
    assert out[1]["cluster_size"] == 3
    assert out[10]["rep_doc"] == 10 and out[10]["cluster_size"] == 2


def test_select_representatives_lexicographic_rank(spark):
    clusters = spark.createDataFrame([(1, 1), (2, 1)],
                                     "doc_id long, cluster_id long")
    # first rank col ties, second decides — doc 2 wins despite lower doc_id
    ranked = spark.createDataFrame([(1, 7, 1), (2, 7, 3)],
                                   "doc_id long, a long, b long")
    out = select_representatives(clusters, ranked, ["a", "b"]).collect()[0]
    assert out["rep_doc"] == 2 and out["rep_a"] == 7 and out["rep_b"] == 3


def test_funnel_rep_rank_keeps_best_member(spark):
    # two byte-distinct near-dup texts; rank prefers the HIGHER doc_id,
    # so the rep_rank funnel must keep 1 where the default keeps 0
    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the quiet green forest tonight")
    pages = spark.createDataFrame(
        [(0, base), (1, base + " extra"), (7, "zz yy xx ww vv uu tt ss")],
        "doc_id long, text string")
    oc = DedupOracle(CFG, {0: base, 1: base + " extra"})
    assert oc.clusters().get(1) == 0, "fixture must actually near-dup"

    default = curation_funnel(pages, CFG)
    kept = sorted(r["doc_id"] for r in
                  default.survivors.select("doc_id").collect())
    assert kept == [0, 7]

    ranked = curation_funnel(pages, CFG,
                             rep_rank={"pref": F.col("doc_id").cast("long")})
    kept = sorted(r["doc_id"] for r in
                  ranked.survivors.select("doc_id").collect())
    assert kept == [1, 7]


# ------------------------------------------------------------- snapshot

@pytest.fixture(scope="module")
def snapshot_docs():
    toks = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    corpus = {0: toks, 2: toks, 4: "one two three four five six seven "
                                   "eight nine ten eleven twelve"}
    new = {101: toks + " extra", 103: "totally different words with no "
                                      "overlap whatsoever here today"}
    return corpus, new


def test_dedup_against_corpus_matches_python(spark, snapshot_docs):
    corpus, new = snapshot_docs
    cdf = spark.createDataFrame(sorted(corpus.items()),
                                "doc_id long, text string")
    ndf = spark.createDataFrame(sorted(new.items()),
                                "doc_id long, text string")
    got = {r["doc_id"]: (r["dup_of"], r["jaccard"]) for r in
           dedup_against_corpus(cdf, ndf, CFG).collect()}

    oc = DedupOracle(CFG, {**corpus, **new})
    # python replay: best corpus match per new doc at threshold
    want = {}
    for n in new:
        best = None
        for c in corpus:
            j = jaccard(oc.shingles[n], oc.shingles[c])
            if j >= CFG.jaccard_threshold:
                cand = (j, -c)
                if best is None or cand > best:
                    best = cand
        if best is not None:
            want[n] = (-best[1], best[0])
    assert set(got) == set(want) == {101}
    dup_of, j = got[101]
    # docs 0 and 2 are byte-identical -> tie broken to the LOWEST corpus id
    assert dup_of == 0
    assert j == pytest.approx(want[101][1])


def test_dedup_against_corpus_precomputed_sigs_parity(spark, snapshot_docs):
    from distributed_lsh_spark.functions.signature import with_signatures

    corpus, new = snapshot_docs
    cdf = spark.createDataFrame(sorted(corpus.items()),
                                "doc_id long, text string")
    ndf = spark.createDataFrame(sorted(new.items()),
                                "doc_id long, text string")
    fresh = dedup_against_corpus(cdf, ndf, CFG).collect()
    reused = dedup_against_corpus(
        cdf, ndf, CFG, corpus_sigs=with_signatures(cdf, CFG)).collect()
    assert sorted(map(tuple, fresh)) == sorted(map(tuple, reused))


# -------------------------------------------------------------- packing

def _python_pack(counts: dict[int, int], budget: int, n_shards: int):
    """Replay: per-shard doc_id order, start offset, concat-chunk bin."""
    per_doc = {}
    for shard in range(n_shards):
        off = 0
        for d in sorted(x for x in counts if x % n_shards == shard):
            per_doc[d] = (shard, off // budget, off, counts[d])
            off += counts[d]
    return per_doc


def test_pack_sequences_matches_python(spark):
    counts = {i: (i * 37) % 900 for i in range(50)}
    counts[13] = 0          # zero-token doc occupies a row, adds nothing
    counts[14] = 5000       # bigger than the budget: spills by definition
    df = spark.createDataFrame(sorted(counts.items()),
                               "doc_id long, n_tokens long")
    packed = pack_sequences(df, "n_tokens", budget=1024, n_shards=4)
    got = {r["doc_id"]: (r["shard"], r["bin_id"], r["start_offset"],
                         r["n_tokens"]) for r in packed.collect()}
    assert got == _python_pack(counts, 1024, 4)

    summary = {(r["shard"], r["bin_id"]): r for r in
               pack_summary(packed, 1024).collect()}
    want = _python_pack(counts, 1024, 4)
    for (shard, bin_id), row in summary.items():
        docs = [d for d, v in want.items() if v[0] == shard and v[1] == bin_id]
        assert row["n_docs"] == len(docs)
        assert row["bin_tokens"] == sum(want[d][3] for d in docs)
        assert row["first_doc"] == min(docs)
        assert row["last_doc"] == max(docs)
        ends = max(want[d][2] + want[d][3] for d in docs)
        assert row["spills"] == (ends > (bin_id + 1) * 1024)
    # every (shard, bin) pair accounted for
    assert len(summary) == len({(v[0], v[1]) for v in want.values()})
