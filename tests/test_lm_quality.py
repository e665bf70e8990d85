"""operators/lm_quality.py: bigram LM scoring vs an independent
plain-Python replay of the same LM (no Spark code in the oracle)."""

from __future__ import annotations

import math
import re
from collections import Counter

from distributed_lsh_spark.operators.lm_quality import bigram_lm_scores

DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the cat sat"),
    (3, "a dog barked at the cat"),
    (4, "singleton"),          # 1 token -> no bigrams
    (5, ""),                   # empty -> no bigrams
    (6, "THE cat!!! sat---on the MAT"),  # normalizes to doc 1's tokens
]


def _toks(text: str) -> list[str]:
    return [t for t in re.sub(r"[^a-z0-9]+", " ", text.lower()).split() if t]


def _py_scores() -> dict[int, tuple[int, int, float | None]]:
    uni: Counter = Counter()
    bgc: Counter = Counter()
    per_doc: dict[int, list[tuple[str, str]]] = {}
    for doc_id, text in DOCS:
        t = _toks(text)
        uni.update(t)
        bgs = list(zip(t, t[1:]))
        bgc.update(bgs)
        per_doc[doc_id] = bgs
    vocab = len(uni)
    out = {}
    for doc_id, bgs in per_doc.items():
        nlls = [round(-math.log((bgc[(w1, w2)] + 1) / (uni[w1] + vocab)) * 1e6)
                for w1, w2 in bgs]
        s = sum(nlls)
        out[doc_id] = (len(bgs), s,
                       round(s / (len(bgs) * 1e6), 6) if bgs else None)
    return out


def test_bigram_lm_matches_python_replay(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_bigrams"], r["sum_nll_micro"], r["avg_nll"])
           for r in bigram_lm_scores(df).collect()}
    assert got == _py_scores()


def test_bigram_lm_edge_docs(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["doc_id"]: r for r in bigram_lm_scores(df).collect()}
    assert len(got) == len(DOCS)  # keeps every doc, incl. no-bigram ones
    for did in (4, 5):
        assert got[did]["n_bigrams"] == 0
        assert got[did]["sum_nll_micro"] == 0
        assert got[did]["avg_nll"] is None
    # normalization: doc 6 tokenizes identically to doc 1 -> same score
    assert got[6]["sum_nll_micro"] == got[1]["sum_nll_micro"]
    # repeated high-prob bigrams score lower than unseen-heavy docs
    assert got[1]["avg_nll"] < got[3]["avg_nll"]
