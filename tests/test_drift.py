"""Corpus drift (q_corpus_drift): pure-Python JSD replay, planting
semantics, and the constant-total column."""

import math
import re
from collections import Counter

SF_DIR = "/root/testdata/sf0.001"


def _py_drift(docs):
    ca, cb = Counter(), Counter()
    for doc_id, text in docs.items():
        if doc_id % 2 == 1 and doc_id % 13 == 0:
            text = text + " drifttok drifttok drifttok"
        toks = [t for t in re.sub("[^a-z0-9]+", " ", text.lower()).split()
                if t]
        (ca if doc_id % 2 == 0 else cb).update(toks)
    vocab = set(ca) | set(cb)
    na, nb, v = sum(ca.values()), sum(cb.values()), len(vocab)
    out = {}
    for w in vocab:
        pa = (ca.get(w, 0) + 1) / (na + v)
        pb = (cb.get(w, 0) + 1) / (nb + v)
        m = (pa + pb) / 2
        out[w] = (ca.get(w, 0), cb.get(w, 0),
                  round((pa * math.log(pa / m) + pb * math.log(pb / m))
                        * 0.5e12))
    return out


def test_corpus_drift_matches_python_replay(spark):
    from distributed_lsh_spark.entry_queries import QUERIES

    docs = {r["doc_id"]: r["text"]
            for r in spark.read.parquet(
                f"{SF_DIR}/documents.parquet").collect()}
    want = _py_drift(docs)
    rows = QUERIES["corpus_drift"](spark, SF_DIR).collect()
    assert len(rows) == 20
    for r in rows:
        wa, wb, wc = want[r["token"]]
        assert (r["c_a"], r["c_b"]) == (wa, wb)
        # ln quantization slack: the engine and Python libm may differ
        # by at most one pico-unit at a rounding boundary
        assert abs(r["contrib_micro"] - wc) <= 1
    # the planted drift token exists only in snapshot B and tops the list
    top = rows[0]
    assert top["token"] == "drifttok"
    assert top["c_a"] == 0 and top["c_b"] > 0
    # ordering is by contribution, tiebroken by token
    contribs = [r["contrib_micro"] for r in rows]
    assert contribs == sorted(contribs, reverse=True)
    # the total column is constant and >= the displayed contributions
    totals = {r["jsd_total_micro"] for r in rows}
    assert len(totals) == 1
    assert totals.pop() >= sum(c for c in contribs if c > 0) - len(want)
