"""DSIR importance-resampling weights (operators/dsir.py): the full
hashed-n-gram scoring chain replayed in plain Python (no Spark SQL, no
DuckDB), semantic direction pins, and Gumbel-key determinism."""

from __future__ import annotations

import hashlib
import math
import re

DIM = 64  # tiny table so bucket collisions are exercised


def _toks(text: str) -> list[str]:
    return [t for t in re.sub(r"[^a-z0-9]+", " ", text.lower()).split()
            if t]


def _grams(text: str) -> list[str]:
    t = _toks(text)
    return t + [f"{a} {b}" for a, b in zip(t, t[1:])]


def _fid(g: str, dim: int) -> int:
    return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % dim


def _python_dsir(raw: dict[int, str], target_ids: set[int],
                 dim: int) -> dict[int, tuple[int, int]]:
    """doc_id -> (n_grams, logw_micro), the operator's exact contract."""
    cr: dict[int, int] = {}
    ct: dict[int, int] = {}
    per_doc: dict[int, dict[int, int]] = {}
    for doc_id, text in raw.items():
        feats: dict[int, int] = {}
        for g in _grams(text):
            feats[_fid(g, dim)] = feats.get(_fid(g, dim), 0) + 1
        per_doc[doc_id] = feats
        for fid, m in feats.items():
            cr[fid] = cr.get(fid, 0) + m
            if doc_id in target_ids:
                ct[fid] = ct.get(fid, 0) + m
    nr, nt = sum(cr.values()), sum(ct.values())
    lr = {fid: round((math.log((ct.get(fid, 0) + 1) / float(nt + dim))
                      - math.log((cr.get(fid, 0) + 1) / float(nr + dim)))
                     * 1e6)
          for fid in range(dim)}
    out = {}
    for doc_id, feats in per_doc.items():
        out[doc_id] = (sum(feats.values()),
                       sum(m * lr[fid] for fid, m in feats.items()))
    return out


def _python_gumbel_micro(doc_id: int) -> int:
    h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
    u = ((h % 2147483648) + 0.5) / 2147483648.0
    return round(-math.log(-math.log(u)) * 1e6)


RAW = {
    0: "alpha beta gamma delta alpha beta",
    1: "alpha beta gamma delta epsilon zeta",
    2: "stock market crash panic sell now buy gold",
    3: "alpha beta gamma delta eta theta",
    4: "win free money click here now spam spam spam",
    5: "x",  # single token: unigram feature only, no bigrams
}
TARGETS = {0, 3}


def _spark_rows(spark):
    from distributed_lsh_spark.operators.dsir import dsir_weights

    raw = spark.createDataFrame(list(RAW.items()), "doc_id long, text string")
    target = raw.where(raw.doc_id.isin(list(TARGETS)))
    return {r.doc_id: r for r in dsir_weights(raw, target, dim=DIM).collect()}


def test_dsir_matches_plain_python(spark):
    want = _python_dsir(RAW, TARGETS, DIM)
    got = _spark_rows(spark)
    assert set(got) == set(RAW)
    for doc_id, (n_grams, logw) in want.items():
        assert got[doc_id].n_grams == n_grams, doc_id
        assert got[doc_id].logw_micro == logw, doc_id
        assert got[doc_id].key_micro == logw + _python_gumbel_micro(doc_id)


def test_dsir_scores_target_like_docs_higher(spark):
    got = _spark_rows(spark)
    # doc 1 shares most grams with the target family; docs 2/4 share none
    assert got[1].logw_micro > got[2].logw_micro
    assert got[1].logw_micro > got[4].logw_micro
    # the target docs themselves score positive, off-target junk negative
    for t in TARGETS:
        assert got[t].logw_micro > 0
    assert got[4].logw_micro < 0


def test_dsir_single_token_doc_scores_via_unigram(spark):
    got = _spark_rows(spark)
    assert got[5].n_grams == 1  # one unigram, zero bigrams
    # weight 1 only if its bucket ratio is flat; key still drawn
    assert got[5].key_micro == got[5].logw_micro + _python_gumbel_micro(5)


def test_dsir_keys_deterministic_across_runs(spark):
    a = _spark_rows(spark)
    b = _spark_rows(spark)
    assert {d: r.key_micro for d, r in a.items()} == \
        {d: r.key_micro for d, r in b.items()}
