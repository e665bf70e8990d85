"""operators/classifier.py: hashed linear scoring vs an independent
plain-Python replay (hashlib md5 features, integer logit, math sigmoid)."""

from __future__ import annotations

import hashlib
import math
import re

from pyspark.sql import functions as F

from distributed_lsh_spark.operators.classifier import (
    feature_hash, hashed_linear_score,
)

DIM = 64
BIAS = 250_000

DOCS = [
    (1, "good informative article with varied language"),
    (2, "spam spam spam spam spam spam"),
    (3, ""),                 # no tokens -> score = sigmoid(bias/1e6)
    (4, "x"),                # single token
    (5, "Good, INFORMATIVE article; with varied language!"),  # == doc 1
]


def _toks(text: str) -> list[str]:
    return [t for t in re.sub(r"[^a-z0-9]+", " ", text.lower()).split() if t]


def _fid(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % DIM


def _w(fid: int) -> int:
    return (fid * 2654435761) % 2000001 - 1000000


def _py_score(text: str) -> tuple[int, int, float, bool]:
    toks = _toks(text)
    z = BIAS + sum(_w(_fid(t)) for t in toks)
    zm = z / (max(len(toks), 1) * 1e6)
    s = round(1.0 / (1.0 + math.exp(-zm)), 6)
    return len(toks), z, s, s >= 0.5


def _weights_df(spark):
    return spark.range(DIM).select(
        F.col("id").alias("feature_id"),
        (F.pmod(F.col("id") * F.lit(2654435761), F.lit(2000001))
         - F.lit(1000000)).alias("w_micro"))


def test_feature_hash_matches_python_md5(spark):
    toks = sorted({t for _, x in DOCS for t in _toks(x)})
    df = spark.createDataFrame([(t,) for t in toks], "w string")
    got = {r["w"]: r["f"] for r in
           df.select("w", feature_hash(F.col("w"), DIM).alias("f")).collect()}
    assert got == {t: _fid(t) for t in toks}


def test_hashed_linear_score_matches_python(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = hashed_linear_score(df, _weights_df(spark), DIM,
                              bias_micro=BIAS)
    got = {r["doc_id"]: (r["n_tokens"], r["z_micro"], r["score"], r["keep"])
           for r in out.collect()}
    assert len(got) == len(DOCS)  # empty doc kept with bias-only score
    for doc_id, text in DOCS:
        assert got[doc_id] == _py_score(text), (doc_id, text)
    # normalization: punctuation/case variants score identically
    assert got[5] == got[1]
    # empty doc: exactly sigmoid(bias)
    assert got[3][2] == round(1 / (1 + math.exp(-BIAS / 1e6)), 6)
