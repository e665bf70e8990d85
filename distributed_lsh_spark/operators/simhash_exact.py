"""Exact all-pairs SimHash Hamming search via multi-index pigeonhole LSH.

Pigeonhole exactness: split the 64-bit fingerprint into c bit chunks; any
pair within Hamming distance h differs in at most h chunks, so at least
m = c - h chunks AGREE — in particular some specific m-subset of chunk
indices agrees, and that subset is one of the C(c, m) combinations.  Each
doc therefore emits C(c, m) composite keys (combo_id, concatenated chunk
values); the equi-join on them has recall 1.0 (not approximate), and the
exact bit_count verification removes false candidates.  This is the
block-permutation table scheme of Manku, Jain & Das Sarma, "Detecting
Near-Duplicates for Web Crawling" (WWW 2007) — and the reference's AND/OR
table structure (SURVEY.md P1/J2: L tables OR'ed,
MapReduce-LSH/.../common/LSH.java:117-131) instantiated with bit-slice
combinations as the tables, with a provable recall guarantee instead of a
probabilistic one.

The fingerprint is a SimHash over the doc's DISTINCT word k-grams, where
the gram hash is the same rolling 64-bit polynomial over 44-bit per-token
md5_h64 values the substring stage uses (operators/substring.py step 2):
md5 runs once per DISTINCT token (O(token bytes)), windows are k
multiply-adds — not md5 over each concatenated k-gram string (O(tokens*k)
string bytes, the anti-pattern the substring rewrite killed).  Token-level
md5 keeps the whole chain replayable in DuckDB; the internal pipeline's
crc32-based SimHash (functions/signature.py) is pinned by the NumPy
oracle instead.

Scale: with the degenerate c = h + 1 (m = 1) the keys are single 16-bit
chunks — 65,536 buckets, which at 10^9 docs means ~15k docs/bucket and a
quadratic bucket self-join.  The default c = 6, m = 3 gives 32-33-bit
composite keys (~2^32 buckets per combo index): random fingerprints
essentially never collide without agreeing on 3 real chunks, so join
fan-out stays near the true-pair count.  Cost is C(6,3) = 20 index rows
per doc (vs 4) — linear, the right trade at web scale.  The hot-bucket
`cap` still applies per (combo_id, key) for adversarial corpora (identical
boilerplate collapses via the exact pre-pass first, as with MinHash bands).
"""

from __future__ import annotations

from itertools import combinations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from distributed_lsh_spark.operators.substring import (
    TH_SHIFT, _MASK64, _md5_vocab, window_pows,
)


def simhash_md5(df: DataFrame, k: int = 5, text_col: str = "text") -> DataFrame:
    """-> (doc_id, simhash): 64-bit SimHash over the doc's DISTINCT word
    k-gram rolling-poly hashes (module docstring).  One fused Arrow pass:
    Arrow tokenize, md5 per DISTINCT token, k multiply-adds for every
    window of the whole batch, per-doc distinct + vectorized bit majority.
    Map-only — the previous form exploded one row per gram through an
    md5-per-gram-string groupBy."""
    pows = np.array(window_pows(k), dtype=np.uint64)

    @F.pandas_udf(T.LongType())
    def _sh(texts: pd.Series) -> pd.Series:
        from distributed_lsh_spark.functions.signature import _token_hashes

        tok_h, lens = _token_hashes(texts, token_hash=_md5_vocab)
        th = tok_h >> np.uint64(TH_SHIFT)
        n_tok = len(th)
        if n_tok >= k:
            H = np.zeros(n_tok - k + 1, dtype=np.uint64)
            for j in range(k):
                H += th[j:n_tok - k + 1 + j] * pows[j]
        else:
            H = np.empty(0, dtype=np.uint64)
        offsets = np.zeros(len(lens) + 1, dtype=np.int64)
        np.cumsum(lens, out=offsets[1:])

        out = np.empty(len(lens), dtype=np.int64)
        for d in range(len(lens)):
            n = int(lens[d])
            if n >= k:
                wh = H[offsets[d]:offsets[d] + n - k + 1]
            else:
                pn = np.array(window_pows(n), dtype=np.uint64)
                wh = np.array(
                    [(th[offsets[d]:offsets[d] + n] * pn).sum()] if n else [0],
                    dtype=np.uint64)
            uniq = np.unique(wh)
            bits = np.unpackbits(uniq.view(np.uint8).reshape(-1, 8),
                                 axis=1, bitorder="little").sum(axis=0)
            fp_bits = 2 * bits > len(uniq)
            out[d] = np.packbits(fp_bits, bitorder="little") \
                       .view(np.dtype("<u8"))[0].astype(np.int64)
        return pd.Series(out)

    return df.select("doc_id", _sh(F.col(text_col)).alias("simhash"))


def _combo_keys(fp_col: str, hamming_threshold: int, n_chunks: int):
    """Composite-key exprs: for each of the C(c, m) m-subsets of chunk
    indices (m = c - h), the concatenation of that subset's chunk values.
    Returns a list of (combo_id, key_sql) with key width = sum of member
    chunk widths (<= 64 - h bits, so always a valid long)."""
    c, h = n_chunks, hamming_threshold
    if c <= h:
        raise ValueError(f"need n_chunks > hamming_threshold ({c} <= {h})")
    widths = [64 // c + (1 if i < 64 % c else 0) for i in range(c)]
    offs, o = [], 0
    for w in widths:
        offs.append(o)
        o += w
    out = []
    for cid, combo in enumerate(combinations(range(c), c - h)):
        key, shift = [], 0
        for i in reversed(combo):
            key.append(
                f"(shiftleft(shiftright({fp_col}, {offs[i]}) "
                f"& {(1 << widths[i]) - 1}, {shift}))")
            shift += widths[i]
        out.append((cid, " + ".join(key)))
    return out


def simhash_keys(fps: DataFrame, hamming_threshold: int = 3,
                 n_chunks: int = 6) -> DataFrame:
    """(doc_id, simhash) -> (doc_id, simhash, combo_id, key): the C(c, m)
    composite index rows per doc — the persistable index frame (the
    streaming path appends it per batch, like the MinHash band_index)."""
    combo = F.explode(F.array(*[
        F.struct(F.lit(cid).alias("combo_id"), F.expr(key).alias("key"))
        for cid, key in _combo_keys("simhash", hamming_threshold, n_chunks)
    ])).alias("c")
    return (fps.select("doc_id", "simhash", combo)
            .select("doc_id", "simhash",
                    F.col("c.combo_id").alias("combo_id"),
                    F.col("c.key").alias("key")))


def simhash_chunk_candidates(fps: DataFrame, hamming_threshold: int = 3,
                             n_chunks: int = 6,
                             cap: int | None = None) -> DataFrame:
    """(doc_id, simhash) -> candidate (id_a, id_b, _fa, _fb): every pair
    agreeing on at least one composite key — a superset of all pairs
    within hamming_threshold (pigeonhole), deduped, NOT yet verified.
    Factored out so tests can bound the candidate count directly."""
    keys = simhash_keys(fps, hamming_threshold, n_chunks)
    if cap is not None:
        w = Window.partitionBy("combo_id", "key") \
                  .orderBy(F.xxhash64("combo_id", "doc_id"), "doc_id")
        keys = (keys.withColumn("_rn", F.row_number().over(w))
                    .where(F.col("_rn") <= cap).drop("_rn"))
    a = keys.select(F.col("doc_id").alias("id_a"),
                    F.col("simhash").alias("_fa"), "combo_id", "key")
    b = keys.select(F.col("doc_id").alias("id_b"),
                    F.col("simhash").alias("_fb"), "combo_id", "key")
    return (a.join(b, ["combo_id", "key"])
             .where(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b", "_fa", "_fb")
             .dropDuplicates(["id_a", "id_b"]))


def simhash_dup_pairs(df: DataFrame, k: int = 5,
                      hamming_threshold: int = 3,
                      text_col: str = "text",
                      n_chunks: int = 6,
                      cap: int | None = None) -> DataFrame:
    """-> (id_a, id_b, hamming): ALL pairs with Hamming(simhash) <=
    hamming_threshold, found exactly via the multi-index pigeonhole join
    (see module docstring).  `cap` bounds hot key buckets at scale (recall
    then degrades only inside capped buckets, mirroring hot_band_cap)."""
    fps = simhash_md5(df, k, text_col)
    cands = simhash_chunk_candidates(fps, hamming_threshold, n_chunks, cap)
    ham = F.expr("bit_count(_fa ^ _fb)")
    return (cands.where(ham <= hamming_threshold)
                 .select("id_a", "id_b", ham.cast("long").alias("hamming")))


# ---------------------------------------------------------------- oracle

def py_simhash_md5(text: str, k: int = 5) -> int:
    """Pure-Python mirror of simhash_md5 for parity tests."""
    import re

    from distributed_lsh_spark.functions.md5hash import py_md5_h64

    toks = [t for t in re.sub(r"[^a-z0-9]+", " ", text.lower()).split(" ") if t]
    th = [(py_md5_h64(t) & _MASK64) >> TH_SHIFT for t in toks]
    n = len(th)
    if n < k:
        pn = window_pows(n)
        grams = {sum(th[j] * pn[j] for j in range(n)) & _MASK64}
    else:
        pows = window_pows(k)
        grams = {sum(th[i + j] * pows[j] for j in range(k)) & _MASK64
                 for i in range(n - k + 1)}
    hs = sorted(grams)
    m = len(hs)
    u = 0
    for j in range(64):
        cnt = sum((h >> j) & 1 for h in hs)
        if 2 * cnt > m:
            u |= 1 << j
    return u - (1 << 64) if u >= (1 << 63) else u


def oracle_simhash_pairs(docs: dict[int, str], k: int = 5,
                         hamming_threshold: int = 3) -> dict[tuple[int, int], int]:
    """Brute-force all-pairs (the chunk join must equal this EXACTLY)."""
    fps = {d: py_simhash_md5(t, k) for d, t in docs.items()}
    ids = sorted(docs)
    out = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = bin((fps[a] ^ fps[b]) & ((1 << 64) - 1)).count("1")
            if h <= hamming_threshold:
                out[(a, b)] = h
    return out
