"""One-pass Arrow-vectorized signature stage: text -> (shingles, minhash,
simhash) in a single pandas UDF.

WHY: Spark's higher-order array functions (transform/aggregate/filter) are
NOT whole-stage-codegen'd — they evaluate interpreted, per element, with
closure allocation (measured ~43s per 100k docs for shingling alone at 32
cores).  This stage replaces the whole chain with NumPy batch math
(~10-30x): pandas C string ops for tokenization, `pd.factorize` +
`zlib.crc32` so each distinct token is hashed once per batch, a rolling
64-bit polynomial over token hashes for shingle ids, segment tricks
(lexsort + reduceat) for per-doc distinct/minhash/simhash.  No per-row
Python beyond output-list assembly.

Hash definitions (shared EXACTLY with oracle.dedup — pure-Python mirror):
    tok_h   = crc32(utf8(token))                      (zlib, public, stable)
    shingle = poly over k consecutive tok_h:
                H_0 = 0;  H_{j+1} = H_j * FNV + tok_h[i+j]   (mod 2^64)
              docs with 0 < n < k tokens: one shingle over all n tokens;
              empty docs: shingle set {0}
    minhash_i = min over distinct shingles s of (a_i * (s mod P) + b_i) mod P
              (P = 2^31-1, same (a_i, b_i) stream as functions.hashing)
    simhash = per-bit majority over the 64 bits of the distinct shingle set

The reference analogue is the projection stage P1 (dense dot products per
table, MapReduce-LSH/.../common/LSH.java:220-236) — there too the hot loop
is a vectorizable matmul; Arrow batches play the role of its TwoDArray
partition buffers.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from distributed_lsh_spark.conf import PRIME_31, DedupConfig
from distributed_lsh_spark.functions.hashing import minhash_params

FNV = np.uint64(1099511628211)
_NONALNUM = r"[^a-z0-9]+"

SIG_SCHEMA = T.StructType([
    T.StructField("shingles", T.ArrayType(T.LongType()), False),
    T.StructField("minhash", T.ArrayType(T.LongType()), False),
    T.StructField("simhash", T.LongType(), False),
])


def _token_hashes(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """All docs' token hashes flattened -> (tok_h uint64, doc_lens int64)."""
    toks = (texts.fillna("").str.lower()
            .str.replace(_NONALNUM, " ", regex=True)
            .str.split())
    lens = toks.str.len().fillna(0).astype(np.int64).to_numpy()
    flat = [t for lst in toks for t in (lst or ())]
    if flat:
        codes, uniques = pd.factorize(pd.Series(flat, dtype=object))
        uh = np.fromiter((zlib.crc32(u.encode("utf-8")) for u in uniques),
                         dtype=np.uint64, count=len(uniques))
        tok_h = uh[codes]
    else:
        tok_h = np.empty(0, dtype=np.uint64)
    return tok_h, lens


def _shingle_hashes(tok_h: np.ndarray, lens: np.ndarray, k: int,
                    ) -> tuple[np.ndarray, np.ndarray]:
    """Rolling-poly k-gram hashes per doc -> (flat values uint64, counts).

    counts[d] = number of (non-distinct) shingles for doc d
    (= max(lens[d] - k + 1, 1); empty docs produce the single value 0).
    """
    n_tok = len(tok_h)
    # global poly over every window of k, computed with k shifted adds
    if n_tok >= k:
        H = np.zeros(n_tok - k + 1, dtype=np.uint64)
        for j in range(k):
            H = H * FNV + tok_h[j:n_tok - k + 1 + j]
    else:
        H = np.empty(0, dtype=np.uint64)

    offsets = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    counts = np.maximum(lens - k + 1, 1)
    out = np.empty(int(counts.sum()), dtype=np.uint64)
    pos = 0
    for d in range(len(lens)):
        n = int(lens[d])
        c = int(counts[d])
        if n >= k:
            out[pos:pos + c] = H[offsets[d]:offsets[d] + c]
        elif n > 0:   # short doc: one whole-doc shingle (Python ints: the
            h = 0     # wraparound is explicit, no numpy overflow warnings)
            for t in tok_h[offsets[d]:offsets[d] + n]:
                h = (h * 1099511628211 + int(t)) & ((1 << 64) - 1)
            out[pos] = np.uint64(h)
        else:         # empty doc
            out[pos] = np.uint64(0)
        pos += c
    return out, counts


def _distinct_per_segment(values: np.ndarray, counts: np.ndarray,
                          ) -> tuple[np.ndarray, np.ndarray]:
    """Per-segment sorted distinct -> (flat distinct values, seg offsets)."""
    segs = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    # sort by the SIGNED view: Spark's array_sort on LongType is signed,
    # and the oracle sorts signed — the contract is signed ascending
    order = np.lexsort((values.view(np.int64), segs))
    sv, ss = values[order], segs[order]
    keep = np.ones(len(sv), dtype=bool)
    keep[1:] = (sv[1:] != sv[:-1]) | (ss[1:] != ss[:-1])
    dv, ds = sv[keep], ss[keep]
    dcounts = np.bincount(ds, minlength=len(counts)).astype(np.int64)
    offsets = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(dcounts, out=offsets[1:])
    return dv, offsets


def signature_pandas_udf(cfg: DedupConfig):
    a, b = minhash_params(cfg.num_perm, cfg.seed)
    a_np = np.asarray(a, dtype=np.uint64)
    b_np = np.asarray(b, dtype=np.uint64)
    p = np.uint64(PRIME_31)
    k = cfg.shingle_k
    num_perm = cfg.num_perm

    @F.pandas_udf(SIG_SCHEMA)
    def _sig(text: pd.Series) -> pd.DataFrame:
        n_docs = len(text)
        if n_docs == 0:
            return pd.DataFrame({"shingles": [], "minhash": [], "simhash": []})
        tok_h, lens = _token_hashes(text)
        values, counts = _shingle_hashes(tok_h, lens, k)
        dv, offsets = _distinct_per_segment(values, counts)
        dv_signed = dv.view(np.int64)

        # minhash: permute the 31-bit residues, segment-min via reduceat.
        # Chunked over doc ranges so the (num_perm x shingles) work matrix
        # stays ~128 MB regardless of batch size (an unchunked outer() was
        # ~2 GB/worker at 10k-row batches -> 32 workers OOM'd the host).
        h31 = (dv_signed % np.int64(PRIME_31)).astype(np.uint64)  # floored mod == Spark pmod
        minhash = np.empty((n_docs, num_perm), dtype=np.int64)
        # Cache-blocked: the (num_perm x chunk) work matrix is kept ~4 MB so
        # the fold passes run from cache instead of streaming DRAM (the
        # full-width outer product made this stage memory-bandwidth bound;
        # micro-bench: 46s -> 2.2s per 2M shingles per core at 4k chunks).
        # Chunks are doc-aligned.
        budget = max(1 << 12, 2 * int((np.diff(offsets)).max(initial=1)))
        c31 = np.uint64(31)
        d0 = 0
        while d0 < n_docs:
            d1 = d0
            while d1 < n_docs and offsets[d1 + 1] - offsets[d0] <= budget:
                d1 += 1
            d1 = max(d1, d0 + 1)
            lo, hi = offsets[d0], offsets[d1]
            x = np.outer(a_np, h31[lo:hi])                   # (perm, chunk)
            x += b_np[:, None]                               # < 2^62
            # Mersenne fold: x mod (2^31-1) without integer division (the
            # uint64 % has no SIMD path and dominated this stage).  Two
            # folds bring x <= P+1, one conditional subtract finishes.
            y = x >> c31
            x &= p
            x += y                                           # < 2^32
            np.right_shift(x, c31, out=y)
            x &= p
            x += y                                           # <= P+1
            np.subtract(x, p, out=x, where=x >= p)
            mins = np.minimum.reduceat(x, (offsets[d0:d1] - lo), axis=1)
            minhash[d0:d1] = mins.T.astype(np.int64)
            d0 = d1
        # reduceat quirk: empty segments copy the start element — none here
        # (every doc has >= 1 shingle by construction)

        # simhash: per-bit majority over each doc's distinct shingles
        bits = np.unpackbits(dv.view(np.uint8).reshape(-1, 8), axis=1,
                             bitorder="little").astype(np.int64)   # (total, 64)
        seg_counts = np.diff(offsets)
        sums = np.add.reduceat(bits, offsets[:-1], axis=0)         # (docs, 64)
        votes = 2 * sums - seg_counts[:, None]
        fp_bits = (votes > 0).astype(np.uint8)
        simhash = np.packbits(fp_bits, axis=1, bitorder="little") \
            .view(np.uint64).ravel().astype(np.int64)

        shingles_col = [dv_signed[offsets[d]:offsets[d + 1]]
                        for d in range(n_docs)]
        return pd.DataFrame({
            "shingles": shingles_col,
            "minhash": list(minhash),
            "simhash": simhash,
        })

    return _sig


def with_signatures(df: DataFrame, cfg: DedupConfig,
                    text_col: str = "text") -> DataFrame:
    """docs(doc_id, text) -> + shingles array<long>, minhash array<long>,
    simhash long — one Arrow round trip for the whole signature stage."""
    sig = signature_pandas_udf(cfg)(F.col(text_col)).alias("_sig")
    return (df.withColumn("_sig", sig)
              .withColumn("shingles", F.col("_sig.shingles"))
              .withColumn("minhash", F.col("_sig.minhash"))
              .withColumn("simhash", F.col("_sig.simhash"))
              .drop("_sig"))
