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


def _token_hashes(texts: pd.Series, token_hash=None,
                  ) -> tuple[np.ndarray, np.ndarray]:
    """All docs' token hashes flattened -> (tok_h uint64, doc_lens int64).

    All string work stays in Arrow C++ (lower/regex/split/flatten/
    dictionary-encode); Python touches only the per-batch token VOCABULARY
    (one crc32 per distinct token).  A pandas/object-dtype version of this
    (per-token Python string objects + factorize over tens of millions of
    objects) was ~10x slower and allocation-bound.

    `token_hash`: optional list[str] -> uint64 ndarray vocabulary hasher
    (default crc32); operators/substring.py passes an md5_h64 hasher so
    its chain stays replayable in DuckDB.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = pa.Array.from_pandas(texts.astype(object))
    clean = pc.replace_substring_regex(pc.utf8_lower(arr), _NONALNUM, " ")
    toks = pc.utf8_split_whitespace(clean)
    lens0 = np.asarray(pc.list_value_length(toks).fill_null(0)).astype(np.int64)
    flat = pc.list_flatten(toks)
    if len(flat) == 0:
        return np.empty(0, dtype=np.uint64), lens0
    enc = pc.dictionary_encode(flat)
    # to_numpy(zero_copy_only=False) is the int32 fast path; np.asarray on
    # a pyarrow index array takes a slow element-wise route
    idx = enc.indices.to_numpy(zero_copy_only=False)
    uniques = enc.dictionary.to_pylist()
    if token_hash is None:
        uh = np.fromiter((zlib.crc32(u.encode("utf-8")) for u in uniques),
                         dtype=np.uint64, count=len(uniques))
    else:
        uh = token_hash(uniques)
    # split_whitespace emits empty tokens at string edges — drop them and
    # recompute per-doc lengths
    empty_ids = [i for i, u in enumerate(uniques) if u == ""]
    if empty_ids:
        doc_of = np.repeat(np.arange(len(texts), dtype=np.int64), lens0)
        keep = idx != empty_ids[0]
        idx = idx[keep]
        lens0 = np.bincount(doc_of[keep], minlength=len(texts)).astype(np.int64)
    return uh[idx], lens0


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
    out = np.zeros(int(counts.sum()), dtype=np.uint64)
    out_offsets = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(counts, out=out_offsets[1:])

    # long docs (n >= k): their windows are exactly the global windows that
    # do not cross a doc boundary — one vectorized masked assignment
    long_docs = lens >= k
    if len(H) and long_docs.any():
        doc_of_tok = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        valid = doc_of_tok[:len(H)] == doc_of_tok[k - 1:]
        out[np.repeat(long_docs, counts)] = H[valid]

    # short docs (0 < n < k): one whole-doc rolling hash each (rare; Python
    # ints make the 64-bit wraparound explicit, no numpy overflow warnings)
    for d in np.nonzero((lens > 0) & ~long_docs)[0]:
        h = 0
        for t in tok_h[offsets[d]:offsets[d] + int(lens[d])]:
            h = (h * 1099511628211 + int(t)) & ((1 << 64) - 1)
        out[out_offsets[d]] = np.uint64(h)
    # empty docs keep the zero the array was initialized with
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


def _mersenne_fold(x: np.ndarray, p: np.uint64) -> np.ndarray:
    """In-place x mod (2^31-1) for x < 2^62 without integer division (the
    uint64 % has no SIMD path).  Two folds bring x <= P+1, one conditional
    subtract finishes."""
    c31 = np.uint64(31)
    y = x >> c31
    x &= p
    x += y                                           # < 2^32
    y = x >> c31
    x &= p
    x += y                                           # <= P+1
    np.subtract(x, p, out=x, where=x >= p)
    return x


def _oph_minhash(dv_signed: np.ndarray, offsets: np.ndarray,
                 a0: np.uint64, b0: np.uint64, num_perm: int) -> np.ndarray:
    """One-permutation hashing with right-rotation densification
    (Li et al. NIPS'12; Shrivastava & Li ICML'14) — O(shingles) instead of
    kxl's O(num_perm x shingles); bit-identical to oracle.dedup.oph_sig.

    ONE universal hash g(s) = (a_0 * (s mod P) + b_0) mod P; num_perm
    residue bins g mod num_perm; bin value = min g in bin; an empty bin
    borrows from the nearest non-empty bin to its right (circular, distance
    d) at value + d*P so borrowed entries collide only with equally-borrowed
    entries."""
    p = np.uint64(PRIME_31)
    n_docs = len(offsets) - 1
    k = num_perm
    g = (dv_signed % np.int64(PRIME_31)).astype(np.uint64)
    g *= a0
    g += b0
    _mersenne_fold(g, p)
    seg = np.repeat(np.arange(n_docs, dtype=np.int64), np.diff(offsets))
    key = seg * k + (g % np.uint64(k)).astype(np.int64)
    # scatter-min into the dense (doc, bin) table: numpy's indexed-loop
    # fast path makes minimum.at ~16x cheaper than a lexsort+reduceat here
    EMPTY = np.int64(np.iinfo(np.int64).max)
    vals = np.full(n_docs * k, EMPTY, dtype=np.int64)
    np.minimum.at(vals, key, g.astype(np.int64))
    vals = vals.reshape(n_docs, k)
    filled = vals != EMPTY
    # densify: nearest filled bin at-or-right of j over the doubled row
    # (circular); nf via reversed cumulative min of (col if filled else BIG)
    col2 = np.arange(2 * k, dtype=np.int64)
    A = np.where(np.concatenate([filled, filled], axis=1), col2, np.int64(2 * k))
    nf = np.minimum.accumulate(A[:, ::-1], axis=1)[:, ::-1][:, :k]
    # every doc has >= 1 shingle, so every row has >= 1 filled bin
    vals2 = np.concatenate([vals, vals], axis=1)
    dist = nf - np.arange(k, dtype=np.int64)
    return np.take_along_axis(vals2, nf, axis=1) + dist * np.int64(PRIME_31)


def signature_pandas_udf(cfg: DedupConfig):
    if cfg.minhash_scheme not in ("kxl", "oph"):
        raise ValueError(f"unknown minhash_scheme {cfg.minhash_scheme!r} "
                         "(engine implements 'kxl' and 'oph')")
    a, b = minhash_params(cfg.num_perm, cfg.seed)
    a_np = np.asarray(a, dtype=np.uint64)
    b_np = np.asarray(b, dtype=np.uint64)
    p = np.uint64(PRIME_31)
    k = cfg.shingle_k
    num_perm = cfg.num_perm
    scheme = cfg.minhash_scheme

    @F.pandas_udf(SIG_SCHEMA)
    def _sig(text: pd.Series) -> pd.DataFrame:
        n_docs = len(text)
        if n_docs == 0:
            return pd.DataFrame({"shingles": [], "minhash": [], "simhash": []})
        tok_h, lens = _token_hashes(text)
        values, counts = _shingle_hashes(tok_h, lens, k)
        dv, offsets = _distinct_per_segment(values, counts)
        dv_signed = dv.view(np.int64)

        if scheme == "oph":
            minhash = _oph_minhash(dv_signed, offsets, a_np[0], b_np[0], num_perm)
            return _assemble(dv, dv_signed, offsets, minhash, n_docs)

        # kxl minhash: permute the 31-bit residues, segment-min via reduceat.
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
        return _assemble(dv, dv_signed, offsets, minhash, n_docs)

    return _sig


def _assemble(dv: np.ndarray, dv_signed: np.ndarray, offsets: np.ndarray,
              minhash: np.ndarray, n_docs: int) -> pd.DataFrame:
    """Shared tail of the signature UDF: SimHash + output assembly.

    simhash: per-bit majority over each doc's distinct shingles.  One bit at
    a time (64 cheap passes over a 1-D array) — an unpackbits (total, 64)
    int64 matrix was 2+ GB and 15x slower."""
    seg_counts = np.diff(offsets)
    sums = np.empty((n_docs, 64), dtype=np.int64)
    tmp = np.empty(len(dv), dtype=np.uint64)
    one = np.uint64(1)
    for j in range(64):
        np.right_shift(dv, np.uint64(j), out=tmp)
        np.bitwise_and(tmp, one, out=tmp)
        sums[:, j] = np.add.reduceat(tmp, offsets[:-1])
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
