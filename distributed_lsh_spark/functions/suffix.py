"""Suffix arrays over token sequences (NumPy, prefix-doubling) and the
exact cross-document longest-common-substring they enable.

The north_star names "a suffix-array-based exact-substring dedup stage for
long repeated spans".  Architecture here (see operators/substring.py for
the full stage): winnowed fingerprints generate candidate pairs GLOBALLY
(one equi-join; SWA guarantee bounds recall), then this module computes the
EXACT maximal shared token span per candidate pair with a suffix array +
Kasai LCP over the pair's concatenated token sequence — the per-pair
refinement step, vectorized NumPy inside a pandas UDF.  This mirrors the
published suffix-array dedup recipe (Lee et al., "Deduplicating Training
Data Makes Language Models Better", ACL'22) re-shaped for Spark: their
single-node global suffix array becomes candidate generation (winnowing
join) + per-pair suffix arrays, which shards trivially.

Standard algorithms (public): prefix-doubling suffix array construction
(Manber-Myers), Kasai et al. LCP; max cross-document LCP = max LCP between
SA-adjacent suffixes owned by different documents.
"""

from __future__ import annotations

import numpy as np


def suffix_array(tokens: np.ndarray) -> np.ndarray:
    """SA of an int64 token sequence via prefix doubling (O(n log^2 n),
    fully vectorized: one lexsort per doubling round)."""
    n = len(tokens)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    rank = np.unique(tokens, return_inverse=True)[1].astype(np.int64)
    k = 1
    order = np.argsort(rank, kind="stable")
    while True:
        key2 = np.full(n, -1, dtype=np.int64)
        key2[: n - k] = rank[k:]
        order = np.lexsort((key2, rank))
        diff = np.ones(n, dtype=np.int64)
        diff[0] = 0
        diff[1:] = ((rank[order][1:] != rank[order][:-1])
                    | (key2[order][1:] != key2[order][:-1])).astype(np.int64)
        new_rank = np.empty(n, dtype=np.int64)
        new_rank[order] = np.cumsum(diff)
        rank = new_rank
        if rank[order[-1]] == n - 1:
            break
        k *= 2
    return order


def kasai_lcp(tokens: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """lcp[i] = LCP(suffix sa[i], suffix sa[i+1]); length n-1.  O(n)."""
    n = len(tokens)
    if n <= 1:
        return np.empty(0, dtype=np.int64)
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    lcp = np.zeros(n - 1, dtype=np.int64)
    h = 0
    for i in range(n):
        r = rank[i]
        if r == n - 1:
            h = 0
            continue
        j = sa[r + 1]
        while i + h < n and j + h < n and tokens[i + h] == tokens[j + h]:
            h += 1
        lcp[r] = h
        if h:
            h -= 1
    return lcp


def max_cross_span(toks_a: list[str], toks_b: list[str]) -> int:
    """Exact length (in tokens) of the longest token span shared verbatim
    by the two sequences: suffix array + Kasai over a|SEP|b; answer = max
    LCP between SA-adjacent suffixes from DIFFERENT sides (standard result;
    the unique separator blocks spans from crossing the boundary)."""
    if not toks_a or not toks_b:
        return 0
    # joint factorization; separator gets a value outside the vocabulary
    vocab: dict[str, int] = {}
    enc = [vocab.setdefault(t, len(vocab)) for t in toks_a]
    enc.append(-1)
    enc += [vocab.setdefault(t, len(vocab)) for t in toks_b]
    s = np.asarray(enc, dtype=np.int64)
    sa = suffix_array(s)
    lcp = kasai_lcp(s, sa)
    owner_a = sa < len(toks_a)          # suffixes starting inside a
    cross = owner_a[:-1] != owner_a[1:]
    # suffixes starting AT the separator belong to neither side; their LCP
    # with anything is 0 (unique token), so they never inflate the max
    return int(lcp[cross].max(initial=0))


def oracle_max_span_dp(toks_a: list[str], toks_b: list[str]) -> int:
    """O(n*m) dynamic-programming mirror for parity tests."""
    best = 0
    m = len(toks_b)
    prev = [0] * (m + 1)
    for a in toks_a:
        cur = [0] * (m + 1)
        for j, b in enumerate(toks_b, start=1):
            if a == b:
                cur[j] = prev[j - 1] + 1
                if cur[j] > best:
                    best = cur[j]
        prev = cur
    return best
