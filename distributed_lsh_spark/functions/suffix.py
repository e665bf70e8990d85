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


def cross_coverage(toks_b: list[str], partners: list[list[str]],
                   min_len: int) -> np.ndarray:
    """Boolean mask over toks_b: True where the position lies inside a
    token span of length >= min_len shared verbatim with ANY partner
    sequence (the Lee et al. ACL'22 removal criterion, per-pair form).

    Per partner: matching statistics ms_j (longest prefix of b[j:]
    occurring anywhere in a) via the joint SA + Kasai LCP — for each
    b-suffix, the nearest a-suffix in SA order in either direction,
    taking min-LCP along the way (two linear scans).  Coverage is the
    union of [j, j + ms_j) over ms_j >= min_len, which equals "inside a
    maximal diagonal match-run of length >= min_len" (each such run's
    start has ms >= run length; conversely ms_j >= L exhibits a run of
    length >= L through j) — the identity the SQL oracle exploits.
    """
    nb = len(toks_b)
    mask = np.zeros(nb, dtype=bool)
    if nb == 0:
        return mask
    big = nb + 1
    for toks_a in partners:
        if not toks_a or len(toks_a) < min_len:
            continue
        vocab: dict[str, int] = {}
        enc = [vocab.setdefault(t, len(vocab)) for t in toks_a]
        enc.append(-1)
        enc += [vocab.setdefault(t, len(vocab)) for t in toks_b]
        s = np.asarray(enc, dtype=np.int64)
        sa = suffix_array(s)
        lcp = kasai_lcp(s, sa)
        na = len(toks_a)
        n = len(s)
        ms = np.zeros(n, dtype=np.int64)        # indexed by suffix start
        # forward: nearest a-suffix ABOVE in SA order
        cur = -1
        for r in range(n):
            start = sa[r]
            if r > 0:
                cur = min(cur, int(lcp[r - 1])) if cur >= 0 else -1
            if start < na:
                cur = big
            elif start > na and cur > 0:
                ms[start] = max(ms[start], cur)
        # backward: nearest a-suffix BELOW in SA order
        cur = -1
        for r in range(n - 1, -1, -1):
            start = sa[r]
            if r < n - 1:
                cur = min(cur, int(lcp[r])) if cur >= 0 else -1
            if start < na:
                cur = big
            elif start > na and cur > 0:
                ms[start] = max(ms[start], cur)
        for j in range(nb):
            m = min(int(ms[na + 1 + j]), nb - j)
            if m >= min_len:
                mask[j:j + m] = True
    return mask


def oracle_coverage_dp(toks_b: list[str], partners: list[list[str]],
                       min_len: int) -> list[bool]:
    """O(n*m) mirror for parity tests: diagonal match-run membership."""
    nb = len(toks_b)
    mask = [False] * nb
    for toks_a in partners:
        na = len(toks_a)
        for i in range(na):
            for j in range(nb):
                if toks_a[i] != toks_b[j] or (i > 0 and j > 0 and
                                              toks_a[i - 1] == toks_b[j - 1]):
                    continue  # only run starts
                ln = 0
                while (i + ln < na and j + ln < nb
                       and toks_a[i + ln] == toks_b[j + ln]):
                    ln += 1
                if ln >= min_len:
                    for p in range(j, j + ln):
                        mask[p] = True
    return mask
