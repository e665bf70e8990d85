"""Exact-substring (long repeated span) dedup via winnowed window
fingerprints — the SURVEY.md §7 step-7 stage.

Whole-doc MinHash misses a 500-token span copied verbatim into an otherwise
distinct page (global Jaccard stays low).  This stage detects such spans:

  1. tokenize (same normalizer as the shingle stage)
  2. hash every W-token window (W = `window`) with a ROLLING 64-bit
     polynomial over per-token md5_h64 values:
         th_t  = md5_h64(token_t) as unsigned, reduced to 44 bits (>> 20)
         wh_i  = sum_{j=0..W-1} th_{i+j} * B^(W-1-j)   (mod 2^64, B odd)
     read back as signed int64.  O(tokens) md5 bytes + O(tokens * W)
     64-bit multiply-adds in one fused Arrow/NumPy pass — the previous
     form (md5 over the concatenated W-token string per position, via
     interpreted HOFs) was O(tokens * W) STRING bytes through md5 and was
     this pipeline's hot spot.  The 44-bit reduction exists so the DuckDB
     oracle can replay the chain: HUGEINT is 128-bit, and th44 * pow
     (< 2^108) fits where a full 64x64 modular product would overflow.
     Token-level md5 keeps the whole chain replayable in Spark SQL,
     DuckDB, and Python (functions/md5hash.py).
  3. TRUE winnowing (Schleimer/Wilkerson/Aiken, SIGMOD'03): for every run
     of `guarantee` consecutive window hashes select the RIGHTMOST minimum;
     the selected set is the union over runs.  Per-position form (what the
     code evaluates): position i is selected iff L(i) + R(i) >= g - 1,
     where L(i) = length of the maximal run left of i with wh >= wh[i] and
     R(i) = length of the maximal run right of i with wh > wh[i] (both
     capped at g-1); docs with fewer than g window hashes use
     g_eff = n_windows (one run covering everything = its rightmost min).
     Guarantee: any span of >= W + guarantee - 1 tokens shared verbatim by
     two docs contributes at least one identical fingerprint to BOTH.
  4. explode (doc_id, fingerprint, pos); equi-join fingerprints across docs
     (same shape as the LSH band join, with the same hot-key cap)
  5. pairs ranked by number of shared distinct fingerprints (>= `min_shared`)

The oracle re-implements steps 1-5 in pure Python for exact parity tests,
and entry_queries mirrors them in DuckDB SQL for the driver's correctness
gate.  Steps 2-3 run in one Arrow-batched pandas UDF (the
functions/signature.py pattern: Arrow C++ string work, md5 only per
distinct token, NumPy window/winnow kernels); steps 4-5 are JVM joins.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from distributed_lsh_spark.functions.md5hash import py_md5_h64
from distributed_lsh_spark.functions.text import _NORMALIZE_SQL

WINDOW_BASE = 1000003          # odd -> full-period base for the mod-2^64 poly
TH_SHIFT = 20                  # md5_h64 reduced to 44 bits (DuckDB HUGEINT fit)
_MASK64 = (1 << 64) - 1


def window_pows(window: int) -> list[int]:
    """[B^(W-1), B^(W-2), ..., B^0] mod 2^64 — pows[j] multiplies th[i+j]."""
    p, out = 1, []
    for _ in range(window):
        out.append(p)
        p = (p * WINDOW_BASE) & _MASK64
    return list(reversed(out))


def _md5_vocab(uniques: list[str]) -> "np.ndarray":
    """Vocabulary hasher for signature._token_hashes: unsigned md5_h64."""
    return np.fromiter(((py_md5_h64(u) & _MASK64) for u in uniques),
                       dtype=np.uint64, count=len(uniques))


_WFP_SCHEMA = T.StructType([
    T.StructField("pos", T.ArrayType(T.LongType()), False),
    T.StructField("fp", T.ArrayType(T.LongType()), False),
])


def _window_fp_udf(window: int, guarantee: int):
    """pandas UDF: text -> array<struct<pos,fp>> of winnowed rolling-poly
    window fingerprints.  One Arrow tokenize pass, md5 per DISTINCT token,
    then NumPy: W shifted multiply-adds for all windows of the whole batch
    at once (cross-doc windows masked via the offsets), and a
    sliding-window rightmost-min winnow per doc."""
    W, g0 = window, guarantee
    pows = np.array(window_pows(W), dtype=np.uint64)

    @F.pandas_udf(_WFP_SCHEMA)
    def _wfp(texts: pd.Series) -> pd.DataFrame:
        from distributed_lsh_spark.functions.signature import _token_hashes

        tok_h, lens = _token_hashes(texts, token_hash=_md5_vocab)
        th = tok_h >> np.uint64(TH_SHIFT)
        n_tok = len(th)
        if n_tok >= W:
            H = np.zeros(n_tok - W + 1, dtype=np.uint64)
            for j in range(W):
                H += th[j:n_tok - W + 1 + j] * pows[j]
        else:
            H = np.empty(0, dtype=np.uint64)
        offsets = np.zeros(len(lens) + 1, dtype=np.int64)
        np.cumsum(lens, out=offsets[1:])

        out_pos: list[np.ndarray] = []
        out_fp: list[np.ndarray] = []
        empty = np.empty(0, dtype=np.int64)
        for d in range(len(lens)):
            n = int(lens[d])
            if n < W:
                out_pos.append(empty)
                out_fp.append(empty)
                continue
            # windows starting inside doc d never cross its end for
            # start offsets 0..n-W, so the global H slice is exact
            wh = H[offsets[d]:offsets[d] + n - W + 1].astype(np.int64)
            g = min(g0, len(wh))
            sw = np.lib.stride_tricks.sliding_window_view(wh, g)
            # rightmost minimum of each g-run (signed compare — the same
            # BIGINT ordering the DuckDB oracle uses)
            idx = (g - 1) - np.argmin(sw[:, ::-1], axis=1)
            sel = np.unique(np.arange(len(sw), dtype=np.int64) + idx)
            # parallel arrays (Arrow list columns) — no per-element Python
            out_pos.append(sel + 1)
            out_fp.append(wh[sel])
        return pd.DataFrame({"pos": out_pos, "fp": out_fp})

    return _wfp


def window_fingerprints(df: DataFrame, text_col: str = "text",
                        window: int = 50, guarantee: int = 10) -> DataFrame:
    """-> (doc_id, pos, fp): winnowed fingerprints of W-token windows.
    Docs with fewer than `window` tokens yield no fingerprints.  The UDF
    emits parallel pos/fp Arrow list columns; the zip + explode to rows
    happens JVM-side."""
    wfp = _window_fp_udf(window, guarantee)
    return (df.select("doc_id", wfp(F.col(text_col)).alias("s"))
              .select("doc_id",
                      F.explode(F.arrays_zip("s.pos", "s.fp")).alias("w"))
              .select("doc_id", F.col("w.pos").alias("pos"),
                      F.col("w.fp").alias("fp")))


def substring_dup_pairs(df: DataFrame, text_col: str = "text",
                        window: int = 50, guarantee: int = 10,
                        min_shared: int = 2, cap: int = 2000) -> DataFrame:
    """-> (id_a, id_b, n_shared_fps): doc pairs sharing >= min_shared
    winnowed fingerprints (verbatim spans of >= window tokens)."""
    fps = window_fingerprints(df, text_col, window, guarantee)
    if cap is not None:
        w = Window.partitionBy("fp").orderBy("doc_id", "pos")
        fps = (fps.withColumn("_rn", F.row_number().over(w))
                  .where(F.col("_rn") <= cap).drop("_rn"))
    fps = fps.select("doc_id", "fp").dropDuplicates()
    a, b = fps.alias("a"), fps.alias("b")
    return (
        a.join(b, "fp")
         .where(F.col("a.doc_id") < F.col("b.doc_id"))
         .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
         .agg(F.count("*").alias("n_shared_fps"))
         .where(F.col("n_shared_fps") >= min_shared)
    )


def substring_span_pairs(df: DataFrame, text_col: str = "text",
                         window: int = 50, guarantee: int = 10,
                         cap: int = 2000) -> DataFrame:
    """Suffix-array exact-substring stage (the north_star's named
    algorithm): -> (id_a, id_b, max_span) where max_span is the EXACT
    length in tokens of the longest span the pair shares verbatim.

    Two phases (functions/suffix.py docstring has the architecture note):
      1. candidates: winnowed-fingerprint equi-join (above).  The SWA
         guarantee makes recall total for spans >= window + guarantee - 1;
         a fingerprint match implies a shared window modulo md5 collision.
      2. refinement: per candidate pair, suffix array + Kasai LCP over the
         concatenated token sequences gives the exact maximal shared span
         (Arrow-batched pandas UDF, NumPy inside); pairs whose exact span
         falls below `window` (hash-collision false positives) are dropped.
    """
    from pyspark.sql import types as T

    from distributed_lsh_spark.functions.suffix import max_cross_span

    cands = (substring_dup_pairs(df, text_col, window, guarantee,
                                 min_shared=1, cap=cap)
             .select("id_a", "id_b"))
    toks = df.select("doc_id", F.expr(
        _NORMALIZE_SQL.format(col=text_col)).alias("_toks"))

    @F.pandas_udf(T.LongType())
    def _span(ta: pd.Series, tb: pd.Series) -> pd.Series:
        return pd.Series([max_cross_span(list(a), list(b))
                          for a, b in zip(ta, tb)], dtype="int64")

    ta = toks.select(F.col("doc_id").alias("id_a"), F.col("_toks").alias("_ta"))
    tb = toks.select(F.col("doc_id").alias("id_b"), F.col("_toks").alias("_tb"))
    cands = cands.persist()   # lazy pin; broadcast build materializes it
    return (F.broadcast(cands).join(ta, "id_a").join(tb, "id_b")
            .withColumn("max_span", _span("_ta", "_tb"))
            .where(F.col("max_span") >= window)
            .select("id_a", "id_b", "max_span"))


# ---------------------------------------------------------------- oracle

def oracle_winnow_positions(wh: list[int], guarantee: int) -> list[int]:
    """True winnowing by DEFINITION (not the per-position formula the
    engine uses): slide every g-window, record its rightmost minimum;
    1-based positions.  Docs with < g hashes form one run."""
    n = len(wh)
    if n == 0:
        return []
    g = min(guarantee, n)
    picked: set[int] = set()
    for w0 in range(n - g + 1):
        run = wh[w0:w0 + g]
        mn = min(run)
        # rightmost occurrence of the minimum
        idx = w0 + max(j for j, v in enumerate(run) if v == mn)
        picked.add(idx + 1)
    return sorted(picked)


def oracle_window_fingerprints(text: str, window: int = 50,
                               guarantee: int = 10) -> list[tuple[int, int]]:
    """Pure-Python mirror of window_fingerprints: [(pos_1based, fp)]."""
    import re
    toks = [t for t in re.sub(r"[^a-z0-9]+", " ", text.lower()).split(" ") if t]
    if len(toks) < window:
        return []
    th = [(py_md5_h64(t) & _MASK64) >> TH_SHIFT for t in toks]
    pows = window_pows(window)
    wh = []
    for i in range(len(toks) - window + 1):
        u = sum(th[i + j] * pows[j] for j in range(window)) & _MASK64
        wh.append(u - (1 << 64) if u >= (1 << 63) else u)
    return [(i, wh[i - 1]) for i in oracle_winnow_positions(wh, guarantee)]


def oracle_substring_span_pairs(docs: dict[int, str], window: int = 50,
                                guarantee: int = 10) -> dict[tuple[int, int], int]:
    """Pure-Python mirror of substring_span_pairs: winnow candidates, then
    exact max shared span via the O(n*m) DP (independent of the engine's
    suffix-array algorithm, so parity validates the SA construction)."""
    import re

    from distributed_lsh_spark.functions.suffix import oracle_max_span_dp

    cands = oracle_substring_pairs(docs, window, guarantee, min_shared=1)
    toks = {d: [t for t in re.sub(r"[^a-z0-9]+", " ", x.lower()).split(" ") if t]
            for d, x in docs.items()}
    out = {}
    for (a, b) in cands:
        span = oracle_max_span_dp(toks[a], toks[b])
        if span >= window:
            out[(a, b)] = span
    return out


def oracle_substring_pairs(docs: dict[int, str], window: int = 50,
                           guarantee: int = 10, min_shared: int = 2,
                           ) -> dict[tuple[int, int], int]:
    fps: dict[int, set[int]] = {
        d: {fp for _, fp in oracle_window_fingerprints(t, window, guarantee)}
        for d, t in docs.items()
    }
    ids = sorted(docs)
    out = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            shared = len(fps[a] & fps[b])
            if shared >= min_shared:
                out[(a, b)] = shared
    return out


def remove_shared_spans(df: DataFrame, text_col: str = "text",
                        window: int = 50, guarantee: int = 10,
                        cap: int = 2000, max_partners: int = 64) -> DataFrame:
    """Exact-substring REMOVAL (Lee et al. ACL'22 remediation step):
    rewrite each doc with every token span of length >= `window` that it
    shares verbatim with a LOWER-doc_id candidate partner cut out — the
    lowest-id occurrence of a span survives, every later copy is removed.

    -> (doc_id, n_tokens, n_removed, clean_text) over the NORMALIZED
    token stream (production maps positions back to raw-byte offsets;
    the token stream is this repo's canonical text form, same as
    line_dedup's).  Docs with no candidate partner pass through intact.

    Shape: winnowed-fingerprint candidates (same join + hot-key cap as
    `substring_dup_pairs`; the SWA guarantee makes discovery total for
    spans >= window + guarantee - 1), then per doc the partner token
    sequences are gathered and coverage is computed with per-pair
    suffix-array matching statistics (functions/suffix.cross_coverage)
    in one Arrow-batched pandas UDF — the same shard-by-pair reshaping
    of the paper's global suffix array as `substring_span_pairs`.

    `max_partners` bounds the gather: a boilerplate-heavy doc can pair
    with thousands of candidates, and collecting every partner's token
    array into one row is the one place this plan could build an
    unbounded row.  The LOWEST-id partners are kept (deterministic, and
    they are exactly the copies the survivor policy defers to); a span
    shared with a dropped partner is near-always shared with a kept one
    — mass-duplicated spans are present in many partners by definition.
    """
    from distributed_lsh_spark.functions.suffix import cross_coverage

    cands = (substring_dup_pairs(df, text_col, window, guarantee,
                                 min_shared=1, cap=cap)
             .select("id_a", "id_b"))
    cands = (cands.withColumn(
                 "_r", F.row_number().over(
                     Window.partitionBy("id_b").orderBy("id_a")))
                  .where(F.col("_r") <= max_partners).drop("_r")
                  .persist())   # lazy pin; broadcast build materializes it
    toks = df.select("doc_id", F.expr(
        _NORMALIZE_SQL.format(col=text_col)).alias("_toks"))
    ta = toks.select(F.col("doc_id").alias("id_a"),
                     F.col("_toks").alias("_ta"))
    partners = (F.broadcast(cands).join(ta, "id_a")
                .groupBy(F.col("id_b").alias("doc_id"))
                .agg(F.collect_list("_ta").alias("_partners")))

    out_schema = T.StructType([
        T.StructField("n_removed", T.LongType(), False),
        T.StructField("clean_text", T.StringType(), False),
    ])

    @F.pandas_udf(out_schema)
    def _scrub(tb: pd.Series, ps: pd.Series) -> pd.DataFrame:
        rows = []
        for b, partner_list in zip(tb, ps):
            b = list(b)
            pl = [list(p) for p in partner_list] if partner_list is not None else []
            if pl:
                mask = cross_coverage(b, pl, window)
                kept = [t for t, c in zip(b, mask) if not c]
                rows.append((int(mask.sum()), " ".join(kept)))
            else:
                rows.append((0, " ".join(b)))
        return pd.DataFrame(rows, columns=["n_removed", "clean_text"])

    return (toks.join(partners, "doc_id", "left")
                .withColumn("_o", _scrub("_toks", "_partners"))
                .select("doc_id",
                        F.size("_toks").cast("bigint").alias("n_tokens"),
                        F.col("_o.n_removed").alias("n_removed"),
                        F.col("_o.clean_text").alias("clean_text")))
