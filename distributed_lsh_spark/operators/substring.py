"""Exact-substring (long repeated span) dedup via winnowed window
fingerprints — the SURVEY.md §7 step-7 stage.

Whole-doc MinHash misses a 500-token span copied verbatim into an otherwise
distinct page (global Jaccard stays low).  This stage detects such spans:

  1. tokenize (same normalizer as the shingle stage)
  2. hash every W-token window (W = `window`): wh_i = md5_h64(window_i)
     (functions/md5hash.py — the one hash Spark, DuckDB, and Python share,
     so the driver's DuckDB oracle can replay the whole chain)
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

Everything JVM-side; the oracle re-implements steps 1-5 in pure Python for
exact parity tests, and entry_queries mirrors them in DuckDB SQL for the
driver's correctness gate.

Scale note: the HOF window-hash build is O(n_tokens * W) string bytes per
doc; at 100-TB scale swap step 2 for the rolling-poly hash inside a fused
Arrow UDF (functions/signature.py pattern) and keep steps 3-5 unchanged.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from distributed_lsh_spark.functions.md5hash import py_md5_h64, spark_h64
from distributed_lsh_spark.functions.text import _NORMALIZE_SQL


def _winnow_select_sql(wh: str, g: int) -> str:
    """SQL expr: 1-based positions of `wh` selected by true winnowing."""
    geff = f"least({g}, size({wh}))"
    lcap = (f"size(filter(sequence(1, {geff}), m -> m < {geff} "
            f"AND i - m >= 1 "
            f"AND {wh}[i-1] <= array_min(slice({wh}, i - m, m))))")
    rcap = (f"size(filter(sequence(1, {geff}), m -> m < {geff} "
            f"AND i + m <= size({wh}) "
            f"AND {wh}[i-1] < array_min(slice({wh}, i + 1, m))))")
    return (f"filter(sequence(1, size({wh})), "
            f"i -> {lcap} + {rcap} >= {geff} - 1)")


def window_fingerprints(df: DataFrame, text_col: str = "text",
                        window: int = 50, guarantee: int = 10) -> DataFrame:
    """-> (doc_id, pos, fp): winnowed fingerprints of W-token windows.
    Docs with fewer than `window` tokens yield no fingerprints."""
    toks = _NORMALIZE_SQL.format(col=text_col)
    win_str = f"concat_ws(' ', slice(_toks, i, {window}))"
    wh_expr = (f"transform(sequence(1, size(_toks) - {window} + 1), "
               f"i -> {spark_h64(win_str)})")
    return (
        df.withColumn("_toks", F.expr(toks))
          .where(F.size("_toks") >= window)
          .withColumn("_wh", F.expr(wh_expr))
          .withColumn("_sel", F.expr(_winnow_select_sql("_wh", guarantee)))
          .select("doc_id",
                  F.explode(F.expr("transform(_sel, i -> struct(i AS pos, _wh[i-1] AS fp))"))
                   .alias("w"))
          .select("doc_id", F.col("w.pos").alias("pos"), F.col("w.fp").alias("fp"))
    )


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
    cands = cands.localCheckpoint(eager=False)
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
    wh = [py_md5_h64(" ".join(toks[i:i + window]))
          for i in range(len(toks) - window + 1)]
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
