"""Exact-substring (long repeated span) dedup via winnowed window
fingerprints — the SURVEY.md §7 step-7 stage.

Whole-doc MinHash misses a 500-token span copied verbatim into an otherwise
distinct page (global Jaccard stays low).  This stage detects such spans:

  1. tokenize (same normalizer as the shingle stage)
  2. hash every W-token window (W = `window`): h_i = xxhash64(window_i)
  3. winnowing (Schleimer/Wilkerson/Aiken, SIGMOD'03 — public algorithm):
     within every run of `guarantee` consecutive window hashes keep the
     minimum; guarantees any shared span of >= W + guarantee - 1 tokens
     contributes at least one identical fingerprint on both sides
  4. explode (doc_id, fingerprint, pos); equi-join fingerprints across docs
     (same shape as the LSH band join, with the same hot-key cap)
  5. pairs ranked by number of shared fingerprints (>= `min_shared`)

Everything JVM-side (higher-order functions + xxhash64); the oracle
re-implements steps 1-5 in pure Python for exact parity tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from distributed_lsh_spark.functions.text import _NORMALIZE_SQL
from distributed_lsh_spark.oracle.xxh64 import spark_xxhash64_string


def window_fingerprints(df: DataFrame, text_col: str = "text",
                        window: int = 50, guarantee: int = 10) -> DataFrame:
    """-> (doc_id, pos, fp): winnowed fingerprints of W-token windows."""
    toks = _NORMALIZE_SQL.format(col=text_col)
    return (
        df.withColumn("_toks", F.expr(toks))
          .where(F.size("_toks") >= window)
          # window hashes: one per start position (1-based slice)
          .withColumn("_wh", F.expr(
              f"transform(sequence(1, size(_toks) - {window} + 1), "
              f"i -> xxhash64(concat_ws(' ', slice(_toks, i, {window}))))"))
          # winnowing: keep position i iff _wh[i] is the min of the
          # guarantee-length run ending at i (ties keep rightmost == this one)
          .withColumn("_sel", F.expr(
              f"filter(sequence(1, size(_wh)), "
              f"i -> _wh[i-1] <= array_min(slice(_wh, greatest(1, i - {guarantee} + 1), "
              f"least(i, {guarantee}))))"))
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


# ---------------------------------------------------------------- oracle

def oracle_window_fingerprints(text: str, window: int = 50,
                               guarantee: int = 10) -> list[tuple[int, int]]:
    """Pure-Python mirror of window_fingerprints: [(pos_1based, fp)]."""
    import re
    toks = [t for t in re.sub(r"[^a-z0-9]+", " ", text.lower()).split(" ") if t]
    if len(toks) < window:
        return []
    wh = [spark_xxhash64_string(" ".join(toks[i:i + window]))
          for i in range(len(toks) - window + 1)]
    out = []
    for i in range(1, len(wh) + 1):
        lo = max(1, i - guarantee + 1)
        run = wh[lo - 1:lo - 1 + min(i, guarantee)]
        if wh[i - 1] <= min(run):
            out.append((i, wh[i - 1]))
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
