"""Global line-level dedup as a REWRITE operator — the operational form
of the three gated line-dedup semantics (entry_queries):

  * "c4"         — q_line_dedup: remove EVERY occurrence of any 8-token
                   line occurring >= 2 times anywhere (C4/RefinedWeb).
  * "keep_first" — q_line_dedup_keep_first: remove an occurrence iff an
                   earlier (doc_id, pos) occurrence exists; the first
                   copy survives (Dolma's exact rule).
  * "bloom"      — q_bloom_line_dedup: keep-first decided by a
                   sequential Bloom filter (operators/bloom_dedup.py) —
                   false positives accepted as a tunable loss in
                   exchange for O(m-bit) membership state (Dolma's
                   deduper as actually shipped).

Like the whole family, "lines" are 8-token chunks of the NORMALIZED
token stream (functions/text.doc_lines), so the rewritten text is the
cleaned normalized stream a tokenizer pipeline consumes.

Scale shape: one explode -> one map-side-combining groupBy on 8-byte
line keys (c4: count; keep_first: min-rank — never a row_number window
over a hot line's occurrence list; bloom: min-rank per BIT position) ->
one narrow join -> one per-doc groupBy for the ordered reconstruction.
Zero-line docs flow through unchanged (the rewrite is total).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from distributed_lsh_spark.functions.text import doc_lines
from distributed_lsh_spark.operators.bloom_dedup import (
    RANK_POS_SPACE,
    bloom_flag_occurrences,
)

LINE_DEDUP_MODES = ("c4", "keep_first", "bloom")

# production Bloom default: 2^30 bits = 128 MiB of driver-free state,
# ~1e-4 FP per occurrence at 10^8 distinct lines with k=2 (callers with
# a key-count estimate should size via functions/bloom.bloom_parameters)
BLOOM_DEFAULT_BITS = 1 << 30


def remove_duplicate_lines(pages: DataFrame, *, mode: str = "keep_first",
                           bloom_m: int = BLOOM_DEFAULT_BITS,
                           bloom_k: int = 2) -> DataFrame:
    """pages(doc_id, text) -> (doc_id, clean_text, n_lines, n_removed):
    text rebuilt without the duplicate lines `mode` condemns."""
    if mode not in LINE_DEDUP_MODES:
        raise ValueError(f"mode must be one of {LINE_DEDUP_MODES}: {mode}")
    lines = doc_lines(pages.select("doc_id", "text"))
    if mode == "c4":
        dup = (lines.groupBy("lk").agg(F.count("*").alias("_c"))
               .where(F.col("_c") >= 2)
               .select("lk", F.lit(1).alias("_dup")))
        flagged = (lines.join(dup, "lk", "left")
                   .select("doc_id", "pos",
                           F.col("_dup").isNotNull().alias("_rm"), "line"))
    elif mode == "keep_first":
        firsts = (lines.groupBy("lk")
                  .agg(F.min(F.struct("doc_id", "pos")).alias("_first")))
        flagged = (lines.join(firsts, "lk")
                   .select("doc_id", "pos",
                           (F.struct("doc_id", "pos") != F.col("_first"))
                           .alias("_rm"), "line"))
    else:
        ranked = lines.withColumn(
            "rk", F.col("doc_id") * F.lit(RANK_POS_SPACE) + F.col("pos"))
        flags = bloom_flag_occurrences(ranked, bloom_m, bloom_k,
                                       key_col="line", rank_col="rk")
        flagged = (ranked.join(flags, "rk")
                   .select("doc_id", "pos",
                           F.col("flagged").alias("_rm"), "line"))
    kept = F.array_sort(F.collect_list(
        F.when(~F.col("_rm"), F.struct("pos", "line"))))
    rebuilt = (flagged.groupBy("doc_id")
               .agg(F.count("*").alias("n_lines"),
                    F.sum(F.col("_rm").cast("bigint")).alias("n_removed"),
                    F.concat_ws(" ", kept["line"]).alias("clean_text")))
    # zero-line docs (empty text) never explode a row — carry them
    # through unchanged so the rewrite tier is total
    return (pages.select("doc_id").join(rebuilt, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("clean_text", F.lit("")).alias("clean_text"),
                    F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
                    F.coalesce("n_removed", F.lit(0)).alias("n_removed")))
