"""Benchmark decontamination — drop training docs that overlap an eval set.

The GPT-3/PaLM-style pass (Brown et al. 2020 §C; public methodology):
a training document is contaminated when it shares word n-grams
(conventionally 13-grams) with any document of a held-out benchmark
suite; contaminated docs are removed before training so downstream
evals measure generalization, not memorization.  The gated
`contamination_check` query computes the per-doc overlap SIGNAL; this
operator is the operational REMOVAL tier `curate --decontaminate`
composes after the dedup funnel.

Scale shape (100 TB corpus, fixed eval suite):
- the eval inventory is distinct n-grams of a FIXED benchmark suite —
  MBs at any corpus size — so it broadcasts and the corpus side never
  shuffles for the probe join;
- corpus cost = one codegen shingle scan + explode + a map-side-
  combining groupBy(doc_id) for hit counts (threshold > 0) or a plain
  broadcast left-semi for drop-on-any-hit (threshold == 0, the GPT-3
  rule) — the semi form never materializes per-doc counts at all;
- the drop is a broadcast-able left_anti on doc_id against the
  contaminated-id frame (bounded by the eval suite's reach, not the
  corpus);
- the threshold compare is integer ppm cross-multiplication — no float
  ratios, so verdicts are layout- and engine-independent.

Reference analogue: the query-vs-corpus probe shape of the reference's
SearchMapper (MapReduce-LSH/LSHSearcher.java) — a small query-side
inventory broadcast against a large scanned corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from distributed_lsh_spark.functions.text import shingle_strings

#: conventional decontamination n-gram size (GPT-3 used 13-grams)
DEFAULT_NGRAM = 13


def eval_ngram_inventory(eval_texts: DataFrame, n: int = DEFAULT_NGRAM,
                         text_col: str = "text") -> DataFrame:
    """Distinct word n-grams of the eval suite — one column `g`.

    Normalization is the engine-wide token rule (shingle_strings), so a
    case/punctuation variant of an eval passage still collides."""
    grams = F.array_distinct(shingle_strings(text_col, n))
    return (eval_texts.select(F.explode(grams).alias("g"))
            .dropDuplicates())


def contaminated_ids(pages: DataFrame, eval_inventory: DataFrame,
                     n: int = DEFAULT_NGRAM,
                     threshold: float = 0.0) -> DataFrame:
    """doc_ids whose n-gram overlap with the eval inventory exceeds
    `threshold` (fraction of the doc's distinct n-grams).

    threshold == 0.0 is the GPT-3 rule — ANY shared n-gram drops the
    doc — and uses a broadcast left-semi join (no counting).  For
    threshold > 0 the compare is exact integer ppm cross-multiplication:
    n_hit * 1e6 > ppm * n_grams."""
    grams = F.array_distinct(shingle_strings("text", n))
    g = pages.select("doc_id", F.explode(grams).alias("g"))
    ev = F.broadcast(eval_inventory.select("g"))
    if threshold <= 0.0:
        return g.join(ev, "g", "left_semi").select("doc_id").dropDuplicates()
    ppm = int(round(threshold * 1_000_000))
    hits = (g.join(ev, "g")
            .groupBy("doc_id").agg(F.count("*").alias("n_hit")))
    sizes = pages.select("doc_id", F.size(grams).alias("n_grams"))
    return (sizes.join(hits, "doc_id")
            .where(F.col("n_hit") * F.lit(1_000_000) >
                   F.lit(ppm) * F.col("n_grams"))
            .select("doc_id"))


def decontaminate(pages: DataFrame, eval_texts: DataFrame,
                  n: int = DEFAULT_NGRAM,
                  threshold: float = 0.0) -> DataFrame:
    """pages minus contaminated docs (left_anti on doc_id)."""
    bad = contaminated_ids(pages, eval_ngram_inventory(eval_texts, n), n,
                           threshold)
    return pages.join(bad, "doc_id", "left_anti")


__all__ = ["DEFAULT_NGRAM", "eval_ngram_inventory", "contaminated_ids",
           "decontaminate"]
