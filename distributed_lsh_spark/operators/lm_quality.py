"""Corpus-trained bigram language-model quality scoring (CCNet-style).

The production pattern (CCNet, Wenzek et al. LREC'20) filters web text by
perplexity under a small n-gram LM.  This operator is the Spark-native
train-then-score form over the corpus itself: count unigrams/bigrams in
one pass, score every document with the add-one-smoothed bigram NLL

    p(w2 | w1) = (c(w1 w2) + 1) / (c(w1) + V)
    doc score  = mean over bigram occurrences of -ln p

High avg_nll = surprising/noisy text (gibberish, boilerplate soup); the
filter keeps the low-perplexity band.  To score against a FIXED reference
LM instead (CCNet's Wikipedia LM), swap `uni`/`bgc` for pre-counted
tables — the plan below is unchanged from the join onwards.

Cross-engine determinism (the gate hashes values): every count is exact;
p is one IEEE double division of exact ints; the only transcendental,
ln(p), is quantized to integer micro-nats (round(-ln(p) * 1e6)) BEFORE
any aggregation, so per-doc sums are exact integer arithmetic with no
float-summation order dependence, and avg_nll is one exact-int division
rounded at the end.

Scale shape (100-TB corpus):
* bigrams come from posexplode + lead() over a doc-partitioned window —
  no higher-order-function lambdas (interpreted, not codegen, in this
  Spark build) and one shuffle keyed by doc_id.
* per-doc (w1, w2) multiplicities are pre-aggregated with map-side
  combine BEFORE any join (`token_rarity` precedent): zipfian repeats
  collapse to one row per doc, so the count-table joins move
  #distinct-bigrams-per-doc rows, not token occurrences.
* the count tables (`uni`, `bgc`) are one row per key; joining them back
  shuffles on the token keys — hot heads ("the of") are 1-row build
  sides, and AQE skew-join splits the probe side.  With a bounded
  reference vocabulary both tables broadcast instead.
* the token explode is deliberately NOT persisted: it is ~10x the corpus
  bytes, and recomputing it costs one extra pruned columnar scan — far
  cheaper at scale than materializing the exploded frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from distributed_lsh_spark.functions.text import normalized_tokens


def bigram_lm_scores(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(id, n_bigrams, sum_nll_micro, avg_nll) under the corpus bigram LM.

    avg_nll is NULL for docs with fewer than 2 tokens (no bigrams);
    sum_nll_micro is the exact integer sum of round(-ln(p)*1e6) over
    bigram occurrences — the gate-stable form of the score.
    """
    base = df.select(F.col(id_col).alias("doc_id"),
                     normalized_tokens(text_col).alias("t"))
    ex = base.select("doc_id", F.posexplode("t").alias("pos", "w"))

    # train: unigram occurrence counts + vocabulary size (uni feeds both
    # the scoring join and the vocab count — pinned once, vocab-sized)
    uni = (ex.groupBy("w").agg(F.count(F.lit(1)).alias("cu"))
             .persist())
    vdf = uni.agg(F.count(F.lit(1)).alias("vs"))

    # bigram occurrences -> per-doc multiplicities (map-side combine).
    # docbg and uni are each consumed by TWO downstream branches (the
    # count-table derivation and the scoring join); a lazy persist pin
    # makes the explode/window lineage run once per frame instead of once
    # per branch (same reuse barrier the dedup pipeline puts before the
    # band self-join) without the eager execution an RDD-converting
    # localCheckpoint pays under AQE.
    wspec = Window.partitionBy("doc_id").orderBy("pos")
    bg = (ex.select("doc_id", F.col("w").alias("w1"),
                    F.lead("w").over(wspec).alias("w2"))
            .where(F.col("w2").isNotNull()))
    docbg = (bg.groupBy("doc_id", "w1", "w2")
               .agg(F.count(F.lit(1)).alias("m"))
               .persist())
    bgc = docbg.groupBy("w1", "w2").agg(F.sum("m").alias("cb"))

    p = ((F.col("cb") + 1).cast("double") /
         (F.col("cu") + F.col("vs")).cast("double"))
    nll_micro = F.round(-F.log(p) * F.lit(1e6)).cast("bigint")
    perdoc = (docbg.join(bgc, ["w1", "w2"])
                   .join(uni.withColumnRenamed("w", "w1"), "w1")
                   .crossJoin(F.broadcast(vdf))
                   .withColumn("nll", nll_micro)
                   .groupBy("doc_id")
                   .agg(F.sum("m").alias("n_bigrams"),
                        F.sum(F.col("m") * F.col("nll"))
                         .alias("sum_nll_micro")))

    return (df.select(F.col(id_col).alias("doc_id"))
              .join(perdoc, "doc_id", "left")
              .select("doc_id",
                      F.coalesce("n_bigrams", F.lit(0)).cast("bigint")
                       .alias("n_bigrams"),
                      F.coalesce("sum_nll_micro", F.lit(0)).cast("bigint")
                       .alias("sum_nll_micro"),
                      F.round(F.col("sum_nll_micro") /
                              (F.col("n_bigrams") * F.lit(1e6)), 6)
                       .alias("avg_nll")))
