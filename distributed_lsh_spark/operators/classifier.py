"""Hashed-feature linear quality classifier — model application at scale.

The production pattern (RefinedWeb, DCLM, FineWeb-Edu): score every page
with a small trained text classifier (fastText-style linear model over
hashed bag-of-words features) and keep the high-score band.  This module
is the Spark-native APPLY side: the model is a (feature_id, weight) table,
scoring is

    z(doc)   = bias + sum over token occurrences of w[h(token) % dim]
    score    = sigmoid(z / n_tokens)          (mean feature weight)

Training happens offline (any library); what must scale is inference over
10^12 docs, and that is pure DataFrame algebra here.

Determinism contract (gate-hashable): weights are INTEGER micro-units
(w_micro = round(w * 1e6)), so the accumulated logit is exact integer
arithmetic — no float-summation order dependence; the only transcendental
(sigmoid's exp) runs once per doc on an exactly-agreed double and is
rounded to 6 dp.  The feature hash is the cross-engine md5 fold
(`conv(substr(md5(w),1,15),16,10) % dim` == DuckDB
`('0x'||substr(md5(w),1,15))::BIGINT % dim`); production swaps in
xxhash64 for cheapness — same plan, different hash expression.

Scale shape: token explode -> map-only hash -> BROADCAST join against the
weight table (dim rows; a fastText bucket table of 2M rows x 16 B ships
once per executor) -> one groupBy(doc_id) whose partial aggregation
collapses each doc to one row per map task before the shuffle.  One
shuffle total, keyed by doc_id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def feature_hash(col: Column, dim: int) -> Column:
    """Token -> [0, dim) feature id, replayable bit-exactly in ANSI SQL."""
    return (F.conv(F.substring(F.md5(col), 1, 15), 16, 10)
             .cast("bigint") % dim)


def hashed_linear_score(df: DataFrame, weights: DataFrame, dim: int,
                        bias_micro: int = 0,
                        id_col: str = "doc_id",
                        text_col: str = "text",
                        threshold: float = 0.5) -> DataFrame:
    """(id, n_tokens, z_micro, score, keep) under a hashed linear model.

    `weights` is (feature_id bigint, w_micro bigint) — integer micro-unit
    weights.  Unhit features contribute 0 (left join).  Docs with no
    tokens score sigmoid(bias) by convention (z = bias, n_tokens 0).
    """
    from distributed_lsh_spark.functions.text import normalized_tokens

    base = df.select(F.col(id_col).alias("doc_id"),
                     normalized_tokens(text_col).alias("t"))
    ex = (base.select("doc_id", F.explode_outer("t").alias("w"))
              .withColumn("fid",
                          F.when(F.col("w").isNotNull(),
                                 feature_hash(F.col("w"), dim))))
    scored = (ex.join(F.broadcast(weights), ex.fid == weights.feature_id,
                      "left")
                .groupBy("doc_id")
                .agg(F.count("w").alias("n_tokens"),
                     (F.coalesce(F.sum("w_micro"), F.lit(0)) +
                      F.lit(int(bias_micro))).alias("z_micro")))
    # mean micro-logit -> probability; z/n is one exact-int division
    z_mean = (F.col("z_micro") /
              (F.greatest(F.col("n_tokens"), F.lit(1)) * F.lit(1e6)))
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z_mean)), 6)
    return scored.select("doc_id", "n_tokens", "z_micro",
                         score.alias("score"),
                         (score >= threshold).alias("keep"))
