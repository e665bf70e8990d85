"""Duplicate-aware weighting, leakage-safe splits, and mixture planning.

Three curation-side operators a web-scale training pipeline runs AFTER the
dedup stages (the reference stops at cluster output,
MapReduce-LSH/.../lsh/searcher/LSHSearcher.java:212-252 — these consume
that output):

* `soft_dedup_weights` — instead of dropping duplicates, keep every doc
  and downweight it by its near-dup cluster size (weight = 1/|cluster|),
  so a family of n near-identical pages contributes one page's worth of
  gradient mass in expectation ("soft" deduplication).
* `cluster_safe_split` — deterministic train/valid/test assignment where
  the WHOLE near-dup cluster follows one hash draw, so near-duplicates can
  never straddle the train/eval boundary (the split-leakage analogue of
  the contamination check).
* `temperature_mixture` — per-domain mixture plan: raw token share p_d,
  temperature-flattened share q_d = p_d^alpha / sum(p_d^alpha), and the
  up/down-sampling factor q_d/p_d each domain needs to hit the flattened
  mix.

Scale shape
-----------
All three are one or two hash aggregations over already-reduced frames
(cluster labels / per-domain rollups), far smaller than the corpus scan
that produced them:

* `soft_dedup_weights` / `cluster_safe_split` join the corpus id column
  to the cluster-label frame (left join on doc_id — the label frame is a
  doc_id-keyed output of the CC stage, so the join co-partitions on the
  same key the CC loop already shuffled on) and, for weights, one
  groupBy(cluster_id) with map-side combine.  No text column is touched:
  the scan prunes to doc_id only.
* the split hash is md5 of the cluster id — computed per ROW but only on
  an 8-byte key, and identical across engines (Spark
  `conv(substr(md5(x),1,15),16,10)` == DuckDB
  `('0x'||substr(md5(x),1,15))::BIGINT`), so the gate value-checks the
  whole assignment.
* `temperature_mixture` aggregates to one row per domain first; the
  window total runs over that tiny frame (#domains rows), never the
  corpus.  alpha=0.5 keeps the flattening inside IEEE-exact sqrt.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket_100(col: Column) -> Column:
    """Deterministic [0, 100) bucket from md5, reproducible in ANSI SQL.

    First 60 bits of the md5 hex digest parsed base-16 (fits a signed
    int64), mod 100.  DuckDB twin: ('0x'||substr(md5(x),1,15))::BIGINT.
    """
    return (F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10)
             .cast("bigint") % 100)


def with_cluster_ids(docs: DataFrame, clusters: DataFrame,
                     id_col: str = "doc_id") -> DataFrame:
    """(id, cluster_id) for EVERY doc: clustered docs take their CC label,
    singletons (absent from the label frame) become their own cluster."""
    return (docs.select(id_col)
                .join(clusters.select(F.col(id_col),
                                      F.col("cluster_id").alias("_cid")),
                      id_col, "left")
                .select(F.col(id_col),
                        F.coalesce("_cid", F.col(id_col))
                         .alias("cluster_id")))


def soft_dedup_weights(docs: DataFrame, clusters: DataFrame,
                       id_col: str = "doc_id") -> DataFrame:
    """Per-doc soft-dedup weight: 1 / near-dup-cluster size.

    Keeps all rows (a curation policy choice vs dropping: downweighted
    duplicates still contribute diversity in their unique spans) while the
    EXPECTED sample mass per cluster is exactly one document's.
    """
    # labeled feeds both the size groupBy and the final join — checkpoint
    # the 16-B (id, cluster_id) frame so the label join runs once
    labeled = with_cluster_ids(docs, clusters, id_col).persist()
    sizes = (labeled.groupBy("cluster_id")
                    .agg(F.count(F.lit(1)).alias("cluster_size")))
    return (labeled.join(sizes, "cluster_id")
                   .select(id_col, "cluster_id", "cluster_size",
                           F.round(F.lit(1.0) / F.col("cluster_size"), 6)
                            .alias("weight")))


def cluster_safe_split(docs: DataFrame, clusters: DataFrame,
                       id_col: str = "doc_id",
                       train_pct: int = 90,
                       valid_pct: int = 5) -> DataFrame:
    """Leakage-safe train/valid/test split: one md5 draw PER CLUSTER.

    Hashing the cluster id (not the doc id) guarantees every member of a
    near-dup family lands in the same split — a doc can never have a
    near-duplicate of itself across the train/eval boundary.  Fractions
    are integer percent thresholds on a uniform [0,100) bucket.
    """
    labeled = with_cluster_ids(docs, clusters, id_col)
    bucket = hash_bucket_100(F.col("cluster_id"))
    split = (F.when(bucket < train_pct, F.lit("train"))
              .when(bucket < train_pct + valid_pct, F.lit("valid"))
              .otherwise(F.lit("test")))
    return labeled.select(id_col, "cluster_id", bucket.alias("bucket"),
                          split.alias("split"))


def temperature_mixture(df: DataFrame, domain_col: str, tokens_col: str,
                        alpha: float = 0.5) -> DataFrame:
    """Per-domain temperature-sampling plan over token mass.

    p_raw   = domain tokens / total tokens
    p_temp  = p_raw^alpha / sum_d p_raw^alpha   (alpha<1 flattens the mix
              toward uniform; alpha=1 is proportional, alpha=0 uniform)
    mix_weight = p_temp / p_raw — the per-doc up/down-sampling factor that
              realises the flattened mix (head domains get <1, tail >1).

    One corpus groupBy(domain) with map-side combine; the normalisation
    windows run over the per-domain frame (#domains rows), so the whole
    plan after the first shuffle is driver-trivial at any corpus size.
    """
    agg = (df.groupBy(domain_col)
             .agg(F.count(F.lit(1)).alias("n_docs"),
                  F.sum(tokens_col).alias("n_tokens")))
    w = Window.partitionBy()
    p_raw = F.col("n_tokens") / F.sum("n_tokens").over(w)
    # alpha=0.5 routes through sqrt: IEEE-correctly-rounded on every
    # engine, unlike pow(x, 0.5) — keeps the oracle bit-exact pre-round
    powed = F.sqrt(p_raw) if alpha == 0.5 else F.pow(p_raw, F.lit(alpha))
    p_temp = powed / F.sum(powed).over(w)
    return (agg.select(domain_col, "n_docs", "n_tokens",
                       F.round(p_raw, 6).alias("p_raw"),
                       F.round(p_temp, 6).alias("p_temp"),
                       F.round(p_temp / p_raw, 6).alias("mix_weight"))
               .orderBy(domain_col))
