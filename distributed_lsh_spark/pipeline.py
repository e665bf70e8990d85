"""End-to-end dedup pipeline: docs -> signatures -> bands -> candidate
pairs -> verified pairs -> clusters.

Each stage is a DataFrame transformation; `run_dedup` chains them lazily
(one Catalyst plan end-to-end) while `CheckpointedPipeline` (sources/
checkpoint.py) materializes each stage to Parquet/Iceberg with a manifest
for idempotent resume — the generalization of the reference's persisted
intermediate state (Naive-DLSH/.../lsh/searcher/LSHSearcher.java:340-352).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from distributed_lsh_spark.conf import DedupConfig, DEFAULT_CONFIG
from distributed_lsh_spark.functions.text import with_shingle_hashes
from distributed_lsh_spark.functions.hashing import with_minhash, with_simhash, band_keys
from distributed_lsh_spark.operators.candidates import candidate_pairs
from distributed_lsh_spark.operators.verify import verify_pairs
from distributed_lsh_spark.operators.connected_components import connected_components


@dataclass
class DedupStages:
    docs: DataFrame          # doc_id, text, shingles
    signatures: DataFrame    # doc_id, minhash, simhash
    bands: DataFrame         # doc_id, band_id, band_hash
    pairs: DataFrame         # id_a, id_b
    verified: DataFrame      # id_a, id_b, jaccard


def build_stages(df: DataFrame, cfg: DedupConfig = DEFAULT_CONFIG,
                 id_col: str = "doc_id", text_col: str = "text",
                 minhash_impl: str = "expr", with_simhash_col: bool = False,
                 persist: bool = False) -> DedupStages:
    """`persist=True` caches the shingled docs (consumed by both verify-join
    sides) and the band keys (consumed by both self-join sides) so the
    signature chain is computed once, not ~4x.  On a cluster run the
    CheckpointedPipeline materializes these to Parquet/Iceberg instead."""
    docs = with_shingle_hashes(
        df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")),
        text_col="text", k=cfg.shingle_k)
    if persist:
        docs = docs.persist()
    sigs = with_minhash(docs, cfg, impl=minhash_impl)
    if with_simhash_col:
        sigs = with_simhash(sigs, cfg)
    bands = band_keys(sigs, cfg)
    if persist:
        bands = bands.persist()
    pairs = candidate_pairs(bands, cfg)
    verified = verify_pairs(pairs, docs, cfg)
    return DedupStages(docs=docs, signatures=sigs, bands=bands,
                       pairs=pairs, verified=verified)


def run_dedup(df: DataFrame, cfg: DedupConfig = DEFAULT_CONFIG,
              id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Full pipeline -> clusters(doc_id, cluster_id). Lazy until CC loop."""
    st = build_stages(df, cfg, id_col=id_col, text_col=text_col, persist=True)
    # The verified edge set is reused by every CC iteration — persist it once
    # (the reference persists splitCand/ between jobs for the same reason,
    # Naive-DLSH/.../lsh/searcher/LSHSearcher.java:327).
    edges = st.verified.select("id_a", "id_b").localCheckpoint(eager=False)
    return connected_components(edges)


def dup_pairs(df: DataFrame, cfg: DedupConfig = DEFAULT_CONFIG,
              id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Pipeline up to verified pairs (id_a, id_b, jaccard)."""
    return build_stages(df, cfg, id_col=id_col, text_col=text_col).verified
