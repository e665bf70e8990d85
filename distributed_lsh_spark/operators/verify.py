"""Exact verification of candidate pairs — never trust signatures alone.

The reference verifies every LSH collision with an exact L2 distance and
keeps it iff dist < c*R (MapReduce-LSH/.../lsh/searcher/SearchMapper.java:
107-126, LSHTool.java:184-192).  The graft verifies with exact Jaccard over
the shingle-hash sets (and exact Hamming over SimHash fingerprints): two
payload-fetch joins (SURVEY.md J3) then a pure-JVM intersect/union size —
whole-stage codegen, no Python.

Scale note: the two joins against `docs` shuffle candidate pairs by doc id —
exactly the reference's NDLSH check phase, which routes candidates to dataset
splits by index (Naive-DLSH/.../lsh/searcher/CheckCandidateMapper.java:
113-145).  Bucketing the docs/signature checkpoint table by doc_id makes
these co-located on a real cluster (Iceberg bucket(N, doc_id)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from distributed_lsh_spark.conf import DedupConfig


def verify_pairs(pairs: DataFrame, docs: DataFrame, cfg: DedupConfig,
                 shingles_col: str = "shingles", simhash_col: str | None = None,
                 keep_below_threshold: bool = False,
                 broadcast_pairs: bool = True) -> DataFrame:
    """pairs(id_a, id_b) x docs(doc_id, shingles[, simhash]) ->
    (id_a, id_b, jaccard[, hamming]) filtered at cfg.jaccard_threshold.

    `broadcast_pairs=True` (default) hints the pair list as the build side:
    the dup-pair set is orders of magnitude smaller than the corpus, and a
    sort-merge join would otherwise shuffle+sort the WIDE side (docs with
    their shingle arrays) twice.  For pair sets too big to broadcast, pass
    False and bucket the docs checkpoint by doc_id instead (Iceberg
    bucket(N, doc_id)) so the payload joins are co-located.
    """
    cols = ["doc_id", shingles_col] + ([simhash_col] if simhash_col else [])
    payload = docs.select(*cols)

    da = payload.select(
        F.col("doc_id").alias("id_a"), F.col(shingles_col).alias("_sh_a"),
        *([F.col(simhash_col).alias("_sim_a")] if simhash_col else []))
    db = payload.select(
        F.col("doc_id").alias("id_b"), F.col(shingles_col).alias("_sh_b"),
        *([F.col(simhash_col).alias("_sim_b")] if simhash_col else []))

    if broadcast_pairs:
        # Broadcast ONLY the bare pair list (two longs per row) for the
        # first join — the docs side streams with no shuffle.  The second
        # join must NOT be broadcast: its left side carries the _sh_a
        # arrays (hundreds of MB at modest pair counts — broadcasting it
        # measured 4 minutes of driver serialization at 400k docs).
        # Instead, semi-join-prune the wide docs side down to ids that
        # actually appear in pairs (a broadcast of bare longs) so the one
        # shuffle join moves only needed payloads.
        # pairs feeds TWO broadcast builds (the prune + the join); the lazy
        # localCheckpoint stops the whole upstream candidate plan from
        # executing once per build (measured ~2x the verify stage at 400k).
        pairs = pairs.localCheckpoint(eager=False)
        db = db.join(F.broadcast(pairs.select("id_b").distinct()),
                     "id_b", "left_semi")
        joined = F.broadcast(pairs).join(da, "id_a").join(db, "id_b")
    else:
        joined = pairs.join(da, "id_a").join(db, "id_b")
    out = (
        joined
        .withColumn("_inter", F.size(F.array_intersect("_sh_a", "_sh_b")))
        .withColumn(
            "jaccard",
            F.when(F.size("_sh_a") + F.size("_sh_b") == 0, F.lit(1.0))
             .otherwise(F.col("_inter") /
                        (F.size("_sh_a") + F.size("_sh_b") - F.col("_inter"))))
    )
    if simhash_col:
        out = out.withColumn("hamming", F.bit_count(F.col("_sim_a").bitwiseXOR(F.col("_sim_b"))))
    if not keep_below_threshold:
        out = out.where(F.col("jaccard") >= cfg.jaccard_threshold)
    keep = ["id_a", "id_b", "jaccard"] + (["hamming"] if simhash_col else [])
    return out.select(*keep)


def hamming_pairs(pairs: DataFrame, docs: DataFrame, cfg: DedupConfig,
                  simhash_col: str = "simhash",
                  broadcast_pairs: bool = True) -> DataFrame:
    """SimHash path: keep pairs with Hamming distance <= cfg.hamming_threshold."""
    da = docs.select(F.col("doc_id").alias("id_a"), F.col(simhash_col).alias("_sim_a"))
    db = docs.select(F.col("doc_id").alias("id_b"), F.col(simhash_col).alias("_sim_b"))
    if broadcast_pairs:
        pairs = F.broadcast(pairs)
    return (
        pairs.join(da, "id_a").join(db, "id_b")
        .withColumn("hamming", F.bit_count(F.col("_sim_a").bitwiseXOR(F.col("_sim_b"))))
        .where(F.col("hamming") <= cfg.hamming_threshold)
        .select("id_a", "id_b", "hamming")
    )
