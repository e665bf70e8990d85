"""LSH candidate-pair generation: the band self-join.

This is the engine's one join, the analogue of the reference's LSH probe
(SURVEY.md §2.3): where the reference looks up a query's bucket in an
in-memory HashMap per (radius, table)
(MapReduce-LSH/.../lsh/searcher/SearchMapper.java:268-311), the dedup graft
self-joins the band-key DataFrame with itself on (band_id, band_hash) —
one shuffle over the band-key space; each band is an independent key
sub-space, the analogue of NDLSH's hash-table blocks
(Naive-DLSH/.../common/LSH.java:125-142).

Skew hardening (SURVEY.md §4 custom item 1): a boilerplate page repeated
10^6 times puts 10^6 rows on one (band_id, band_hash) key -> 10^12 pairs
from a single bucket.  Two guards, both with reference precedent
(searchThreshold = pruneFactor*L + k, SearchMapper.java:266,340-353):

  * `hot_band_cap`: per-bucket membership is capped at `cap` docs, ordered
    by a BAND-DEPENDENT hash xxhash64(band_id, doc_id) (deterministic).  The
    ordering must vary per band: byte-identical docs share every band
    bucket, so a fixed doc_id ordering would starve the same members in all
    b bands; with per-band orderings each band keeps a different cap-sized
    subset, and the union of those subsets' pair cliques keeps a >cap
    identical family connected.  Byte-identical families are additionally
    collapsed BEFORE banding by run_dedup's exact-first md5 pre-pass
    (pipeline.py), which is the primary defense; the cap guards
    near-duplicate (non-identical) hot buckets.
  * AQE skew-join splitting is on session-wide for the residual skew.

Pair dedup across bands (P6, SearchMapper.java:100-106: checkedIndexSet)
happens BEFORE the expensive exact verification: dropDuplicates on
(id_a, id_b), a map-side-combinable aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from distributed_lsh_spark.conf import DedupConfig


def cap_hot_buckets(bands: DataFrame, cap: int,
                    probe: bool = True) -> DataFrame:
    """Deterministically cap per-bucket membership of a (doc_id, band_hash)
    frame at `cap` docs.

    Routed two-path deterministic cap (`probe=True`): persist the bands,
    aggregate bucket counts (map-side combinable) and probe for ANY
    oversized bucket in one routing job; when none exists — the common
    case on a corpus whose byte-identical families were already collapsed
    by the exact-first pre-pass — return the persisted bands untouched,
    so the self-join plan carries ZERO cap stages.  Otherwise window-sort
    ONLY the oversized buckets and pass everything else through a
    broadcast anti-join.  A plain window over all bands was measured 2.8x
    slower at 400k docs: the full 11.9M-row sort ran once per self-join
    side (41.4s vs 14.5s uncapped) — sorting rows that no cap will ever
    drop.  The ordering is BAND-DEPENDENT (band_hash embeds band_id;
    see module docstring).

    `probe=False` keeps the one-plan inline shape (no routing job, no
    persist): right for single-consumer callers whose downstream action
    folds the cap subplan anyway (the snapshot probe joins — a routing
    job per side measured slower than the stages it saved)."""
    if probe:
        bands = bands.persist()
    counts = bands.groupBy("band_hash").agg(F.count("*").alias("_n"))
    hot_df = counts.where(F.col("_n") > cap).select("band_hash")
    # routing job: materializes the bands cache (both self-join sides and
    # the non-empty path below reuse it) and answers "any hot bucket?" —
    # the partial aggregate collapses map-side, so the probe moves
    # O(distinct buckets) rows at most
    if probe and hot_df.isEmpty():
        return bands
    hot = F.broadcast(hot_df)
    w = Window.partitionBy("band_hash") \
              .orderBy(F.xxhash64("band_hash", "doc_id"), "doc_id")
    hot_capped = (bands.join(hot, ["band_hash"])
                  .withColumn("_rn", F.row_number().over(w))
                  .where(F.col("_rn") <= cap)
                  .drop("_rn"))
    return bands.join(hot, ["band_hash"], "left_anti") \
                .unionByName(hot_capped)


def candidate_pairs(bands: DataFrame, cfg: DedupConfig | None = None,
                    cap: int | None = None) -> DataFrame:
    """bands(doc_id, band_id, band_hash) -> (id_a, id_b) with id_a < id_b.

    Distinct pairs across all bands (one row per pair, not per collision).
    """
    if cap is None:
        cap = cfg.hot_band_cap if cfg else None

    # band_hash already encodes band_id (band_keys hashes the id into the
    # slice hash), so the bucket key is band_hash ALONE: the shuffled row
    # shrinks to (doc_id, band_hash) = 16 B.  A cross-band 64-bit hash
    # collision merges two buckets, which can only ADD candidates — exact
    # verification removes them — with probability ~ (32n)^2 / 2^64.
    bands = bands.select("doc_id", "band_hash")

    if cap is not None:
        bands = cap_hot_buckets(bands, cap)

    # persist barrier: the self-join consumes bands twice; without it the
    # whole upstream plan (signatures included) executes once per side.
    # persist, NOT localCheckpoint: under AQE a "lazy" localCheckpoint
    # converts to an RDD, which executes the upstream stages NOW as an
    # extra driver-synchronized job; persist is genuinely lazy and the
    # cache manager dedupes the two join-side reads inside whichever
    # action consumes the pairs (cap_hot_buckets already persisted and
    # materialized the cache in its routing job when the no-hot passthrough
    # was taken — is_cached skips the duplicate registration).
    if not bands.is_cached:
        bands = bands.persist()
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(b, ["band_hash"])
         .where(F.col("a.doc_id") < F.col("b.doc_id"))
         .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
         .dropDuplicates(["id_a", "id_b"])
    )
