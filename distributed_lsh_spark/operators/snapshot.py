"""Incremental snapshot dedup: probe a NEW crawl batch against an
EXISTING corpus — the batch twin of `streaming/dedup_stream`'s
per-micro-batch history probe, and the shape a Common-Crawl pipeline
runs monthly (dedup snapshot N against the union of snapshots < N
without re-clustering the whole archive).

Reference analogue: the reference's search mode probes QUERY points
against a pre-built corpus bucket table rather than self-joining the
corpus (MapReduce-LSH/.../lsh/searcher/SearchMapper.java:268-311,
bucket tables built once by LSHTool and reused per query batch); this
operator is that probe shape applied to the dedup graft — corpus bands
are the persisted index side, new-batch bands the probe side.

Scale shape (100 TB corpus + 1 TB monthly batch):

  * The corpus side's (doc_id, band_hash) index is exactly what
    `streaming/dedup_stream` already persists per batch and compacts —
    on a real run pass that persisted index in as `corpus_bands`
    (plus the signature table for verify) instead of recomputing;
    signatures are computed only over the NEW batch: O(batch), not
    O(corpus).
  * The band join shuffles 16-B rows keyed by band_hash; both sides
    are capped per-bucket with the SAME two-path deterministic cap as
    the self-join path (`candidates.cap_hot_buckets`), so a boilerplate
    bucket present in both snapshots cannot produce a quadratic
    candidate blowup.
  * Verification is the gated exact-Jaccard payload join
    (`verify.verify_pairs`) over the union of both sides' shingle
    payloads, semi-join-pruned to docs that actually appear in a
    candidate pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from distributed_lsh_spark.conf import DedupConfig, DEFAULT_CONFIG
from distributed_lsh_spark.functions.hashing import band_keys
from distributed_lsh_spark.functions.signature import with_signatures
from distributed_lsh_spark.operators.candidates import cap_hot_buckets
from distributed_lsh_spark.operators.verify import verify_pairs


def dedup_against_corpus(corpus: DataFrame, new: DataFrame,
                         cfg: DedupConfig = DEFAULT_CONFIG,
                         corpus_sigs: DataFrame | None = None,
                         prefilter: str | None = None,
                         bloom_fpp: float = 0.01) -> DataFrame:
    """corpus(doc_id, text) x new(doc_id, text) ->
    (doc_id, dup_of, jaccard): one row per NEW doc that is a near-dup
    (exact Jaccard >= cfg.jaccard_threshold) of at least one corpus doc;
    `dup_of` = the best-matching corpus doc (max jaccard, ties to the
    lowest corpus doc_id).  New docs absent from the result are novel.

    `corpus_sigs`: optionally pass a precomputed corpus signature frame
    (doc_id, shingles, minhash) — e.g. the persisted signature
    checkpoint of the previous run — to skip recomputing the corpus
    side (the whole point of the incremental shape).  doc_id spaces of
    the two inputs must be disjoint.

    `prefilter`: prune the CORPUS band index against the (much smaller)
    new batch's band-hash set BEFORE the 16-B band rows enter the
    shuffle — the dominant cost of probing a monthly batch against a
    10^12-doc archive.  Output is bit-identical for every mode (pruning
    removes whole non-colliding buckets; survivors still pass the exact
    band join and the exact-Jaccard verify — pinned by
    tests/test_snapshot_prefilter.py):

      * None    — plain shuffle band join (both sides move).
      * "semi"  — broadcast LEFT SEMI join against the batch's DISTINCT
        band hashes: all-JVM, exact, best while the batch's distinct
        band-hash set fits a broadcast hash relation (~16 B/key: fine
        to ~10^8 keys).
      * "bloom" — `functions/bloom.py` bitmap at `bloom_fpp`:
        ~9.6 bits/key at 1% — broadcastable at batch sizes whose exact
        key set is not; false positives only waste join probes.
    """
    if corpus_sigs is None:
        corpus_sigs = with_signatures(
            corpus.select("doc_id", "text"), cfg)
    corpus_sigs = corpus_sigs.select("doc_id", "shingles", "minhash") \
                             .persist()
    new_sigs = with_signatures(new.select("doc_id", "text"), cfg) \
        .select("doc_id", "shingles", "minhash").persist()

    bands_c = band_keys(corpus_sigs, cfg).select("doc_id", "band_hash")
    # probed caps only pay off when the prefilter branch reuses the
    # persisted bands (the routing job doubles as its materialization);
    # on the plain path the inline one-plan cap folds into the band join
    # (A/B: plain 2.58 -> 1.84 s inline, bloom 3.0 -> 2.2 s probed)
    bands_n = cap_hot_buckets(
        band_keys(new_sigs, cfg).select("doc_id", "band_hash"),
        cfg.hot_band_cap, probe=prefilter is not None)

    if prefilter is not None:
        # the capped batch bands feed BOTH the filter build and the band
        # join — pin them once (round-2 lesson: a self-referenced subplan
        # re-executes per consumer); lazy persist, not an RDD-converting
        # localCheckpoint (which executes the subplan eagerly under AQE)
        bands_n = bands_n.persist()
        if prefilter == "semi":
            probe_keys = bands_n.select("band_hash").distinct()
            bands_c = bands_c.join(F.broadcast(probe_keys), "band_hash",
                                   "left_semi")
        elif prefilter == "bloom":
            from distributed_lsh_spark.functions.bloom import (
                bloom_filter_col, bloom_parameters, build_bloom)

            keys = bands_n.select("band_hash").distinct() \
                .persist()   # the count right below materializes it
            n_bits, n_hashes = bloom_parameters(keys.count(), bloom_fpp)
            bloom = build_bloom(keys, "band_hash", n_bits, n_hashes)
            bands_c = bloom_filter_col(bands_c, "band_hash", bloom, n_hashes)
        else:
            raise ValueError(f"unknown prefilter {prefilter!r}")

    bands_c = cap_hot_buckets(bands_c, cfg.hot_band_cap,
                              probe=prefilter is not None)

    cand = (bands_c.select(F.col("doc_id").alias("id_a"), "band_hash")
            .join(bands_n.select(F.col("doc_id").alias("id_b"), "band_hash"),
                  "band_hash")
            .select("id_a", "id_b")
            .dropDuplicates(["id_a", "id_b"]))

    payload = corpus_sigs.select("doc_id", "shingles") \
        .unionByName(new_sigs.select("doc_id", "shingles"))
    verified = verify_pairs(cand, payload, cfg)

    # per new doc: best corpus match — argmax jaccard, ties to lowest
    # corpus id.  max(struct) is map-side combinable: hot new docs (a
    # doc duplicated across the whole corpus) collapse before the
    # shuffle.
    best = (verified
            .groupBy(F.col("id_b").alias("doc_id"))
            .agg(F.max(F.struct(F.col("jaccard"),
                                (-F.col("id_a")).alias("_neg_a"))).alias("_w"))
            .select("doc_id", (-F.col("_w._neg_a")).alias("dup_of"),
                    F.col("_w.jaccard").alias("jaccard")))
    return best


def retract_components(labels: DataFrame, edges: DataFrame,
                       deleted: DataFrame,
                       driver_max_edges: int | None = None) -> DataFrame:
    """Remove a set of docs from an existing min-id cluster labeling and
    EXACTLY re-split the affected components — the takedown/GDPR
    direction of cluster maintenance.  `incremental_components` handles
    the merge direction (new edges only ever merge components, so a
    monotone label algebra suffices); a deletion can SPLIT a component,
    which no monotone algebra can express, so the affected components
    are re-solved from the archived edge set (the `candidate edges`
    checkpoint the north-rule resume contract already persists).

    labels(doc_id, cluster_id): the archive labeling, cluster_id = min
    doc_id of the component (the `connected_components` invariant).
    edges(id_a, id_b): the verified near-dup edge archive that produced
    `labels`.  deleted(doc_id): docs to retract (ids absent from
    `labels` are no-ops).

    Returns the updated labeling over every SURVIVING previously-
    labeled doc.  Unlike `connected_components`, survivors whose last
    edge died keep a row with cluster_id = their own doc_id — callers
    need that row to learn the doc's cluster dissolved.

    Exactness: components are vertex-disjoint, so deleting docs can
    only change the components that contain one; those are recomputed
    from scratch on their remaining subgraph, and every untouched
    component keeps its label (its min member cannot have been deleted
    because it contains no deleted doc).  Pinned against full recompute
    by tests/test_retract.py, driver and distributed CC paths.

    Scale shape (10^12-doc archive, batch-sized takedown list): the
    label frame is touched by one broadcast semi-join (find affected
    cluster ids), one broadcast anti/semi pair (split untouched vs
    affected members); the edge archive by ONE semi-join against the
    affected members (AQE broadcasts the typically-tiny member set), so
    only the affected components' edges enter the CC recompute —
    O(affected), not O(archive).
    """
    from distributed_lsh_spark.operators.connected_components import (
        DRIVER_CC_MAX_EDGES, connected_components)

    if driver_max_edges is None:
        driver_max_edges = DRIVER_CC_MAX_EDGES
    d = deleted.select(F.col("doc_id").cast("long").alias("doc_id")) \
        .distinct().persist()   # feeds several broadcast builds
    affected = (labels.join(F.broadcast(d), "doc_id", "left_semi")
                .select("cluster_id").distinct()
                .persist())   # 2 consumers
    untouched = labels.join(F.broadcast(affected), "cluster_id",
                            "left_anti").select("doc_id", "cluster_id")
    members = (labels.join(F.broadcast(affected), "cluster_id",
                           "left_semi")
               .select("doc_id").persist())   # 2 consumers
    survivors = members.join(F.broadcast(d), "doc_id", "left_anti")
    # both endpoints of an archived edge share a component, so ONE
    # endpoint semi-join prunes the archive to the affected components
    e_aff = (edges.select(F.col("id_a").cast("long").alias("id_a"),
                          F.col("id_b").cast("long").alias("id_b"))
             .join(members.select(F.col("doc_id").alias("id_a")),
                   "id_a", "left_semi"))
    e_rem = (e_aff
             .join(F.broadcast(d.select(F.col("doc_id").alias("id_a"))),
                   "id_a", "left_anti")
             .join(F.broadcast(d.select(F.col("doc_id").alias("id_b"))),
                   "id_b", "left_anti"))
    cc = connected_components(e_rem, driver_max_edges=driver_max_edges)
    relabeled = (survivors
                 .join(cc, "doc_id", "left")
                 .select("doc_id",
                         F.coalesce("cluster_id", F.col("doc_id"))
                          .alias("cluster_id")))
    return untouched.unionByName(relabeled)


def incremental_components(labels: DataFrame, new_edges: DataFrame,
                           driver_max_edges: int | None = None) -> DataFrame:
    """Merge a new batch's near-dup edges into an existing min-id
    cluster labeling WITHOUT re-clustering the archive — the cluster-
    maintenance step after `dedup_against_corpus` finds this month's
    duplicate edges against a 10^12-doc archive.

    labels(doc_id, cluster_id): the archive labeling, cluster_id = min
    doc_id of the component (the `connected_components` invariant —
    REQUIRED, it is what makes contraction exact).  new_edges(id_a,
    id_b): edges among new docs and new<->archive docs (archive<->
    archive edges are allowed too, e.g. from a threshold change).  New
    doc_ids must not collide with archive doc_ids.

    Returns the UPDATED full labeling: every previously-labeled doc plus
    every doc appearing in new_edges.  Exactness: each archive endpoint
    is contracted to its component's representative; since every
    original id >= its rep, the min over a merged component of all
    original ids equals the min over (participating reps + new ids) —
    so running CC on the contracted graph and re-expanding reproduces
    the from-scratch labeling exactly (pinned by
    tests/test_snapshot_incremental.py against full recompute).

    Scale shape (100 TB archive + 1 TB batch): the archive frame is
    touched by exactly TWO map-side broadcast-hash passes (rep lookup
    for the batch's endpoints; final relabel through the merged-rep
    map) — it never shuffles and never feeds CC; the CC loop runs on
    the contracted graph, O(new edges) nodes.  Both broadcast sides are
    batch-sized (endpoint ids; reps whose label changed).
    """
    from distributed_lsh_spark.operators.connected_components import (
        DRIVER_CC_MAX_EDGES, connected_components)

    if driver_max_edges is None:
        driver_max_edges = DRIVER_CC_MAX_EDGES
    e = (new_edges.select(F.col("id_a").cast("long").alias("id_a"),
                          F.col("id_b").cast("long").alias("id_b"))
         .where(F.col("id_a") != F.col("id_b"))
         .distinct()
         .localCheckpoint(eager=False))
    if e.isEmpty():          # e is batch-scale; a no-edge batch is a no-op
        return labels.select("doc_id", "cluster_id")
    ends = (e.select(F.col("id_a").alias("doc_id"))
            .union(e.select(F.col("id_b").alias("doc_id")))
            .distinct())
    # archive touched once: broadcast semi-prune to the batch's endpoints
    rep = (labels.join(F.broadcast(ends), "doc_id")
           .select("doc_id", F.col("cluster_id").alias("rep"))
           .localCheckpoint(eager=False))
    ra = rep.select(F.col("doc_id").alias("id_a"), F.col("rep").alias("rep_a"))
    rb = rep.select(F.col("doc_id").alias("id_b"), F.col("rep").alias("rep_b"))
    contracted = (e.join(F.broadcast(ra), "id_a", "left")
                   .join(F.broadcast(rb), "id_b", "left")
                   .select(F.coalesce("rep_a", F.col("id_a")).alias("id_a"),
                           F.coalesce("rep_b", F.col("id_b")).alias("id_b")))
    cc = connected_components(contracted, driver_max_edges=driver_max_edges) \
        .localCheckpoint(eager=False)

    rep_set = rep.select(F.col("rep").alias("doc_id")).distinct()
    # reps whose component merged into a lower-id one
    moved = (cc.join(rep_set, "doc_id")
               .where(F.col("cluster_id") != F.col("doc_id"))
               .select(F.col("doc_id").alias("old_rep"),
                       F.col("cluster_id").alias("new_label")))
    relabeled = (labels.join(F.broadcast(moved),
                             labels.cluster_id == moved.old_rep, "left")
                 .select(labels.doc_id,
                         F.coalesce("new_label", labels.cluster_id)
                          .alias("cluster_id")))
    # cc nodes are exactly {rep values} U {non-archive endpoint ids}
    # (contraction replaced every archive endpoint by its rep), so the
    # fresh side is the anti-join against the SMALL rep-value set — an
    # anti-join against the archive labels would both shuffle the
    # archive and misclassify reps that are not themselves endpoints
    fresh = (cc.join(F.broadcast(rep_set), "doc_id", "left_anti")
               .select("doc_id", "cluster_id"))
    return relabeled.unionByName(fresh)
