"""Tiered dedup funnel: the standard web-curation cascade run as ORDERED
tiers, each consuming only the previous tier's survivors, with per-tier
survivor metrics — the composed form a production Common-Crawl curation
run executes (the "tier dedup" shape):

  0. input            raw crawl pages
  1. url_latest       keep the newest snapshot per url (crawl dedup)
  2. exact            byte-identical collapse, md5(text) keep-min-doc_id
  3. quality          document quality gate (caller-supplied keep rule)
  4. near_dup         MinHash-LSH near-dup clusters, keep the cluster
                      representative (min doc_id in component)
  5. containment      OPTIONAL (`drop_contained=tau`): drop docs whose
                      shingle set sits >= tau inside a partner's — the
                      asymmetric doc-in-doc pairs tier 4's Jaccard-LSH
                      structurally misses (operators/containment.py)

Tier ORDER is the cost argument, not a correctness choice: each tier is
cheaper per-row than the next (16-40 B projection groupBys < codegen
scan < LSH band self-join), so running them as a funnel means the
expensive stages only ever see the cheap stages' survivors.  At Common-Crawl ratios the
url tier alone removes most bytes (recrawls), so the LSH stage — the
only shuffle-heavy one — runs on a small fraction of the input.

Each tier reuses the standalone operator the catalog already gates
(`url_latest_dedup`, `exact_dup_groups` / pipeline.exact_collapse,
`doc_quality` keep rule, `dedup_clusters`); this module only supplies
the composition, the per-tier metrics frame, and optional per-tier
checkpointing (resume mid-funnel via sources/checkpoint.py — the
north_rule's "resumable from checkpoint with per-partition lineage +
metrics", applied to the whole cascade).

Streaming twins: every funnel tier has a streaming counterpart — url
tier: `streaming/stateful.stateful_url_latest` (running keep-latest in
the state store); exact tier: `streaming/stateful.stateful_exact_dedup`;
quality tier: a stateless map on any stream; near-dup tier:
`streaming/dedup_stream.incremental_dedup_stream` — composed in
`streaming/ingest.py` (exact -> near-dup ordering, the same as tiers
2->4 here).

Reference analogue: the reference chains its MapReduce jobs the same way
(hash build -> bucket join -> verify), persisting each stage's output
dir before the next job starts (Naive-DLSH/.../lsh/searcher/
LSHSearcher.java:327-352); the funnel is that chaining generalized to
the web-curation tier set.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from distributed_lsh_spark.conf import DedupConfig, DEFAULT_CONFIG
from distributed_lsh_spark.pipeline import run_dedup

TIER_NAMES = ("input", "url_latest", "exact", "quality", "near_dup",
              "containment")


def select_representatives(clusters: DataFrame, ranked: DataFrame,
                           rank_cols: list[str]) -> DataFrame:
    """clusters(doc_id, cluster_id) x ranked(doc_id, <rank_cols...>) ->
    (cluster_id, cluster_size, rep_doc, <rep rank_cols...>): one row per
    cluster, rep = the member maximizing the rank tuple lexicographically,
    ties to the LOWEST doc_id.

    This is the survivor POLICY stage of a curation run: instead of the
    arbitrary min-doc_id representative, keep the best-quality member of
    every near-dup cluster (rank_cols = e.g. the gated integer quality
    counts).  Rank columns must be integer-typed so the argmax is
    bit-exact across engines.

    Scale shape: one groupBy over (doc_id, cluster_id, ranks) projections;
    max(struct(...)) is map-side combinable, so a mega-cluster (the
    boilerplate component) collapses to one row per map task before the
    shuffle — no window sort over cluster members.
    """
    joined = clusters.join(ranked, "doc_id")
    rank_struct = F.struct(*[F.col(c) for c in rank_cols],
                           (-F.col("doc_id")).alias("_neg_id"))
    agg = (joined.groupBy("cluster_id")
           .agg(F.count("*").alias("cluster_size"),
                F.max(rank_struct).alias("_w")))
    return agg.select(
        "cluster_id", "cluster_size",
        (-F.col("_w._neg_id")).alias("rep_doc"),
        *[F.col(f"_w.{c}").alias(f"rep_{c}") for c in rank_cols])


@dataclass
class FunnelResult:
    survivors: DataFrame            # final tier's (doc_id, text, ...) frame
    tiers: dict[str, DataFrame]     # tier name -> that tier's survivor frame
    metrics: DataFrame              # tier_no, tier, docs_in, docs_out, docs_removed


def curation_funnel(pages: DataFrame, cfg: DedupConfig = DEFAULT_CONFIG, *,
                    url_col: str = "url", ts_col: str = "warc_epoch",
                    quality_keep: Column | None = None,
                    rep_rank: dict[str, Column] | None = None,
                    drop_contained: float | None = None,
                    fuzzy_exact: bool = False,
                    ckpt=None) -> FunnelResult:
    """Run the 4-tier dedup funnel over `pages(doc_id, text[, url, ts])`.

    - The url tier runs only when `url_col` is present (a corpus without
      crawl metadata starts at the exact tier).  NULL crawl timestamps
      sort below every real one inside `max(struct(ts, doc_id))` (Spark
      orders NULL struct fields first ascending), i.e. a NULL-ts snapshot
      only wins a url group whose every snapshot is NULL-ts — coalesce
      upstream if different semantics are wanted.
    - `quality_keep`: boolean Column over the page row (e.g. the gated
      doc_quality keep rule); None skips the tier (keeps the row count).
    - `drop_contained`: optional containment threshold; when set, a fifth
      tier drops the contained side of every asymmetric containment pair
      among the near-dup survivors (see the tier comment below).
    - `rep_rank`: optional {name: integer Column over the page row}
      survivor policy for the near-dup tier — keep each cluster's member
      maximizing the rank tuple lexicographically (ties to lowest
      doc_id) instead of the default min-doc_id representative
      (`select_representatives`).  Columns must be integer-typed so the
      argmax is deterministic.
    - `ckpt`: optional sources.checkpoint.CheckpointManager.  With it,
      every tier AFTER the raw input materializes through
      `ckpt.stage("funnel_<tier>", ...)` (Parquet/Iceberg + manifest +
      per-partition lineage counters), so a killed run resumes at the
      first incomplete tier and the tier metrics counts come from the
      committed manifests (the input row costs one column-pruned
      count()).
      Without it, tiers persist in memory and the metrics frame computes
      every count in ONE action (union of aggregates over the persisted
      tiers).

    Scale shape (100 TB): tiers 1-2 are map-side-combining groupBys over
    (url, ts, doc_id) / (md5, doc_id) projections + doc_id semi-joins —
    full page rows are never window-sorted and hot urls / hot hashes
    collapse before their shuffle; tier 3 is a codegen scan; tier 4 is
    the gated LSH plan (bucketed band self-join + capped hot keys +
    small-star/large-star CC) running only on tiers 1-3's survivors.  No
    tier collects rows to the driver; the metrics frame is 5 rows.
    """
    has_url = url_col in pages.columns

    def checkpointed(name: str, df_or_thunk) -> DataFrame:
        if ckpt is not None:
            return ckpt.stage(f"funnel_{name}",
                              (df_or_thunk if callable(df_or_thunk)
                               else (lambda: df_or_thunk)))
        df = df_or_thunk() if callable(df_or_thunk) else df_or_thunk
        return df.persist()

    tiers: dict[str, DataFrame] = {}
    # the raw input is NEVER checkpointed — staging it would write a full
    # copy of the crawl before any reduction; tier 1 reads it straight
    # from the source (its metrics count comes from one count() in ckpt
    # mode, a column-pruned metadata-cheap scan)
    cur = pages if ckpt is not None else pages.persist()
    tiers["input"] = cur

    # Tiers 1-2 compute their keep-set on a PROJECTION and semi-join the
    # ids back, never windowing the full page rows: a window partitioned
    # by url/md5 would shuffle AND sort every page byte (html included at
    # production shape) and a hot url (the canonical skew key) would sort
    # its whole snapshot family in one task.  max/min over the projection
    # are map-side combinable, so hot keys collapse BEFORE the shuffle —
    # the same argument as pipeline.exact_collapse — and both semi-joins
    # hash-partition pages by doc_id, a partitioning Catalyst reuses
    # across the consecutive tiers.
    if has_url:
        keep_latest = (cur.select(url_col, ts_col, "doc_id")
                       .groupBy(url_col)
                       .agg(F.max(F.struct(F.col(ts_col),
                                           F.col("doc_id"))).alias("_w"))
                       .select(F.col("_w.doc_id").alias("doc_id")))
        cur = checkpointed("url_latest",
                           cur.join(keep_latest, "doc_id", "left_semi"))
        tiers["url_latest"] = cur

    # exact tier: keep-min-doc_id per md5(text), hash/id projection only.
    # fuzzy_exact keys by the NORMALIZED token stream instead (the gated
    # fuzzy_exact_dup_groups rule): case/punct/spacing variants collapse
    # too — same plan, the key is one extra codegen regexp in the scan.
    if fuzzy_exact:
        from distributed_lsh_spark.functions.text import token_stream
        exact_key = F.md5(token_stream("text").cast("binary"))
    else:
        exact_key = F.md5(F.col("text").cast("binary"))
    keep_rep = (cur.select(exact_key.alias("_h"), "doc_id")
                .groupBy("_h").agg(F.min("doc_id").alias("doc_id"))
                .select("doc_id"))
    cur = checkpointed("exact", cur.join(keep_rep, "doc_id", "left_semi"))
    tiers["exact"] = cur

    if quality_keep is not None:
        cur = checkpointed("quality", cur.where(quality_keep))
        tiers["quality"] = cur

    # near-dup tier: LSH clusters over the survivors; drop every
    # non-representative member (cluster_id = min doc_id in component).
    # exact_first=False: tier 2 already collapsed byte-identical texts.
    prev = cur
    # the dedup stages computed here are stashed for the optional
    # containment tier: its shingle sets are byte-identical per doc to
    # the near-dup tier's (shingling does not depend on the minhash
    # scheme), so re-running the signature UDF pass over the survivors
    # would recompute data the persisted signature cache already holds
    nd_state: dict[str, DataFrame] = {}

    def build_near_dup() -> DataFrame:
        from distributed_lsh_spark.operators.connected_components import (
            connected_components,
        )
        # probe_partitions=False: prev went through the url/exact tier
        # shuffles, so its width is the session shuffle width — always
        # below the 3x-parallelism target.  Probing would EXECUTE the
        # whole tier chain once (AQE runs shuffle stages at
        # RDD-conversion time) just to confirm that.
        from distributed_lsh_spark.pipeline import build_stages
        st = build_stages(prev, cfg, persist=True, probe_partitions=False)
        clusters = connected_components(
            st.verified.select("id_a", "id_b"))
        nd_state["docs"] = st.docs
        if rep_rank is None:
            non_reps = (clusters
                        .where(F.col("doc_id") != F.col("cluster_id"))
                        .select("doc_id"))
        else:
            ranked = prev.select(
                "doc_id", *[c.alias(n) for n, c in rep_rank.items()])
            reps = (select_representatives(clusters, ranked,
                                           list(rep_rank.keys()))
                    .select(F.col("rep_doc").alias("doc_id")))
            non_reps = clusters.select("doc_id") \
                               .join(reps, "doc_id", "left_anti")
        nd_state["non_reps"] = non_reps
        return prev.join(non_reps, "doc_id", "left_anti")

    cur = checkpointed("near_dup", build_near_dup)
    tiers["near_dup"] = cur

    if drop_contained is not None:
        # optional fifth tier: asymmetric containment dedup over the
        # near-dup survivors — drops each doc whose shingle set sits
        # >= drop_contained inside a partner's (the doc-in-doc pairs whose
        # Jaccard the near-dup tier's LSH structurally cannot see; pairs
        # >= the Jaccard threshold are ALREADY gone, so everything found
        # here is in the Jaccard-missed class).  Policy: keep the
        # CONTAINER (the doc with more distinct shingles — its text
        # carries the pair's content); mutual-containment ties keep the
        # higher id (the operator labels the lower id contained).  Runs
        # last because its inverted-index self-join is the costliest
        # per-row tier — it only ever sees the fully-reduced survivor
        # set.  Shingles are recomputed with a 1-perm OPH config (the
        # minhash column is discarded; the pass costs tokenize+shingle).
        import dataclasses

        from distributed_lsh_spark.functions.signature import with_signatures
        from distributed_lsh_spark.operators.containment import (
            containment_pairs,
        )

        prev2 = cur

        def build_containment() -> DataFrame:
            if "docs" in nd_state:
                # reuse the near-dup tier's persisted shingle sets (they
                # are a per-doc function of the text, identical across
                # minhash configs); the survivors are prev anti non_reps,
                # so the same anti-join restricts the signature frame —
                # no second tokenize+shingle pass over the corpus
                docs = (nd_state["docs"].select("doc_id", "shingles")
                        .join(nd_state["non_reps"], "doc_id", "left_anti"))
            else:
                # checkpoint-resume path: the near-dup stage was read back
                # from its manifest, so the signature frame was never
                # built this run — recompute shingles for the survivors
                shingle_cfg = dataclasses.replace(
                    cfg, minhash_scheme="oph", num_perm=1,
                    num_bands=1, rows_per_band=1)
                docs = with_signatures(prev2.select("doc_id", "text"),
                                       shingle_cfg)
            pairs = containment_pairs(docs, tau=drop_contained,
                                      df_cap=cfg.hot_band_cap)
            drops = pairs.select(F.col("contained_id").alias("doc_id")) \
                         .distinct()
            return prev2.join(drops, "doc_id", "left_anti")

        cur = checkpointed("containment", build_containment)
        tiers["containment"] = cur

    return FunnelResult(survivors=cur, tiers=tiers,
                        metrics=_metrics(tiers, ckpt))


def _metrics(tiers: dict[str, DataFrame], ckpt) -> DataFrame:
    """One (tier_no, tier, docs_in, docs_out, docs_removed) row per tier.

    Checkpointed runs read row counts from the committed stage manifests
    (driver ints, no job); in-memory runs union one count-aggregate per
    persisted tier — a single action computes the whole frame."""
    order = [n for n in TIER_NAMES if n in tiers]
    some_df = next(iter(tiers.values()))
    spark = some_df.sparkSession
    if ckpt is not None:
        rows = [(i, n,
                 (tiers[n].select("doc_id").count() if n == "input"
                  else int(ckpt.rows(f"funnel_{n}"))))
                for i, n in enumerate(order)]
        m = spark.createDataFrame(
            rows, "tier_no int, tier string, docs_out long")
    else:
        counts = [tiers[n].agg(F.count(F.lit(1)).alias("docs_out"))
                          .select(F.lit(i).alias("tier_no"),
                                  F.lit(n).alias("tier"), "docs_out")
                  for i, n in enumerate(order)]
        m = counts[0]
        for c in counts[1:]:
            m = m.unionByName(c)
    w = Window.orderBy("tier_no")
    docs_in = F.coalesce(F.lag("docs_out").over(w), F.col("docs_out"))
    return (m.withColumn("docs_in", docs_in)
             .withColumn("docs_removed", F.col("docs_in") - F.col("docs_out"))
             .select("tier_no", "tier", "docs_in", "docs_out", "docs_removed"))
