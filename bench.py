"""Benchmark harness — run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print a
compact JSON summary line (first AND last, so bounded head/tail capture
windows always see a complete object):
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
plus one full-detail line (`"detail": true`) with every per-query second.

`value` is total wall-clock over the headline queries (lower is better);
the compact `queries` carries the flagship dedup legs; extra context keys
(docs/sec dedup throughput, OPH recall) ride along for BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from distributed_lsh_spark.session import get_spark
    from distributed_lsh_spark.entry_queries import QUERIES

    headline = [
        "minhash_lsh_dup_pairs",
        "dedup_clusters",
        "cluster_audit",
        "ngram_jaccard_dup_pairs",
        "containment_dup_pairs",
        "exact_dup_groups",
        "simhash_hamming_pairs",
        "substring_dup_pairs",
        "ann_topk",
        "html_extract",
        "doc_quality",
        "embedding_topk",
        "pricing_summary",
        "top_unshipped_orders",
        "events_hourly",
        "user_sessions",
        "decontam_filter",
        "word_blocklist_filter",
        "filter_agreement",
        "tokenizer_fertility",
        "line_dedup",
        "line_dedup_keep_first",
        "bloom_line_dedup",
        "c4_line_filter",
        "bpe_merge_learn",
        "bpe_encode",
        "fuzzy_exact_dup_groups",
        "host_boilerplate",
        "gopher_quality",
        "gopher_repetition",
        "url_latest_dedup",
        "dedup_funnel",
        "dedup_funnel_contained",
        "dedup_funnel_dsir",
        "token_rarity",
        "domain_stats",
        "semantic_dedup",
        "kmeans_topics",
        "warc_extract",
        "url_canonical_dedup",
        "canonical_link_dedup",
        "pub_date_extract",
        "hreflang_pairs",
        "redirect_chains",
        "registrable_domains",
        "jsonld_types",
        "soft404_filter",
        "cdx_index",
        "sitemap_urls",
        "web_doc_records",
        "stratified_sample",
        "link_pagerank",
        "anchor_texts",
        "unicode_nfc_dedup",
        "cluster_representatives",
        "dedup_against_corpus",
        "dedup_against_bloom",
        "incremental_clusters",
        "pack_sequences",
        "doc_chunking",
        "blocklist_filter",
        "soft_dedup_weights",
        "cluster_safe_split",
        "temperature_mixture",
        "bigram_lm_quality",
        "quality_classifier",
        "dsir_weights",
        "dsir_select",
        "substring_removal",
        "mirror_hosts",
        "reservoir_sample",
        "corpus_profile",
        "pair_similarity_histogram",
        "pair_diagnostics",
        "export_shards",
        "ngram_novelty",
        "perplexity_buckets",
        "host_token_budget",
        "events_asof_join",
        "cluster_retraction",
        "vocab_hll",
        "source_overlap_hll",
        "cms_term_counts",
        "length_quantiles",
        "encoding_quality",
        "noindex_filter",
        "robots_filter",
        "main_content_extract",
        "url_change_stats",
        "tfidf_terms",
        "line_lang_segments",
        "corpus_drift",
    ]

    spark = get_spark(app_name="bench", cores=cores, shuffle_partitions=cores)
    # Warm the JVM / whole-stage-codegen / shuffle paths with a full pipeline
    # pass at the smallest sf, so timed numbers are steady-state (BASELINE.md:
    # "measured on steady-state stage time excluding session startup").
    # Each distinct plan shape pays its own first-run JIT — warm the three
    # hash-chain shapes, not just the minhash pipeline.
    for warm in ("minhash_lsh_dup_pairs", "simhash_hamming_pairs",
                 "substring_dup_pairs"):
        QUERIES[warm](spark, "/root/testdata/sf0.001").count()

    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    # Right-size the shuffle width to the corpus (SCALE.md's own rule):
    # 32 shuffle partitions over a 5k-doc sf0.1 corpus is pure task-
    # scheduling overhead in the deep CC/join chains (measured: clusters
    # 8.0s -> 5.8s at 12).  AQE still coalesces below this; large corpora
    # keep the full width.
    sp = max(8, min(cores, n_docs // 400))
    spark.conf.set("spark.sql.shuffle.partitions", str(sp))

    # best-of-2 per query: this host shows 1.3-1.6x run-to-run swings from
    # external load (BENCH/BASELINE.md); the faster repetition is the
    # least-noise-inflated steady-state estimate.
    times: dict[str, float] = {}
    for name in headline:
        fn = QUERIES[name]
        best = float("inf")
        for _ in range(2):
            # cold cache each repetition: Spark's CacheManager dedupes by
            # canonicalized plan, so a persisted stage from rep 1 would
            # otherwise serve rep 2 and the min would measure a cache hit
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            # count() forces full execution without driver-side result transfer
            fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        times[name] = round(best, 3)

    total = round(sum(times.values()), 3)
    dedup_sec = times["minhash_lsh_dup_pairs"] + times["dedup_clusters"]
    docs_per_sec = round(2 * n_docs / dedup_sec, 1) if dedup_sec else None

    # OPH leg: the at-scale signature scheme (one-permutation hashing with
    # rotation densification — SCALE.md's ~15x signature-kernel lever) run
    # on the same dedup queries, with pair-set recall vs the gate-pinned
    # kxl scheme recorded so the speed never silently trades correctness.
    from dataclasses import replace

    from distributed_lsh_spark import entry_queries as eq

    kxl_pairs = {(r["id_a"], r["id_b"])
                 for r in QUERIES["minhash_lsh_dup_pairs"](spark, sf_dir)
                 .collect()}
    oph_times: dict[str, float] = {}
    old_cfg = eq.CFG
    eq.CFG = replace(old_cfg, minhash_scheme="oph")
    try:
        QUERIES["minhash_lsh_dup_pairs"](spark, "/root/testdata/sf0.001").count()
        for name in ("minhash_lsh_dup_pairs", "dedup_clusters"):
            best = float("inf")
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                QUERIES[name](spark, sf_dir).count()
                best = min(best, time.perf_counter() - t0)
            oph_times[name] = round(best, 3)
        oph_pairs = {(r["id_a"], r["id_b"])
                     for r in QUERIES["minhash_lsh_dup_pairs"](spark, sf_dir)
                     .collect()}
    finally:
        eq.CFG = old_cfg
    oph_dedup_sec = sum(oph_times.values())
    oph = {
        "queries": oph_times,
        "dedup_docs_per_sec": round(2 * n_docs / oph_dedup_sec, 1)
        if oph_dedup_sec else None,
        "pairs_kxl": len(kxl_pairs),
        "pairs_oph": len(oph_pairs),
        "pair_recall_vs_kxl": round(len(oph_pairs & kxl_pairs)
                                    / len(kxl_pairs), 6) if kxl_pairs else None,
    }

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf

    # The driver records a bounded window of stdout (BENCH_r04 failed to
    # parse when the single line with all per-query timings outgrew it).
    # Emit a COMPACT summary line FIRST and repeat it LAST, with the full
    # per-query detail line in between: whichever line a bounded head/tail
    # parser lands on is complete, parseable, and carries the headline
    # metric.  The compact `queries` map holds the flagship dedup legs;
    # the middle line (`detail: true`) carries every timed query.
    flagship = ["minhash_lsh_dup_pairs", "dedup_clusters", "cluster_audit",
                "simhash_hamming_pairs", "substring_dup_pairs",
                "ngram_jaccard_dup_pairs", "containment_dup_pairs",
                "exact_dup_groups", "ann_topk", "line_dedup"]
    summary = json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": {k: times[k] for k in flagship if k in times},
        "n_queries_timed": len(times),
        "sf": sf_val,
        "cores": cores,
        "n_docs": n_docs,
        "dedup_docs_per_sec": docs_per_sec,
        "oph_docs_per_sec": oph["dedup_docs_per_sec"],
        "oph_pair_recall_vs_kxl": oph["pair_recall_vs_kxl"],
    })
    print(summary)
    print(json.dumps({
        "detail": True,
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf_val,
        "cores": cores,
        "n_docs": n_docs,
        "dedup_docs_per_sec": docs_per_sec,
        "oph": oph,
    }))
    print(summary)
    spark.stop()


if __name__ == "__main__":
    main()
