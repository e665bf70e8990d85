"""Count Spark jobs + wall time per headline query (guide §1/§7)."""
import sys, time
sys.path.insert(0, "/root/repo")
from distributed_lsh_spark.session import get_spark
from distributed_lsh_spark.entry_queries import QUERIES

SF = "/root/testdata/sf0.1"
spark = get_spark(app_name="profile_jobs", cores=32, shuffle_partitions=12)
sc = spark.sparkContext

QUERY_LIST = sys.argv[1:] or [
    "minhash_lsh_dup_pairs", "dedup_clusters", "cluster_audit",
    "dedup_funnel", "dedup_funnel_dsir", "dedup_funnel_contained",
    "ann_topk", "dedup_against_bloom", "soft_dedup_weights",
    "cluster_representatives", "cluster_safe_split",
    "pair_similarity_histogram", "dsir_select", "perplexity_buckets",
    "filter_agreement", "link_pagerank", "dedup_against_corpus",
    "pair_diagnostics", "tokenizer_fertility", "redirect_chains",
    "cluster_retraction", "ngram_novelty", "bloom_line_dedup",
]

# warm
QUERIES["minhash_lsh_dup_pairs"](spark, "/root/testdata/sf0.001").count()

def n_jobs():
    return sc._jsc.sc().statusTracker().getJobIdsForGroup(None).__len__()

for name in QUERY_LIST:
    best = 1e9; bj = 0
    for rep in range(2):
        spark.catalog.clearCache()
        j0 = n_jobs()
        t0 = time.perf_counter()
        QUERIES[name](spark, SF).count()
        dt = time.perf_counter() - t0
        j1 = n_jobs()
        if dt < best:
            best, bj = dt, j1 - j0
    print(f"{best:8.3f}s  {bj:3d} jobs  {name}", flush=True)
spark.stop()
