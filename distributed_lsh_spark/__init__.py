"""distributed_lsh_spark — a PySpark-native near-duplicate detection and
clustering engine.

A from-scratch re-expression of the capabilities of zbweng/Distributed-LSH
(a Hadoop-1.0.4 MapReduce implementation of distributed LSH for c-k-ANN over
dense integer vectors) as an idiomatic Spark DataFrame pipeline targeted at
web-scale text dedup:

    pages -> text -> shingles -> {MinHash, SimHash} -> band keys
          -> candidate pairs -> exact verify (Jaccard / Hamming)
          -> connected components -> cluster labels

Everything is DataFrame/SQL-first: Catalyst handles pushdown, pruning and
join strategy; Python appears only inside Arrow-vectorized pandas UDFs
(never per-row), and most of the hot path is pure JVM expressions
(higher-order functions + xxhash64) with whole-stage codegen.

Reference semantics preserved (citations are to /root/reference/):
  * LSH family = AND of r rows OR'ed over b bands, the MinHash analogue of
    the reference's (AND of m projections) x (OR of L tables)
    (MapReduce-LSH/.../common/LSH.java:117-131).
  * Candidate generation by key-equality collision, then *exact*
    verification (MapReduce-LSH/.../lsh/searcher/SearchMapper.java:107-126).
  * Dedup-before-verify (SearchMapper.java:100-106) and per-key work caps
    against skew (searchThreshold, SearchMapper.java:266,340-353).
  * Iterate-with-remaining-set driver loops with persisted intermediate
    state (Naive-DLSH/.../lsh/searcher/LSHSearcher.java:212-252) ->
    checkpointed DataFrames + anti-join resume.
"""

from distributed_lsh_spark.conf import DedupConfig, DEFAULT_CONFIG

__all__ = ["DedupConfig", "DEFAULT_CONFIG"]
__version__ = "0.1.0"
