"""Token-budget sequence packing for training export: concatenate the
corpus into fixed-token-budget bins (the GPT-style "concat and chunk"
packing a pretraining data loader consumes), computed distributively.

Semantics: docs are processed in deterministic (shard, doc_id) order;
each doc's bin is `floor(start_offset / budget)` where start_offset is
the running token count of all earlier docs in its shard — i.e. a doc
belongs to the bin its FIRST token lands in when the shard's docs are
concatenated back-to-back.  All-integer, so the assignment is bit-exact
across engines and partitionings.

Scale shape (100 TB): a single global running sum would serialize on one
task, so packing is per-shard — shard = pmod(doc_id, n_shards), window
partitioned by shard.  Each shard's cumsum sorts only its own docs; with
n_shards sized to the cluster (e.g. 10k shards for 1000 executors) every
task handles corpus/n_shards rows and the whole operator is one shuffle
(hash by shard) + an in-partition sort.  Production data loaders read
one shard per reader worker, which is exactly this layout.

Reference analogue: the reference splits its dataset into numbered
splits and routes work by split index (Naive-DLSH/.../common/
FileGenerator.java's numbered part files); the shard here is the same
numbered-split layout keyed arithmetically instead of by input file.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(df: DataFrame, tokens_col: Column | str,
                   budget: int, n_shards: int,
                   id_col: str = "doc_id") -> DataFrame:
    """docs(doc_id, ...) + a token-count column -> one row per doc:
    (doc_id, shard, bin_id, start_offset, n_tokens).

    `tokens_col` may be a column name or an expression (e.g. the gated
    whitespace-token count); docs with 0 tokens still occupy a row (they
    start where the previous doc ended and contribute nothing).
    """
    tok = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    shard = F.pmod(F.col(id_col), F.lit(n_shards)).cast("int")
    base = df.select(F.col(id_col).alias("doc_id"),
                     shard.alias("shard"),
                     tok.cast("long").alias("n_tokens"))
    w = Window.partitionBy("shard").orderBy("doc_id")
    start = (F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) -
             F.col("n_tokens"))
    # integral `div`, not floor(double /): start offsets past 2^53 would
    # round under double division; div keeps the whole chain in longs
    return (base.withColumn("start_offset", start)
                .withColumn("bin_id",
                            F.expr(f"start_offset div {int(budget)}")))


def pack_summary(packed: DataFrame, budget: int) -> DataFrame:
    """Per-bin manifest a data loader consumes: (shard, bin_id, n_docs,
    bin_tokens, first_doc, last_doc, spills) where `bin_tokens` counts
    tokens of docs STARTING in the bin and `spills` flags a bin whose
    last doc runs past the budget boundary (is chunked into the next
    bin by the loader).  One map-side-combining groupBy."""
    return (packed.groupBy("shard", "bin_id")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_tokens").alias("bin_tokens"),
                 F.min("doc_id").alias("first_doc"),
                 F.max("doc_id").alias("last_doc"),
                 (F.max(F.col("start_offset") + F.col("n_tokens")) >
                  (F.col("bin_id") + 1) * budget).alias("spills")))
