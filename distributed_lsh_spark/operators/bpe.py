"""Distributed BPE tokenizer training — the iterative merge-learning
step of byte-pair encoding (Sennrich et al. 2016), expressed the way a
Spark cluster should run it.

The only corpus-scale job is the word count: one map-side-combinable
groupBy over the normalized token stream (a 100-TB corpus collapses to a
distinct-word frame of ~10^7-10^8 rows — the standard trainer trick; the
original BPE implementation itself operates on a word-frequency
dictionary, not the raw corpus).  Every learning iteration then runs on
that small frame: adjacent symbol pairs via posexplode + a lead() window
partitioned by word, a count-weighted global argmax (ONE driver row per
step — the merge decision is global state every distributed BPE trainer
synchronizes), and the merge applied as a single codegen regexp_replace.

Merge application is greedy leftmost non-overlapping, the BPE contract.
Symbol sequences are stored as double-space-joined strings
('h  e  l  l  o'); a merge of (l, r) pads the sequence with '  ' on both
edges and replaces ' l  r ' -> ' lr ' globally.  Each match consumes one
of the two spaces at each flank, so back-to-back occurrences
('a  a  a  a' under merge (a,a)) still match consecutively — the regex
engine's left-to-right non-overlapping scan IS the BPE merge order, with
no lookahead (portable to RE2, so the DuckDB oracle replays it verbatim).

Lineage is truncated with an eager localCheckpoint per iteration, the
same iterative-algorithm hygiene as the connected-components loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from distributed_lsh_spark.functions.text import token_stream

MERGE_SCHEMA = T.StructType([
    T.StructField("step", T.IntegerType()),
    T.StructField("left", T.StringType()),
    T.StructField("right", T.StringType()),
    T.StructField("merged", T.StringType()),
    T.StructField("pair_count", T.LongType()),
])


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt): distinct normalized tokens with corpus frequencies —
    the one corpus-scale job (wordcount, map-side combine)."""
    return (df.select(F.explode(F.split(token_stream(text_col), " "))
                      .alias("word"))
              .where(F.col("word") != "")
              .groupBy("word").agg(F.count("*").alias("cnt")))


def learn_bpe(spark: SparkSession, words: DataFrame,
              n_merges: int) -> tuple[DataFrame, DataFrame]:
    """Learn `n_merges` BPE merges over a (word, cnt) frame.

    Returns (merges, words_final): the merge table
    (step, left, right, merged, pair_count) — k driver-side rows, one per
    synchronized merge decision — and the word frame with its final
    symbol sequences in `seq`.
    """
    words = words.withColumn(
        "seq", F.trim(F.regexp_replace(F.col("word"), "(.)", "$1  ")))
    words = words.localCheckpoint(eager=True)
    merges: list[tuple] = []
    w = Window.partitionBy("word").orderBy("i")
    for step in range(1, n_merges + 1):
        syms = words.select(
            "word", "cnt",
            F.posexplode(F.split("seq", "  ")).alias("i", "sym"))
        pairs = (syms
                 .withColumn("r", F.lead("sym").over(w))
                 .where(F.col("r").isNotNull())
                 .groupBy(F.col("sym").alias("l"), "r")
                 .agg(F.sum("cnt").alias("c")))
        best = pairs.orderBy(F.col("c").desc(), "l", "r").limit(1).collect()
        if not best:
            break
        left, right, cnt = best[0]["l"], best[0]["r"], int(best[0]["c"])
        merges.append((step, left, right, left + right, cnt))
        # eager=False: the checkpoint materializes inside the NEXT
        # iteration's argmax job (one job per iteration, not two) while
        # still truncating lineage for iteration k+1
        words = (words.withColumn(
                     "seq",
                     F.trim(F.regexp_replace(
                         F.concat(F.lit("  "), F.col("seq"), F.lit("  ")),
                         F.lit(f" {left}  {right} "),
                         f" {left}{right} ")))
                 .localCheckpoint(eager=False))
    return spark.createDataFrame(merges, MERGE_SCHEMA), words
