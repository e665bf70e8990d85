"""df-capped inverted-index ngram dedup: results identical to brute force
under a planted hot shingle, while the capped index bounds the join."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from distributed_lsh_spark.conf import DEFAULT_CONFIG as CFG
from distributed_lsh_spark.functions.signature import with_signatures
from distributed_lsh_spark.operators.ngram import ngram_jaccard_pairs
from distributed_lsh_spark.oracle.dedup import DedupOracle


def _hot_shingle_docs() -> dict[int, str]:
    """30 docs sharing ONE 5-token phrase inside otherwise-unique text
    (the hot inverted-index key), plus a genuine near-dup pair."""
    rng = random.Random(99)
    vocab = [f"v{i:04d}" for i in range(2000)]
    phrase = "common boiler plate phrase here"
    docs = {}
    for d in range(30):
        ctx = [rng.choice(vocab) for _ in range(20)]
        docs[d] = " ".join(ctx[:10]) + " " + phrase + " " + " ".join(ctx[10:])
    base = [rng.choice(vocab) for _ in range(100)]
    near = list(base)
    near[50] = rng.choice(vocab)
    docs[100] = " ".join(base)
    docs[101] = " ".join(near)
    return docs


def test_df_cap_preserves_results_and_bounds_join(spark):
    docs_py = _hot_shingle_docs()
    df = spark.createDataFrame(list(docs_py.items()), "doc_id long, text string")
    docs = with_signatures(df, CFG)

    expect = {(a, b): j for (a, b), j in DedupOracle(CFG, docs_py).exact_pairs().items()}
    assert expect, "fixture must contain a genuine dup pair"

    capped = {(r["id_a"], r["id_b"]): r["jaccard"]
              for r in ngram_jaccard_pairs(docs, CFG, df_cap=5).collect()}
    uncapped = {(r["id_a"], r["id_b"]): r["jaccard"]
                for r in ngram_jaccard_pairs(docs, CFG, df_cap=None).collect()}
    assert set(capped) == set(expect)
    assert set(uncapped) == set(expect)

    # the capped index drops the hot shingle entirely: candidate count
    # collapses from >= C(30,2) to just the genuine pair's candidates
    def candidates(df_cap):
        from pyspark.sql import Window
        shd = docs.select("doc_id", F.explode("shingles").alias("g"))
        if df_cap is not None:
            w = Window.partitionBy("g")
            shd = (shd.withColumn("_df", F.count("*").over(w))
                      .where(F.col("_df") <= df_cap).drop("_df"))
        a, b = shd.alias("a"), shd.alias("b")
        return (a.join(b, "g")
                 .where(F.col("a.doc_id") < F.col("b.doc_id"))
                 .select(F.col("a.doc_id").alias("id_a"),
                         F.col("b.doc_id").alias("id_b"))
                 .dropDuplicates(["id_a", "id_b"]).count())

    n_capped, n_uncapped = candidates(5), candidates(None)
    assert n_uncapped >= 30 * 29 // 2
    assert n_capped < 10
