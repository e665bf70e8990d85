"""Bloom / broadcast-semi prefilters for the incremental snapshot probe
(functions/bloom.py + operators/snapshot.dedup_against_corpus(prefilter=)):
the corpus band index is pruned against the new batch's band hashes
BEFORE the shuffle, and because pruning removes whole non-colliding
buckets and the exact band join + exact-Jaccard verify still run, the
final output must be bit-identical across prefilter modes — which is
exactly what these tests pin."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from distributed_lsh_spark.conf import DEFAULT_CONFIG as CFG
from distributed_lsh_spark.functions.bloom import (bloom_filter_col,
                                                   bloom_parameters,
                                                   build_bloom)
from distributed_lsh_spark.operators.snapshot import dedup_against_corpus


# ------------------------------------------------------------- bloom unit

def test_bloom_parameters_shape():
    n_bits, k = bloom_parameters(10_000, 0.01)
    # ~9.6 bits/key and ~7 hashes at 1% fpp (standard optima)
    assert 9 * 10_000 <= n_bits <= 11 * 10_000
    assert 6 <= k <= 8
    assert n_bits % 64 == 0


def test_bloom_no_false_negatives_and_prunes(spark):
    members = spark.range(0, 2_000).select(
        (F.col("id") * 2_654_435_761).alias("k"))
    n_bits, k = bloom_parameters(2_000, 0.01)
    bloom = build_bloom(members, "k", n_bits, k)

    # every inserted key must pass
    kept = bloom_filter_col(members, "k", bloom, k).count()
    assert kept == 2_000

    # disjoint probe keys: fpp should be near 1%, certainly far below 10%
    probes = spark.range(0, 20_000).select(
        (F.col("id") * 2_654_435_761 + 1).alias("k"))
    fp = bloom_filter_col(probes, "k", bloom, k).count()
    assert fp < 2_000, f"false-positive blowup: {fp}/20000"


def test_bloom_multi_partition_build_matches_single(spark):
    keys = spark.range(0, 5_000).select(
        ((F.col("id") + 7) * 1_099_511_628_211).alias("k"))
    n_bits, k = bloom_parameters(5_000, 0.01)
    b1 = build_bloom(keys.coalesce(1), "k", n_bits, k)
    b8 = build_bloom(keys.repartition(8), "k", n_bits, k)
    # OR-reduction is partition-order independent
    assert b1 == b8
    assert np.frombuffer(b1, dtype=np.uint8).any()


# -------------------------------------------------------- probe parity

def _snapshot_frames(spark):
    """Corpus/new split with planted cross-snapshot near-dups."""
    base = ("the quick brown fox jumps over the lazy dog while the "
            "cat sleeps near the warm stone wall in the old garden")
    rows = []
    for i in range(30):
        rows.append((i, f"{base} corpus page number {i} "
                        f"with unique suffix token{i:04d}"))
    new_rows = []
    for i in range(30, 55):
        new_rows.append((i, f"completely different novel text body {i} "
                            + " ".join(f"w{i}x{j}" for j in range(20))))
    # planted near-dups of corpus docs 0/5/10 (one token appended)
    for j, src in enumerate((0, 5, 10)):
        new_rows.append((100 + j, rows[src][1] + " planted"))
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    new = spark.createDataFrame(new_rows, "doc_id long, text string")
    return corpus, new


@pytest.mark.parametrize("mode", ["semi", "bloom"])
def test_prefilter_output_identical(spark, mode):
    corpus, new = _snapshot_frames(spark)
    plain = sorted(
        (r["doc_id"], r["dup_of"], round(r["jaccard"], 9))
        for r in dedup_against_corpus(corpus, new, CFG).collect())
    pre = sorted(
        (r["doc_id"], r["dup_of"], round(r["jaccard"], 9))
        for r in dedup_against_corpus(corpus, new, CFG,
                                      prefilter=mode).collect())
    assert plain == pre
    assert len(plain) >= 3  # the planted dups must actually be found
    found = {d for d, _, _ in plain}
    assert {100, 101, 102} <= found


def test_prefilter_rejects_unknown_mode(spark):
    corpus, new = _snapshot_frames(spark)
    with pytest.raises(ValueError):
        dedup_against_corpus(corpus, new, CFG, prefilter="nope").collect()
