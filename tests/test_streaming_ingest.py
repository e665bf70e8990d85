"""Composed streaming ingest (stateful exact pass -> incremental near-dup
stream) matches batch run_dedup clusters on the same corpus, including
across query restarts and with a late-arriving lower doc_id (first-seen
canonical != global-min representative)."""

from __future__ import annotations

import os

from distributed_lsh_spark.conf import DEFAULT_CONFIG as CFG
from distributed_lsh_spark.oracle.dedup import DedupOracle
from distributed_lsh_spark.streaming.ingest import ingest_clusters, run_ingest


def _drop(spark, input_dir, name, rows):
    spark.createDataFrame(rows, "doc_id long, text string") \
         .coalesce(1).write.parquet(os.path.join(input_dir, name))


def test_ingest_matches_batch_clusters(spark, tiny_corpus, tmp_path):
    docs = dict(list(tiny_corpus.texts_by_id().items())[:60])
    ids = sorted(docs)
    base = "the quick brown fox jumps over the lazy dog and then naps all "
    # byte-identical family where the MIN id arrives in the LAST drop:
    # first-seen canonical (9001) != batch representative (901)
    extra = {9001: base + "day long", 9002: base + "day long",
             901: base + "day long",
             # near-dup (not byte-dup) of the family, different drop
             9003: base + "day"}
    docs.update(extra)

    input_dir = str(tmp_path / "incoming")
    state_dir = str(tmp_path / "state")
    os.makedirs(input_dir)

    half = len(ids) // 2
    _drop(spark, input_dir, "d1",
          [(i, docs[i]) for i in ids[:half]] + [(9001, docs[9001])])
    _drop(spark, input_dir, "d2",
          [(i, docs[i]) for i in ids[half:]] + [(9002, docs[9002])])
    run_ingest(spark, input_dir + "/*", state_dir, CFG)

    # restart with a third drop: the byte-dup with the LOWEST id and a
    # near-dup arrive after the family's state already exists
    _drop(spark, input_dir, "d3", [(901, docs[901]), (9003, docs[9003])])
    run_ingest(spark, input_dir + "/*", state_dir, CFG)

    got = {r["doc_id"]: r["cluster_id"]
           for r in ingest_clusters(spark, state_dir).collect()}
    oracle = DedupOracle(CFG, docs)
    assert got == oracle.clusters()
    # the planted family resolved to the global-min cluster id even though
    # 901 arrived last
    assert got[9001] == got[9002] == got[901] == 901
    assert got.get(9003) == 901  # near-dup joined via the LSH stage
