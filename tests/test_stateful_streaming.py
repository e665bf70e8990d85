"""applyInPandasWithState: first-seen exact dedup keeps per-hash state in
the state store, across micro-batches AND across query restarts."""

from __future__ import annotations

import os

from distributed_lsh_spark.streaming.stateful import run_stateful_dedup


def _drop(spark, input_dir, name, rows):
    spark.createDataFrame(rows, "doc_id long, text string") \
         .coalesce(1).write.parquet(os.path.join(input_dir, name))


def test_stateful_exact_dedup_across_restarts(spark, tmp_path):
    input_dir = str(tmp_path / "incoming")
    state_dir = str(tmp_path / "state")
    os.makedirs(input_dir)

    # run 1: two dup families + a unique doc, two micro-batches
    _drop(spark, input_dir, "d1", [(1, "aaa"), (2, "bbb"), (3, "aaa")])
    _drop(spark, input_dir, "d2", [(4, "bbb"), (5, "ccc")])
    q = run_stateful_dedup(spark, input_dir + "/*", state_dir)
    q.awaitTermination(240)

    # run 2 (restart, new drop): state must survive the restart — 6 is a
    # dup of the long-gone doc 1, 7 of doc 5, 8 is fresh
    _drop(spark, input_dir, "d3", [(6, "aaa"), (7, "ccc"), (8, "ddd")])
    q = run_stateful_dedup(spark, input_dir + "/*", state_dir)
    q.awaitTermination(240)

    got = {r["doc_id"]: (r["canonical_id"], r["is_dup"])
           for r in spark.read.parquet(f"{state_dir}/labeled").collect()}
    assert got == {
        1: (1, False), 3: (1, True), 6: (1, True),      # "aaa" family
        2: (2, False), 4: (2, True),                    # "bbb" family
        5: (5, False), 7: (5, True),                    # "ccc" family
        8: (8, False),                                  # unique
    }
