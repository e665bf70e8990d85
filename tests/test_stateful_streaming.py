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


def test_stateful_url_latest_parity_and_restart(spark, tmp_path):
    """Streaming twin of the funnel url tier: per-url running winner under
    max (warc_epoch, doc_id); final winners == batch keep-latest; state
    survives a query restart; dethroning across batches emits changed."""
    import os

    from distributed_lsh_spark.streaming.stateful import run_stateful_url_latest

    input_dir = str(tmp_path / "in")
    state_dir = str(tmp_path / "st")
    os.makedirs(input_dir)
    sch = "doc_id long, url string, warc_epoch long"

    def drop(name, rows):
        spark.createDataFrame(rows, sch).coalesce(1) \
             .write.parquet(os.path.join(input_dir, name))

    # u1: winner moves across batches (epoch 5 -> 9); u2: ties on epoch
    # break by doc_id; u3 appears once
    drop("d1", [(1, "u1", 5), (2, "u2", 7), (3, "u2", 7)])
    drop("d2", [(4, "u1", 9), (5, "u3", 1)])
    q = run_stateful_url_latest(spark, input_dir + "/*", state_dir)
    q.awaitTermination(240)

    # restart with a LOSING revisit of u1 (older epoch): must not dethrone
    drop("d3", [(6, "u1", 2)])
    q = run_stateful_url_latest(spark, input_dir + "/*", state_dir)
    q.awaitTermination(240)

    out = spark.read.parquet(f"{state_dir}/latest").collect()
    # final winner per url = emitted row with max (warc_epoch, doc_id)
    final = {}
    for r in out:
        # same winner may be re-emitted by later batches with a higher
        # crawl count — the freshest row is max (epoch, doc_id, n_crawls)
        k = (r["warc_epoch"], r["doc_id"], r["n_crawls"])
        if r["url"] not in final or k > final[r["url"]]:
            final[r["url"]] = k
    assert final == {"u1": (9, 4, 3),    # 3 crawls seen, winner (9, 4)
                     "u2": (7, 3, 2),    # epoch tie -> max doc_id
                     "u3": (1, 5, 1)}
    # u1's d3 appearance must emit the STANDING winner unchanged
    u1_rows = sorted([(r["n_crawls"], r["doc_id"], r["changed"])
                      for r in out if r["url"] == "u1"])
    assert u1_rows == [(1, 1, True), (2, 4, True), (3, 4, False)]

    # batch parity: funnel url tier over the union of all drops keeps
    # exactly the streaming winners
    from distributed_lsh_spark.conf import DEFAULT_CONFIG as CFG
    from distributed_lsh_spark.operators.funnel import curation_funnel

    pages = spark.createDataFrame(
        [(1, "u1", 5), (2, "u2", 7), (3, "u2", 7),
         (4, "u1", 9), (5, "u3", 1), (6, "u1", 2)], sch) \
        .selectExpr("doc_id", "url", "warc_epoch",
                    "concat('t', doc_id) AS text")
    res = curation_funnel(pages, CFG)
    kept = {r["url"]: r["doc_id"]
            for r in res.tiers["url_latest"].collect()}
    assert kept == {u: d for u, (_, d, _) in final.items()}


def test_stateful_fuzzy_exact_dedup_catches_variants(spark, tmp_path):
    """The fuzzy twin keys state by the normalized token stream: a
    case/punctuation variant of seen content labels is_dup (the
    byte-level twin would not), and genuinely new content does not."""
    input_dir = str(tmp_path / "incoming")
    state_dir = str(tmp_path / "state")
    byte_state = str(tmp_path / "state_byte")
    os.makedirs(input_dir)

    _drop(spark, input_dir, "d1", [(1, "hello world one"),
                                   (2, "other content two")])
    # doc 3: uppercase + punctuation noise variant of doc 1 (byte-distinct,
    # normalization-identical); doc 4: fresh
    _drop(spark, input_dir, "d2", [(3, "  HELLO, world -- ONE!! "),
                                   (4, "fresh stuff")])

    q = run_stateful_dedup(spark, input_dir + "/*", state_dir, fuzzy=True)
    q.awaitTermination(240)
    got = {r["doc_id"]: (r["canonical_id"], r["is_dup"])
           for r in spark.read.parquet(f"{state_dir}/labeled").collect()}
    assert got[3] == (1, True)
    assert got[1] == (1, False)
    assert got[4] == (4, False)

    # the byte-level twin on the same drops does NOT flag the variant
    q2 = run_stateful_dedup(spark, input_dir + "/*", byte_state)
    q2.awaitTermination(240)
    byte_got = {r["doc_id"]: r["is_dup"] for r in
                spark.read.parquet(f"{byte_state}/labeled").collect()}
    assert byte_got[3] is False
