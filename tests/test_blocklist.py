"""Domain/URL blocklist pass (operators/blocklist.py): hand-stated
host extraction and suffix-match semantics, label-boundary safety,
precedence, row-count preservation, and the gate row reproduced by
plain-Python arithmetic."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F


def _verdicts(spark, rows, blocked, patterns=None, max_labels=4):
    from distributed_lsh_spark.operators.blocklist import \
        with_blocklist_verdict

    pages = spark.createDataFrame(
        [(i, u) for i, u in enumerate(rows)], "doc_id long, url string")
    bl = spark.createDataFrame([(h,) for h in blocked],
                               "blocked_host string")
    out = with_blocklist_verdict(pages, bl, "url", patterns, max_labels)
    return {r.doc_id: (r.host, r.blocked, r.reason)
            for r in out.collect()}


def test_host_extraction_and_suffix_match(spark):
    got = _verdicts(spark, [
        "https://www.blocked.com/a",            # subdomain of entry
        "https://blocked.com/a",                # exact entry
        "HTTPS://WWW.BLOCKED.COM:8443/a",       # case + port stripped
        "https://user:pw@www.blocked.com/a",    # userinfo stripped
        "https://xblocked.com/a",               # label boundary: NOT blocked
        "https://blocked.com.evil.net/a",       # entry not a suffix: kept
        "https://fine.example.net/a",
        "not-a-url",                            # no host -> kept
    ], blocked=["Blocked.COM"])                 # list entry lowercased
    assert got[0] == ("www.blocked.com", True, "host:blocked.com")
    assert got[1] == ("blocked.com", True, "host:blocked.com")
    assert got[2] == ("www.blocked.com", True, "host:blocked.com")
    assert got[3] == ("www.blocked.com", True, "host:blocked.com")
    assert got[4] == ("xblocked.com", False, "")
    assert got[5] == ("blocked.com.evil.net", False, "")
    assert got[6] == ("fine.example.net", False, "")
    assert got[7] == ("", False, "")


def test_precedence_and_patterns(spark):
    # both a domain entry and its subdomain entry match: most-specific wins
    got = _verdicts(spark, [
        "https://a.sub.dom.com/x",
        "https://b.dom.com/x",
        "https://ok.net/ads/banner",    # pattern only
        "https://sub.dom.com/ads/z",    # host hit beats pattern hit
        "https://ok.net/x",
    ], blocked=["dom.com", "sub.dom.com"], patterns=[r"/ads/"])
    assert got[0][2] == "host:sub.dom.com"
    assert got[1][2] == "host:dom.com"
    assert got[2] == ("ok.net", True, "pattern")
    assert got[3][2] == "host:sub.dom.com"
    assert got[4] == ("ok.net", False, "")


def test_row_count_preserved_and_filter(spark):
    from distributed_lsh_spark.operators.blocklist import blocklist_filter

    pages = spark.createDataFrame(
        [(i, f"https://h{i % 3}.example.com/p/{i}", f"t{i}")
         for i in range(30)], "doc_id long, url string, text string")
    bl = spark.createDataFrame([("h1.example.com",), ("h1.example.com",)],
                               "blocked_host string")  # duplicate entry
    kept = blocklist_filter(pages, bl, "url")
    assert kept.columns == ["doc_id", "url", "text"]
    ids = sorted(r.doc_id for r in kept.collect())
    assert ids == [i for i in range(30) if i % 3 != 1]
    # empty blocklist, no patterns: everything survives exactly once
    none = blocklist_filter(pages, bl.limit(0), "url")
    assert none.count() == 30


def test_gate_row_matches_plain_python(spark):
    from distributed_lsh_spark.entry_queries import QUERIES

    sf = "/root/testdata/sf0.001"
    ids = [r[0] for r in duckdb.sql(
        f"SELECT doc_id FROM read_parquet('{sf}/documents.parquet')"
    ).fetchall()]
    got = {r.doc_id: (r.host, r.blocked, r.reason)
           for r in QUERIES["blocklist_filter"](spark, sf).collect()}
    assert set(got) == set(ids)
    for d in ids:
        p = d % 97
        host = f"w{d % 3}.h{p % 7}.example.com"
        if p % 7 == 3:
            want = "host:h3.example.com"
        elif d % 3 == 1 and p % 7 == 5:
            want = "host:w1.h5.example.com"
        elif p in (13, 15):
            want = "pattern"
        else:
            want = ""
        assert got[d] == (host, want != "", want), d
    # the planted hazards genuinely occur and both block families fire
    reasons = [v[2] for v in got.values()]
    assert any(r == "pattern" for r in reasons)
    assert any(r == "host:h3.example.com" for r in reasons)
    assert any(r == "host:w1.h5.example.com" for r in reasons)


def test_plan_never_shuffles_pages(spark):
    """Every join is a BroadcastHashJoin and no exchange is keyed on the
    pages side — the only shuffle allowed is the blocklist's own
    entry-dedup (config-sized, never the corpus)."""
    from distributed_lsh_spark.operators.blocklist import \
        with_blocklist_verdict

    pages = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("https://h"), (F.col("id") % 5).cast("string"),
                 F.lit(".example.com/p")).alias("url"))
    bl = spark.createDataFrame([("h1.example.com",)], "blocked_host string")
    plan = with_blocklist_verdict(pages, bl, "url")._jdf \
        .queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "hashpartitioning(doc_id" not in plan
    assert "hashpartitioning(url" not in plan
    assert "hashpartitioning(_host" not in plan


def test_cli_curate_blocked_words(spark, tmp_path, capsys):
    """--blocked-words drops pages containing a listed token (whole-token
    semantics: near-miss tokens survive); removal count attributed in the
    JSON; a changed word list invalidates via the config echo."""
    import json
    import os

    from pyspark.sql import functions as F

    from distributed_lsh_spark.cli import main

    src = str(tmp_path / "pages")
    out = str(tmp_path / "cur")
    base = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text"))
    # plant 'zzevil' into docs 0..4, near-miss 'zzevils' into 5..9
    planted = (base.withColumn(
        "text",
        F.when(F.col("doc_id") < 5,
               F.concat(F.col("text"), F.lit(" zzevil ")))
         .when(F.col("doc_id") < 10,
               F.concat(F.col("text"), F.lit(" zzevils ")))
         .otherwise(F.col("text"))))
    planted.write.parquet(src)
    n_total = planted.count()
    words = tmp_path / "badwords.txt"
    words.write_text("# sandbox list\nzzevil\n")

    args = ["curate", "--input", src, "--output", out, "--run-id", "w1",
            "--cores", "8", "--no-quality", "--blocked-words", str(words)]
    main(args)
    r1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r1["word_blocklist_removed"] == 5
    assert r1["n_docs"] == n_total - 5
    surv = spark.read.parquet(
        os.path.join(out, "w1", f"funnel_{r1['tiers'][-1]['tier']}", "data"))
    assert surv.where(F.col("doc_id") < 5).count() == 0
    assert surv.where((F.col("doc_id") >= 5) & (F.col("doc_id") < 10)) \
               .count() > 0, "near-miss tokens must survive"

    # changed list -> rebuild: now nothing matches
    words.write_text("zzabsent\n")
    main(args)
    r2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r2["word_blocklist_removed"] == 0
    assert r2["n_docs"] == n_total

    # malformed entry (not a tokenizer-alphabet token) is rejected
    words.write_text("two words\n")
    import pytest
    with pytest.raises(SystemExit):
        main(args)
