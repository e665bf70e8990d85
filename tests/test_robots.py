"""robots.txt compliance (operators/robots.py): RFC 9309 parser
semantics, pattern translation, and DataFrame precedence matching."""

from __future__ import annotations

import re

from distributed_lsh_spark.operators.robots import (
    parse_robots_txt,
    pattern_length,
    pattern_regex,
    robots_rules,
    robots_verdicts,
)

_TXT = """\
# comment line
User-agent: Googlebot
Disallow: /g/

User-agent: trainbot
User-agent: otherbot
Disallow: /private/
Allow: /private/pub/
Crawl-delay: 10
Disallow:

User-agent: *
Disallow: /all/

User-agent: trainbot
Allow: /second-group/
"""


def test_parser_group_selection_and_merge():
    # exact agent match: both trainbot groups merge, '*' and Googlebot
    # groups invisible; empty Disallow and unknown directives ignored
    rules = parse_robots_txt(_TXT, "TrainBot")
    assert rules == [("/private/", False), ("/private/pub/", True),
                     ("/second-group/", True)]
    # a consecutive user-agent run names one group for several agents
    assert ("/private/", False) in parse_robots_txt(_TXT, "otherbot")
    # unknown agent falls through to the '*' group
    assert parse_robots_txt(_TXT, "randombot") == [("/all/", False)]
    # no groups at all -> no rules
    assert parse_robots_txt("# empty\n", "trainbot") == []


def test_parser_rule_before_any_group_ignored():
    assert parse_robots_txt("Disallow: /x/\nUser-agent: a\nAllow: /y/",
                            "a") == [("/y/", True)]


def test_pattern_regex_and_length():
    assert re.match(pattern_regex("/tmp/*.html$"), "/tmp/a/b.html")
    assert not re.match(pattern_regex("/tmp/*.html$"), "/tmp/a.htmlx")
    assert re.match(pattern_regex("/a"), "/abc")          # prefix match
    assert not re.match(pattern_regex("/a$"), "/abc")     # anchored
    # regex metachars in patterns are literal (§2.2.3)
    assert re.match(pattern_regex("/p?.x"), "/p?.x/deep")
    assert not re.match(pattern_regex("/p?.x"), "/pA.x")
    assert pattern_length("/tmp/*.html$") == len("/tmp/*.html")
    assert pattern_length("/a") == 2


def test_verdict_precedence(spark):
    pages = spark.createDataFrame(
        [(0, "h", "/private/x"), (1, "h", "/private/pub/x"),
         (2, "h", "/dup/x"), (3, "h", "/b/x"), (4, "h", "/free"),
         (5, "nohost.example", "/anything")],
        "doc_id long, host string, path string")
    rules = spark.createDataFrame(
        [("h", "/private/", False), ("h", "/private/pub/", True),
         ("h", "/dup/", False), ("h", "/dup/", True),
         ("h", "/b", True), ("h", "/b/", False)],
        "host string, pattern string, allow boolean")
    got = {r["doc_id"]: (r["allowed"], r["matched_pattern"])
           for r in robots_verdicts(pages, rules).collect()}
    assert got == {
        0: (False, "/private/"),
        1: (True, "/private/pub/"),       # longest match wins
        2: (True, "/dup/"),               # equal length: allow wins
        3: (False, "/b/"),                # longer disallow wins
        4: (True, ""),                    # host has rules, none match
        5: (True, ""),                    # host has no rules at all
    }


def test_robots_rules_udf_matches_parser(spark):
    robots = spark.createDataFrame([("h1", _TXT), ("h2", "")],
                                   "host string, robots_txt string")
    rows = robots_rules(robots, user_agent="trainbot").collect()
    by_host: dict[str, list] = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append(
            (r["pattern"], r["allow"], r["plen"], r["regex"]))
    assert "h2" not in by_host  # empty robots.txt -> zero rules
    expect = [(p, a, pattern_length(p), pattern_regex(p))
              for p, a in parse_robots_txt(_TXT, "trainbot")]
    assert sorted(by_host["h1"]) == sorted(expect)


def test_cli_curate_robots_table(spark, tmp_path, capsys):
    """--robots-table drops exactly the pages the host's robots.txt
    disallows for --robots-agent, reports the removal count, and the
    agent rides the config echo (an agent change rebuilds)."""
    import json
    import os

    from pyspark.sql import functions as F

    from distributed_lsh_spark.cli import main

    src = str(tmp_path / "pages")
    out = str(tmp_path / "cur")
    host = F.when(F.pmod("doc_id", F.lit(2)) == 0,
                  F.lit("a.example.com")).otherwise(F.lit("b.example.com"))
    path = F.when(F.pmod("doc_id", F.lit(3)) == 0,
                  F.lit("/private/")).otherwise(F.lit("/pub/"))
    (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
          .select("doc_id", "text")
          .withColumn("url", F.concat(F.lit("https://"), host, path,
                                      F.col("doc_id").cast("string")))
          .withColumn("warc_epoch", (F.col("doc_id") * 7).cast("long"))
          .write.parquet(src))
    robots_txt = ("User-agent: *\nDisallow: /pub/\n\n"
                  "User-agent: trainbot\nDisallow: /private/\n")
    rb = str(tmp_path / "robots")
    spark.createDataFrame([("a.example.com", robots_txt)],
                          "host string, robots_txt string") \
         .write.parquet(rb)
    df = spark.read.parquet(src)
    n_total = df.count()
    n_blocked = df.where((F.pmod("doc_id", F.lit(2)) == 0) &
                         (F.pmod("doc_id", F.lit(3)) == 0)).count()
    assert n_blocked > 0

    args = ["curate", "--input", src, "--output", out, "--run-id", "rb",
            "--cores", "8", "--no-quality",
            "--robots-table", rb, "--robots-agent", "trainbot"]
    main(args)
    r1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r1["robots_removed"] == n_blocked
    assert r1["tiers"][0]["docs_in"] == n_total - n_blocked
    surv = spark.read.parquet(os.path.join(out, "rb", "funnel_near_dup",
                                           "data"))
    assert surv.where((F.pmod("doc_id", F.lit(2)) == 0) &
                      (F.pmod("doc_id", F.lit(3)) == 0)).count() == 0
    # host b has no robots row -> untouched even on /private/ paths
    assert surv.where((F.pmod("doc_id", F.lit(2)) == 1) &
                      (F.pmod("doc_id", F.lit(3)) == 0)).count() > 0

    # agent change = config change: same run-id REBUILDS under the '*'
    # group, whose rule blocks the /pub/ class of host a instead
    n_pub_a = df.where((F.pmod("doc_id", F.lit(2)) == 0) &
                       (F.pmod("doc_id", F.lit(3)) != 0)).count()
    main(["curate", "--input", src, "--output", out, "--run-id", "rb",
          "--cores", "8", "--no-quality", "--robots-table", rb])
    r2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r2["robots_removed"] == n_pub_a
    assert r2["tiers"][0]["docs_in"] == n_total - n_pub_a
