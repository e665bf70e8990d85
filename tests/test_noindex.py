"""Robots-meta noindex detection (functions/extract.py) + the
`curate --respect-noindex` compliance pass."""

import json
import os
import re

from pyspark.sql import functions as F

from distributed_lsh_spark.cli import main
from distributed_lsh_spark.functions.extract import (
    ROBOTS_NOFOLLOW_PATTERN, ROBOTS_NOINDEX_PATTERN, robots_noindex,
    robots_nofollow,
)

# (html, noindex, nofollow) — the gate's 8 planting variants plus extra
# adversarial shapes the gate's moduli can't carry
CASES = [
    ('<META NAME="ROBOTS" CONTENT="NOINDEX, NOFOLLOW">', True, True),
    ("<meta name=robots content=noindex>", True, False),
    ('<meta content="noindex" name="robots">', True, False),
    ('<meta name="robots" content="nofollow">', False, True),
    ('<meta name="description" content="noindex tips">', False, False),
    ('<meta name="robots" content="index,follow">', False, False),
    ('<meta name="robots" content="none">', True, True),
    ("<p>no meta at all noindex robots</p>", False, False),
    # two tags on one line: directives cannot leak across the tag's '>'
    ('<meta name="a" content="noindex"><meta name="robots" '
     'content="index">', False, False),
    # \b bounds: robotsx is not robots, nonenclature is not none
    ('<meta name="robotsx" content="noindex">', False, False),
    ('<meta name="robots" content="nonenclature">', False, False),
    # single quotes + spacing around '='
    ("<meta name = 'robots' content = 'noindex'>", True, False),
]


def test_pattern_semantics_python_replay():
    for html, want_ni, want_nf in CASES:
        h = html.lower()
        assert bool(re.search(ROBOTS_NOINDEX_PATTERN, h)) == want_ni, html
        assert bool(re.search(ROBOTS_NOFOLLOW_PATTERN, h)) == want_nf, html


def test_pattern_semantics_spark_columns(spark):
    df = spark.createDataFrame(
        [(i, f"<html><head>{h}</head><body>x</body></html>")
         for i, (h, _, _) in enumerate(CASES)],
        "i int, html string")
    got = {r["i"]: (r["ni"], r["nf"])
           for r in df.select("i", robots_noindex("html").alias("ni"),
                              robots_nofollow("html").alias("nf"))
           .collect()}
    for i, (_, want_ni, want_nf) in enumerate(CASES):
        assert got[i] == (want_ni, want_nf), CASES[i][0]


def test_cli_curate_respect_noindex(spark, tmp_path, capsys):
    """--respect-noindex drops exactly the noindex/none pages before any
    tier, reports the removal count, and rides the config echo."""
    src = str(tmp_path / "pages")
    out = str(tmp_path / "cur")
    meta = (F.when(F.pmod("doc_id", F.lit(5)) == 0,
                   F.lit('<meta name="robots" content="noindex">'))
            .when(F.pmod("doc_id", F.lit(5)) == 1,
                  F.lit('<meta name="robots" content="nofollow">'))
            .otherwise(F.lit("")))
    (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
          .select("doc_id", "text")
          .withColumn("html", F.concat(
              F.lit("<html><head>"), meta, F.lit("</head><body><p>"),
              F.col("text"), F.lit("</p></body></html>")))
          .withColumn("url", F.concat(
              F.lit("https://h.example.com/p/"),
              F.col("doc_id").cast("string")))
          .withColumn("warc_epoch", (F.col("doc_id") * 7).cast("long"))
          .write.parquet(src))
    n_total = spark.read.parquet(src).count()
    n_noidx = spark.read.parquet(src).where(
        F.pmod("doc_id", F.lit(5)) == 0).count()

    args = ["curate", "--input", src, "--output", out, "--run-id", "ni",
            "--cores", "8", "--no-quality", "--respect-noindex"]
    main(args)
    r1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r1["noindex_removed"] == n_noidx
    assert r1["tiers"][0]["docs_in"] == n_total - n_noidx
    surv = spark.read.parquet(os.path.join(out, "ni", "funnel_near_dup",
                                           "data"))
    # nofollow-only pages stay; noindex pages are gone
    assert surv.where(F.pmod("doc_id", F.lit(5)) == 0).count() == 0
    assert surv.where(F.pmod("doc_id", F.lit(5)) == 1).count() > 0

    # dropping the flag changes the config echo: same run-id REBUILDS
    # with the noindex pages back in
    main(["curate", "--input", src, "--output", out, "--run-id", "ni",
          "--cores", "8", "--no-quality"])
    r2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "noindex_removed" not in r2
    assert r2["tiers"][0]["docs_in"] == n_total
