"""Mojibake detection/repair (functions/encoding.py): scalar-spec
semantics, UDF parity, gate-planting pins, and threshold behavior."""

import re

import pytest
from pyspark.sql import functions as F

from distributed_lsh_spark.functions.encoding import (
    MOJIBAKE_PATTERN, fix_mojibake, fix_mojibake_udf, mojibake_artifacts,
    replacement_chars,
)

CLEAN = " café — naïve…"
CORRUPT = CLEAN.encode("utf-8").decode("latin-1")
SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize("text,want", [
    (CORRUPT, CLEAN),                       # the reversible class inverts
    ("plain ascii", "plain ascii"),         # ASCII round-trips (identity)
    (CLEAN, CLEAN),                         # genuine unicode: encode fails
    (" lost\ufffdbyte", " lost\ufffdbyte"), # FFFD: information loss
    ("\u4e2d\u6587", "\u4e2d\u6587"),       # >U+00FF: encode fails
    (None, None),
    ("", ""),
])
def test_fix_mojibake_scalar_spec(text, want):
    assert fix_mojibake(text) == want


def test_fix_mojibake_idempotent():
    once = fix_mojibake(CORRUPT)
    assert fix_mojibake(once) == once


def test_detection_counts_and_threshold():
    # 4 artifact sequences in the corrupt marker (pinned so the gate
    # threshold >= 2 provably fires on the planting)
    assert len(re.findall(MOJIBAKE_PATTERN, CORRUPT)) == 4
    # a single accented letter followed by ASCII does NOT match: the
    # second char must be a continuation-range codepoint
    assert re.findall(MOJIBAKE_PATTERN, "À la carte") == []


def test_udf_matches_scalar_and_counts(spark):
    rows = [(0, "x" + CORRUPT), (1, "plain"), (2, "a\ufffdb"),
            (3, None), (4, CLEAN)]
    df = spark.createDataFrame(rows, "doc_id long, t string")
    got = {r["doc_id"]: (r["fixed"], r["n_art"], r["n_repl"])
           for r in df.select(
               "doc_id", fix_mojibake_udf("t").alias("fixed"),
               mojibake_artifacts("t").alias("n_art"),
               replacement_chars("t").alias("n_repl")).collect()}
    for doc_id, t in rows:
        want_fixed = fix_mojibake(t)
        want_art = len(re.findall(MOJIBAKE_PATTERN, t)) if t else 0
        want_repl = t.count("\ufffd") if t else 0
        if t is None:
            assert got[doc_id][0] is None
        else:
            assert got[doc_id] == (want_fixed, want_art, want_repl)


def test_gate_planting_semantics(spark):
    """Every planted doc is flagged; reversible plantings repair to
    text + CLEAN marker; FFFD plantings pass through; clean docs are
    untouched and unflagged."""
    from distributed_lsh_spark.entry_queries import QUERIES

    docs = {r["doc_id"]: r["text"]
            for r in spark.read.parquet(
                f"{SF_DIR}/documents.parquet").collect()}
    out = {r["doc_id"]: r for r in
           QUERIES["encoding_quality"](spark, SF_DIR).collect()}
    import hashlib

    def md5(s: str) -> str:
        return hashlib.md5(s.encode("utf-8")).hexdigest()

    n_corrupt = n_fffd = 0
    for doc_id, text in docs.items():
        r = out[doc_id]
        if doc_id % 43 == 0:
            n_corrupt += 1
            assert r["is_mojibake"] and r["n_artifacts"] >= 2
            assert r["repaired_md5"] == md5(text + CLEAN)
        elif doc_id % 59 == 0:
            n_fffd += 1
            assert r["is_mojibake"] and r["n_repl"] == 1
            assert r["repaired_md5"] == md5(text + " lost\ufffdbyte")
        else:
            assert not r["is_mojibake"]
            assert r["repaired_md5"] == md5(text)
    assert n_corrupt > 0 and n_fffd > 0


def test_cli_curate_fix_encoding(spark, tmp_path, capsys):
    """--fix-encoding repairs flagged docs before the exact tier, so a
    mojibake'd byte-copy of a clean doc dedups against it; the repaired
    count lands in the metrics JSON and rides the config echo."""
    import json
    import os

    from distributed_lsh_spark.cli import main

    src = str(tmp_path / "pages")
    out = str(tmp_path / "cur")
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text")
    # corrupt copies of every doc_id % 7 == 0 doc at +1M: after repair
    # they are byte-identical to their originals -> exact tier removes
    corrupt = (base.where(F.pmod("doc_id", F.lit(7)) == 0)
               .select((F.col("doc_id") + 1_000_000).alias("doc_id"),
                       F.concat("text", F.lit(CORRUPT)).alias("text")))
    clean_twin = (base.where(F.pmod("doc_id", F.lit(7)) == 0)
                  .select((F.col("doc_id") + 2_000_000).alias("doc_id"),
                          F.concat("text", F.lit(CLEAN)).alias("text")))
    n_corrupt = corrupt.count()
    (base.unionByName(corrupt).unionByName(clean_twin)
     .withColumn("url", F.concat(F.lit("https://h.example.com/p/"),
                                 F.col("doc_id").cast("string")))
     .withColumn("warc_epoch", (F.col("doc_id") * 7).cast("long"))
     .write.parquet(src))

    main(["curate", "--input", src, "--output", out, "--run-id", "fx",
          "--cores", "8", "--no-quality", "--fix-encoding"])
    r = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r["encoding_fixed"] == n_corrupt
    exact = next(t for t in r["tiers"] if t["tier"] == "exact")
    # every repaired copy collapses onto its clean twin (or vice versa)
    assert exact["docs_removed"] >= n_corrupt
    surv = spark.read.parquet(os.path.join(out, "fx", "funnel_near_dup",
                                           "data"))
    # no mojibake bytes survive anywhere
    from distributed_lsh_spark.functions.encoding import mojibake_artifacts
    assert surv.where(mojibake_artifacts("text") >= 2).count() == 0
