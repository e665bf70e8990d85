"""Benchmark decontamination (operators/decontam.py): the GPT-3-style
13-gram overlap drop — operator semantics (any-hit vs threshold) plus the
`curate --decontaminate` tier e2e with resume + eval-set invalidation."""

from __future__ import annotations

import json
import os

from distributed_lsh_spark.cli import main
from distributed_lsh_spark.operators.decontam import (
    contaminated_ids, decontaminate, eval_ngram_inventory)

_A = " ".join(f"alpha{i}" for i in range(20))          # 20 tokens
_B = " ".join(f"beta{i}" for i in range(20))
_EVAL_LINE = " ".join(f"alpha{i}" for i in range(4, 17))  # tokens 5..17 of A


def _pages(spark):
    return spark.createDataFrame([(0, _A), (1, _B)], "doc_id long, text string")


def test_any_hit_rule_drops_only_overlapping_doc(spark):
    pages = _pages(spark)
    ev = spark.createDataFrame([(_EVAL_LINE,)], "text string")
    bad = {r.doc_id for r in
           contaminated_ids(pages, eval_ngram_inventory(ev)).collect()}
    assert bad == {0}
    kept = {r.doc_id for r in decontaminate(pages, ev).collect()}
    assert kept == {1}


def test_threshold_is_fraction_of_doc_ngrams(spark):
    # doc A has 20 tokens -> 8 distinct 13-grams; the eval line matches
    # exactly 1 of them -> ratio 1/8 = 0.125
    pages = _pages(spark)
    ev = spark.createDataFrame([(_EVAL_LINE,)], "text string")
    inv = eval_ngram_inventory(ev)
    assert {r.doc_id for r in
            contaminated_ids(pages, inv, threshold=0.1).collect()} == {0}
    assert contaminated_ids(pages, inv, threshold=0.2).count() == 0


def test_short_eval_text_matches_whole_doc_only(spark):
    # an eval text under 13 tokens shingles to its whole normalized text:
    # it can only hit a doc carrying that exact token run
    pages = _pages(spark)
    ev = spark.createDataFrame([("alpha0 alpha1 alpha2",)], "text string")
    assert contaminated_ids(pages, eval_ngram_inventory(ev)).count() == 0
    ev2 = spark.createDataFrame([(_A,)], "text string")
    assert {r.doc_id for r in
            contaminated_ids(pages, eval_ngram_inventory(ev2)).collect()} \
        == {0}


def test_cli_curate_decontaminate(spark, tmp_path, capsys):
    """--decontaminate drops funnel survivors overlapping the eval file;
    resume serves the committed stage; a CHANGED eval file invalidates
    (config echo carries the file's md5)."""
    from pyspark.sql import functions as F

    src = str(tmp_path / "pages")
    out = str(tmp_path / "cur")
    base = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text"))
    # unique urls so the url/exact tiers remove nothing; doc 0 is the
    # min-id of any near-dup cluster it joins, so it ALWAYS survives the
    # funnel -> planting its text as the eval set guarantees >=1 removal
    (base.withColumn("url", F.concat(F.lit("https://x/p/"),
                                     F.col("doc_id").cast("string")))
         .withColumn("warc_epoch", (F.col("doc_id") * 7).cast("long"))
         .write.parquet(src))
    doc0 = base.where(F.col("doc_id") == 0).collect()[0].text
    ev_file = tmp_path / "eval.txt"
    ev_file.write_text(doc0.replace("\n", " ") + "\n")

    args = ["curate", "--input", src, "--output", out, "--run-id", "d1",
            "--cores", "8", "--no-quality",
            "--decontaminate", str(ev_file)]
    main(args)
    r1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r1["survivors_stage"] == "decontam"
    assert r1["decontam_removed"] >= 1
    assert r1["n_survivors"] == r1["tiers"][-1]["docs_out"] - \
        r1["decontam_removed"]
    surv = spark.read.parquet(os.path.join(out, "d1", "decontam", "data"))
    assert surv.count() == r1["n_survivors"]
    assert surv.where(F.col("doc_id") == 0).count() == 0

    # resume: identical numbers, stage served from its manifest
    main(args)
    r2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert (r2["n_survivors"], r2["decontam_removed"]) == \
        (r1["n_survivors"], r1["decontam_removed"])

    # changed eval file -> rebuild under the new suite: a too-short
    # nonsense line matches nothing, so nothing is removed
    ev_file.write_text("zz qq ww\n")
    main(args)
    r3 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r3["decontam_removed"] == 0
    assert r3["n_survivors"] == r1["tiers"][-1]["docs_out"]
