"""Stratified sampling: the gate row's kept SET reproduced by independent
plain-Python arithmetic (no Spark, no DuckDB), and rate sanity."""

from __future__ import annotations

import hashlib

import duckdb

RATES = {"en": 500, "de": 800, "fr": 800, "es": 800, "zh": 250}


def test_stratified_sample_matches_plain_python(spark):
    from distributed_lsh_spark.entry_queries import QUERIES

    sf = "/root/testdata/sf0.001"
    rows = duckdb.sql(
        f"SELECT doc_id, lang FROM "
        f"read_parquet('{sf}/documents.parquet')").fetchall()

    strata: dict[str, dict] = {}
    for doc_id, lang in rows:
        rate = RATES.get(lang, 1000)
        st = strata.setdefault(lang, {"rate": rate, "n": 0, "kept": []})
        st["n"] += 1
        if (doc_id * 7919 + 17) % 1000 < rate:
            st["kept"].append(doc_id)

    got = {r.lang: r for r in QUERIES["stratified_sample"](spark, sf)
           .collect()}
    assert set(got) == set(strata)
    for lang, st in strata.items():
        g = got[lang]
        assert g.rate_pm == st["rate"]
        assert g.n_docs == st["n"]
        assert g.n_kept == len(st["kept"])
        want_md5 = hashlib.md5(
            ",".join(str(i) for i in sorted(st["kept"])).encode()
        ).hexdigest()
        assert g.kept_ids_md5 == want_md5, lang
        # the sampler actually thins the stratum (not all-kept, not empty)
        if st["rate"] < 1000 and st["n"] >= 20:
            assert 0 < g.n_kept < g.n_docs


# ---------------------------------------------------------------- reservoir

def _py_rank(x: int) -> int:
    import hashlib
    return int(hashlib.md5(str(x).encode()).hexdigest()[:15], 16)


def test_reservoir_sample_equals_pure_topn(spark):
    # prefilter + window must equal the pure "n smallest md5 ranks per
    # stratum" definition, computed independently in Python
    from distributed_lsh_spark.operators.sampling import reservoir_sample

    rows = [(i, i % 3) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, stratum long")
    got = {(r["stratum"], r["sample_rank"]): r["doc_id"]
           for r in reservoir_sample(df, "stratum", n=7).collect()}
    for s in range(3):
        ids = sorted((i for i in range(500) if i % 3 == s),
                     key=lambda i: (_py_rank(i), i))[:7]
        for rank, i in enumerate(ids, start=1):
            assert got[(s, rank)] == i, (s, rank)
    assert len(got) == 21


def test_reservoir_sample_small_strata_exact(spark):
    # a stratum smaller than n returns ALL its rows (count<=margin*n
    # passes the threshold for every rank by construction)
    from distributed_lsh_spark.operators.sampling import reservoir_sample

    rows = [(i, 0) for i in range(3)] + [(100 + i, 1) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, stratum long")
    out = reservoir_sample(df, "stratum", n=10)
    sizes = {r["stratum"]: r["n"] for r in
             out.groupBy("stratum").agg(__import__("pyspark.sql.functions",
                 fromlist=["count"]).count("*").alias("n")).collect()}
    assert sizes == {0: 3, 1: 10}


def test_reservoir_sample_stable_under_repartition(spark):
    # the sample depends only on ids, never on physical layout
    from distributed_lsh_spark.operators.sampling import reservoir_sample

    rows = [(i, i % 2) for i in range(300)]
    a = spark.createDataFrame(rows, "doc_id long, stratum long")
    b = a.repartition(17)
    ka = sorted(map(tuple, reservoir_sample(a, "stratum", 5)
                    .select("stratum", "doc_id", "sample_rank").collect()))
    kb = sorted(map(tuple, reservoir_sample(b, "stratum", 5)
                    .select("stratum", "doc_id", "sample_rank").collect()))
    assert ka == kb and len(ka) == 10


def test_cli_curate_max_docs_per_host(spark, tmp_path, capsys):
    """--max-docs-per-host keeps at most N survivors per host by
    deterministic md5 rank; removal attributed in the JSON; resume
    serves the committed stage with the identical kept set."""
    import json
    import os

    from pyspark.sql import functions as F

    from distributed_lsh_spark.cli import main

    src = str(tmp_path / "pages")
    out = str(tmp_path / "cur")
    base = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text"))
    host = F.when(F.col("doc_id") < 30, F.lit("big.example")) \
            .otherwise(F.lit("small.example"))
    (base.withColumn("url", F.concat(F.lit("https://"), host, F.lit("/p/"),
                                     F.col("doc_id").cast("string")))
         .withColumn("warc_epoch", (F.col("doc_id") * 7).cast("long"))
         .write.parquet(src))

    args = ["curate", "--input", src, "--output", out, "--run-id", "hc1",
            "--cores", "8", "--no-quality", "--max-docs-per-host", "3"]
    main(args)
    r1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r1["survivors_stage"] == "host_cap"
    surv = spark.read.parquet(os.path.join(out, "hc1", "host_cap", "data"))
    per_host = {r["h"]: r["c"] for r in
                (surv.withColumn("h", F.regexp_extract("url",
                                                       "https://([^/]+)/", 1))
                     .groupBy("h").agg(F.count("*").alias("c")).collect())}
    assert all(c <= 3 for c in per_host.values()), per_host
    assert r1["n_survivors"] == surv.count() == sum(per_host.values())
    assert r1["host_cap_removed"] == \
        r1["tiers"][-1]["docs_out"] - r1["n_survivors"]
    kept1 = sorted(r["doc_id"] for r in surv.select("doc_id").collect())

    # resume: identical kept SET (md5 rank is layout- and run-independent)
    main(args)
    r2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    surv2 = spark.read.parquet(os.path.join(out, "hc1", "host_cap", "data"))
    kept2 = sorted(r["doc_id"] for r in surv2.select("doc_id").collect())
    assert kept2 == kept1
    assert r2["n_survivors"] == r1["n_survivors"]

    # a no-url input rejects the flag
    src2 = str(tmp_path / "pages2")
    base.write.parquet(src2)
    import pytest
    with pytest.raises(SystemExit):
        main(["curate", "--input", src2, "--output", out, "--run-id",
              "hc2", "--cores", "8", "--no-quality",
              "--max-docs-per-host", "3"])
