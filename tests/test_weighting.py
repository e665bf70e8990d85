"""operators/weighting.py: soft-dedup weights, cluster-safe splits,
temperature mixture — semantics pinned against hand-stated expectations
and independent Python replays (no Spark code in the checks)."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from distributed_lsh_spark.operators.weighting import (
    cluster_safe_split, hash_bucket_100, soft_dedup_weights,
    temperature_mixture, with_cluster_ids,
)


@pytest.fixture(scope="module")
def labeled(spark):
    # docs 1..10; clusters: {1,2,3} (label 1), {7,8} (label 7); rest singleton
    docs = spark.createDataFrame([(i,) for i in range(1, 11)], "doc_id long")
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7), (8, 7)],
        "doc_id long, cluster_id long")
    return docs, clusters


def test_with_cluster_ids_fills_singletons(spark, labeled):
    docs, clusters = labeled
    got = {r["doc_id"]: r["cluster_id"]
           for r in with_cluster_ids(docs, clusters).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 6, 7: 7, 8: 7, 9: 9,
                   10: 10}


def test_soft_dedup_weights_mass_is_one_per_cluster(spark, labeled):
    docs, clusters = labeled
    rows = soft_dedup_weights(docs, clusters).collect()
    assert len(rows) == 10  # keeps every doc
    by_id = {r["doc_id"]: r for r in rows}
    assert by_id[2]["cluster_size"] == 3 and by_id[2]["weight"] == round(1 / 3, 6)
    assert by_id[8]["cluster_size"] == 2 and by_id[8]["weight"] == 0.5
    assert by_id[4]["weight"] == 1.0
    # expected sample mass per cluster == 1
    mass = {}
    for r in rows:
        mass[r["cluster_id"]] = mass.get(r["cluster_id"], 0) + r["weight"]
    for cid, m in mass.items():
        assert abs(m - 1.0) < 1e-5, (cid, m)


def _py_bucket(x: int) -> int:
    return int(hashlib.md5(str(x).encode()).hexdigest()[:15], 16) % 100


def test_hash_bucket_matches_python_md5(spark):
    df = spark.createDataFrame([(i,) for i in range(200)], "v long")
    got = {r["v"]: r["b"] for r in
           df.select("v", hash_bucket_100(F.col("v")).alias("b")).collect()}
    assert got == {i: _py_bucket(i) for i in range(200)}


def test_cluster_safe_split_never_straddles(spark, labeled):
    docs, clusters = labeled
    rows = cluster_safe_split(docs, clusters).collect()
    assert len(rows) == 10
    # every member of a cluster carries the same split
    split_of = {}
    for r in rows:
        assert r["split"] == ("train" if r["bucket"] < 90 else
                              "valid" if r["bucket"] < 95 else "test")
        assert r["bucket"] == _py_bucket(r["cluster_id"])
        split_of.setdefault(r["cluster_id"], set()).add(r["split"])
    assert all(len(s) == 1 for s in split_of.values())


def test_cluster_safe_split_fracs_roughly_hold(spark):
    # 2000 singleton "clusters": uniform md5 buckets -> ~90/5/5
    docs = spark.createDataFrame([(i,) for i in range(2000)], "doc_id long")
    empty = docs.limit(0).withColumn("cluster_id", F.col("doc_id"))
    counts = {r["split"]: r["n"] for r in
              cluster_safe_split(docs, empty)
              .groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert 0.85 < counts["train"] / 2000 < 0.95
    assert counts["train"] + counts.get("valid", 0) + counts.get("test", 0) == 2000


def test_temperature_mixture_math(spark):
    # two domains, token mass 900 / 100: p_raw .9/.1,
    # p_temp = sqrt(p)/sum -> .75/.25, mix_weight .8333../2.5
    rows = [("a", 900), ("a", 0), ("b", 100)]
    df = spark.createDataFrame(rows, "host string, n_toks long")
    got = {r["host"]: r for r in
           temperature_mixture(df, "host", "n_toks", alpha=0.5).collect()}
    s = math.sqrt(0.9) + math.sqrt(0.1)
    assert got["a"]["n_docs"] == 2 and got["a"]["n_tokens"] == 900
    assert got["a"]["p_raw"] == 0.9 and got["b"]["p_raw"] == 0.1
    assert got["a"]["p_temp"] == round(math.sqrt(0.9) / s, 6)
    assert got["b"]["p_temp"] == round(math.sqrt(0.1) / s, 6)
    # flattening: head domain downsampled, tail upsampled
    assert got["a"]["mix_weight"] < 1 < got["b"]["mix_weight"]
    assert got["b"]["mix_weight"] == round((math.sqrt(0.1) / s) / 0.1, 6)


def test_cli_dedup_emits_weights_and_split(spark, tmp_path, capsys):
    import json
    import os

    from distributed_lsh_spark.cli import main

    src = str(tmp_path / "pages")
    out = str(tmp_path / "out")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
         .select("doc_id", "text").write.parquet(src)
    # first run WITHOUT the emit flags, then rerun WITH them: every dedup
    # stage must resume and only the new tables get built
    main(["dedup", "--input", src, "--output", out, "--run-id", "w1",
          "--cores", "8"])
    capsys.readouterr()
    main(["dedup", "--input", src, "--output", out, "--run-id", "w1",
          "--emit-weights", "--emit-split", "--cores", "8"])
    r = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    n_docs = r["n_docs"]
    assert r["n_weighted_docs"] == n_docs and r["n_split_docs"] == n_docs
    w = spark.read.parquet(os.path.join(out, "w1", "weights", "data"))
    s = spark.read.parquet(os.path.join(out, "w1", "split", "data"))
    assert w.count() == n_docs and s.count() == n_docs
    # weights sum to the number of clusters+singletons (mass 1 each)
    from pyspark.sql import functions as F
    n_groups = w.select("cluster_id").distinct().count()
    total = w.agg(F.sum("weight")).collect()[0][0]
    assert abs(total - n_groups) < 1e-3
    assert {r2["split"] for r2 in s.collect()} <= {"train", "valid", "test"}
