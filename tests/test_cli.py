"""CLI smoke: dedup verb end-to-end with checkpoint resume, query verb on a
small vectors table."""

from __future__ import annotations

import json
import os

from distributed_lsh_spark.cli import main


def test_cli_dedup_and_resume(spark, tmp_path, capsys):
    src = str(tmp_path / "pages")
    out = str(tmp_path / "out")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
         .select("doc_id", "text").write.parquet(src)

    args = ["dedup", "--input", src, "--output", out, "--run-id", "t1",
            "--cores", "8"]
    main(args)
    r1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r1["n_dup_pairs"] > 0 and r1["n_clustered_docs"] > 0

    # resume: all stages complete -> same numbers, much less work
    main(args)
    r2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert (r1["n_dup_pairs"], r1["n_clustered_docs"]) == \
           (r2["n_dup_pairs"], r2["n_clustered_docs"])
    assert os.path.exists(os.path.join(out, "t1", "clusters", "manifest.json"))


def test_cli_query_ann(spark, tmp_path, capsys):
    from distributed_lsh_spark.fixtures import make_vectors_fixture

    fx = make_vectors_fixture(n=200, d=8, t=63, n_queries=5, max_k=10)
    pts = str(tmp_path / "pts")
    qs = str(tmp_path / "qs")
    out = str(tmp_path / "res")
    spark.createDataFrame([(i, fx.points[i].tolist()) for i in range(len(fx.points))],
                          "id long, vec array<int>").write.parquet(pts)
    spark.createDataFrame([(i, fx.queries[i].tolist()) for i in range(len(fx.queries))],
                          "query_id long, vec array<int>").write.parquet(qs)
    main(["query", "--input", pts, "--queries", qs, "--output", out,
          "--k", "3", "--cores", "8"])
    r = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r["queries"] == 5
    assert r["tables_reused"] is False
    got = spark.read.parquet(out)
    assert got.count() == r["results"]
    assert set(got.columns) == {"query_id", "point_id", "dist", "rank"}
    first = sorted(map(tuple, got.collect()))

    # -b/-s split: second invocation (same run-id, same input/model) hits
    # the ann_tables manifest, skips the build, returns identical results
    main(["query", "--input", pts, "--queries", qs, "--output", out,
          "--k", "3", "--cores", "8"])
    r2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r2["tables_reused"] is True
    assert r2["results"] == r["results"]
    assert sorted(map(tuple, spark.read.parquet(out).collect())) == first


def test_ann_prebuilt_tables_match_direct(spark):
    """ann_search_spark(tables=build_hash_tables(...)) == the recompute
    path, point for point."""
    from distributed_lsh_spark.fixtures import make_vectors_fixture
    from distributed_lsh_spark.operators.ann import ann_search_spark, build_hash_tables
    from distributed_lsh_spark.oracle.reference_lsh import ReferenceLSHModel

    fx = make_vectors_fixture(n=200, d=8, t=63, n_queries=5, max_k=10)
    model = ReferenceLSHModel(dim=8, max_coordinate=63, cardinality=200,
                              ratio=2, seed=42)
    pts = spark.createDataFrame(
        [(i, fx.points[i].tolist()) for i in range(len(fx.points))],
        "id long, vec array<int>")
    qs = spark.createDataFrame(
        [(i, fx.queries[i].tolist()) for i in range(len(fx.queries))],
        "query_id long, vec array<int>")
    tables = build_hash_tables(pts, model).persist()
    assert tables.count() == 200 * model.L * model.n_radii
    direct = sorted(map(tuple, ann_search_spark(spark, pts, qs, model, k=3).collect()))
    via_tables = sorted(map(tuple,
                            ann_search_spark(spark, pts, qs, model, k=3,
                                             tables=tables).collect()))
    tables.unpersist()
    assert via_tables == direct


def test_cli_curate_and_resume(spark, tmp_path, capsys):
    from pyspark.sql import functions as F

    src = str(tmp_path / "pages")
    out = str(tmp_path / "cur")
    (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
          .select("doc_id", "text")
          .withColumn("url", F.concat(F.lit("https://x/p/"),
                                      F.pmod("doc_id", F.lit(97)).cast("string")))
          .withColumn("warc_epoch", (F.col("doc_id") * 7).cast("long"))
          .write.parquet(src))

    args = ["curate", "--input", src, "--output", out, "--run-id", "c1",
            "--cores", "8"]
    main(args)
    r1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    tiers = {t["tier"]: t for t in r1["tiers"]}
    assert list(tiers) == ["input", "url_latest", "exact", "quality",
                           "near_dup"]
    assert tiers["url_latest"]["docs_removed"] > 0      # ~n/97 urls
    assert r1["n_survivors"] == tiers["near_dup"]["docs_out"]
    surv = spark.read.parquet(os.path.join(out, "c1", "funnel_near_dup", "data"))
    assert surv.count() == r1["n_survivors"]

    # resume: every tier served from its manifest, identical metrics
    main(args)
    r2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r2["tiers"] == r1["tiers"]

    # --no-quality drops the tier
    main(["curate", "--input", src, "--output", out, "--run-id", "c2",
          "--cores", "8", "--no-quality"])
    r3 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert [t["tier"] for t in r3["tiers"]] == ["input", "url_latest",
                                                "exact", "near_dup"]


def test_cli_curate_tier_set_change_invalidates(spark, tmp_path, capsys):
    """Re-running a run-id with a different tier SET (--no-quality) must
    REBUILD, not resume stale tiers built under the old semantics."""
    from pyspark.sql import functions as F

    src = str(tmp_path / "pages")
    out = str(tmp_path / "cur")
    (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
          .select("doc_id", "text").write.parquet(src))

    main(["curate", "--input", src, "--output", out, "--run-id", "cq",
          "--cores", "8"])
    r1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    main(["curate", "--input", src, "--output", out, "--run-id", "cq",
          "--cores", "8", "--no-quality"])
    r2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "quality" in {t["tier"] for t in r1["tiers"]}
    assert "quality" not in {t["tier"] for t in r2["tiers"]}
    # quality removes rows at sf0.001, so the rebuilt near_dup input differs
    assert r2["tiers"][-1]["docs_in"] != r1["tiers"][-1]["docs_in"]


def test_cli_curate_blocklist(spark, tmp_path, capsys):
    """--blocked-hosts/--blocked-url-regex run as a map-only pre-funnel
    pass; the removal count lands in the JSON and a changed blocklist
    invalidates the run-id's staged tiers (config echo)."""
    from pyspark.sql import functions as F

    src = str(tmp_path / "pages")
    out = str(tmp_path / "cur")
    (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
          .select("doc_id", "text")
          .withColumn("url", F.concat(
              F.lit("https://h"), F.pmod("doc_id", F.lit(3)).cast("string"),
              F.lit(".example.com/p/"),
              F.pmod("doc_id", F.lit(97)).cast("string")))
          .withColumn("warc_epoch", (F.col("doc_id") * 7).cast("long"))
          .write.parquet(src))
    n_total = spark.read.parquet(src).count()
    n_h1 = spark.read.parquet(src).where(
        F.pmod("doc_id", F.lit(3)) == 1).count()

    blfile = tmp_path / "ut1.txt"
    blfile.write_text("# adult\nH1.example.COM\n\n")
    args = ["curate", "--input", src, "--output", out, "--run-id", "bl",
            "--cores", "8", "--blocked-hosts", str(blfile)]
    main(args)
    r1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r1["blocklist_removed"] == n_h1
    assert r1["tiers"][0]["docs_out"] == n_total - n_h1
    surv = spark.read.parquet(os.path.join(out, "bl", "funnel_near_dup",
                                           "data"))
    assert surv.where(surv.url.contains("//h1.")).count() == 0

    # a changed blocklist rides the config echo: same run-id REBUILDS
    blfile.write_text("h1.example.com\nh2.example.com\n")
    main(args)
    r2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r2["blocklist_removed"] > n_h1
    assert r2["tiers"][0]["docs_out"] < r1["tiers"][0]["docs_out"]

    # pattern-only blocking needs no hosts file
    main(["curate", "--input", src, "--output", out, "--run-id", "blp",
          "--cores", "8", "--blocked-url-regex", r"/p/1[35]$"])
    r3 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r3["blocklist_removed"] > 0


def test_cli_curate_drop_contained(spark, tmp_path, capsys):
    """--drop-contained adds the fifth tier: a planted doc-in-doc copy
    (containment ~1, Jaccard far below threshold) is dropped, the
    survivors stage becomes funnel_containment, and the flag rides the
    checkpoint config echo."""
    from pyspark.sql import functions as F

    src = str(tmp_path / "pages")
    out = str(tmp_path / "cur")
    base = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text"))
    donor = base.where("doc_id = 11").collect()[0]["text"]
    filler = " ".join(f"cliw{i:03d}" for i in range(150))
    planted = spark.createDataFrame(
        [(900000, f"{filler} {donor} {filler}")], "doc_id long, text string")
    base.unionByName(planted).write.parquet(src)

    main(["curate", "--input", src, "--output", out, "--run-id", "cc",
          "--cores", "8", "--drop-contained"])
    r = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    tiers = {t["tier"]: t for t in r["tiers"]}
    assert [t["tier"] for t in r["tiers"]][-1] == "containment"
    assert r["survivors_stage"] == "funnel_containment"
    assert tiers["containment"]["docs_removed"] >= 1
    surv = spark.read.parquet(
        os.path.join(out, "cc", "funnel_containment", "data"))
    ids = {row["doc_id"] for row in surv.select("doc_id").collect()}
    assert 900000 in ids and 11 not in ids
    assert surv.count() == r["n_survivors"]


def test_cli_dedup_against_archive(spark, tmp_path, capsys):
    """Incremental mode: a new crawl batch probes an existing archive —
    re-crawled near-identical pages map to their archive doc, novel
    pages don't; passing the archive's persisted signature checkpoint
    (--against-sigs) gives identical results without touching the
    archive text."""
    from pyspark.sql import functions as F

    arch = str(tmp_path / "archive")
    newp = str(tmp_path / "new")
    out = str(tmp_path / "dd")
    base = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text"))
    base.write.parquet(arch)
    # new batch: 3 re-crawls (one appended token — near-dup of the
    # original) + 2 novel docs; ids offset to keep the spaces disjoint
    recrawls = (base.where("doc_id in (2, 11, 17)")
                .select((F.col("doc_id") + 5_000_000).alias("doc_id"),
                        F.concat("text", F.lit(" recrawl")).alias("text")))
    novel = spark.createDataFrame(
        [(6_000_000, " ".join(f"novel{i}" for i in range(40))),
         (6_000_001, " ".join(f"fresh{i}" for i in range(40)))],
        "doc_id long, text string")
    recrawls.unionByName(novel).write.parquet(newp)

    # full dedup of the archive first — its signatures checkpoint is the
    # --against-sigs input of the incremental run
    main(["dedup", "--input", arch, "--output", out, "--run-id", "arch",
          "--cores", "8"])
    capsys.readouterr()

    main(["dedup", "--input", newp, "--output", out, "--run-id", "inc",
          "--cores", "8", "--against", arch])
    r1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r1["n_new_docs"] == 5
    assert r1["n_dup_of_archive"] == 3 and r1["n_novel"] == 2
    dups = spark.read.parquet(os.path.join(out, "inc", "against_dups",
                                           "data"))
    got = {r["doc_id"]: r["dup_of"] for r in dups.collect()}
    assert got == {5_000_002: 2, 5_000_011: 11, 5_000_017: 17}

    sig_dir = os.path.join(out, "arch", "signatures", "data")
    main(["dedup", "--input", newp, "--output", out, "--run-id", "inc2",
          "--cores", "8", "--against", arch, "--against-sigs", sig_dir])
    r2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert (r2["n_dup_of_archive"], r2["n_novel"]) == (3, 2)
    dups2 = spark.read.parquet(os.path.join(out, "inc2", "against_dups",
                                            "data"))
    assert {r["doc_id"]: r["dup_of"] for r in dups2.collect()} == got


def test_cli_dedup_against_merge_labels(spark, tmp_path, capsys):
    """--merge-labels: the incremental probe's edges fold into an
    existing archive labeling without re-clustering it — re-crawled docs
    join their original's cluster, untouched labels survive verbatim."""
    from pyspark.sql import functions as F

    arch = str(tmp_path / "archive")
    newp = str(tmp_path / "new")
    out = str(tmp_path / "dd")
    labels_p = str(tmp_path / "labels")
    base = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text"))
    base.write.parquet(arch)
    recrawl = (base.where("doc_id in (2, 11)")
               .select((F.col("doc_id") + 5_000_000).alias("doc_id"),
                       F.concat("text", F.lit(" recrawl")).alias("text")))
    recrawl.write.parquet(newp)
    # archive labeling: docs 2 and 7 already share a cluster; 11 is its
    # own singleton cluster
    spark.createDataFrame([(2, 2), (7, 2), (11, 11), (30, 30)],
                          "doc_id long, cluster_id long") \
         .write.parquet(labels_p)

    main(["dedup", "--input", newp, "--output", out, "--run-id", "m",
          "--cores", "8", "--against", arch, "--merge-labels", labels_p])
    r = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r["n_dup_of_archive"] == 2
    assert r["n_labels"] == 6          # 4 standing + 2 new docs
    lbl = spark.read.parquet(os.path.join(out, "m", "updated_labels",
                                          "data"))
    got = {x["doc_id"]: x["cluster_id"] for x in lbl.collect()}
    assert got == {2: 2, 7: 2, 11: 11, 30: 30,
                   5_000_002: 2, 5_000_011: 11}


def test_cli_topics(spark, tmp_path, capsys):
    """`topics` writes a checkpointed assignment table identical to the
    operator's direct output, and a rerun resumes from the manifest."""
    out = str(tmp_path / "tp")
    main(["topics", "--input", "/root/testdata/sf0.001/embeddings.parquet",
          "--output", out, "--run-id", "t", "--k", "4", "--iters", "2",
          "--cores", "8"])
    r = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r["n_vectors"] == 500 and r["k"] == 4
    assert r["smallest_cluster"] >= 1
    got = spark.read.parquet(os.path.join(out, "t", "topic_assignments",
                                          "data"))
    from distributed_lsh_spark.operators.kmeans import kmeans_topics
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet") \
        .select("vec_id", "embedding")
    want = {(x.vec_id, x.cluster_id)
            for x in kmeans_topics(emb, k=4, iters=2).collect()}
    assert {(x.vec_id, x.cluster_id) for x in got.collect()} == want
    # resume: second run skips the stage (manifest complete)
    main(["topics", "--input", "/root/testdata/sf0.001/embeddings.parquet",
          "--output", out, "--run-id", "t", "--k", "4", "--iters", "2",
          "--cores", "8"])
    r2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r2["n_vectors"] == 500


def test_cli_retract(spark, tmp_path, capsys):
    """dedup run -> retract a deletion batch from its checkpointed
    stages: CLI output == direct retract_components, and a re-invocation
    resumes from the manifest."""
    src = str(tmp_path / "pages_r")
    out = str(tmp_path / "out_r")
    rout = str(tmp_path / "out_retract")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
         .select("doc_id", "text").write.parquet(src)
    main(["dedup", "--input", src, "--output", out, "--run-id", "t1",
          "--cores", "8"])
    capsys.readouterr()

    labels_p = os.path.join(out, "t1", "clusters", "data")
    ver_p = os.path.join(out, "t1", "verified_pairs", "data")
    ex_p = os.path.join(out, "t1", "exact_edges", "data")
    labels = spark.read.parquet(labels_p)
    # delete every 3rd labeled doc
    deleted = labels.where(labels.doc_id % 3 == 0).select("doc_id")
    del_p = str(tmp_path / "deleted")
    deleted.write.parquet(del_p)

    args = ["retract", "--labels", labels_p, "--edges", ver_p,
            "--edges", ex_p, "--deleted", del_p,
            "--output", rout, "--run-id", "t1", "--cores", "8"]
    main(args)
    r = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r["n_deleted"] == deleted.count()
    assert r["n_labels_after"] == r["n_labels_before"] - r["n_deleted"]
    assert r["n_relabeled"] > 0

    from distributed_lsh_spark.operators.snapshot import retract_components
    edges = spark.read.parquet(ver_p).select("id_a", "id_b") \
        .unionByName(spark.read.parquet(ex_p).select("id_a", "id_b"))
    want = {x.doc_id: x.cluster_id
            for x in retract_components(labels, edges,
                                        deleted).collect()}
    got = {x.doc_id: x.cluster_id
           for x in spark.read.parquet(
               os.path.join(rout, "t1", "retracted_labels", "data")).collect()}
    assert got == want

    # resume: stage manifest complete -> identical numbers
    main(args)
    r2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert (r2["n_labels_after"], r2["n_relabeled"]) == \
           (r["n_labels_after"], r["n_relabeled"])


def test_cli_audit_data_card(spark, tmp_path, capsys):
    """`audit` emits one JSON data card whose exact fields replay from
    the corpus, with sketch fields carrying the gated semantics
    (histogram quantile >= exact order stat; HLL within its band)."""
    from pyspark.sql import functions as F

    src = str(tmp_path / "pages")
    (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
     .withColumn("url", F.concat(
         F.lit("https://h"), F.pmod("doc_id", F.lit(3)).cast("string"),
         F.lit(".example.com/p/"), F.col("doc_id").cast("string")))
     .write.parquet(src))
    main(["audit", "--input", src, "--cores", "8"])
    card = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    docs = spark.read.parquet(src)
    n = docs.count()
    assert card["n_docs"] == n
    assert card["slice_col"] == "lang"
    assert sum(v["n_docs"] for v in card["slices"].values()) == n
    for v in card["slices"].values():
        assert v["p50_tokens"] <= v["p90_tokens"] <= v["p99_tokens"]
        assert 0 <= v["byte_dup_frac"] < 1
        assert v["vocab_est"] > 0
    # top_hosts covers the three planted hosts, counts sum to n
    hosts = dict(map(tuple, card["top_hosts"]))
    assert set(hosts) == {"h0.example.com", "h1.example.com",
                          "h2.example.com"}
    assert sum(hosts.values()) == n

    # absent slice column degrades to one 'all' slice
    main(["audit", "--input", src, "--cores", "8",
          "--slice-col", "nope"])
    card2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert list(card2["slices"]) == ["all"]
    assert card2["slices"]["all"]["n_docs"] == n
