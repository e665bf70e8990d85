"""sources/jsonl.py: JSONL interchange roundtrip, corrupt-line handling,
binary-column drop, and the curate CLI flow over/into JSONL."""

from __future__ import annotations

import datetime
import glob
import gzip
import json
import os

from pyspark.sql import functions as F

from distributed_lsh_spark.sources.jsonl import read_jsonl, write_jsonl


def _pages_df(spark, n=30):
    rows = [(f"http://h{i % 5}.example.com/p/{i}",
             datetime.datetime(2024, 1, 1 + i % 20, 12, 0, i % 60),
             bytes([i % 250, 1, 2]),
             f"document body number {i} with shared tail tokens",
             "en") for i in range(n)]
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, "
              "text string, lang string")


def test_jsonl_roundtrip_drops_binary(spark, tmp_path):
    src = _pages_df(spark)
    out = str(tmp_path / "jl")
    n = write_jsonl(src, out, shards=3)
    assert n == 30
    # gzip shard count == requested downstream parallelism
    assert len(glob.glob(os.path.join(out, "part-*.json.gz"))) == 3
    back = read_jsonl(spark, out)
    assert "_corrupt_record" in back.columns and "html" not in back.columns
    got = {r["url"]: r for r in back.collect()}
    want = {r["url"]: r for r in src.collect()}
    assert got.keys() == want.keys()
    for u in want:
        assert got[u]["warc_ts"] == want[u]["warc_ts"]  # ts roundtrips
        assert got[u]["text"] == want[u]["text"]
        assert got[u]["lang"] == want[u]["lang"]
        assert got[u]["_corrupt_record"] is None


def test_jsonl_permissive_quarantines_corrupt_lines(spark, tmp_path):
    p = tmp_path / "dirty"
    p.mkdir()
    with open(p / "a.jsonl", "w") as fh:
        fh.write(json.dumps({"url": "http://a", "text": "ok", "lang": "en"})
                 + "\n")
        fh.write("{not json at all\n")
        fh.write(json.dumps({"url": "http://b", "text": "ok2"}) + "\n")
    df = read_jsonl(spark, str(p))
    clean = df.where(F.col("_corrupt_record").isNull())
    # audit pattern: co-select a data column so the plan never references
    # ONLY _corrupt_record (Spark forbids that pruned shape)
    dirty = (df.where(F.col("_corrupt_record").isNotNull())
               .select("url", "_corrupt_record").collect())
    assert {r["url"] for r in clean.collect()} == {"http://a", "http://b"}
    assert len(dirty) == 1  # the broken line is quantified, not fatal
    assert dirty[0]["_corrupt_record"].startswith("{not json")


def test_cli_curate_jsonl_in_and_out(spark, tmp_path, capsys):
    from distributed_lsh_spark.cli import main

    src = str(tmp_path / "pages_jl")
    out = str(tmp_path / "run")
    jl_out = str(tmp_path / "survivors_jl")
    write_jsonl(_pages_df(spark), src)
    main(["curate", "--input", src, "--input-format", "jsonl",
          "--output", out, "--run-id", "j1", "--no-quality",
          "--jsonl-output", jl_out, "--jsonl-shards", "2",
          "--cores", "8"])
    r = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r["n_docs"] == 30
    assert r["jsonl_records"] == r["n_survivors"] > 0
    # the exported shards really are valid gzipped JSONL of the survivors
    files = glob.glob(os.path.join(jl_out, "part-*.json.gz"))
    assert len(files) == 2
    recs = []
    for f in files:
        with gzip.open(f, "rt") as fh:
            recs += [json.loads(ln) for ln in fh if ln.strip()]
    assert len(recs) == r["jsonl_records"]
    assert all("html" not in rec for rec in recs)
    assert all(rec["url"].startswith("http://") for rec in recs)
