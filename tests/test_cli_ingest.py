"""ingest verb: WARC files -> north-star pages parquet, chained into the
curate funnel end to end; curate's --canonical-urls tier semantics."""

from __future__ import annotations

import json

from distributed_lsh_spark.cli import main
from distributed_lsh_spark.sources import warc as W

_HTML = (b"<html><head><title>T</title></head><body><h1>Doc %d</h1>"
         b"<p>the quick brown fox and the lazy dog are here with %d</p>"
         b"</body></html>")


def _write_warcs(tmp_path, n=12):
    # messy url spellings that all canonicalize to https://hX.ex.com/p/N
    recs = []
    for i in range(n):
        messy = (f"HTTPS://H{i % 3}.Ex.COM:443/p/{i}?utm_source=t#frag"
                 if i % 2 else f"https://h{i % 3}.ex.com/p/{i}")
        recs.append(W.build_response_record(
            messy, f"2026-01-01T00:00:{i:02d}Z", _HTML % (i, i), f"id{i}"))
    (tmp_path / "a.warc.gz").write_bytes(
        W.encode_warc_file(recs[: n // 2], gzipped=True))
    (tmp_path / "b.warc").write_bytes(
        W.encode_warc_file(recs[n // 2:], gzipped=False))


def test_ingest_then_curate(spark, tmp_path, capsys):
    _write_warcs(tmp_path)
    pages = str(tmp_path / "pages")
    main(["ingest", "--input", str(tmp_path / "*.warc*"),
          "--output", pages, "--cores", "8"])
    r = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r["n_pages"] == 12 and r["canonical_urls"] is True

    df = spark.read.parquet(pages)
    assert df.columns == ["url", "warc_ts", "html", "text", "lang"]
    rows = {x.url: x for x in df.collect()}
    # canonicalization folded case/port/tracking/fragment away
    assert set(rows) == {f"https://h{i % 3}.ex.com/p/{i}" for i in range(12)}
    r0 = rows["https://h0.ex.com/p/0"]
    assert r0.text == ("T Doc 0\nthe quick brown fox and the lazy dog "
                       "are here with 0")
    assert r0.lang == "en"
    assert bytes(r0.html) == _HTML % (0, 0)

    # the ingest output is directly curate-able (funnel over url/warc_ts),
    # and survivors export back to WET conversion records in one flag
    wet = str(tmp_path / "wet")
    main(["curate", "--input", pages, "--output", str(tmp_path / "cur"),
          "--run-id", "c1", "--no-quality", "--cores", "8",
          "--wet-output", wet])
    c = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert c["n_docs"] == 12
    assert 0 < c["n_survivors"] <= 12
    tiers = [t["tier"] for t in c["tiers"]]
    assert "url_latest" in tiers
    assert c["wet_records"] == c["n_survivors"]

    from distributed_lsh_spark.sources.warc import read_warc
    back = read_warc(spark, wet)
    assert back.count() == c["n_survivors"]
    assert {r.record_type for r in back.collect()} == {"conversion"}


def test_curate_canonical_urls_flag(spark, tmp_path, capsys):
    # two spellings of ONE url, different warc_epoch: without the flag
    # they are distinct urls (2 survivors of the url tier); with it the
    # url tier keeps only the newest
    rows = [
        (1, "text one alpha", "HTTP://Ex.COM:80/a?utm_source=x", 100),
        (2, "text two beta", "http://ex.com/a", 200),
        (3, "text three gamma", "http://other.com/b", 50),
    ]
    src = str(tmp_path / "pages")
    spark.createDataFrame(
        rows, "doc_id long, text string, url string, warc_epoch long") \
        .write.parquet(src)

    out = str(tmp_path / "out")
    main(["curate", "--input", src, "--output", out, "--run-id", "k1",
          "--no-quality", "--canonical-urls", "--cores", "4"])
    r = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    url_tier = next(t for t in r["tiers"] if t["tier"] == "url_latest")
    assert url_tier["docs_out"] == 2          # doc 2 beat doc 1; doc 3 kept

    # same run-id WITHOUT the flag: config echo changed -> tiers rebuild
    main(["curate", "--input", src, "--output", out, "--run-id", "k1",
          "--no-quality", "--cores", "4"])
    r2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    url_tier2 = next(t for t in r2["tiers"] if t["tier"] == "url_latest")
    assert url_tier2["docs_out"] == 3         # raw spellings stay distinct
