"""WARC source tests: parser pinned against hand-written raw bytes
(independent of the writer), writer/parser round-trip in both layouts,
error seams, and the distributed `read_warc` reader end-to-end."""

from __future__ import annotations

import gzip
import hashlib

import pytest

from distributed_lsh_spark.sources import warc as W

# A raw two-record WARC file written BY HAND (never through the writer),
# exercising: mixed-case header names, an extra non-standard header,
# a warcinfo record, and a payload containing CRLFCRLF (length-framed,
# so it must NOT confuse the parser).
_RAW = (
    b"WARC/1.0\r\n"
    b"WARC-Type: warcinfo\r\n"
    b"WARC-Record-ID: <urn:uuid:aaa>\r\n"
    b"Content-Type: application/warc-fields\r\n"
    b"Content-Length: 9\r\n"
    b"\r\n"
    b"robots: x"
    b"\r\n\r\n"
    b"WARC/1.0\r\n"
    b"warc-type: response\r\n"
    b"WARC-TARGET-URI: https://ex.com/a\r\n"
    b"Warc-Date: 2026-01-02T03:04:05Z\r\n"
    b"WARC-Record-ID: <urn:uuid:bbb>\r\n"
    b"X-Custom: keep me\r\n"
    b"Content-Length: 17\r\n"
    b"\r\n"
    b"ab\r\n\r\ncd<html>xyz"
    b"\r\n\r\n"
)


def test_parser_on_handwritten_bytes_plain():
    recs = list(W.iter_warc_records(_RAW))
    assert [r["headers"]["warc-type"] for r in recs] == \
        ["warcinfo", "response"]
    r = recs[1]
    assert r["headers"]["warc-target-uri"] == "https://ex.com/a"
    assert r["headers"]["warc-date"] == "2026-01-02T03:04:05Z"
    assert r["headers"]["x-custom"] == "keep me"
    assert r["payload"] == b"ab\r\n\r\ncd<html>xyz"


def test_parser_on_handwritten_bytes_gzip_members():
    # one member per record — the Common Crawl layout — compressed with
    # plain stdlib gzip (NOT the repo's gzip_member), so parser parity
    # does not depend on the writer's framing choices at all
    split = _RAW.index(b"WARC/1.0", 1)
    blob = gzip.compress(_RAW[:split]) + gzip.compress(_RAW[split:])
    recs = list(W.iter_warc_records(blob))
    assert len(recs) == 2
    assert recs[1]["payload"] == b"ab\r\n\r\ncd<html>xyz"


def test_chunked_stream_equals_whole_blob():
    # every tiny chunk size crosses header/payload/separator/gzip-member
    # boundaries somewhere; the incremental parser must not care
    recs = [W.build_response_record(f"https://ex.com/{i}",
                                    "2026-01-01T00:00:00Z",
                                    (b"x" * i) + b"\r\n\r\n" + bytes([i]),
                                    f"id{i}")
            for i in range(9)]
    for gz in (False, True):
        blob = W.encode_warc_file(recs, gzipped=gz)
        want = [(r["headers"]["warc-target-uri"], r["payload"])
                for r in W.iter_warc_records(blob)]
        assert len(want) == 9
        for size in (1, 2, 3, 7, 64, 1 << 20):
            chunks = [blob[i:i + size] for i in range(0, len(blob), size)]
            got = [(r["headers"]["warc-target-uri"], r["payload"])
                   for r in W.iter_warc_records_stream(chunks)]
            assert got == want, (gz, size)


def test_roundtrip_both_layouts():
    recs = [W.build_response_record(f"https://ex.com/{i}",
                                    "2026-01-01T00:00:00Z",
                                    b"<p>%d</p>" % i, f"id{i}")
            for i in range(5)]
    for gz in (False, True):
        out = list(W.iter_warc_records(W.encode_warc_file(recs, gzipped=gz)))
        assert [r["headers"]["warc-target-uri"] for r in out] == \
            [f"https://ex.com/{i}" for i in range(5)]
        assert [r["payload"] for r in out] == \
            [b"<p>%d</p>" % i for i in range(5)]


def test_writer_bytes_deterministic():
    rec = W.build_response_record("https://ex.com/a",
                                  "2026-01-01T00:00:00Z", b"xy", "i")
    # gzip mtime pinned to 0 -> encoded bytes are a pure function of input
    assert W.gzip_member(rec) == W.gzip_member(rec)
    assert hashlib.md5(rec).hexdigest() == \
        hashlib.md5(W.build_response_record(
            "https://ex.com/a", "2026-01-01T00:00:00Z", b"xy",
            "i")).hexdigest()


def test_error_seams():
    with pytest.raises(ValueError, match="truncated gzip"):
        list(W.iter_warc_records(gzip.compress(_RAW)[:-4]))
    with pytest.raises(ValueError, match="payload truncated"):
        list(W.iter_warc_records(_RAW[:-10]))
    with pytest.raises(ValueError, match="version"):
        list(W.iter_warc_records(b"HTTP/1.1 200\r\n\r\n"))
    with pytest.raises(ValueError, match="Content-Length"):
        list(W.iter_warc_records(
            b"WARC/1.0\r\nWARC-Type: response\r\n\r\n"))
    # separator check is strict by default, relaxable
    noisy = _RAW.rstrip(b"\r\n")  # drop only the final record separator
    with pytest.raises(ValueError, match="separator"):
        list(W.iter_warc_records(noisy))
    assert len(list(W.iter_warc_records(noisy, strict=False))) == 2


def test_read_warc_spark(spark, tmp_path):
    recs = [W.build_response_record(f"https://ex.com/{i}",
                                    f"2026-01-01T00:00:{i:02d}Z",
                                    b"<html>%d</html>" % i, f"id{i}")
            for i in range(6)]
    info = W.build_record({"WARC-Type": "warcinfo",
                           "WARC-Record-ID": "<urn:uuid:z>"}, b"meta")
    (tmp_path / "a.warc").write_bytes(
        W.encode_warc_file([info] + recs[:3], gzipped=False))
    (tmp_path / "b.warc.gz").write_bytes(
        W.encode_warc_file(recs[3:], gzipped=True))

    df = W.read_warc(spark, str(tmp_path)).orderBy("url")
    rows = df.collect()
    # warcinfo dropped; 6 response records across the two files
    assert [r.url for r in rows] == [f"https://ex.com/{i}" for i in range(6)]
    assert [bytes(r.html) for r in rows] == \
        [b"<html>%d</html>" % i for i in range(6)]
    assert rows[5].warc_ts.second == 5
    assert rows[0].record_type == "response"
    assert rows[0].warc_file.endswith("a.warc")


def test_write_warc_wet_roundtrip(spark, tmp_path):
    import glob

    rows = [(f"https://ex.com/{i}", None if i == 4 else
             __import__("datetime").datetime(2026, 1, 2, 3, 4, i),
             f"extracted text {i}" if i != 3 else None)
            for i in range(6)]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, text string").repartition(3)
    out = str(tmp_path / "wet")
    n = W.write_warc(df, out, gzipped=True)
    assert n == 6
    files = sorted(glob.glob(out + "/part-*.warc.gz"))
    assert 1 <= len(files) <= 3

    back = {r.url: r for r in W.read_warc(spark, out).collect()}
    assert set(back) == {f"https://ex.com/{i}" for i in range(6)}
    r2 = back["https://ex.com/2"]
    assert bytes(r2.html) == b"extracted text 2"
    assert r2.record_type == "conversion"
    assert r2.warc_ts.second == 2
    assert bytes(back["https://ex.com/3"].html) == b""      # null text
    assert back["https://ex.com/4"].warc_ts.year == 1970    # null ts

    # deterministic bytes: same input -> same file contents
    out2 = str(tmp_path / "wet2")
    W.write_warc(df, out2, gzipped=True)
    blob1 = b"".join(open(f, "rb").read() for f in files)
    blob2 = b"".join(open(f, "rb").read() for f in
                     sorted(glob.glob(out2 + "/part-*.warc.gz")))
    assert hashlib.md5(blob1).hexdigest() == hashlib.md5(blob2).hexdigest()


def test_warc_extract_gate_row_matches_oracle(spark):
    import duckdb

    from distributed_lsh_spark.entry_queries import ORACLE_SQL, QUERIES

    sf = "/root/testdata/sf0.001"
    sdf = QUERIES["warc_extract"](spark, sf).toPandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    ddf = con.execute(ORACLE_SQL["warc_extract"]).df()
    assert len(sdf) == len(ddf) > 0
    for c in ["url", "warc_date", "record_id", "payload_len", "ext_md5",
              "n_text_chars"]:
        assert list(sdf[c].astype(str)) == list(ddf[c].astype(str)), c
