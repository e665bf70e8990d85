"""WARC ingest: the Common-Crawl wire format, parsed Spark-side.

BASELINE.json's north star is "an Iceberg table of Common-Crawl-style web
pages" — but the pages START as WARC files (ISO 28500), so a user of this
engine needs the ingest edge too: WARC bytes -> (url, warc_ts, html) rows.
This module implements the format from the public spec only:

  * records are framed `WARC/1.0\\r\\n` + header lines + `\\r\\n\\r\\n` +
    exactly `Content-Length` payload bytes + `\\r\\n\\r\\n`;
  * Common Crawl compresses each record as its OWN gzip member and
    concatenates the members, so a reader can stream records without
    decompressing the whole file; `iter_warc_records` auto-detects the
    gzip magic and walks members with a zlib raw-stream loop (each
    member may still contain several plain records — tolerated);
  * the writer (`build_response_record` / `gzip_member`) exists for
    fixtures and round-trip tests and is byte-deterministic (gzip mtime
    pinned to 0, no filename field), so encoded fixtures can be md5-pinned.

Distribution model (`read_warc`): `spark.read.format("binaryFile")` — one
file per task, which matches the corpus: Common Crawl ships ~1 GB .warc.gz
files, ~90k of them per crawl, so a 100 TB ingest is ~100k independent
tasks with no shuffle at all; the parse is a generator inside
`mapInPandas`, holding one decompressed record at a time (never the whole
decompressed file).  WARC.gz is not block-splittable (gzip members carry
no index), so one-file-one-task IS the standard parallelism unit for this
format; re-sharding happens after parse via the normal repartition.

Reference parity: the reference engine reads pre-extracted text
(`/root/reference/src/mapreduce/FileInput.java`-style line inputs); WARC
ingest is the upstream edge its users run outside the engine.  Here it is
in-engine, feeding the same html->text extractor (functions/extract.py)
the gate already pins byte-identically.
"""

from __future__ import annotations

import gzip
import io
import zlib
from typing import Iterable, Iterator

CRLF = b"\r\n"
_GZIP_MAGIC = b"\x1f\x8b"
WARC_VERSION = b"WARC/1.0"


def build_record(headers: dict[str, str], payload: bytes) -> bytes:
    """Frame one WARC record (spec §4): version line, headers,
    Content-Length computed here, blank line, payload, record separator."""
    lines = [WARC_VERSION]
    for k, v in headers.items():
        if k.lower() == "content-length":
            raise ValueError("Content-Length is computed, not passed")
        lines.append(f"{k}: {v}".encode("utf-8"))
    lines.append(b"Content-Length: %d" % len(payload))
    return CRLF.join(lines) + CRLF + CRLF + payload + CRLF + CRLF


def build_response_record(url: str, date_iso: str, payload: bytes,
                          rec_id: str) -> bytes:
    """A minimal `WARC-Type: response` record the way Common Crawl lays
    it out (content-type application/http carries an HTTP envelope; we
    write the bare payload form used by conversion records to keep the
    byte-identity contract on the html payload itself)."""
    return build_record({
        "WARC-Type": "response",
        "WARC-Record-ID": f"<urn:uuid:{rec_id}>",
        "WARC-Date": date_iso,
        "WARC-Target-URI": url,
        "Content-Type": "text/html",
    }, payload)


def gzip_member(data: bytes) -> bytes:
    """Deterministic single-member gzip (mtime=0, no filename) — the
    per-record member framing Common Crawl uses."""
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", compresslevel=6, mtime=0) as g:
        g.write(data)
    return buf.getvalue()


def _iter_gzip_members(blob: bytes) -> Iterator[bytes]:
    """Decompress a concatenation of gzip members one member at a time
    (zlib wbits=31 stops at member end; unused_data is the next member)."""
    rest = blob
    while rest:
        d = zlib.decompressobj(wbits=31)
        out = d.decompress(rest)
        if not d.eof:
            raise ValueError("truncated gzip member in WARC file")
        yield out + d.flush()
        rest = d.unused_data


def _parse_records(data: bytes, strict: bool = True) -> Iterator[dict]:
    """Parse concatenated plain WARC records from one buffer."""
    pos = 0
    n = len(data)
    while pos < n:
        # tolerate extra record separators between records
        while data.startswith(CRLF, pos):
            pos += 2
        if pos >= n:
            return
        head_end = data.find(CRLF + CRLF, pos)
        if head_end < 0:
            raise ValueError("WARC header block missing terminator")
        head = data[pos:head_end]
        lines = head.split(CRLF)
        if not lines[0].startswith(b"WARC/"):
            raise ValueError(f"bad WARC version line: {lines[0][:40]!r}")
        headers: dict[str, str] = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(b":")
            headers[k.strip().decode("utf-8").lower()] = \
                v.strip().decode("utf-8")
        try:
            clen = int(headers["content-length"])
        except KeyError:
            raise ValueError("WARC record without Content-Length") from None
        body_start = head_end + 4
        body_end = body_start + clen
        if body_end > n:
            raise ValueError("WARC payload truncated")
        if strict and data[body_end:body_end + 4] != CRLF + CRLF:
            raise ValueError("WARC record separator missing after payload")
        yield {"headers": headers, "payload": data[body_start:body_end]}
        pos = body_end


def iter_warc_records(blob: bytes, strict: bool = True) -> Iterator[dict]:
    """Iterate records of one WARC file, gzipped (per-member or whole-file)
    or plain — auto-detected.  Each dict: {"headers": {lower: value},
    "payload": bytes}."""
    if blob.startswith(_GZIP_MAGIC):
        for member in _iter_gzip_members(blob):
            yield from _parse_records(member, strict=strict)
    else:
        yield from _parse_records(blob, strict=strict)


def encode_warc_file(records: Iterable[bytes], gzipped: bool) -> bytes:
    """Concatenate framed records into one file blob, per-record-gzip
    (Common Crawl layout) when `gzipped`."""
    if gzipped:
        return b"".join(gzip_member(r) for r in records)
    return b"".join(records)


# ---------------------------------------------------------------------------
# Spark reader

WARC_PAGE_SCHEMA = ("warc_file string, url string, warc_ts timestamp, "
                    "record_type string, record_id string, html binary")


def read_warc(spark, path: str):
    """WARC files -> DataFrame(warc_file, url, warc_ts, record_type,
    record_id, html) — the north-star page shape minus the derived
    text/lang columns (functions.extract / lang-id run downstream).

    One file = one task (binaryFile is non-splittable; see module doc for
    why that is the right unit for .warc.gz).  The parse generator holds
    one record at a time; only non-record rows (warcinfo/request) are
    dropped here so predicate pushdown has nothing to lose.
    """
    from pyspark.sql import functions as F

    def parse(batches):
        import pandas as pd
        for pdf in batches:
            for path_, blob in zip(pdf["path"], pdf["content"]):
                rows = []
                for rec in iter_warc_records(bytes(blob)):
                    h = rec["headers"]
                    if h.get("warc-type") not in ("response", "conversion"):
                        continue
                    rows.append((path_, h.get("warc-target-uri"),
                                 pd.Timestamp(h.get("warc-date"))
                                   .tz_localize(None)
                                 if h.get("warc-date") else None,
                                 h.get("warc-type"),
                                 h.get("warc-record-id"),
                                 rec["payload"]))
                    if len(rows) >= 256:
                        yield pd.DataFrame(rows, columns=[
                            "warc_file", "url", "warc_ts", "record_type",
                            "record_id", "html"])
                        rows = []
                if rows:
                    yield pd.DataFrame(rows, columns=[
                        "warc_file", "url", "warc_ts", "record_type",
                        "record_id", "html"])

    binary = (spark.read.format("binaryFile").load(path)
              .select("path", "content"))
    return binary.mapInPandas(parse, schema=WARC_PAGE_SCHEMA)
