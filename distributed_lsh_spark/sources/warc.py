"""WARC ingest: the Common-Crawl wire format, parsed Spark-side.

BASELINE.json's north star is "an Iceberg table of Common-Crawl-style web
pages" — but the pages START as WARC files (ISO 28500), so a user of this
engine needs the ingest edge too: WARC bytes -> (url, warc_ts, html) rows.
This module implements the format from the public spec only:

  * records are framed `WARC/1.0\\r\\n` + header lines + `\\r\\n\\r\\n` +
    exactly `Content-Length` payload bytes + `\\r\\n\\r\\n`;
  * Common Crawl compresses each record as its OWN gzip member and
    concatenates the members, so a reader can stream records without
    decompressing the whole file; the parser auto-detects the gzip magic
    and walks members with one zlib raw-stream decompressor at a time;
  * the writer (`build_response_record` / `gzip_member`) exists for
    fixtures and round-trip tests and is byte-deterministic (gzip mtime
    pinned to 0, no filename field), so encoded fixtures can be md5-pinned.

Everything is INCREMENTAL (`iter_warc_records_stream`): the parser is fed
chunks and holds at most one record (plus one input chunk) in memory, so
a 1 GB .warc.gz never materializes — neither compressed nor decompressed.
The obvious simpler implementations both fail at Common Crawl shape:
whole-file `binaryFile` content hits Arrow's 2 GB row limit and holds the
file twice, and per-member `unused_data` slicing re-copies the remaining
blob once per member — quadratic over the ~50-100k members per file.

Distribution model (`read_warc`): file PATHS are enumerated with the
binaryFile source (content column pruned away — metadata-only listing,
works on any Hadoop FS / glob) and each task OPENS its file itself
(pyarrow.fs for s3:// etc., plain open() for file:) and streams it through
the incremental parser.  One file per task matches the corpus: Common
Crawl ships ~1 GB .warc.gz files, ~90k per crawl, so a 100 TB ingest is
~100k independent tasks with no shuffle at all; WARC.gz is not
block-splittable (gzip members carry no index), so one-file-one-task IS
the standard parallelism unit, and re-sharding happens after parse.

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
_MAX_HEADER = 1 << 20          # a sane bound; real WARC headers are ~300 B


# ---------------------------------------------------------------------------
# Writer (fixtures / tests; byte-deterministic)

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


def encode_warc_file(records: Iterable[bytes], gzipped: bool) -> bytes:
    """Concatenate framed records into one file blob, per-record-gzip
    (Common Crawl layout) when `gzipped`."""
    if gzipped:
        return b"".join(gzip_member(r) for r in records)
    return b"".join(records)


# ---------------------------------------------------------------------------
# Incremental parser

class _Assembler:
    """Feed plain (decompressed) WARC bytes in arbitrary chunks; yields
    complete records.  Holds at most one record in its buffer — the
    buffer is trimmed after every emitted record."""

    def __init__(self, strict: bool = True) -> None:
        self.buf = bytearray()
        self.strict = strict

    def feed(self, data: bytes) -> Iterator[dict]:
        self.buf += data
        yield from self._drain(final=False)

    def finish(self) -> Iterator[dict]:
        yield from self._drain(final=True)
        if self.buf:
            raise ValueError("WARC header block missing terminator")

    def _drain(self, final: bool) -> Iterator[dict]:
        buf = self.buf
        while True:
            while buf.startswith(CRLF):
                del buf[:2]
            if not buf:
                return
            head_end = buf.find(CRLF + CRLF)
            if head_end < 0:
                if len(buf) > _MAX_HEADER:
                    raise ValueError("WARC header block missing terminator")
                return          # wait for more input (finish() errors)
            lines = bytes(buf[:head_end]).split(CRLF)
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
                raise ValueError(
                    "WARC record without Content-Length") from None
            body_start = head_end + 4
            body_end = body_start + clen
            if len(buf) < body_end:
                if final:
                    raise ValueError("WARC payload truncated")
                return
            if self.strict:
                if len(buf) < body_end + 4 and not final:
                    return      # separator may still arrive
                if bytes(buf[body_end:body_end + 4]) != CRLF + CRLF:
                    raise ValueError(
                        "WARC record separator missing after payload")
            yield {"headers": headers,
                   "payload": bytes(buf[body_start:body_end])}
            del buf[:body_end]


def _stream_plain(chunks: Iterable[bytes], strict: bool) -> Iterator[dict]:
    asm = _Assembler(strict)
    for c in chunks:
        yield from asm.feed(c)
    yield from asm.finish()


def _stream_gzip(chunks: Iterable[bytes], strict: bool) -> Iterator[dict]:
    """Walk concatenated gzip members with one decompressor at a time;
    O(input) total — no per-member re-slicing of the remainder."""
    asm = _Assembler(strict)
    d = None
    for c in chunks:
        data = bytes(c)
        while data:
            if d is None:
                d = zlib.decompressobj(wbits=31)
            try:
                out = d.decompress(data)
            except zlib.error as e:
                raise ValueError(f"bad gzip member in WARC file: {e}") \
                    from None
            if out:
                yield from asm.feed(out)
            if d.eof:
                data = d.unused_data   # bounded by one input chunk
                d = None
            else:
                data = b""
    if d is not None:
        raise ValueError("truncated gzip member in WARC file")
    yield from asm.finish()


def iter_warc_records_stream(chunks: Iterable[bytes],
                             strict: bool = True) -> Iterator[dict]:
    """Iterate records of one WARC file from a chunk stream, gzipped
    (per-member or whole-file) or plain — auto-detected.  Each dict:
    {"headers": {lowercased-name: value}, "payload": bytes}.  Memory is
    O(one record + one chunk) regardless of file size."""
    it = iter(chunks)
    head = b""
    while len(head) < 2:       # need 2 bytes to sniff the gzip magic
        try:
            head += next(it)
        except StopIteration:
            break
    if not head:
        return
    rest = _chain_first(head, it)
    if head.startswith(_GZIP_MAGIC):
        yield from _stream_gzip(rest, strict)
    else:
        yield from _stream_plain(rest, strict)


def _chain_first(first: bytes, it: Iterator[bytes]) -> Iterator[bytes]:
    yield first
    yield from it


def iter_warc_records(blob: bytes, strict: bool = True) -> Iterator[dict]:
    """Whole-buffer convenience wrapper over the chunked parser."""
    yield from iter_warc_records_stream([blob], strict=strict)


# ---------------------------------------------------------------------------
# Spark reader

WARC_PAGE_SCHEMA = ("warc_file string, url string, warc_ts timestamp, "
                    "record_type string, record_id string, html binary")


def _file_chunks(uri: str, chunk_bytes: int) -> Iterator[bytes]:
    """Open `uri` inside the task and stream it in chunks.  file: URIs
    (and bare paths) use plain open(); other schemes (s3://, hdfs://,
    gs://...) go through pyarrow.fs, which is how Python workers reach
    object stores without the JVM (py4j is driver-only)."""
    if uri.startswith("file:"):
        p = uri[5:]
        if p.startswith("///"):
            p = p[2:]
        f = open(p, "rb")
    elif "://" not in uri:
        f = open(uri, "rb")
    else:
        from pyarrow import fs as pafs
        fsys, p = pafs.FileSystem.from_uri(uri)
        f = fsys.open_input_stream(p)
    with f:
        while True:
            b = f.read(chunk_bytes)
            if not b:
                return
            yield bytes(b)


def read_warc(spark, path: str, chunk_bytes: int = 4 << 20):
    """WARC files -> DataFrame(warc_file, url, warc_ts, record_type,
    record_id, html) — the north-star page shape minus the derived
    text/lang columns (functions.extract / lang-id run downstream).

    Listing rides the binaryFile source with the content column pruned
    (metadata only, any Hadoop FS or glob); each task then streams its
    own file through the incremental parser — one file = one task, one
    record in memory at a time (see module doc for why that is the right
    unit for .warc.gz).  Only response/conversion records survive here,
    so there is nothing downstream pruning could have skipped.
    """
    def parse(batches):
        import pandas as pd
        for pdf in batches:
            for path_ in pdf["path"]:
                rows = []
                for rec in iter_warc_records_stream(
                        _file_chunks(path_, chunk_bytes)):
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

    listing = (spark.read.format("binaryFile").load(path)
               .select("path"))
    return listing.mapInPandas(parse, schema=WARC_PAGE_SCHEMA)


def _open_output(uri: str):
    import os

    if uri.startswith("file:"):
        p = uri[5:]
        if p.startswith("///"):
            p = p[2:]
        os.makedirs(os.path.dirname(p), exist_ok=True)
        return open(p, "wb")
    if "://" not in uri:
        os.makedirs(os.path.dirname(uri), exist_ok=True)
        return open(uri, "wb")
    from pyarrow import fs as pafs
    fsys, p = pafs.FileSystem.from_uri(uri)
    fsys.create_dir(p.rsplit("/", 1)[0], recursive=True)
    return fsys.open_output_stream(p)


def write_warc(df, out_dir: str, text_col: str = "text",
               record_type: str = "conversion", gzipped: bool = True,
               suffix: str | None = None) -> int:
    """Pages -> WET-style WARC files: one `WARC-Type: conversion` record
    per row (url, warc_ts, `text_col`), one output file per partition
    (`part-NNNNN.warc[.gz]`), per-record gzip members when `gzipped` —
    the Common Crawl WET layout, so curated/extracted text can be handed
    back to any WARC-consuming tool.  Returns the number of records
    written (one action).

    Deterministic bytes per partition content: record ids are md5 of
    (url, ts, text) — re-running the same input yields byte-identical
    files (gzip mtime pinned), so the sink composes with the checkpoint
    resume contract.  Rows stream through one at a time; memory is
    O(one record).  Size the files with a repartition upstream (the
    standard ~1 GB target at production scale)."""
    import hashlib

    sfx = suffix if suffix is not None else (".warc.gz" if gzipped
                                             else ".warc")

    def write_part(pid, it):
        n = 0
        f = None
        try:
            for row in it:
                if f is None:
                    f = _open_output(f"{out_dir}/part-{pid:05d}{sfx}")
                ts = row["warc_ts"]
                date_iso = (ts.strftime("%Y-%m-%dT%H:%M:%SZ")
                            if ts is not None else "1970-01-01T00:00:00Z")
                payload = (row[text_col] or "").encode("utf-8")
                rec_id = hashlib.md5(
                    f"{row['url']}|{date_iso}|".encode("utf-8") + payload
                ).hexdigest()
                rec = build_record({
                    "WARC-Type": record_type,
                    "WARC-Record-ID": f"<urn:uuid:{rec_id}>",
                    "WARC-Date": date_iso,
                    "WARC-Target-URI": row["url"] or "",
                    "Content-Type": "text/plain",
                }, payload)
                f.write(gzip_member(rec) if gzipped else rec)
                n += 1
        finally:
            if f is not None:
                f.close()
        yield n

    counts = (df.select("url", "warc_ts", text_col).rdd
              .mapPartitionsWithIndex(write_part).collect())
    return int(sum(counts))
