"""Host-boilerplate verdict stream: after every prefix the verdict table
equals the batch rule, the changelog records the non-monotone flip
(became=false when host growth dilutes a line under the threshold), and
state survives a restart."""

from __future__ import annotations

import os
import re
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

NAV1 = "menu home search login contact about terms privacy"   # 8 tokens
NAV2 = "footer links sitemap archive topics authors feeds help"


def _filler(tag: str, n: int = 24) -> str:
    return " ".join(f"{tag}w{j}" for j in range(n))


def _batches() -> list[list[tuple[int, int, str]]]:
    """(doc_id, host, text) rows.  Host 1: NAV1 in docs 0/1 of batch 0
    (2/3 >= 30% -> boilerplate), diluted to 2/8 by batch 1 (-> flips
    off).  Host 2: NAV2 accumulates one doc per batch (1/2 in batch 0 is
    >= 30% but the flip-on case needs min_docs: 1 < 2 -> not boilerplate
    until batch 1's second occurrence)."""
    b0 = [(0, 1, f"{NAV1} {_filler('a')}"),
          (1, 1, f"{NAV1} {_filler('b')}"),
          (2, 1, _filler("c")),
          (10, 2, f"{NAV2} {_filler('d')}"),
          (11, 2, _filler("e"))]
    b1 = [(3, 1, _filler("f")), (4, 1, _filler("g")),
          (5, 1, _filler("h")), (6, 1, _filler("i")),
          (7, 1, _filler("j")),
          (12, 2, f"{NAV2} {_filler('k')}"),
          (13, 2, _filler("m"))]
    return [b0, b1]


def _oracle(rows, tau_permille=300, min_docs=2):
    """Pure-Python batch rule over an ingested prefix."""
    host_docs = defaultdict(set)
    line_docs = defaultdict(set)
    for doc_id, host, text in rows:
        host_docs[host].add(doc_id)
        toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        for i in range(0, len(toks), 8):
            line_docs[(host, " ".join(toks[i:i + 8]))].add(doc_id)
    out = set()
    for (host, line), docs in line_docs.items():
        if len(docs) >= min_docs and \
                len(docs) * 1000 >= tau_permille * len(host_docs[host]):
            out.add((host, line))
    return out


def _verdict_lines(spark, state_dir, all_rows):
    """Map the stream's (host, lk) verdicts back to line strings via the
    xxhash64 keys of every line in the corpus."""
    from distributed_lsh_spark.functions.text import doc_lines
    from distributed_lsh_spark.streaming.dedup_stream import (
        read_host_verdicts,
    )

    df = spark.createDataFrame(all_rows, "doc_id long, host long, text string")
    keyed = (doc_lines(df).join(df.select("doc_id", "host"), "doc_id")
             .select("host", "lk", "line").distinct())
    v = read_host_verdicts(spark, state_dir)
    return {(r["host"], r["line"]) for r in v.join(keyed, ["host", "lk"]).collect()}


def _drop(spark, rows, path):
    spark.createDataFrame(rows, "doc_id long, host long, text string") \
         .coalesce(1).write.parquet(path)


def test_host_boilerplate_stream_verdicts_and_flip(spark, tmp_path):
    from distributed_lsh_spark.streaming.dedup_stream import (
        incremental_host_boilerplate_stream,
    )

    b0, b1 = _batches()
    input_dir = str(tmp_path / "incoming")
    state_dir = str(tmp_path / "state")
    os.makedirs(input_dir)
    _drop(spark, b0, os.path.join(input_dir, "drop0"))
    _drop(spark, b1, os.path.join(input_dir, "drop1"))

    q = incremental_host_boilerplate_stream(
        spark, input_dir + "/*", state_dir, available_now=True,
        max_files_per_trigger=1, compact_every=2)
    q.awaitTermination(240)

    got = _verdict_lines(spark, state_dir, b0 + b1)
    expect = _oracle(b0 + b1)
    assert got == expect
    # host 2's NAV2 is boilerplate at the full prefix (2/4 docs)...
    assert (2, NAV2) in expect
    # ...but host 1's NAV1 was diluted from 2/3 to 2/8: flipped OFF
    assert (1, NAV1) not in expect
    cl = spark.read.parquet(os.path.join(state_dir, "changelog")).collect()
    flips = {(r["host"], r["lk"], r["batch_id"]): r["became"] for r in cl}
    nav1_events = sorted((b, became) for (h, lk, b), became in flips.items()
                         if h == 1)
    assert (0, True) in nav1_events and (1, False) in nav1_events, \
        "NAV1 must flip on at batch 0 and off at batch 1"


def test_host_boilerplate_stream_restart(spark, tmp_path):
    from distributed_lsh_spark.streaming.dedup_stream import (
        incremental_host_boilerplate_stream,
    )

    b0, b1 = _batches()
    input_dir = str(tmp_path / "incoming")
    state_dir = str(tmp_path / "state")
    os.makedirs(input_dir)
    _drop(spark, b0, os.path.join(input_dir, "drop0"))
    q = incremental_host_boilerplate_stream(
        spark, input_dir + "/*", state_dir, available_now=True)
    q.awaitTermination(240)
    assert _verdict_lines(spark, state_dir, b0) == _oracle(b0)

    _drop(spark, b1, os.path.join(input_dir, "drop1"))
    q2 = incremental_host_boilerplate_stream(
        spark, input_dir + "/*", state_dir, available_now=True)
    q2.awaitTermination(240)
    assert _verdict_lines(spark, state_dir, b0 + b1) == _oracle(b0 + b1)
