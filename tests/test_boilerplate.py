"""Host-boilerplate stripping (operators/boilerplate.py): rewrite parity
with a pure-Python replay, threshold both-sides, empty-doc totality, and
the curate --strip-boilerplate CLI tier."""

from __future__ import annotations

import json
import os
import re
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from distributed_lsh_spark.cli import main  # noqa: E402
from distributed_lsh_spark.operators.boilerplate import (  # noqa: E402
    strip_host_boilerplate,
)

NAV = "menu home search login contact about terms privacy"


def _rows():
    """Host 'a': NAV in 2 of 3 docs (67% -> stripped); host 'b': NAV in
    1 of 4 docs (25% < 30% -> kept); one empty doc."""
    f = lambda tag: " ".join(f"{tag}w{j}" for j in range(24))
    return [(0, "a", f"{NAV} {f('x')}"),
            (1, "a", f"{NAV} {f('y')}"),
            (2, "a", f("z")),
            (10, "b", f"{NAV} {f('p')}"),
            (11, "b", f("q")), (12, "b", f("r")), (13, "b", f("s")),
            (20, "b", "")]


def _python_clean(rows, tau_permille=300, min_docs=2):
    host_docs, line_docs, doc_lines_py = defaultdict(set), defaultdict(set), {}
    for doc_id, host, text in rows:
        host_docs[host].add(doc_id)
        toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        ls = [" ".join(toks[i:i + 8]) for i in range(0, len(toks), 8)]
        doc_lines_py[doc_id] = (host, ls)
        for line in ls:
            line_docs[(host, line)].add(doc_id)
    boiler = {k for k, ds in line_docs.items()
              if len(ds) >= min_docs
              and len(ds) * 1000 >= tau_permille * len(host_docs[k[0]])}
    out = {}
    for doc_id, (host, ls) in doc_lines_py.items():
        kept = [l for l in ls if (host, l) not in boiler]
        out[doc_id] = (" ".join(kept), len(ls), len(ls) - len(kept))
    return out


def test_strip_matches_python_and_respects_threshold(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, "doc_id long, host string, text string")
    got = {r["doc_id"]: (r["clean_text"], r["n_lines"], r["n_removed"])
           for r in strip_host_boilerplate(df).collect()}
    expect = _python_clean(rows)
    assert got == expect
    # host a: NAV stripped from both carriers; host b: kept
    assert NAV not in got[0][0] and NAV not in got[1][0]
    assert got[0][2] >= 1
    assert NAV in got[10][0] and got[10][2] == 0
    # empty doc flows through: 0 lines, empty clean text
    assert got[20] == ("", 0, 0)


def test_cli_curate_strip_boilerplate(spark, tmp_path, capsys):
    from pyspark.sql import functions as F

    src = str(tmp_path / "pages")
    out = str(tmp_path / "cur")
    # ~97 urls -> hosts h0/h1 via doc_id parity; plant NAV on every even
    # doc so each host's even half (>= 30%, >= 2 docs) carries it
    (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
          .select("doc_id",
                  F.when(F.pmod("doc_id", F.lit(2)) == 0,
                         F.concat(F.lit(NAV + " "), F.col("text")))
                   .otherwise(F.col("text")).alias("text"))
          .withColumn("url", F.concat(F.lit("https://h"),
                                      F.pmod("doc_id", F.lit(2)).cast("string"),
                                      F.lit(".site/p/"),
                                      F.col("doc_id").cast("string")))
          .write.parquet(src))

    main(["curate", "--input", src, "--output", out, "--run-id", "sb",
          "--cores", "8", "--no-quality", "--strip-boilerplate"])
    r = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r["survivors_stage"] == "boiler_clean"
    assert r["boilerplate_lines_removed"] > 0
    surv = spark.read.parquet(os.path.join(out, "sb", "boiler_clean", "data"))
    assert surv.where(surv.text.contains(NAV)).count() == 0
    assert surv.count() == r["n_survivors"]
