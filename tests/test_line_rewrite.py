"""Global line-dedup rewrite operator (operators/line_dedup.py): all
three modes against pure-Python replays, rewrite totality, and the
curate --line-dedup CLI tier with mode-change invalidation."""

from __future__ import annotations

import json
import os
import re
import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from distributed_lsh_spark.cli import main  # noqa: E402
from distributed_lsh_spark.operators.line_dedup import (  # noqa: E402
    remove_duplicate_lines,
)

SHARED = "alpha beta gamma delta epsilon zeta eta theta"


def _rows():
    f = lambda tag: " ".join(f"{tag}w{j}" for j in range(24))
    return [(0, f"{SHARED} {f('x')}"),
            (1, f"{SHARED} {f('y')}"),
            (2, f("z")),
            (3, "")]


def _lines(text: str) -> list[str]:
    toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
    return [" ".join(toks[i:i + 8]) for i in range(0, len(toks), 8)]


def _python_clean(rows, mode):
    cnt = Counter(ln for _, t in rows for ln in _lines(t))
    seen: set[str] = set()
    out = {}
    for doc_id, text in sorted(rows):
        ls = _lines(text)
        kept = []
        n_rm = 0
        for ln in ls:
            if mode == "c4":
                rm = cnt[ln] >= 2
            else:  # keep_first == bloom at huge m
                rm = ln in seen
            seen.add(ln)
            if rm:
                n_rm += 1
            else:
                kept.append(ln)
        out[doc_id] = (" ".join(kept), len(ls), n_rm)
    return out


def test_rewrite_modes_match_python(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for mode in ("c4", "keep_first"):
        got = {r["doc_id"]: (r["clean_text"], r["n_lines"], r["n_removed"])
               for r in remove_duplicate_lines(df, mode=mode).collect()}
        assert got == _python_clean(rows, mode), mode
    # bloom at a huge m degenerates to keep_first (FP term vanishes)
    got = {r["doc_id"]: (r["clean_text"], r["n_lines"], r["n_removed"])
           for r in remove_duplicate_lines(df, mode="bloom",
                                           bloom_m=1 << 24).collect()}
    assert got == _python_clean(rows, "keep_first")
    # semantics differ where they should: C4 removes BOTH copies of the
    # shared line, keep-first leaves doc 0's
    assert SHARED not in _python_clean(rows, "c4")[0][0]
    assert SHARED in _python_clean(rows, "keep_first")[0][0]
    # empty doc flows through (totality)
    assert got[3] == ("", 0, 0)


def test_rewrite_rejects_unknown_mode(spark):
    df = spark.createDataFrame(_rows(), "doc_id long, text string")
    try:
        remove_duplicate_lines(df, mode="exact")
    except ValueError:
        pass
    else:
        raise AssertionError("unknown mode must raise")


def test_cli_curate_line_dedup(spark, tmp_path, capsys):
    from pyspark.sql import functions as F

    src = str(tmp_path / "pages")
    out = str(tmp_path / "cur")
    # plant SHARED as the first line of every doc_id % 3 == 0 page: a
    # cross-doc repeated line the c4 tier must remove EVERYWHERE
    (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
          .select("doc_id",
                  F.when(F.pmod("doc_id", F.lit(3)) == 0,
                         F.concat(F.lit(SHARED + " "), F.col("text")))
                   .otherwise(F.col("text")).alias("text"))
          .withColumn("url", F.concat(F.lit("https://h.site/p/"),
                                      F.col("doc_id").cast("string")))
          .write.parquet(src))

    main(["curate", "--input", src, "--output", out, "--run-id", "ld",
          "--cores", "8", "--no-quality", "--line-dedup", "c4"])
    r = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r["survivors_stage"] == "line_clean"
    assert r["dup_lines_removed"] > 0
    surv = spark.read.parquet(os.path.join(out, "ld", "line_clean", "data"))
    assert surv.where(surv.text.contains(SHARED)).count() == 0
    assert surv.count() == r["n_survivors"]

    # mode change rides the config echo: keep-first REBUILDS and now the
    # first surviving carrier keeps its line
    main(["curate", "--input", src, "--output", out, "--run-id", "ld",
          "--cores", "8", "--no-quality", "--line-dedup", "keep-first"])
    r2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    surv2 = spark.read.parquet(os.path.join(out, "ld", "line_clean", "data"))
    assert surv2.where(surv2.text.contains(SHARED)).count() == 1
    assert r2["dup_lines_removed"] < r["dup_lines_removed"]
