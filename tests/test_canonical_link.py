"""rel=canonical link extraction (functions/extract.canonical_href,
RFC 6596) + the canonical_link_dedup gate row's fold semantics."""

import re

from pyspark.sql import functions as F

from distributed_lsh_spark.functions.extract import (
    CANONICAL_A_PATTERN, CANONICAL_B_PATTERN, canonical_href,
)

T = "https://t.example.com/x"

# (html, expected href) — the gate's 8 planting variants plus adversarial
# shapes the gate's moduli can't carry
CASES = [
    (f'<link rel="canonical" href="{T}">', T),
    (f'<link href="{T}" rel="canonical">', T),                  # reversed
    (f'<link rel=canonical href={T}>', T),                      # unquoted
    (f'<LINK REL="CANONICAL" HREF="{T}">', T),                  # uppercase
    (f'<link rel="alternate canonical" href="{T}">', T),        # token list
    ('<link rel="stylesheet" href="canonical.css">', ""),       # decoy rel
    (f'<link type="text/html" rel="canonical" data-x="1" href="{T}">', T),
    ("<p>no link at all rel=canonical in prose</p>", ""),       # not a <link>
    (f"<link rel='canonical' href='{T}'>", T),                  # single quotes
    (f'<link rel="noncanonical" href="{T}">', ""),              # \b bound
    # attributes cannot leak across a tag's '>'
    (f'<link rel="canonical"><link rel="stylesheet" href="{T}">', ""),
    # first canonical wins when a stylesheet precedes it
    (f'<link rel="stylesheet" href="a.css"><link rel="canonical" '
     f'href="{T}">', T),
    # unquoted rel must be the bare token, not a substring of another value
    ('<link rel=stylesheet href=canonical.css>', ""),
]


def test_pattern_semantics_python_replay():
    pa, pb = re.compile(CANONICAL_A_PATTERN), re.compile(CANONICAL_B_PATTERN)
    for html, want in CASES:
        ma, mb = pa.search(html), pb.search(html)
        got = ma.group(1) if ma else (mb.group(1) if mb else "")
        assert got == want, html


def test_pattern_semantics_spark_column(spark):
    df = spark.createDataFrame(
        [(i, f"<html><head>{h}</head><body>x</body></html>")
         for i, (h, _) in enumerate(CASES)],
        "i int, html string")
    got = {r["i"]: r["c"]
           for r in df.select(
               "i", canonical_href("html").alias("c")).collect()}
    for i, (_, want) in enumerate(CASES):
        assert got[i] == want, CASES[i][0]


def test_gate_row_folds_onto_declared_target(spark):
    """The canonical_link_dedup query folds every declaring variant of one
    target into a single group while decoy/absent docs keep per-doc urls —
    checked against independent doc_id arithmetic, not the extractor."""
    import duckdb

    from distributed_lsh_spark.entry_queries import (
        _SQL_CANONICAL_LINK_DEDUP, q_canonical_link_dedup,
    )

    sf_dir = "/root/testdata/sf0.001"
    out = q_canonical_link_dedup(spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    want = con.execute(_SQL_CANONICAL_LINK_DEDUP).df()
    cols = sorted(out.columns)
    assert cols == sorted(want.columns)
    a = out[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    assert len(a) == len(b)
    for c in cols:
        assert (a[c].astype(str) == b[c].astype(str)).all(), c
    # shape sanity: shared targets exist and fold >1 doc with canonicals
    shared = out[out.canonical_url.str.startswith("https://canon.")]
    assert (shared.n_with_canon == shared.n_docs).all()
    assert (shared.n_docs > 1).any()
    own = out[~out.canonical_url.str.startswith("https://canon.")]
    assert (own.n_docs == 1).all() and (own.n_with_canon == 0).all()
