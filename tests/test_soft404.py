"""Soft-404 detection (functions/extract.soft404_signals) + the
soft404_filter gate row's semantics."""

import re

from distributed_lsh_spark.functions.extract import (
    BODY_PATTERN, H1_PATTERN, SOFT404_MIN_CONTENT_CHARS,
    SOFT404_PHRASE_PATTERN, TITLE_PATTERN, soft404_signals,
)

LONG = "x" * 300

# (html, expected (has_phrase, n_chars, is_soft404))
CASES = [
    ("<html><head><title>Page Not Found</title></head>"
     "<body><p>Sorry.</p></body></html>", (True, 6, True)),
    ("<html><head><title>404 - File Not Found</title></head>"
     "<body><p>gone</p></body></html>", (True, 4, True)),
    # phrase only in the h1
    ("<html><head><title>Archive</title></head><body>"
     "<h1>Oops! This page cannot be found.</h1><p>hi</p></body></html>",
     (True, 34, True)),
    # the classic false positive: an ARTICLE about 404s
    ("<html><head><title>How to fix a 404 not found error</title></head>"
     f"<body><p>{LONG}</p></body></html>", (True, 300, False)),
    # short but clean title: kept
    ("<html><head><title>Welcome</title></head>"
     "<body><p>Under construction.</p></body></html>", (False, 19, False)),
    # normal page
    ("<html><head><title>Daily digest</title></head>"
     f"<body><p>{LONG}</p></body></html>", (False, 300, False)),
    # case-insensitive phrase
    ("<html><head><title>PAGE NOT FOUND</title></head>"
     "<body><p>x</p></body></html>", (True, 1, True)),
    # phrase in the body only is NOT an error signal
    ("<html><head><title>Blog</title></head>"
     "<body><p>the words not found appear here</p></body></html>",
     (False, 31, False)),
    # no body tag at all
    ("<title>Page Not Found</title>", (True, 0, True)),
]


def _python_signals(html: str) -> tuple:
    mt = re.search(TITLE_PATTERN, html)
    mh = re.search(H1_PATTERN, html)
    head = ((mt.group(1) if mt else "") + " "
            + (mh.group(1) if mh else "")).lower()
    phrase = re.search(SOFT404_PHRASE_PATTERN, head) is not None
    mb = re.search(BODY_PATTERN, html)
    body = mb.group(1) if mb else ""
    n = len(re.sub(r"<[^>]*>", "", body))
    return phrase, n, phrase and n < SOFT404_MIN_CONTENT_CHARS


def test_signal_semantics_python_replay():
    for html, want in CASES:
        assert _python_signals(html) == want, html


def test_signal_semantics_spark_column(spark):
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(CASES)], "i int, html string")
    s = soft404_signals("html")
    got = {r["i"]: (r["p"], r["n"], r["v"]) for r in df.select(
        "i", s["has_error_phrase"].alias("p"),
        s["n_content_chars"].alias("n"),
        s["is_soft404"].alias("v")).collect()}
    for i, (_, want) in enumerate(CASES):
        assert got[i] == want, CASES[i][0]


def test_gate_row_matches_arithmetic_oracle(spark):
    import duckdb

    from distributed_lsh_spark.entry_queries import (
        _SQL_SOFT404_FILTER, q_soft404_filter,
    )

    sf_dir = "/root/testdata/sf0.001"
    out = q_soft404_filter(spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    want = con.execute(_SQL_SOFT404_FILTER).df()
    cols = sorted(out.columns)
    assert cols == sorted(want.columns)
    a = out[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    assert len(a) == len(b) > 0
    for c in cols:
        assert (a[c].astype(str) == b[c].astype(str)).all(), c
    # both verdicts occur, and the phrase-without-short-content class
    # (k=3 with a long doc) is kept
    assert out.is_soft404.any() and (~out.is_soft404).any()
    k3 = out[out.doc_id % 6 == 3]
    assert (k3.is_soft404 == (k3.n_content_chars < 200)).all()
    assert k3.has_error_phrase.all()
