"""Publication-date extraction (functions/extract.published_date,
htmldate-core cascade) + the pub_date_extract gate row's semantics."""

import re

from distributed_lsh_spark.functions.extract import (
    PUBDATE_META_A_PATTERN, PUBDATE_META_B_PATTERN, PUBDATE_TIME_PATTERN,
    URL_DATE_PATTERN, published_date,
)

D = "2024-03-15"
U = "https://h1.example.com/p/9"

# (html, url, expected source, expected date) — the gate's 6 planting
# variants plus adversarial shapes the gate's moduli can't carry
CASES = [
    (f'<meta property="article:published_time" content="{D}">', U,
     "meta", D),
    (f'<meta content="{D}" property="article:published_time">', U,
     "meta", D),                                     # content-first
    (f'<meta content={D} property=article:published_time>', U,
     "meta", D),                                     # unquoted
    (f'<META PROPERTY="ARTICLE:PUBLISHED_TIME" CONTENT="{D}">', U,
     "meta", D),                                     # uppercase
    (f'<time datetime="{D}">x</time>', U, "time", D),
    (f'<TIME DATETIME={D}>x</TIME>', U, "time", D),  # unquoted uppercase
    ("", "https://h1.example.com/2024/03/15/post-9", "url", D),
    ("", U, "none", ""),                             # nothing anywhere
    # priority: meta beats time beats url
    (f'<meta property="article:published_time" content="{D}">'
     f'<time datetime="2025-01-01">', U, "meta", D),
    (f'<time datetime="{D}">', "https://h1.example.com/2025/01/01/post-9",
     "time", D),
    # decoy: description merely MENTIONS the property name + a date
    ('<meta name="description" content="article:published_time '
     '2020-01-01">', U, "none", ""),
    # decoy: a dated content on a DIFFERENT property
    ('<meta property="og:title" content="2020-05-05 headline">', U,
     "none", ""),
    # decoy: <time> without datetime
    ("<time>March 5</time>", U, "none", ""),
    # bounds: month 13 / day 40 never parse as dates
    ('<time datetime="2024-13-01">', U, "none", ""),
    ('<time datetime="2024-12-40">', U, "none", ""),
    ("", "https://h1.example.com/2024/13/01/post-9", "none", ""),
    # attributes cannot leak across a tag's '>'
    (f'<meta property="article:published_time"><meta content="{D}">', U,
     "none", ""),
    # URL date must be a full /Y/M/D/ path segment run
    ("", "https://h1.example.com/2024/03/post-9", "none", ""),
    # datetime with a full timestamp still yields the date prefix
    (f'<time datetime="{D}T10:22:01Z">x</time>', U, "time", D),
]


def _python_cascade(html: str, url: str) -> tuple[str, str]:
    ma = re.search(PUBDATE_META_A_PATTERN, html)
    mb = re.search(PUBDATE_META_B_PATTERN, html)
    meta = ma.group(1) if ma else (mb.group(1) if mb else "")
    mt = re.search(PUBDATE_TIME_PATTERN, html)
    t = mt.group(1) if mt else ""
    mu = re.search(URL_DATE_PATTERN, url)
    u = "-".join(mu.groups()) if mu else ""
    if meta:
        return "meta", meta
    if t:
        return "time", t
    if u:
        return "url", u
    return "none", ""


def test_pattern_semantics_python_replay():
    for html, url, want_src, want_date in CASES:
        got = _python_cascade(html, url)
        assert got == (want_src, want_date), (html, url)


def test_pattern_semantics_spark_column(spark):
    df = spark.createDataFrame(
        [(i, f"<html><head>{h}</head><body>x</body></html>", u)
         for i, (h, u, _, _) in enumerate(CASES)],
        "i int, html string, url string")
    pd_ = published_date("html", "url")
    got = {r["i"]: (r["s"], r["d"])
           for r in df.select("i", pd_["source"].alias("s"),
                              pd_["date"].alias("d")).collect()}
    for i, (_, _, want_src, want_date) in enumerate(CASES):
        assert got[i] == (want_src, want_date), CASES[i][:2]


def test_gate_row_matches_arithmetic_oracle(spark):
    """The pub_date_extract query's (source, date) per doc equals the
    DuckDB oracle's pure doc_id arithmetic — the oracle never parses
    html or urls, so a wrong pattern cannot pass by matching itself."""
    import duckdb

    from distributed_lsh_spark.entry_queries import (
        _SQL_PUB_DATE_EXTRACT, q_pub_date_extract,
    )

    sf_dir = "/root/testdata/sf0.001"
    out = q_pub_date_extract(spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    want = con.execute(_SQL_PUB_DATE_EXTRACT).df()
    cols = sorted(out.columns)
    assert cols == sorted(want.columns)
    a = out[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    assert len(a) == len(b) > 0
    for c in cols:
        assert (a[c].astype(str) == b[c].astype(str)).all(), c
    # shape sanity: every cascade branch fires on the planted corpus
    assert set(out.pub_source) == {"meta", "time", "url", "none"}
    dated = out[out.pub_source != "none"]
    assert (dated.pub_date.str.match(r"\d{4}-\d{2}-\d{2}$")).all()
    assert (out[out.pub_source == "none"].pub_date == "").all()
