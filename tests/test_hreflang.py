"""Reciprocal hreflang translation-pair mining
(functions/extract.hreflang_alternates / reciprocal_hreflang_pairs) + the
hreflang_pairs gate row's semantics."""

import re

from distributed_lsh_spark.functions.extract import (
    HREFLANG_CODE_PATTERN, LINK_TAG_PATTERN, hreflang_alternates,
    reciprocal_hreflang_pairs,
)

A = "https://s.example.com/en/a"
B = "https://s.example.com/fr/a"

# (html, src_url, expected {(dst_lang, dst_url)}) — extraction shapes
EXTRACT_CASES = [
    (f'<link rel="alternate" hreflang="fr" href="{B}">', A, {("fr", B)}),
    (f'<LINK HREF={B} HREFLANG=FR REL=ALTERNATE>', A,
     {("fr", B)}),                                   # unquoted, reversed
    (f"<link rel='alternate' hreflang='pt-BR' href='{B}'>", A,
     {("pt-br", B)}),                                # region code, lowered
    (f'<link rel="alternate" hreflang="x-default" href="{B}">', A,
     set()),                                         # x-default: no language
    (f'<link rel="alternate" type="application/rss+xml" href="{B}">', A,
     set()),                                         # alternate w/o hreflang
    (f'<link rel="stylesheet" hreflang="fr" href="{B}">', A,
     set()),                                         # rel must be alternate
    (f'<link rel="alternate" hreflang="fr" href="{A}">', A,
     set()),                                         # self-reference dropped
    # attributes cannot leak across tags: the alternate tag has no hreflang
    (f'<link rel="alternate" href="{B}"><link hreflang="fr" '
     'href="x.css" rel="stylesheet">', A, set()),
    # two declarations in one page both extract
    (f'<link rel="alternate" hreflang="fr" href="{B}">'
     f'<link rel="alternate" hreflang="de" href="{B}de">', A,
     {("fr", B), ("de", B + "de")}),
    # 3-letter ISO 639-2/3 primary subtags extract whole — never
    # truncated to a different 2-letter language
    (f'<link rel="alternate" hreflang="fil" href="{B}">', A,
     {("fil", B)}),
    (f'<link rel="alternate" hreflang="haw-US" href="{B}">', A,
     {("haw-us", B)}),
    # a 4+-letter run is not a primary subtag: reject, don't truncate
    (f'<link rel="alternate" hreflang="abcd" href="{B}">', A, set()),
]


def test_extraction_python_replay():
    tag_re = re.compile(LINK_TAG_PATTERN)
    lang_re = re.compile(HREFLANG_CODE_PATTERN)
    alt_re = re.compile(
        r"""(?i)\brel\s*=\s*(?:["'][^"'>]*\balternate\b|alternate\b)""")
    href_re = re.compile(r"""(?i)\bhref\s*=\s*["']?([^"'\s>]+)""")
    for html, src, want in EXTRACT_CASES:
        got = set()
        for tag in tag_re.findall(html):
            if not alt_re.search(tag):
                continue
            ml, mh = lang_re.search(tag), href_re.search(tag)
            if ml and mh and mh.group(1) != src:
                got.add((ml.group(1).lower(), mh.group(1)))
        assert got == want, html


def test_extraction_spark_frame(spark):
    # src_url is shared across cases, so drive one single-row frame each
    for h, u, want in EXTRACT_CASES:
        one = spark.createDataFrame([(h, u)], "html string, url string")
        out = {(r["dst_lang"], r["dst_url"])
               for r in hreflang_alternates(one, "html", "url").collect()}
        assert out == want, h


def test_reciprocity_confirms_only_bidirectional(spark):
    c = "https://s.example.com/de/a"
    rows = [
        # A <-> B reciprocal; A -> C unreciprocated (C declares nothing)
        (A, f'<link rel="alternate" hreflang="fr" href="{B}">'
            f'<link rel="alternate" hreflang="de" href="{c}">'),
        (B, f'<link rel="alternate" hreflang="en" href="{A}">'),
        (c, "<p>no links</p>"),
    ]
    df = spark.createDataFrame(rows, "url string, html string")
    out = [r.asDict() for r in
           reciprocal_hreflang_pairs(df, "html", "url").collect()]
    assert len(out) == 1
    (p,) = out
    # url order: /en/ < /fr/ -> lang_a is what B calls A
    assert (p["lang_a"], p["lang_b"]) == ("en", "fr")
    assert (p["url_a"], p["url_b"]) == (A, B)


def test_gate_row_matches_arithmetic_oracle(spark):
    """hreflang_pairs equals the DuckDB oracle's pure doc_id arithmetic
    (existence + silence + the reciprocity join replayed in SQL, never
    parsing html)."""
    import duckdb

    from distributed_lsh_spark.entry_queries import (
        _SQL_HREFLANG_PAIRS, q_hreflang_pairs,
    )

    sf_dir = "/root/testdata/sf0.001"
    out = q_hreflang_pairs(spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    want = con.execute(_SQL_HREFLANG_PAIRS).df()
    cols = sorted(out.columns)
    assert cols == sorted(want.columns)
    a = out[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    assert len(a) == len(b) > 0
    for col in cols:
        assert (a[col].astype(str) == b[col].astype(str)).all(), col
    # shape sanity: silent-de clusters emit (en,fr) but never a de pair
    pairs = {(r.lang_a, r.lang_b) for r in out.itertuples()}
    assert ("en", "fr") in pairs or ("de", "en") in pairs
    silent_clusters = {int(u.rsplit("-", 1)[1])
                       for u in out.url_a if "/de/" in u} | \
                      {int(u.rsplit("-", 1)[1])
                       for u in out.url_b if "/de/" in u}
    assert all(cl % 5 != 0 for cl in silent_clusters)
