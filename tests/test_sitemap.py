"""Sitemap parsing (functions/extract.sitemap_entries) + the
sitemap_urls gate row."""

import re

from distributed_lsh_spark.functions.extract import (
    SITEMAP_CHILD_BLOCK_PATTERN, SITEMAP_LASTMOD_PATTERN,
    SITEMAP_LOC_PATTERN, SITEMAP_URL_BLOCK_PATTERN, sitemap_entries,
)

U = "https://s.example.com/p/1"

# (xml, expected [(kind, loc, lastmod)])
CASES = [
    (f"<urlset><url><loc>{U}</loc><lastmod>2024-03-15</lastmod></url>"
     "</urlset>", [("urlset", U, "2024-03-15")]),
    # optional lastmod absent
    (f"<urlset><url><loc>{U}</loc></url></urlset>", [("urlset", U, "")]),
    # whitespace inside loc trims; multiline entries
    (f"<urlset><url>\n<loc> {U} </loc>\n</url></urlset>",
     [("urlset", U, "")]),
    # two entries keep their own lastmod (block isolation)
    (f"<urlset><url><loc>{U}a</loc><lastmod>2024-01-01</lastmod></url>"
     f"<url><loc>{U}b</loc></url></urlset>",
     [("urlset", U + "a", "2024-01-01"), ("urlset", U + "b", "")]),
    # sitemapindex children
    (f"<sitemapindex><sitemap><loc>{U}.xml</loc></sitemap></sitemapindex>",
     [("sitemapindex", U + ".xml", "")]),
    # prose mention of <loc> outside an entry block yields nothing
    (f"<html><p>the tag &lt;loc&gt; and even <loc>{U}</loc></p></html>",
     []),
    # malformed opener is not an entry
    (f"<urlset><URL never closes<url><loc>{U}</loc></url></urlset>",
     [("urlset", U, "")]),
    # empty loc is dropped
    ("<urlset><url><loc></loc></url></urlset>", []),
]


def _python_entries(xml: str):
    out = []
    for pat, kind in ((SITEMAP_URL_BLOCK_PATTERN, "urlset"),
                      (SITEMAP_CHILD_BLOCK_PATTERN, "sitemapindex")):
        for block in re.findall(pat, xml):
            ml = re.search(SITEMAP_LOC_PATTERN, block)
            if not ml:
                continue
            mm = re.search(SITEMAP_LASTMOD_PATTERN, block)
            out.append((kind, ml.group(1), mm.group(1) if mm else ""))
    return out


def test_python_replay():
    for xml, want in CASES:
        assert sorted(_python_entries(xml)) == sorted(want), xml


def test_spark_frame(spark):
    df = spark.createDataFrame([(i, x) for i, (x, _) in enumerate(CASES)],
                               "doc_id long, html string")
    rows = sitemap_entries(df, "html", "doc_id").collect()
    got: dict[int, list] = {}
    for r in rows:
        got.setdefault(r["doc_id"], []).append(
            (r["kind"], r["loc"], r["lastmod"]))
    for i, (_, want) in enumerate(CASES):
        assert sorted(got.get(i, [])) == sorted(want), CASES[i][0]


def test_gate_row_matches_arithmetic_oracle(spark):
    import duckdb

    from distributed_lsh_spark.entry_queries import (
        _SQL_SITEMAP_URLS, q_sitemap_urls,
    )

    sf_dir = "/root/testdata/sf0.001"
    out = q_sitemap_urls(spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    want = con.execute(_SQL_SITEMAP_URLS).df()
    cols = sorted(out.columns)
    assert cols == sorted(want.columns)
    a = out[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    assert len(a) == len(b) > 0
    for c in cols:
        assert (a[c].astype(str) == b[c].astype(str)).all(), c
    # both kinds appear; the missing-lastmod entries come back ''
    assert set(out.kind) == {"urlset", "sitemapindex"}
    assert (out[out["loc"].str.contains("/q/")].lastmod == "").all()
    assert (out[out["loc"].str.contains("/p/")].lastmod != "").all()
