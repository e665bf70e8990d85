"""URL canonicalization: scalar spec pinned on hand-stated cases, UDF
parity with the scalar, and the gate row against its DuckDB oracle."""

from __future__ import annotations

import pytest

from distributed_lsh_spark.functions.url import canonicalize_url

CASES = [
    # scheme/host case, default port (§6.2.2.1 / §6.2.3)
    ("HTTP://Ex.COM:80/a", "http://ex.com/a"),
    ("https://ex.com:443/a", "https://ex.com/a"),
    ("https://ex.com:8443/a", "https://ex.com:8443/a"),
    # empty path -> "/"
    ("http://ex.com", "http://ex.com/"),
    ("http://ex.com?q=1", "http://ex.com/?q=1"),
    # fragment dropped
    ("http://ex.com/a#frag", "http://ex.com/a"),
    # percent-normalization: unreserved decoded, others uppercased
    ("http://ex.com/p%2Dq%2fr", "http://ex.com/p-q%2Fr"),
    # dot segments (§5.2.4), incl. trailing-dot slash preservation
    ("http://ex.com/a/../b/./c", "http://ex.com/b/c"),
    ("http://ex.com/a/b/..", "http://ex.com/a/"),
    ("http://ex.com/../a", "http://ex.com/a"),
    # query: sort, strip tracking, drop empty
    ("http://ex.com/a?b=2&a=1", "http://ex.com/a?a=1&b=2"),
    ("http://ex.com/a?utm_source=x&gclid=1", "http://ex.com/a"),
    ("http://ex.com/a?UTM_Medium=y&z=1", "http://ex.com/a?z=1"),
    ("http://ex.com/a?flag&b=1", "http://ex.com/a?b=1&flag"),
    # userinfo and non-default port preserved
    ("http://u:p@Ex.com/x", "http://u:p@ex.com/x"),
    # non-http(s) and garbage pass through untouched
    ("ftp://ex.com/a", "ftp://ex.com/a"),
    ("not a url", "not a url"),
    # bad port / bracket garbage raise inside .hostname/.port, not
    # urlsplit — must survive as pass-through, not a task kill
    ("http://ex.com:80x/a", "http://ex.com:80x/a"),
    ("http://[::1:80/a", "http://[::1:80/a"),
    ("http:///just-a-path", "http:///just-a-path"),
    (None, None),
]


@pytest.mark.parametrize("raw,want", CASES)
def test_scalar_spec(raw, want):
    assert canonicalize_url(raw) == want


def test_idempotent():
    for raw, want in CASES:
        if want is not None:
            assert canonicalize_url(want) == want


def test_udf_matches_scalar(spark):
    from pyspark.sql import functions as F

    from distributed_lsh_spark.functions.url import canonicalize_url_udf

    raws = [c[0] for c in CASES if c[0] is not None]
    df = spark.createDataFrame([(r,) for r in raws], "url string")
    got = [r.c for r in
           df.select(canonicalize_url_udf(F.col("url")).alias("c"))
             .collect()]
    assert got == [canonicalize_url(r) for r in raws]


def test_gate_row_matches_oracle(spark):
    import duckdb

    from distributed_lsh_spark.entry_queries import ORACLE_SQL, QUERIES

    sf = "/root/testdata/sf0.001"
    sdf = QUERIES["url_canonical_dedup"](spark, sf).toPandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    ddf = con.execute(ORACLE_SQL["url_canonical_dedup"]).df()
    assert len(sdf) == len(ddf) > 0
    for c in sdf.columns:
        assert list(sdf[c].astype(str)) == list(ddf[c].astype(str)), c
    # the planting really exercised every messy variant
    assert sdf["n_forms"].max() > 1
