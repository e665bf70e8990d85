"""JSON-LD @type census (functions/extract.jsonld_type_counts) + the
jsonld_types gate row's semantics."""

import re
from collections import Counter

from distributed_lsh_spark.functions.extract import (
    JSONLD_BLOCK_PATTERN, JSONLD_TYPE_ARRAY_PATTERN,
    JSONLD_TYPE_SCALAR_PATTERN, _QUOTED_TOKEN, jsonld_type_counts,
)

LD = '<script type="application/ld+json">'

# (html, expected {type: count})
CASES = [
    (f'{LD}{{"@type":"NewsArticle"}}</script>', {"NewsArticle": 1}),
    (f'{LD}{{"@type" : "Recipe"}}</script>', {"Recipe": 1}),   # spacing
    # two blocks on one page
    (f'{LD}{{"@type":"NewsArticle"}}</script>'
     f'{LD}{{"@type":"BreadcrumbList"}}</script>',
     {"NewsArticle": 1, "BreadcrumbList": 1}),
    # array spelling, both extract, no scalar double-count
    (f'{LD}{{"@type": ["Product", "Offer"]}}</script>',
     {"Product": 1, "Offer": 1}),
    # nested entity: two scalar types inside one block
    (f'{LD}{{"@type":"Article","author":{{"@type":"Person"}}}}</script>',
     {"Article": 1, "Person": 1}),
    # decoys: plain script, prose mention, wrong mime type
    ('<script>var x = {"@type": "Fake"};</script>', {}),
    ('<p>the "@type": "Decoy" phrase in prose</p>', {}),
    (f'<script type="text/javascript">{{"@type":"Nope"}}</script>', {}),
    # duplicate type across blocks aggregates
    (f'{LD}{{"@type":"FAQPage"}}</script>{LD}{{"@type":"FAQPage"}}'
     '</script>', {"FAQPage": 2}),
    # block spans "newlines" (the (?s) flag)
    (f'{LD}\n{{\n  "@type": "VideoObject"\n}}\n</script>',
     {"VideoObject": 1}),
    ("", {}),
]


def _python_census(html: str) -> dict:
    got: Counter = Counter()
    for block in re.findall(JSONLD_BLOCK_PATTERN, html):
        got.update(re.findall(JSONLD_TYPE_SCALAR_PATTERN, block))
        for arr in re.findall(JSONLD_TYPE_ARRAY_PATTERN, block):
            got.update(re.findall(_QUOTED_TOKEN, arr))
    return dict(got)


def test_pattern_semantics_python_replay():
    for html, want in CASES:
        assert _python_census(html) == want, html


def test_census_spark_frame(spark):
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(CASES)], "doc_id long, html string")
    rows = jsonld_type_counts(df, "html", "doc_id").collect()
    got: dict[int, dict] = {}
    for r in rows:
        got.setdefault(r["doc_id"], {})[r["sd_type"]] = r["n"]
    for i, (_, want) in enumerate(CASES):
        assert got.get(i, {}) == want, CASES[i][0]


def test_gate_row_matches_arithmetic_oracle(spark):
    import duckdb

    from distributed_lsh_spark.entry_queries import (
        _SQL_JSONLD_TYPES, q_jsonld_types,
    )

    sf_dir = "/root/testdata/sf0.001"
    out = q_jsonld_types(spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    want = con.execute(_SQL_JSONLD_TYPES).df()
    cols = sorted(out.columns)
    assert cols == sorted(want.columns)
    a = out[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    assert len(a) == len(b) > 0
    for c in cols:
        assert (a[c].astype(str) == b[c].astype(str)).all(), c
    # decoy and empty docs contribute no rows; array docs carry both types
    assert set(out.sd_type) == {"NewsArticle", "BreadcrumbList",
                                "Product", "Offer"}
