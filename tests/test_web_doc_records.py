"""web_doc_records — the capstone extractor composition (drop
precedence, canonical fold/fallback, pub-date cascade) against the
arithmetic oracle."""


def test_gate_row_matches_arithmetic_oracle(spark):
    import duckdb

    from distributed_lsh_spark.entry_queries import (
        _SQL_WEB_DOC_RECORDS, q_web_doc_records,
    )

    sf_dir = "/root/testdata/sf0.001"
    out = q_web_doc_records(spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    want = con.execute(_SQL_WEB_DOC_RECORDS).df()
    cols = sorted(out.columns)
    assert cols == sorted(want.columns)
    a = out[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    assert len(a) == len(b) > 0
    for c in cols:
        assert (a[c].astype(str) == b[c].astype(str)).all(), c


def test_drop_precedence_and_folds(spark):
    """Noindex and soft-404 docs drop (a doc hitting both drops once);
    even docs fold to the declared canonical, odd fall back to their
    own url; %3 docs carry the meta date, others ''."""
    from distributed_lsh_spark.entry_queries import q_web_doc_records

    sf_dir = "/root/testdata/sf0.001"
    out = q_web_doc_records(spark, sf_dir).toPandas()
    ids = set(out.doc_id)
    assert all(i % 11 != 0 and i % 13 != 0 for i in ids)
    ev = out[out.doc_id % 2 == 0]
    od = out[out.doc_id % 2 == 1]
    assert ev.canonical_url.str.startswith("https://canon.").all()
    assert od.canonical_url.str.contains(r"\.example\.com/p/").all()
    assert (out[out.doc_id % 3 == 0].pub_date != "").all()
    assert (out[out.doc_id % 3 != 0].pub_date == "").all()
    assert (out.n_chars > 0).all()
