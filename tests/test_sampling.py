"""Stratified sampling: the gate row's kept SET reproduced by independent
plain-Python arithmetic (no Spark, no DuckDB), and rate sanity."""

from __future__ import annotations

import hashlib

import duckdb

RATES = {"en": 500, "de": 800, "fr": 800, "es": 800, "zh": 250}


def test_stratified_sample_matches_plain_python(spark):
    from distributed_lsh_spark.entry_queries import QUERIES

    sf = "/root/testdata/sf0.001"
    rows = duckdb.sql(
        f"SELECT doc_id, lang FROM "
        f"read_parquet('{sf}/documents.parquet')").fetchall()

    strata: dict[str, dict] = {}
    for doc_id, lang in rows:
        rate = RATES.get(lang, 1000)
        st = strata.setdefault(lang, {"rate": rate, "n": 0, "kept": []})
        st["n"] += 1
        if (doc_id * 7919 + 17) % 1000 < rate:
            st["kept"].append(doc_id)

    got = {r.lang: r for r in QUERIES["stratified_sample"](spark, sf)
           .collect()}
    assert set(got) == set(strata)
    for lang, st in strata.items():
        g = got[lang]
        assert g.rate_pm == st["rate"]
        assert g.n_docs == st["n"]
        assert g.n_kept == len(st["kept"])
        want_md5 = hashlib.md5(
            ",".join(str(i) for i in sorted(st["kept"])).encode()
        ).hexdigest()
        assert g.kept_ids_md5 == want_md5, lang
        # the sampler actually thins the stratum (not all-kept, not empty)
        if st["rate"] < 1000 and st["n"] >= 20:
            assert 0 < g.n_kept < g.n_docs
