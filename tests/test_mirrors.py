"""operators/mirrors.py: mirror-host pairs via content-hash co-occurrence
— hand-stated expectations plus the hot-hash cap guard."""

from __future__ import annotations

from distributed_lsh_spark.operators.mirrors import mirror_host_pairs


def _df(spark, rows):
    return spark.createDataFrame(rows, "host string, text string")


def test_mirror_pairs_basic(spark):
    rows = [
        ("a.com", "page one"), ("a.com", "page two"), ("a.com", "page three"),
        ("b.com", "page one"), ("b.com", "page two"),   # mirrors a on 2 pages
        ("c.com", "page one"),                           # only 1 shared
        ("d.com", "unrelated"),
    ]
    got = {(r["host_a"], r["host_b"]): r["n_shared"]
           for r in mirror_host_pairs(_df(spark, rows), min_shared=2).collect()}
    assert got == {("a.com", "b.com"): 2}


def test_mirror_pairs_per_host_repeats_collapse(spark):
    # the same text served 5x by one host counts ONCE (distinct host,hash)
    rows = [("a.com", "same")] * 5 + [("b.com", "same"),
                                      ("a.com", "other"), ("b.com", "other")]
    got = {(r["host_a"], r["host_b"]): r["n_shared"]
           for r in mirror_host_pairs(_df(spark, rows), min_shared=2).collect()}
    assert got == {("a.com", "b.com"): 2}


def test_mirror_pairs_host_cap_drops_boilerplate(spark):
    # an empty-page hash on 50 hosts would contribute C(50,2) pairs;
    # host_cap excludes it, so only the genuine mirror pair remains
    rows = [(f"h{i}.com", "") for i in range(50)]
    rows += [("h1.com", "real x"), ("h2.com", "real x"),
             ("h1.com", "real y"), ("h2.com", "real y")]
    got = {(r["host_a"], r["host_b"]): r["n_shared"]
           for r in mirror_host_pairs(_df(spark, rows), min_shared=2,
                                      host_cap=10).collect()}
    assert got == {("h1.com", "h2.com"): 2}
