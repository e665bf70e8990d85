"""link_pagerank: the 5-iteration integer fixpoint reproduced by plain
Python (independent of Spark AND DuckDB), plus structural sanity."""

from __future__ import annotations

import duckdb


def _python_pagerank(doc_ids):
    edges = set()
    for d in doc_ids:
        src = d % 97
        edges.add((src, (d * 13 + 1) % 89))
        edges.add((src, (d * 29 + 2) % 83))
    nodes = {s for s, _ in edges} | {t for _, t in edges}
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    rank = {n: 1_000_000 for n in nodes}
    for _ in range(5):
        nxt = {n: 150_000 for n in nodes}
        for s, t in edges:
            nxt[t] += (rank[s] * 85) // (100 * outdeg[s])
        rank = nxt
    n_in = {}
    for _, t in edges:
        n_in[t] = n_in.get(t, 0) + 1
    return {n: (rank[n], outdeg.get(n, 0), n_in.get(n, 0)) for n in nodes}


def test_pagerank_matches_plain_python(spark):
    from distributed_lsh_spark.entry_queries import QUERIES

    sf = "/root/testdata/sf0.001"
    doc_ids = [r[0] for r in duckdb.sql(
        f"SELECT doc_id FROM read_parquet('{sf}/documents.parquet')")
        .fetchall()]
    want = _python_pagerank(doc_ids)

    got = {r.page: (r.rank, r.n_out, r.n_in)
           for r in QUERIES["link_pagerank"](spark, sf).collect()}
    assert got == want
    ranks = sorted(v[0] for v in want.values())
    assert ranks[0] < ranks[-1]        # the planted graph is not regular
    # every rank carries at least the teleport mass
    assert ranks[0] >= 150_000
