"""Meta-refresh extraction (functions/extract.meta_refresh_target) and
pointer-doubling chain resolution (operators/redirects) + the
redirect_chains gate row's semantics."""

import re

from pyspark.sql import functions as F

from distributed_lsh_spark.functions.extract import (
    META_REFRESH_A_PATTERN, META_REFRESH_B_PATTERN, meta_refresh_target,
)
from distributed_lsh_spark.operators.redirects import (
    MAX_HOPS, resolve_redirect_chains,
)

T = "https://r.example.com/p/9"

# (html, expected target) — extraction shapes incl. the gate's decoys
CASES = [
    (f'<meta http-equiv="refresh" content="0;url={T}">', T),
    (f'<meta content="0;url={T}" http-equiv="refresh">', T),  # reversed
    (f'<META HTTP-EQUIV=REFRESH CONTENT="5; url={T}">', T),   # caps, space
    (f"<meta http-equiv='refresh' content='3;URL={T}'>", T),  # single-q, URL=
    ('<meta http-equiv="refresh" content="30">', ""),         # timed reload
    (f'<meta name="refresh" content="0;url={T}">', ""),       # name, not
                                                              # http-equiv
    (f'<meta http-equiv="content-type" content="0;url={T}">', ""),
    # attributes cannot leak across tags
    (f'<meta http-equiv="refresh"><meta content="0;url={T}">', ""),
    (f'<p>prose with url={T} and refresh words</p>', ""),
    (f'<meta http-equiv="refresh" content="0; url = {T}">', T),
]


def test_pattern_semantics_python_replay():
    pa = re.compile(META_REFRESH_A_PATTERN)
    pb = re.compile(META_REFRESH_B_PATTERN)
    for html, want in CASES:
        ma, mb = pa.search(html), pb.search(html)
        got = ma.group(1) if ma else (mb.group(1) if mb else "")
        assert got == want, html


def test_pattern_semantics_spark_column(spark):
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(CASES)], "i int, html string")
    got = {r["i"]: r["t"] for r in
           df.select("i", meta_refresh_target("html").alias("t")).collect()}
    for i, (_, want) in enumerate(CASES):
        assert got[i] == want, CASES[i][0]


def test_pointer_doubling_chain_cycle_dangling(spark):
    u = [f"u{i}" for i in range(8)]
    rows = [
        (u[0], ""),        # terminal
        (u[1], u[2]),      # 3-hop chain 1 -> 2 -> 3 -> 4
        (u[2], u[3]),
        (u[3], u[4]),
        (u[4], ""),        # chain terminal
        (u[5], u[6]),      # 2-cycle 5 <-> 6
        (u[6], u[5]),
        (u[7], "ux"),      # dangling target outside the corpus
    ]
    df = spark.createDataFrame(rows, "url string, redirect_to string")
    out = {r["url"]: r.asDict()
           for r in resolve_redirect_chains(df).collect()}
    assert len(out) == 8
    assert out[u[0]] == {"url": u[0], "final_url": u[0], "n_hops": 0,
                         "cycled": False}
    assert out[u[1]] == {"url": u[1], "final_url": u[4], "n_hops": 3,
                         "cycled": False}
    assert out[u[2]]["n_hops"] == 2 and out[u[2]]["final_url"] == u[4]
    assert out[u[3]]["n_hops"] == 1
    for c in (5, 6):       # deterministic cycle landing: self at MAX_HOPS
        assert out[u[c]] == {"url": u[c], "final_url": u[c],
                             "n_hops": MAX_HOPS, "cycled": True}
    assert out[u[7]] == {"url": u[7], "final_url": "ux", "n_hops": 1,
                         "cycled": False}


def test_long_chain_resolves_within_cap(spark):
    n = MAX_HOPS - 1       # longest legitimate chain under the cap
    rows = [(f"c{i}", f"c{i+1}") for i in range(n)] + [(f"c{n}", "")]
    df = spark.createDataFrame(rows, "url string, redirect_to string")
    out = {r["url"]: r.asDict()
           for r in resolve_redirect_chains(df).collect()}
    assert out["c0"]["final_url"] == f"c{n}"
    assert out["c0"]["n_hops"] == n and not out["c0"]["cycled"]


def test_gate_row_matches_recursive_cte_oracle(spark):
    """redirect_chains equals the DuckDB recursive-CTE walk over the same
    arithmetic edge set (the oracle never parses html)."""
    import duckdb

    from distributed_lsh_spark.entry_queries import (
        _SQL_REDIRECT_CHAINS, q_redirect_chains,
    )

    sf_dir = "/root/testdata/sf0.001"
    out = q_redirect_chains(spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    want = con.execute(_SQL_REDIRECT_CHAINS).df()
    cols = sorted(out.columns)
    assert cols == sorted(want.columns)
    a = out[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    assert len(a) == len(b) > 0
    for c in cols:
        assert (a[c].astype(str) == b[c].astype(str)).all(), c
    # shape sanity: every planted class appears
    assert set(out.n_hops) >= {0, 1, 2, 3, MAX_HOPS}
    assert out.cycled.any() and (out[out.cycled].n_hops == MAX_HOPS).all()
    # 2-cycles land on their own url; the planted 17-hop over-cap chain
    # (doc 440) is cycled=true yet lands on its real terminal (457)
    by_url = out.set_index("url")
    pre = "https://r.example.com/p/"
    assert by_url.loc[f"{pre}5", "cycled"]
    assert by_url.loc[f"{pre}5", "final_url"] == f"{pre}5"
    r440 = by_url.loc[f"{pre}440"]
    assert r440["cycled"] and r440["n_hops"] == MAX_HOPS
    assert r440["final_url"] == f"{pre}457"
    # the planted EXACTLY-MAX_HOPS acyclic chain (420 -> ... -> 436)
    # reaches its terminal and must NOT be flagged
    r420 = by_url.loc[f"{pre}420"]
    assert not r420["cycled"] and r420["n_hops"] == MAX_HOPS
    assert r420["final_url"] == f"{pre}436"


def test_exact_cap_chain_not_flagged_cycled(spark):
    """An acyclic chain of exactly MAX_HOPS hops reaches its terminal:
    cycled=false (the flag means loop-or-over-cap, not at-cap), while a
    MAX_HOPS+1 chain is flagged with n_hops clamped at the cap."""
    n = MAX_HOPS
    rows = [(f"a{i}", f"a{i+1}") for i in range(n)] + [(f"a{n}", "")]
    rows += [(f"b{i}", f"b{i+1}") for i in range(n + 1)] \
        + [(f"b{n+1}", "")]
    df = spark.createDataFrame(rows, "url string, redirect_to string")
    out = {r["url"]: r.asDict()
           for r in resolve_redirect_chains(df).collect()}
    assert out["a0"] == {"url": "a0", "final_url": f"a{n}",
                         "n_hops": n, "cycled": False}
    assert out["b0"] == {"url": "b0", "final_url": f"b{n+1}",
                         "n_hops": n, "cycled": True}
