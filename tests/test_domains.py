"""Public Suffix List registrable-domain extraction
(functions/domains.registrable_domains) + the registrable_domains gate
row's semantics."""

from distributed_lsh_spark.functions.domains import (
    PSL_RULES, registrable_domains,
)

# (host, expected public_suffix, expected registrable) — every branch of
# the PSL algorithm plus shapes the gate's moduli can't carry
CASES = [
    ("example.com", "com", "example.com"),
    ("www.example.com", "com", "example.com"),
    ("a.b.c.example.com", "com", "example.com"),
    ("example.co.uk", "co.uk", "example.co.uk"),       # multi-label rule
    ("www.example.co.uk", "co.uk", "example.co.uk"),
    ("co.uk", "co.uk", ""),                            # host IS a suffix
    ("uk", "uk", ""),                                  # bare TLD rule
    ("example.zz", "zz", "example.zz"),                # unknown TLD -> '*'
    ("zz", "zz", ""),
    ("anything.ck", "anything.ck", ""),                # wildcard *.ck
    ("x.anything.ck", "anything.ck", "x.anything.ck"),
    ("y.x.anything.ck", "anything.ck", "x.anything.ck"),
    ("www.ck", "ck", "www.ck"),                        # exception !www.ck
    ("a.www.ck", "ck", "www.ck"),                      # exception, deeper
    ("foo.bd", "foo.bd", ""),                          # second wildcard
    # a longer NON-matching exact candidate must not shadow co.uk
    ("me.uk", "me.uk", ""),
    ("site.me.uk", "me.uk", "site.me.uk"),
]


def _python_psl(host: str) -> tuple[str, str]:
    labels = host.split(".")
    exc_len, rule_len = None, None
    for rule, is_exc in PSL_RULES:
        rl = rule.split(".")
        if len(rl) > len(labels):
            continue
        tail = labels[-len(rl):]
        if all(r == "*" or r == t for r, t in zip(rl, tail)):
            if is_exc:
                exc_len = max(exc_len or 0, len(rl) - 1)
            else:
                rule_len = max(rule_len or 0, len(rl))
    suf = exc_len if exc_len is not None else (rule_len or 1)
    suffix = ".".join(labels[-suf:])
    reg = ".".join(labels[-(suf + 1):]) if len(labels) > suf else ""
    return suffix, reg


def test_python_replay_of_psl_algorithm():
    for host, want_suf, want_reg in CASES:
        assert _python_psl(host) == (want_suf, want_reg), host


def test_spark_frame_matches_cases(spark):
    df = spark.createDataFrame([(h,) for h, _, _ in CASES], "host string")
    got = {r["host"]: (r["public_suffix"], r["registrable"])
           for r in registrable_domains(df).collect()}
    for host, want_suf, want_reg in CASES:
        assert got[host] == (want_suf, want_reg), host


def test_distinct_hosts_only_and_null_safe(spark):
    df = spark.createDataFrame(
        [("example.com",), ("example.com",), ("",), (None,)],
        "host string")
    out = registrable_domains(df).collect()
    assert len(out) == 1 and out[0]["registrable"] == "example.com"


def test_generated_hosts_match_python_replay(spark):
    """120 deterministically-generated hosts over the rule alphabet
    (every TLD family in PSL_RULES, depths 1-5, md5-derived labels)
    agree between the Spark frame and the pure-Python PSL replay —
    coverage beyond the hand-picked CASES."""
    import hashlib

    tlds = ["com", "co.uk", "uk", "zz", "ck", "bd", "jp", "co.jp",
            "www.ck", "me.uk", "example.com", "ac.uk"]
    hosts = []
    for i in range(120):
        depth = i % 4
        labels = [hashlib.md5(f"{i}.{j}".encode()).hexdigest()[:4]
                  for j in range(depth)]
        hosts.append(".".join(labels + [tlds[i % len(tlds)]]))
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    got = {r["host"]: (r["public_suffix"], r["registrable"])
           for r in registrable_domains(df).collect()}
    for h in set(hosts):
        assert got[h] == _python_psl(h), h


def test_gate_row_matches_arithmetic_oracle(spark):
    """registrable_domains equals the DuckDB oracle's per-class
    arithmetic (the oracle never runs the PSL algorithm)."""
    import duckdb

    from distributed_lsh_spark.entry_queries import (
        _SQL_REGISTRABLE_DOMAINS, q_registrable_domains,
    )

    sf_dir = "/root/testdata/sf0.001"
    out = q_registrable_domains(spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    want = con.execute(_SQL_REGISTRABLE_DOMAINS).df()
    cols = sorted(out.columns)
    assert cols == sorted(want.columns)
    a = out[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    assert len(a) == len(b) > 0
    for c in cols:
        assert (a[c].astype(str) == b[c].astype(str)).all(), c
    # every algorithm branch fires: wildcard self-suffix, exception,
    # bare suffix, unknown TLD
    assert (out.registrable == "").any()
    assert (out.host == "www.ck").any()
    assert out[out.host == "www.ck"].public_suffix.iloc[0] == "ck"
    assert (out[out.host.str.endswith(".zz")].registrable != "").all()


def test_longer_rule_table_widens_candidate_fanout(spark, monkeypatch):
    """The candidate-suffix fan-out is derived from the rule table at
    call time: swapping in real-PSL-length rules (a 4-label wildcard
    like *.compute.amazonaws.com) classifies those hosts without any
    code change (ADVICE r4: a hardcoded max-label constant silently
    dropped the longer candidates)."""
    import distributed_lsh_spark.functions.domains as dom

    rules = dom.PSL_RULES + [
        ("*.compute.amazonaws.com", False),
        ("s3.dualstack.ap-south-1.amazonaws.com", False),
    ]
    monkeypatch.setattr(dom, "PSL_RULES", rules)
    cases = [
        # 4-label wildcard: ec2-x.compute.amazonaws.com IS a suffix
        ("ec2-1-2-3-4.compute.amazonaws.com",
         "ec2-1-2-3-4.compute.amazonaws.com", ""),
        ("myvm.ec2-1-2-3-4.compute.amazonaws.com",
         "ec2-1-2-3-4.compute.amazonaws.com",
         "myvm.ec2-1-2-3-4.compute.amazonaws.com"),
        # 5-label exact rule
        ("s3.dualstack.ap-south-1.amazonaws.com",
         "s3.dualstack.ap-south-1.amazonaws.com", ""),
        ("bkt.s3.dualstack.ap-south-1.amazonaws.com",
         "s3.dualstack.ap-south-1.amazonaws.com",
         "bkt.s3.dualstack.ap-south-1.amazonaws.com"),
        # plain hosts keep classifying under the longer table
        ("www.example.co.uk", "co.uk", "example.co.uk"),
        # amazonaws.com itself only matches the plain 'com' rule
        ("amazonaws.com", "com", "amazonaws.com"),
    ]
    df = spark.createDataFrame([(h,) for h, _, _ in cases], "host string")
    got = {r["host"]: (r["public_suffix"], r["registrable"])
           for r in dom.registrable_domains(df).collect()}
    for host, want_suf, want_reg in cases:
        assert got[host] == (want_suf, want_reg), host
