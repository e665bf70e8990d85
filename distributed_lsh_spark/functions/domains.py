"""Registrable-domain (eTLD+1) extraction — the Public Suffix List
algorithm as a set-based DataFrame computation.

Public semantics (publicsuffix.org/list, the Mozilla PSL algorithm):
among all rules matching a host's right-most labels, an exception rule
(`!www.ck`) wins outright and its public suffix is the rule minus its
leftmost label; otherwise the matching rule with the most labels
prevails (a wildcard `*.ck` label matches exactly one host label); if no
rule matches, the prevailing rule is `*` (the bare TLD).  The public
suffix is the host's last prevailing-rule-many labels, and the
registrable domain (eTLD+1) is the suffix plus one more label — the unit
crawl pipelines use for per-site caps, blocklists, and reputation
rollups (naive last-two-labels grouping merges every `co.uk` site into
one "domain").

Scale shape: the computation runs over DISTINCT hosts (O(#hosts), never
O(pages)); each host emits <= 5 candidate suffix strings via codegen
`substring_index` (no per-row Python, no explode of unbounded arrays),
the rule table is a few-KB broadcast, and one map-side-combining
groupBy(host) picks the prevailing rule.  Verdicts join back to pages
broadcast, the robots-pass discipline.

PSL_RULES below is a representative ICANN-section subset (the full list
is ~10k rules and swaps in as data, not code — same plan); it includes
multi-label rules, a wildcard family, and its exception so every branch
of the algorithm is exercised.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: (rule, is_exception) — '!' stripped; wildcard kept literal.
PSL_RULES: list[tuple[str, bool]] = [
    ("com", False), ("org", False), ("net", False), ("edu", False),
    ("gov", False), ("mil", False), ("int", False),
    ("io", False), ("dev", False), ("app", False), ("ai", False),
    ("uk", False), ("co.uk", False), ("ac.uk", False), ("gov.uk", False),
    ("org.uk", False), ("me.uk", False),
    ("jp", False), ("co.jp", False), ("ne.jp", False), ("ac.jp", False),
    ("or.jp", False),
    ("au", False), ("com.au", False), ("org.au", False), ("net.au", False),
    ("de", False), ("fr", False), ("it", False), ("nl", False), ("es", False),
    ("br", False), ("com.br", False), ("net.br", False),
    ("cn", False), ("com.cn", False), ("org.cn", False),
    ("in", False), ("co.in", False),
    ("ru", False), ("us", False), ("ca", False), ("ch", False), ("se", False),
    ("*.ck", False),   # wildcard family
    ("www.ck", True),  # its exception (!www.ck)
    ("*.bd", False),   # second wildcard family
]

def _max_rule_labels() -> int:
    """Longest rule in PSL_RULES measured in labels (wildcard * counts)
    — derived from the table at call time so swapping in the real ~10k
    rule PSL (with 4-5-label wildcards like *.compute.amazonaws.com)
    widens the candidate-suffix fan-out automatically."""
    return max(r.count(".") + 1 for r, _ in PSL_RULES)


def _rules_df(spark) -> DataFrame:
    return spark.createDataFrame(
        [(r, e, r.count(".") + 1) for r, e in PSL_RULES],
        "rule string, is_exc boolean, n_labels int")


def registrable_domains(hosts: DataFrame, host_col: str = "host",
                        ) -> DataFrame:
    """(host, public_suffix, registrable) per DISTINCT input host;
    registrable = '' when the host itself is a public suffix."""
    spark = hosts.sparkSession
    h = (hosts.select(F.col(host_col).alias("host")).where(
        F.col("host").isNotNull() & (F.col("host") != "")).distinct())
    n_lab = (F.length("host")
             - F.length(F.regexp_replace("host", r"\.", "")) + 1)
    h = h.select("host", n_lab.cast("int").alias("n_host_labels"))

    # candidate suffix strings: exact last-k labels for k = 1..MAX+1
    # (the +1 covers exception rules, one label longer than their
    # wildcard), and the wildcard spelling '*.'+last-(k-1) for k >= 2.
    cands = []
    for k in range(1, _max_rule_labels() + 2):
        exact = F.when(F.col("n_host_labels") >= k,
                       F.substring_index("host", ".", -k))
        cands.append(F.struct(exact.alias("cand"), F.lit(k).alias("k")))
        if k >= 2:
            wild = F.when(
                F.col("n_host_labels") >= k,
                F.concat(F.lit("*."),
                         F.substring_index("host", ".", -(k - 1))))
            cands.append(F.struct(wild.alias("cand"), F.lit(k).alias("k")))
    c = (h.select("host", "n_host_labels",
                  F.explode(F.array(*cands)).alias("c"))
         .select("host", "n_host_labels",
                 F.col("c.cand").alias("cand"), F.col("c.k").alias("k"))
         .where(F.col("cand").isNotNull()))
    r = _rules_df(spark)
    m = c.join(F.broadcast(r), c.cand == r.rule)
    # exception wins at rule_labels - 1; else longest match; else 1 (TLD)
    agg = (m.groupBy("host", "n_host_labels")
           .agg(F.max(F.when(F.col("is_exc"),
                             F.col("n_labels") - 1)).alias("exc_len"),
                F.max(F.when(~F.col("is_exc"),
                             F.col("n_labels"))).alias("rule_len")))
    verdict = (h.join(agg.select("host", "exc_len", "rule_len"),
                      "host", "left")
               .select("host", "n_host_labels",
                       F.coalesce("exc_len", "rule_len", F.lit(1))
                       .cast("int").alias("suf_len")))
    suffix = F.expr("substring_index(host, '.', -suf_len)")
    reg = F.when(F.col("n_host_labels") > F.col("suf_len"),
                 F.expr("substring_index(host, '.', -(suf_len + 1))")) \
           .otherwise(F.lit(""))
    return verdict.select("host", suffix.alias("public_suffix"),
                          reg.alias("registrable"))
