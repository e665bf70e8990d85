"""robots.txt compliance (RFC 9309, the Robots Exclusion Protocol) —
the crawl-side legality pass a Common-Crawl curation pipeline runs
before any content tier: drop pages whose url a host's robots.txt
disallows for the harvesting agent.

Two pieces:

* `parse_robots_txt(content, user_agent)` — a plain-Python RFC 9309
  parser producing the rule list `[(path_pattern, allow)]` of the most
  specific applicable user-agent group (an exact agent-token match
  beats `*`; multiple groups naming the same agent merge, §2.2.1).
  Runs per HOST, never per page — a crawl has ~10^8 hosts vs ~10^12
  pages, so even the Arrow-batched UDF form (`robots_rules`) touches
  4 orders of magnitude fewer rows than any page scan.

* `robots_verdicts(pages, rules)` — pure DataFrame matching: pages
  join rules on host, each candidate (path, pattern) pair evaluated
  with ONE JVM rlike against the pattern's translated regex (`*` = any
  sequence, trailing `$` = end anchor, everything else literal —
  §2.2.3), then RFC precedence as a map-side-combinable argmax:
  longest pattern wins, allow wins length ties (the published Google
  robotstxt tie rule), no match = allowed.  The per-page candidate
  fan-out is that host's rule count (a handful); the argmax collapses
  it back to one row per page before anything else sees it.

Scale shape: rules are O(#hosts) rows and broadcast when small
(`broadcast_rules=True`, the default — a 10^6-host crawl's rule table
is ~100 MB); at full 10^8-host scale pass False and the host equi-join
shuffles 8-byte host hashes with AQE handling skew.  The page side is
scanned exactly once, no Python touches it.

Reference analogue: none — the reference (zbweng/Distributed-LSH) is a
similarity engine; this is part of the web-curation surface the graft
adds around it.  Pattern matching semantics follow RFC 9309 and the
open-sourced Google robotstxt matcher, both public.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

RULE_COLS = ("host", "pattern", "allow")


def parse_robots_txt(content: str, user_agent: str = "*") -> list[tuple[str, bool]]:
    """RFC 9309 parse of one robots.txt body -> [(path_pattern, allow)]
    for `user_agent`.

    Group selection (§2.2.1): all groups whose user-agent token equals
    `user_agent` case-insensitively merge; if none exist, the `*`
    groups apply; a specific match makes every `*` group invisible.
    Empty-value Disallow lines ("Disallow:") mean allow-all and produce
    no rule (§2.2.2).  Unknown directives and comments are ignored.
    Rules keep file order; precedence is decided at match time, not
    here, so order does not matter downstream.
    """
    agent = user_agent.strip().lower()
    groups: list[tuple[list[str], list[tuple[str, bool]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[str, bool]] = []
    in_agent_run = False  # consecutive user-agent lines start one group
    for raw in content.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not in_agent_run:
                if cur_agents:
                    groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = [], []
                in_agent_run = True
            cur_agents.append(val.lower())
        elif key in ("allow", "disallow"):
            in_agent_run = False
            if not cur_agents:
                continue  # rule before any user-agent line: no group
            if val == "":
                continue  # empty pattern = allow-all, not a rule
            cur_rules.append((val, key == "allow"))
        else:
            in_agent_run = False
    if cur_agents:
        groups.append((cur_agents, cur_rules))

    exact = [r for agents, rules in groups if agent in agents for r in rules]
    if any(agent in agents for agents, _ in groups):
        return exact
    return [r for agents, rules in groups if "*" in agents for r in rules]


def pattern_regex(pattern: str) -> str:
    """RFC 9309 §2.2.3 path pattern -> anchored Java/RE2-safe regex:
    `*` matches any sequence, a trailing `$` anchors at the end, all
    other characters are literal.  The same source string compiles on
    Java regex (Spark) and anything POSIX-ish, no lookaround."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    parts = [re.escape(p) for p in body.split("*")]
    return "^" + ".*".join(parts) + ("$" if anchored else "")


def pattern_length(pattern: str) -> int:
    """Specificity key for RFC precedence: octets of the pattern body
    (the trailing `$` anchor is a constraint, not matched path mass)."""
    return len(pattern[:-1]) if pattern.endswith("$") else len(pattern)


@F.pandas_udf(T.StringType())
def _pattern_regex_udf(p: pd.Series) -> pd.Series:
    return p.map(pattern_regex, na_action="ignore")


def robots_rules(robots: DataFrame, user_agent: str = "*",
                 txt_col: str = "robots_txt") -> DataFrame:
    """(host, robots_txt) -> (host, pattern, allow, plen, regex), one
    row per rule of the agent's applicable group, via the plain-Python
    parser in an Arrow-batched iterator (O(#hosts) rows only)."""
    out_schema = ("host string, pattern string, allow boolean, "
                  "plen int, regex string")

    def gen(batches):
        for pdf in batches:
            rows = []
            for host, txt in zip(pdf["host"], pdf[txt_col]):
                for pat, allow in parse_robots_txt(txt or "", user_agent):
                    rows.append((host, pat, allow, pattern_length(pat),
                                 pattern_regex(pat)))
            yield pd.DataFrame(rows, columns=["host", "pattern", "allow",
                                              "plen", "regex"])

    return robots.select("host", txt_col).mapInPandas(gen, out_schema)


def _with_rule_derivatives(rules: DataFrame) -> DataFrame:
    """Ensure (plen, regex) exist; derive them with the tiny UDF-free
    path when the caller supplied bare (host, pattern, allow) rows."""
    if "plen" in rules.columns and "regex" in rules.columns:
        return rules
    anchored = F.col("pattern").endswith("$")
    plen = F.when(anchored, F.length("pattern") - 1) \
            .otherwise(F.length("pattern")).cast("int")
    return rules.withColumn("plen", plen) \
                .withColumn("regex", _pattern_regex_udf("pattern"))


def robots_verdicts(pages: DataFrame, rules: DataFrame, *,
                    id_col: str = "doc_id", host_col: str = "host",
                    path_col: str = "path",
                    broadcast_rules: bool = True) -> DataFrame:
    """Per page: (id, allowed, matched_pattern) under RFC 9309
    precedence — among the host's rules whose pattern matches the
    page's path, the LONGEST pattern decides; allow beats disallow at
    equal length; no matching rule (or no rules for the host) allows.

    The argmax is `max(struct(plen, allow, pattern))` grouped on the
    page id — map-side combinable, so a page never carries more than
    one row into the shuffle per map task even on rule-heavy hosts.
    """
    r = _with_rule_derivatives(rules).select(
        F.col("host").alias("_rhost"), "pattern", "allow", "plen", "regex")
    if broadcast_rules:
        r = F.broadcast(r)
    p = pages.select(F.col(id_col).alias("_id"),
                     F.col(host_col).alias("_host"),
                     F.col(path_col).alias("_path"))
    j = p.join(r, p["_host"] == r["_rhost"], "left")
    # non-matching / no-rule candidate rows contribute the neutral
    # (-1, allow, '') element, so ONE groupBy covers every page — no
    # second corpus pass to recover "host had rules but none matched"
    hit = F.col("_rhost").isNotNull() & F.expr("_path rlike regex")
    elem = F.when(hit, F.struct(
        F.col("plen"),
        F.col("allow").cast("int").alias("allow"),
        F.col("pattern"))).otherwise(F.struct(
            F.lit(-1).alias("plen"), F.lit(1).alias("allow"),
            F.lit("").alias("pattern")))
    agg = j.groupBy("_id").agg(F.max(elem).alias("best"))
    return agg.select(
        F.col("_id").alias(id_col),
        (F.col("best.allow") == 1).alias("allowed"),
        F.when(F.col("best.plen") >= 0, F.col("best.pattern"))
         .otherwise(F.lit("")).alias("matched_pattern"))
