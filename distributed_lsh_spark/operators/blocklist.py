"""Domain/URL blocklist filtering — the UT1/C4-style safety pass a
Common-Crawl curation pipeline runs before any content filter: drop
pages whose host falls under a blocked registrable domain (suffix
match: blocking ``example.com`` blocks ``www.example.com``) or whose
url matches a blocked path pattern.

Reference analogue: the reference prunes candidate buckets with a
driver-held predicate before the expensive verify
(MapReduce-LSH/.../lsh/searcher/SearchMapper.java's per-record bucket
membership check against job-conf state); this is the same
broadcast-small-state row predicate applied to the curation graft.

Scale shape (100 TB corpus, UT1-sized blocklist of ~4M domains):

  * Host-suffix matching is `max_labels` BROADCAST left joins — one per
    suffix length — on ``substring_index(host, '.', -k)`` equi-keys.
    No explode (row count never multiplies), no shuffle (broadcast hash
    joins are map-side), no per-row Python, and no O(|blocklist|)
    literal expressions: the blocklist ships once per executor as a
    hashed relation.  ``substring_index`` is label-boundary safe
    (``xh3.example.com`` does not suffix-match ``h3.example.com``).
  * Path patterns fold into ONE codegen ``rlike`` alternation — the
    pattern list is config-sized (hundreds), not corpus-sized.
  * The verdict precedence is deterministic: the most-specific (most
    labels) host match wins, then the pattern match — so the reason
    column is reproducible across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# scheme://[userinfo@]host[:port]/...  -> host, lowercased by caller
_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://(?:[^/?#@]*@)?([^/?#:]*)"


def url_host(url: Column | str) -> Column:
    """Lowercased host of an absolute url (codegen regexp_extract;
    userinfo and port stripped). Empty string when the url has none."""
    u = F.col(url) if isinstance(url, str) else url
    return F.lower(F.regexp_extract(u, _HOST_RE, 1))


def with_blocklist_verdict(pages: DataFrame, blocked_hosts: DataFrame,
                           url_col: str = "url",
                           url_patterns: list[str] | None = None,
                           max_labels: int = 4) -> DataFrame:
    """pages(..., url) x blocked_hosts(blocked_host) -> pages + (host,
    blocked: bool, reason: str): reason is ``host:<matched suffix>`` for
    a domain hit (most-specific suffix wins), ``pattern`` for a url
    regex hit, '' otherwise.  Filter with ``.where(~F.col("blocked"))``.

    `blocked_hosts` entries are registrable domains or exact hosts with
    up to `max_labels` labels; deeper entries never match and should be
    truncated by the caller.  The joins preserve row count: the
    blocklist side is deduplicated per suffix length.
    """
    bl = blocked_hosts.select(
        F.lower(F.col("blocked_host")).alias("blocked_host")).distinct()
    out = pages.withColumn("_host", url_host(url_col))
    hit_cols: list[Column] = []
    # k = max_labels first so coalesce() below prefers the most-specific
    # match; each join key matches <= 1 distinct blocklist row, so row
    # count is preserved.
    for k in range(max_labels, 0, -1):
        b = F.broadcast(bl.select(F.col("blocked_host").alias(f"_b{k}")))
        out = out.join(
            b, F.substring_index(F.col("_host"), ".", -k) == F.col(f"_b{k}"),
            "left")
        hit_cols.append(F.col(f"_b{k}"))
    host_hit = F.coalesce(*hit_cols)
    pat_hit = (F.col(url_col).rlike("|".join(url_patterns))
               if url_patterns else F.lit(False))
    reason = (F.when(host_hit.isNotNull(),
                     F.concat(F.lit("host:"), host_hit))
              .when(pat_hit, F.lit("pattern"))
              .otherwise(F.lit("")))
    return (out.withColumn("host", F.col("_host"))
               .withColumn("reason", reason)
               .withColumn("blocked", reason != F.lit(""))
               .drop("_host", *[f"_b{k}" for k in range(1, max_labels + 1)]))


def blocklist_filter(pages: DataFrame, blocked_hosts: DataFrame,
                     url_col: str = "url",
                     url_patterns: list[str] | None = None,
                     max_labels: int = 4) -> DataFrame:
    """Survivors of the blocklist pass, original schema preserved."""
    verdict = with_blocklist_verdict(pages, blocked_hosts, url_col,
                                     url_patterns, max_labels)
    return verdict.where(~F.col("blocked")) \
                  .drop("host", "blocked", "reason")
