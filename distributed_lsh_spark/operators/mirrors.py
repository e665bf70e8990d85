"""Mirror-host detection: hosts serving byte-identical page content.

Web-scale corpora carry whole mirrored SITES (CDNs, scrapers, country
mirrors) — the classic treatment is Bharat & Broder, "Mirror, mirror on
the web" (WWW'99): two hosts are mirror candidates when many content
fingerprints co-occur on both.  Detecting mirrors matters beyond per-doc
dedup: a mirror pair predicts duplicates for pages NOT yet crawled on
both hosts, feeding the crawler's frontier policy, and host-level
provenance dedup is cheaper than doc-level when a whole host can be
dropped.

Plan shape (the band-join template yet again): one map-only pass computes
(host, md5(text)); distinct collapses per-host repeats; an equi-self-join
on the content hash produces host pairs; a groupBy counts shared hashes.
The hot-key guard drops hashes served by more than `host_cap` distinct
hosts BEFORE the self-join (empty pages, boilerplate stubs — the
canonical quadratic-blowup keys, exactly the df-cap rule the n-gram
index uses: candidate discovery only, bounded loss documented at the
call site).  All rows past the first pass are (host, 16-B hash) — the
shuffle is corpus-row-count bounded, never corpus-byte bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mirror_host_pairs(pages: DataFrame, host_col: str = "host",
                      text_col: str = "text", min_shared: int = 2,
                      host_cap: int = 100) -> DataFrame:
    """(host_a, host_b, n_shared): distinct byte-identical texts the two
    hosts both serve, for pairs sharing at least `min_shared`.

    `host_cap` drops content hashes present on more than that many hosts
    before the self-join (a hash on h hosts contributes C(h,2) pairs —
    ubiquitous boilerplate would dominate both cost and signal).
    """
    hh = (pages.select(F.col(host_col).alias("host"),
                       F.md5(F.col(text_col).cast("binary")).alias("h"))
               .distinct())
    counts = hh.groupBy("h").agg(F.count(F.lit(1)).alias("_n"))
    kept = (hh.join(counts.where(F.col("_n") <= host_cap), "h")
              .select("host", "h"))
    a = kept.select(F.col("host").alias("host_a"), "h")
    b = kept.select(F.col("host").alias("host_b"), "h")
    return (a.join(b, "h")
             .where(F.col("host_a") < F.col("host_b"))
             .groupBy("host_a", "host_b")
             .agg(F.count(F.lit(1)).alias("n_shared"))
             .where(F.col("n_shared") >= min_shared))
