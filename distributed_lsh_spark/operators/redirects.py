"""Client-side redirect-chain resolution by pointer doubling.

Crawl-scale pipelines resolve meta-refresh (and, when headers are
available, HTTP 3xx) chains before url-level dedup: the crawler indexed
the SOURCE url, the content lives at the chain's TERMINAL url, and
duplicate spellings of one page otherwise survive every url-string
canonicalization pass.  The resolution itself is the classic parallel
pointer-jumping scheme (Wyllie's list ranking): the successor map is
composed with itself each round, so a chain of length L resolves in
ceil(log2(L)) self-joins instead of L sequential ones — at 10^12 pages
the redirect frame is a small fraction of the corpus and 5 rounds
(4 to cover MAX_HOPS = 16, the Blink/Gecko redirect-follow ballpark,
plus one to separate at-cap chains from loops) cover every real chain.

Cycle semantics: a source is flagged `cycled` only when its accumulated
hop count EXCEEDS MAX_HOPS — a legitimate acyclic chain of exactly
MAX_HOPS hops reaches its terminal and is NOT flagged.  The loop runs
one doubling round past the cap with the hop accumulator clamped at
MAX_HOPS + 1, so any true loop (whose count would otherwise double
forever) and any over-cap chain deterministically land on the clamp
value while every within-cap chain keeps its exact length.  `cycled`
therefore reads "loop, or chain a MAX_HOPS-bounded follower gives up
on" (browsers treat the two identically); n_hops is clamped at
MAX_HOPS.  Pointer doubling makes the flagged row deterministic: after
r rounds every unresolved pointer has jumped exactly 2^r steps, so a
2-cycle lands back on its own url.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: bounded-follow cap; 16 = 4 doubling rounds, above Chrome's ~20-total
#: but far above any legitimate chain (>3 hops is already a spam signal).
MAX_HOPS = 16


def resolve_redirect_chains(pages: DataFrame, url_col: str = "url",
                            target_col: str = "redirect_to") -> DataFrame:
    """(url, final_url, n_hops, cycled) for every input page.

    `pages` carries one row per page with `target_col` = the page's
    declared redirect target ('' / null when the page is terminal).
    Targets pointing outside the corpus resolve where the known chain
    ends (the dangling url IS the final url — the follower would fetch
    it next).  Scale shape: the jump table holds only redirecting pages
    (src, dst, steps — three short columns); each round is ONE
    self-equi-join on url, ceil(log2(MAX_HOPS)) rounds total; terminal
    pages never enter a shuffle.
    """
    src = F.col(url_col)
    tgt = F.col(target_col)
    redirecting = (pages
                   .where(tgt.isNotNull() & (tgt != "") & (tgt != src))
                   .select(src.alias("src"), tgt.alias("dst"),
                           F.lit(1).cast("long").alias("steps")))
    jmp = redirecting
    # one round PAST the cap: a chain of exactly MAX_HOPS converges at
    # steps == MAX_HOPS (joins stop adding once the terminal absorbs),
    # while a loop / over-cap chain pushes past it and sticks at the
    # MAX_HOPS + 1 clamp — the extra round is what separates the two.
    rounds = max(1, (MAX_HOPS - 1).bit_length()) + 1
    for _ in range(rounds):
        nxt = jmp.select(F.col("src").alias("n_src"),
                         F.col("dst").alias("n_dst"),
                         F.col("steps").alias("n_steps"))
        jmp = (jmp.join(nxt, jmp.dst == nxt.n_src, "left")
               .select("src",
                       F.coalesce("n_dst", "dst").alias("dst"),
                       F.least(F.col("steps")
                               + F.coalesce("n_steps", F.lit(0)),
                               F.lit(MAX_HOPS + 1))
                       .cast("long").alias("steps")))
        # each round self-joins its own output: without truncation the
        # plan doubles every round and the page-side extraction re-runs
        # 2^rounds times (no exchange reuse across the rename) — the
        # checkpoint caps every round, and the extraction, at one
        # materialization.
        jmp = jmp.localCheckpoint(eager=False)
    resolved = jmp.select(
        F.col("src").alias("r_url"),
        F.col("dst").alias("final_url"),
        F.least(F.col("steps"), F.lit(MAX_HOPS)).alias("n_hops"),
        (F.col("steps") > MAX_HOPS).alias("cycled"))
    return (pages.select(src.alias("url"))
            .join(resolved, F.col("url") == F.col("r_url"), "left")
            .select("url",
                    F.coalesce("final_url", F.col("url")).alias("final_url"),
                    F.coalesce("n_hops", F.lit(0)).cast("long")
                    .alias("n_hops"),
                    F.coalesce("cycled", F.lit(False)).alias("cycled")))
