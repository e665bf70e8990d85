"""Asymmetric containment dedup: doc-in-doc near-duplicates that a
Jaccard-calibrated MinHash-LSH structurally misses.

Containment over k-shingle sets (Broder, "On the resemblance and
containment of documents", SEQUENCES'97):

    C(A, B) = |S(A) n S(B)| / min(|S(A)|, |S(B)|)

A short page A embedded verbatim in a long page B (syndicated article
inside a portal page, quote-wrapper pages, print views with navigation
chrome) has C ~ 1 while J(A, B) = |n| / |u| ~ |S(A)| / |S(B)| — far below
any useful Jaccard threshold, so the MinHash band family (collision
probability a function of J alone) never surfaces the pair and neither
the LSH path (operators/candidates.py) nor a Jaccard verify keeps it.
This operator is the curation pass that catches exactly those pairs.

Candidate generation reuses the df-capped inverted shingle index
(operators/ngram.py's shape).  Its recall argument is STRONGER for
containment than for Jaccard: if C(A, B) >= tau, the contained doc shares
>= tau of its own shingles with the partner, so a missed pair needs
*every one* of those shared shingles to carry document frequency >
df_cap — a doc made almost entirely of corpus-wide boilerplate, which the
exact md5 pre-pass (pipeline.exact_collapse) and a boilerplate line pass
(line_dedup) collapse first.  At index scale beyond this sandbox the
published candidate structure is size-partitioned LSH (LSH Ensemble, Zhu
et al., VLDB'16: partition the corpus by set size, re-tune (b, r) per
partition so band collision tracks containment within each slice);
`candidates` is injectable so such an index drops in without touching
verification.

Verification is exact over the full shingle sets and follows
operators/verify.py's broadcast discipline: broadcast only the bare pair
list, semi-join-prune the wide payload side, lazy localCheckpoint so the
candidate plan executes once, not once per broadcast build.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def containment_pairs(docs: DataFrame, *,
                      tau: float = 0.8, df_cap: int | None = 2000,
                      shingles_col: str = "shingles",
                      candidates: DataFrame | None = None,
                      broadcast_pairs: bool = False) -> DataFrame:
    """docs(doc_id, shingles) -> (id_a, id_b, containment, jaccard,
    contained_id) for pairs with containment >= tau.

    `contained_id` is the smaller-shingle-set side (the doc the pair says
    is inside the other); equal sizes resolve to id_a (= the lower id —
    mutual containment, either label is true).  `jaccard` rides along so
    consumers can see which pairs a Jaccard threshold would have kept.

    `broadcast_pairs` defaults FALSE: the candidate volume is
    corpus-dependent and unbounded (a dup-heavy corpus explodes it past
    the broadcast budget — the ngram operator makes the same choice),
    and AQE still converts the joins to broadcast at runtime when it
    measures the pair list small.  Opt in only for pair sets known
    small a priori (it adds the semi-join payload prune).
    """
    if candidates is None:
        shd = docs.select("doc_id", F.explode(shingles_col).alias("g"))
        if df_cap is not None:
            # window over the index's own (g) partitioning — one exchange,
            # reused by the self-join under AQE (ngram.py's measured shape)
            w = Window.partitionBy("g")
            shd = (shd.withColumn("_df", F.count("*").over(w))
                      .where(F.col("_df") <= df_cap).drop("_df"))
        a, b = shd.alias("a"), shd.alias("b")
        candidates = (a.join(b, "g")
                       .where(F.col("a.doc_id") < F.col("b.doc_id"))
                       .select(F.col("a.doc_id").alias("id_a"),
                               F.col("b.doc_id").alias("id_b"))
                       .dropDuplicates(["id_a", "id_b"]))

    payload = docs.select("doc_id", shingles_col)
    da = payload.select(F.col("doc_id").alias("id_a"),
                        F.col(shingles_col).alias("_sh_a"))
    db = payload.select(F.col("doc_id").alias("id_b"),
                        F.col(shingles_col).alias("_sh_b"))
    if broadcast_pairs:
        candidates = candidates.localCheckpoint(eager=False)
        db = db.join(F.broadcast(candidates.select("id_b").distinct()),
                     "id_b", "left_semi")
        joined = F.broadcast(candidates).join(da, "id_a").join(db, "id_b")
    else:
        joined = candidates.join(da, "id_a").join(db, "id_b")

    # sizes are >= 1 whenever a pair exists (a candidate shares >= 1
    # shingle; min_tokens=1 gives every doc >= 1 whole-doc shingle), so
    # neither division needs a zero guard — and the SQL oracle replays the
    # same bare arithmetic, keeping parity exact.
    na, nb = F.size("_sh_a"), F.size("_sh_b")
    inter = F.size(F.array_intersect("_sh_a", "_sh_b"))
    return (
        joined
        .withColumn("_inter", inter)
        .withColumn("containment", F.col("_inter") / F.least(na, nb))
        .withColumn("jaccard", F.col("_inter") / (na + nb - F.col("_inter")))
        .withColumn("contained_id",
                    F.when(na <= nb, F.col("id_a")).otherwise(F.col("id_b")))
        .where(F.col("containment") >= tau)
        .select("id_a", "id_b", "containment", "jaccard", "contained_id")
    )
