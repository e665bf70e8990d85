"""Exact-N deterministic stratified sampling ("reservoir" semantics).

`stratified_sample` (entry_queries) keeps a RATE per stratum; this
operator keeps an exact COUNT: the N rows with the smallest md5 rank per
stratum — the distributed, deterministic equivalent of per-stratum
reservoir sampling (same marginal distribution, reproducible across
runs/partitionings, and the same sample survives data re-shuffles because
rank depends only on the row id).

Naive form — `row_number() OVER (PARTITION BY stratum ORDER BY rank)` on
the raw corpus — sorts EVERY row of the largest stratum on one task: a
10^11-row language partition is a guaranteed executor kill.  Two-phase
form used here:

  1. count per stratum (one map-side-combining groupBy, #strata rows,
     broadcast back);
  2. hash-threshold prefilter: keep a row iff
        rank * count < 2^60 * margin * N
     evaluated in 128-bit exact arithmetic (Spark DECIMAL(38) / DuckDB
     HUGEINT — bit-identical, no float).  Uniform ranks make survivors
     per stratum concentrate at ~margin*N (Chernoff: undershooting N at
     margin=2 is e^{-N/4}-improbable); strata with count <= margin*N
     pass everything, so small strata are EXACT by construction;
  3. the window runs on the ~margin*N survivors per stratum — bounded
     sort, never corpus-scale.

The operator's defined semantics are "phase-2 prefilter THEN top-N", so
the SQL oracle replays the same arithmetic and parity is exact even in
the astronomically-unlikely undershoot; pytest pins prefilter+window ==
pure top-N on fixtures.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

RANK_SPACE = 1 << 60  # md5-derived rank in [0, 2^60)


def md5_rank(col: Column) -> Column:
    """Deterministic uniform rank in [0, 2^60): first 15 md5 hex chars.
    DuckDB twin: ('0x' || substr(md5(x), 1, 15))::HUGEINT."""
    return (F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10)
             .cast("bigint"))


def reservoir_sample(df: DataFrame, stratum_col: str, n: int,
                     id_col: str = "doc_id", margin: int = 2) -> DataFrame:
    """Exactly min(n, |stratum|) rows per stratum: the n smallest md5
    ranks of `id_col`, ties broken by id.  Returns the input columns
    plus `sample_rank` (1-based within stratum)."""
    ranked = df.withColumn("_rk", md5_rank(F.col(id_col)))
    counts = (ranked.groupBy(stratum_col)
                    .agg(F.count(F.lit(1)).alias("_cnt")))
    # 128-bit exact: rank * count < 2^60 * margin * n
    lhs = F.col("_rk").cast("decimal(38,0)") * F.col("_cnt")
    rhs = F.lit(RANK_SPACE).cast("decimal(38,0)") * F.lit(margin * n)
    pre = (ranked.join(F.broadcast(counts), stratum_col)
                 .where(lhs < rhs))
    w = Window.partitionBy(stratum_col).orderBy("_rk", id_col)
    return (pre.withColumn("sample_rank", F.row_number().over(w))
               .where(F.col("sample_rank") <= n)
               .drop("_rk", "_cnt"))
