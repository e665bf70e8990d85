"""Bloom-filter line dedup — probabilistic membership as the dedup
DECISION (the Dolma `dedupe` semantics), with exact, cross-engine-
replayable bit arithmetic.

Two Bloom roles exist in this repo and they are deliberately different:

* `functions/bloom.py` uses a bitmap as a correctness-neutral PREFILTER
  (snapshot probe): false positives only cost wasted join probes, the
  exact join decides, and the output is bit-identical with the filter on
  or off.  splitmix64 hashing — numpy-fast, not SQL-replayable, and it
  doesn't need to be.
* THIS module uses the Bloom verdict ITSELF as the dedup decision — the
  production pattern of Dolma's deduper (Soldaini et al., ACL'24 §2.3;
  a paragraph whose Bloom probe says "seen" is tagged duplicate, false
  positives accepted as a tunable loss).  Because the verdict lands in
  the output, its bit arithmetic must be value-checkable: hashes derive
  from md5 (replayable in ANSI SQL / DuckDB bit-for-bit), and the
  sequential fill order is pinned to an explicit integer rank so both
  engines agree on WHICH occurrence set each bit first.

Semantics (sequential Bloom, query-then-add): occurrences are ordered by
a caller-supplied int64 rank `rk` (the gate uses doc_id*2^20+pos; a
stream uses arrival order).  Occurrence o is FLAGGED iff at o's turn all
k of its bit positions were already set by occurrences with strictly
smaller rank.  Exact duplicates (same key seen earlier) are flagged by
construction — every earlier same-key occurrence sets exactly o's
positions — so  flagged ⊇ exact-dups,  and  flagged ∖ exact-dups  is the
false-positive set the (m, k) sizing controls.

Spark-native shape (10^12 docs): the filter is never materialized as a
bit array.  "Bit b was set before rank r" ≡ "min rank over occurrences
hashing to b is < r", so the whole construction is:

    occurrences → explode k positions (16-B (rk, bpos) rows)
                → groupBy(bpos).min(rk)          [map-side combinable]
                → join back + per-rk max         [all-k-set test]

Three narrow shuffles, no driver state, no per-row Python — and the
distributed form is exactly equivalent to replaying a single-threaded
Bloom filter in rank order, which is what the DuckDB oracle and the
pure-Python pytest replay do.

Sizing: Dolma sizes m for a target FPR at the expected key count
(m = -n·ln p/(ln 2)^2, k = m/n·ln 2 — `functions/bloom.bloom_parameters`).
The gate constants (m=65536, k=2) are chosen small so the sf corpora
produce a value-dense false-positive count that the gate hash-checks;
production uses bloom_parameters(n_expected, 1e-6)-class sizing.

Reference analogue: the reference's checked-point dedup keeps an exact
per-query hash set (MapReduce-LSH/.../lsh/searcher/LSHSearcher.java
212-252, the `checked` table); this operator is the lossy-but-bounded
variant of the same "have I seen this key" decision, sized in bits/key
instead of bytes/key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Gate constants: small enough that sf0.001/sf0.01 corpora yield a
# deterministic, non-zero false-positive count (10-15 occurrences).
BLOOM_M = 65536
BLOOM_K = 2

# The gate's occurrence rank packs (doc_id, pos) into one int64 so the
# DuckDB oracle can min/max it as a plain BIGINT.  Assumes pos < 2^20
# (a 2^20-line doc is ~8M tokens) and non-negative doc_ids — the sf
# corpora's shape; production streams rank by arrival order instead.
RANK_POS_SPACE = 1 << 20


def bloom_hashes(key: Column, m: int) -> tuple[Column, Column]:
    """(h1, h2) Kirsch-Mitzenmacher double-hash bases from md5(key):
    h1 in [0, m), h2 in [1, m) — bit position i = (h1 + i*h2) % m.
    DuckDB twin: ('0x' || substr(md5(key), 1, 15))::BIGINT % m and
    ('0x' || substr(md5(key), 17, 15))::BIGINT % (m-1) + 1."""
    h1 = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("bigint") \
        % F.lit(m)
    h2 = F.conv(F.substring(F.md5(key), 17, 15), 16, 10).cast("bigint") \
        % F.lit(m - 1) + F.lit(1)
    return h1, h2


def occurrence_positions(occ: DataFrame, m: int, k: int,
                         key_col: str = "line",
                         rank_col: str = "rk") -> DataFrame:
    """(rk, bpos): each occurrence exploded into its k bit positions —
    16-byte rows, the only frame this family ever shuffles."""
    h1, h2 = bloom_hashes(F.col(key_col), m)
    return (occ.select(F.col(rank_col).alias("rk"),
                       h1.alias("_h1"), h2.alias("_h2"))
            .select("rk", "_h1", "_h2",
                    F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("_i"))
            .select("rk", ((F.col("_h1") + F.col("_i") * F.col("_h2"))
                           % F.lit(m)).alias("bpos")))


def bloom_flag_occurrences(occ: DataFrame, m: int = BLOOM_M,
                           k: int = BLOOM_K, key_col: str = "line",
                           rank_col: str = "rk") -> DataFrame:
    """(rk, flagged): sequential-Bloom verdict per occurrence — flagged
    iff ALL k bit positions were set by a strictly smaller rank.

    `occ` needs `key_col` (string) and `rank_col` (int64, unique per
    occurrence, totally ordering the fill).  Equivalent to replaying a
    single-threaded Bloom filter in rank order; distributed as one
    map-side-combining min per bit position plus one per-occurrence max.
    """
    posn = occurrence_positions(occ, m, k, key_col, rank_col)
    setters = posn.groupBy("bpos").agg(F.min("rk").alias("first_set"))
    return (posn.join(setters, "bpos")
            .groupBy("rk")
            .agg(F.max("first_set").alias("_ms"))
            .select("rk", (F.col("_ms") < F.col("rk")).alias("flagged")))
