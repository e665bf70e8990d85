"""Frozen pipeline configuration.

The reference derives its LSH parameters (m projections per table, L tables)
from dataset statistics at build time (MapReduce-LSH/.../common/LSH.java:74-104)
with an *unseeded* RNG (MapReduce-LSH/.../common/LSHTool.java:11).  The new
engine fixes both problems: parameters are frozen in one place, and every
hash function is a pure function of (seed, index) so the NumPy oracle and the
Spark engine agree bit-for-bit.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

# The reference folds 64-bit hash accumulators into [0, 2^31-1) with
# PRIME = 2147483647 (MapReduce-LSH/.../common/LSH.java:21,260-269).  We keep
# the same prime for the 32-bit shingle-hash domain so the ANN-parity oracle
# and the dedup engine share one constant.
PRIME_31 = (1 << 31) - 1


@dataclass(frozen=True)
class DedupConfig:
    """Immutable dedup-pipeline configuration (oracle + engine share it)."""

    # --- text normalization / shingling -------------------------------
    shingle_k: int = 5          # word-shingle width (FIXTURES.md §3)
    min_tokens: int = 1         # docs shorter than this produce 1 whole-doc shingle

    # --- MinHash signature ---------------------------------------------
    num_perm: int = 128         # signature length (FIXTURES.md §3)
    seed: int = 42              # master seed for all hash parameter draws
    # "kxl" = classic k-independent permutations (O(num_perm x shingles),
    #         exactly the reference's AND/OR family shape);
    # "oph" = one-permutation hashing with rotation densification
    #         (Li et al. NIPS'12; Shrivastava & Li ICML'14) — O(shingles),
    #         the at-scale scheme (SCALE.md)
    minhash_scheme: str = "kxl"

    # --- LSH banding -----------------------------------------------------
    num_bands: int = 32         # b
    rows_per_band: int = 4      # r ; threshold ~ (1/b)^(1/r) ~ 0.42

    # --- verification thresholds ----------------------------------------
    jaccard_threshold: float = 0.8   # exact-Jaccard acceptance (P4 analogue)
    simhash_bits: int = 64
    hamming_threshold: int = 3       # SimHash acceptance (FIXTURES.md §3)

    # --- skew hardening (A4/T4 searchThreshold analogue) -----------------
    # Bands whose (band_id, band_hash) bucket exceeds this many docs are
    # capped: the bucket contributes at most `hot_band_cap` docs to pair
    # generation (pairs within the cap), mirroring the reference's
    # searchThreshold = pruneFactor * L + k early cut
    # (MapReduce-LSH/.../lsh/searcher/SearchMapper.java:266,340-353).
    hot_band_cap: int = 2000

    def __post_init__(self) -> None:
        if self.num_bands * self.rows_per_band != self.num_perm:
            raise ValueError(
                f"num_bands*rows_per_band ({self.num_bands}x{self.rows_per_band}) "
                f"must equal num_perm ({self.num_perm})"
            )

    def with_(self, **kw) -> "DedupConfig":
        return replace(self, **kw)

    @property
    def band_threshold(self) -> float:
        """Approximate Jaccard s at which collision prob = 1/2:
        s ~ (1/b)^(1/r) — the MinHash analogue of the reference's p1/p2
        parameter planning (MapReduce-LSH/.../common/LSH.java:84-104)."""
        return (1.0 / self.num_bands) ** (1.0 / self.rows_per_band)


DEFAULT_CONFIG = DedupConfig()


def spark_conf_pairs(shuffle_partitions: int = 32) -> list[tuple[str, str]]:
    """Session conf used by tests, bench, and the CLI.

    AQE on (skew-join + partition coalescing) per SURVEY.md §4; Arrow on for
    the pandas-UDF stages; shuffle partitions sized to local cores (would be
    sized to cluster cores x 2-3 on a real deployment).
    """
    return [
        # legacy arithmetic: the shingle rolling-poly hash relies on 64-bit
        # wraparound multiplication (== numpy uint64); ANSI mode (Spark 4
        # default) would throw ARITHMETIC_OVERFLOW instead of wrapping.
        ("spark.sql.ansi.enabled", "false"),
        ("spark.sql.shuffle.partitions", str(shuffle_partitions)),
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.adaptive.coalescePartitions.enabled", "true"),
        ("spark.sql.adaptive.skewJoin.enabled", "true"),
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
        # bound pandas-UDF batch memory (text rows can be KBs each; 32
        # concurrent python workers x 10k-row default batches OOM'd)
        ("spark.sql.execution.arrow.maxRecordsPerBatch", "4096"),
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.ui.enabled", "false"),
        ("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)),
    ]
