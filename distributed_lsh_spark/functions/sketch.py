"""Deterministic HyperLogLog distinct-count sketch (Flajolet, Fusy,
Gandouet, Meunier, AofA'07) — the mergeable cardinality summary a
100 TB curation pipeline keeps per corpus slice (vocabulary size,
distinct n-grams, distinct urls per host) where an exact
`count(DISTINCT x)` would shuffle every distinct item.

Scale shape: an item row enters ONE map-side-combining groupBy keyed by
(slice, register) — partial aggregation collapses each partition's
contribution to at most `HLL_M` rows per slice before the shuffle, so
the shuffle volume is O(#slices x 256) regardless of corpus size, and
register frames from different runs/batches merge with the same
`max(rho)` algebra (sketch union == sketch of union).

Cross-engine exactness (every gated float in this repo must hash-match
DuckDB): the item hash is the md5-derived 32-bit integer both engines
parse identically; the register index and rho use pure integer bit math
(`bit_count` trailing-zero form); the harmonic mean is computed as the
EXACT int64 sum of `2^(RHO_MAX - M_j)` (max 256 * 2^25 < 2^53), so the
final estimate is one exactly-rounded double division of
engine-identical operands — bit-stable across Spark, DuckDB, and
partitionings.  The textbook small/large-range corrections need `ln`,
which is not correctly-rounded libm-portable, so `hll_summary` emits
the RAW estimator plus `v_zero` (empty-register count) and leaves
corrections to the read path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CMS_D = 4                      # count-min hash rows
CMS_W = 1024                   # counters per row

HLL_P = 8                      # register index bits
HLL_M = 1 << HLL_P             # 256 registers
HLL_RHO_MAX = 32 - HLL_P + 1   # rho of w == 0 (all 24 payload bits zero)
_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
# alpha_m * m^2 * 2^RHO_MAX; m^2 * 2^RHO_MAX = 2^41 is float-exact, so
# this is a single IEEE product — embed repr() of it in oracle SQL to
# guarantee the identical constant on both engines
HLL_EST_NUM = _ALPHA * float(HLL_M) * float(HLL_M) * float(1 << HLL_RHO_MAX)


def _cms_cell(item, row):
    """Row-salted md5 cell index — the same md5-derived 32-bit integer
    both engines parse identically (md5_h32 convention)."""
    return F.pmod(
        F.conv(F.substring(F.md5(F.concat_ws("#", item,
                                             row.cast("string"))),
                           1, 8), 16, 10).cast("long"),
        F.lit(CMS_W))


def cms_cells(df: DataFrame, keys: list[str], item_col: str) -> DataFrame:
    """(keys..., item) -> (keys..., row, cell, cnt): the Count-Min
    table (Cormode & Muthukrishnan, J.Alg'05).  ONE map-side-combining
    groupBy collapses each partition to at most D x W cells per key
    slice before the shuffle — shuffle volume O(#slices x 4096)
    regardless of corpus size, where an exact term census shuffles
    every distinct term.  Cell tables are mergeable by ADDITION
    (union + re-sum == sketch of union), and every count is an exact
    int64 sum — deterministic across engines and partitionings."""
    rows = F.explode(F.array(*[F.lit(r) for r in range(CMS_D)]))
    d = df.select(*keys, F.col(item_col).alias("_it")) \
          .withColumn("row", rows)
    return (d.select(*keys, "row",
                     _cms_cell(F.col("_it"), F.col("row")).alias("cell"))
            .groupBy(*keys, "row", "cell")
            .agg(F.count(F.lit(1)).alias("cnt")))


def cms_lookup(cells: DataFrame, probes: DataFrame,
               item_col: str) -> DataFrame:
    """Probe a Count-Min table: (item) -> (item, cms_count) with
    cms_count = min over the D rows of the item's counter (>= the true
    count, never under).  A cell absent from `cells` counts 0."""
    rows = F.explode(F.array(*[F.lit(r) for r in range(CMS_D)]))
    pc = (probes.select(F.col(item_col).alias("_it"))
          .withColumn("row", rows)
          .select("_it", "row",
                  _cms_cell(F.col("_it"), F.col("row")).alias("cell")))
    return (pc.join(cells, ["row", "cell"], "left")
            .groupBy("_it")
            .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cms_count"))
            .select(F.col("_it").alias(item_col), "cms_count"))


def hll_registers(df: DataFrame, keys: list[str],
                  item_col: str) -> DataFrame:
    """(keys..., item) -> (keys..., reg, max_rho): the HLL register
    table, one map-side-combining groupBy.  Register tables are
    mergeable: union two and re-aggregate max(rho)."""
    u = F.conv(F.substring(F.md5(F.col(item_col)), 1, 8), 16, 10) \
        .cast("long")
    d = df.withColumn("_u", u) \
          .withColumn("_w", F.expr(f"_u div {HLL_M}"))
    rho = (F.when(F.col("_w") == 0, F.lit(HLL_RHO_MAX))
           .otherwise(F.expr("bit_count((_w & -_w) - 1) + 1")))
    return (d.select(*keys, F.pmod("_u", F.lit(HLL_M)).alias("reg"),
                     rho.alias("rho"))
            .groupBy(*keys, "reg")
            .agg(F.max("rho").alias("max_rho")))


def hll_summary(registers: DataFrame, keys: list[str]) -> DataFrame:
    """Register table -> (keys..., hll_estimate, v_zero).  Empty
    registers are filled in from the key grid (they contribute 2^RHO_MAX
    to the exact-integer harmonic sum)."""
    spark = registers.sparkSession
    grid = (registers.select(*keys).distinct()
            .crossJoin(spark.range(HLL_M)
                       .select(F.col("id").alias("reg"))))
    full = (grid.join(registers, [*keys, "reg"], "left")
            .select(*keys, F.coalesce("max_rho", F.lit(0)).alias("max_rho")))
    return (full.groupBy(*keys)
            .agg(F.sum(F.expr(
                     f"shiftleft(CAST(1 AS BIGINT), "
                     f"{HLL_RHO_MAX} - max_rho)")).alias("_harmonic"),
                 F.sum(F.when(F.col("max_rho") == 0, 1).otherwise(0))
                  .cast("long").alias("v_zero"))
            .select(*keys,
                    F.round(F.lit(HLL_EST_NUM) /
                            F.col("_harmonic").cast("double"), 3)
                     .alias("hll_estimate"),
                    "v_zero"))
