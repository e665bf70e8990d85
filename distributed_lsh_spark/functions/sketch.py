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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

CMS_D = 4                      # count-min hash rows
CMS_W = 1024                   # counters per row

QSK_SUB_BITS = 4               # log-histogram sub-octave resolution bits
QSK_BASE = 1 << QSK_SUB_BITS   # values below this are binned exactly

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
               item_col: str, keys: list[str] | None = None) -> DataFrame:
    """Probe a Count-Min table: (item) -> (keys..., item, cms_count)
    with cms_count = min over the D rows of the item's counter (>= the
    true count, never under).  A cell absent from `cells` counts 0.

    `keys` MUST name the slice columns `cells` was built with
    (cms_cells' `keys`): each probe is then answered once per slice.
    Passing a keyed cell table without `keys` would silently join
    counters across slices, so the column set is validated."""
    keys = keys or []
    extra = set(cells.columns) - {"row", "cell", "cnt", *keys}
    if extra:
        raise ValueError(
            f"cells table has slice columns {sorted(extra)} — pass them "
            f"as keys= so lookups do not mix slices")
    rows = F.explode(F.array(*[F.lit(r) for r in range(CMS_D)]))
    pc = (probes.select(F.col(item_col).alias("_it"))
          .withColumn("row", rows)
          .select("_it", "row",
                  _cms_cell(F.col("_it"), F.col("row")).alias("cell")))
    if keys:
        # answer every probe against every slice: the probe side is the
        # tiny one (|probes| x D rows), the cell table is O(#slices x
        # 4096) — both sketch-sized, never corpus-sized
        pc = pc.crossJoin(cells.select(*keys).distinct())
    joined = pc.join(cells, [*keys, "row", "cell"], "left")
    return (joined.groupBy(*keys, "_it")
            .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cms_count"))
            .select(*keys, F.col("_it").alias(item_col), "cms_count"))


_QSK_BIN_SQL = (
    f"CASE WHEN {{v}} < {QSK_BASE} THEN {{v}} "
    f"ELSE (length(bin({{v}})) - {QSK_SUB_BITS + 1}) * {QSK_BASE} "
    f"+ shiftright({{v}}, cast(length(bin({{v}})) - {QSK_SUB_BITS + 1} "
    f"as int)) END"
)
_QSK_UPPER_SQL = (
    f"CASE WHEN {{b}} < {QSK_BASE} THEN {{b}} "
    f"ELSE shiftleft(({{b}} % {QSK_BASE}) + {QSK_BASE + 1}, "
    f"cast({{b}} div {QSK_BASE} - 1 as int)) - 1 END"
)


def log_histogram(df: DataFrame, keys: list[str],
                  value_col: str) -> DataFrame:
    """(keys..., value) -> (keys..., bin_id, cnt): a deterministic
    mergeable log-spaced histogram (the HdrHistogram bucketing scheme,
    Tene, hdrhistogram.org) — the quantile summary a 100 TB pipeline
    keeps per corpus slice (doc-length, token-count, score
    distributions) where an exact per-slice quantile sorts the whole
    slice.

    Binning: values in [0, 16) are exact; above that, a value with
    highest set bit e lands in one of 16 sub-bins of its octave
    (`bin_id = (e - 4) * 16 + (v >> (e - 4))`), so any quantile read
    from the histogram has relative error <= 2^-4 = 0.0625.  Pure
    integer bit math — `length(bin(v)) - 1`
    is the highest-bit index on Spark AND DuckDB — so bins are
    bit-identical cross-engine and across partitionings.

    Scale shape: ONE map-side-combining groupBy; each partition
    collapses to at most ~16 * 60 bins per slice before the shuffle,
    so shuffle volume is O(#slices x #bins) regardless of corpus size,
    and histograms from different runs/batches merge by ADDING counts
    (union + re-sum == histogram of union).  Values must be >= 0
    (negative inputs would bin by their raw value and corrupt the
    cumulative read)."""
    d = df.select(*keys, F.col(value_col).cast("long").alias("_v"))
    return (d.select(*keys,
                     F.expr(_QSK_BIN_SQL.format(v="_v")).alias("bin_id"))
            .groupBy(*keys, "bin_id")
            .agg(F.count(F.lit(1)).alias("cnt")))


def histogram_quantiles(hist: DataFrame, keys: list[str],
                        qs_pm: tuple[int, ...] = (500, 900, 990)
                        ) -> DataFrame:
    """Log-histogram -> (keys..., q_pm, value): for each per-mille
    quantile q, the UPPER BOUND of the bin containing the ceil(q*N/1000)-
    th smallest value — an overestimate of the exact order statistic by
    at most one bin width (relative error <= 2^-4 = 0.0625).

    All arithmetic is integer (rank = (q_pm * N + 999) div 1000; bin
    cumsum; bin -> upper-bound bit math), so the read is bit-identical
    across engines.  The histogram side is O(#slices x #bins) rows —
    the window sort here orders BINS, never corpus rows."""
    spark = hist.sparkSession
    totals = hist.groupBy(*keys).agg(F.sum("cnt").alias("_n"))
    qs = spark.createDataFrame([(int(q),) for q in qs_pm], "q_pm int")
    w = (Window.partitionBy(*keys).orderBy("bin_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = hist.select(*keys, "bin_id",
                      F.sum("cnt").over(w).alias("_cum"))
    j = (cum.join(totals, list(keys))
         .crossJoin(F.broadcast(qs))
         .where(F.col("_cum") >=
                F.expr("CAST((q_pm * _n + 999) div 1000 AS BIGINT)")))
    return (j.groupBy(*keys, "q_pm")
            .agg(F.min("bin_id").alias("_b"))
            .select(*keys, "q_pm",
                    F.expr(_QSK_UPPER_SQL.format(b="_b")).alias("value")))


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
