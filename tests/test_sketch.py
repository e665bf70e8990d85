"""HyperLogLog sketch (functions/sketch.py): estimate quality, exact
cross-engine determinism vs a pure-Python replay, mergeability
(sketch union == sketch of union), and partitioning invariance."""

import hashlib

import pytest
from pyspark.sql import functions as F

from distributed_lsh_spark.functions.sketch import (
    CMS_D, CMS_W, HLL_EST_NUM, HLL_M, HLL_RHO_MAX, cms_cells,
    cms_lookup, hll_registers, hll_summary,
)


def _py_hll(items):
    """Pure-Python replay of the exact register/estimate algebra."""
    regs = [0] * HLL_M
    for it in items:
        u = int(hashlib.md5(it.encode()).hexdigest()[:8], 16)
        w = u // HLL_M
        rho = HLL_RHO_MAX if w == 0 else ((w & -w).bit_length() - 1) + 1
        reg = u % HLL_M
        regs[reg] = max(regs[reg], rho)
    harmonic = sum(1 << (HLL_RHO_MAX - r) for r in regs)
    v_zero = sum(1 for r in regs if r == 0)
    return round(HLL_EST_NUM / float(harmonic), 3), v_zero


@pytest.fixture(scope="module")
def items_df(spark):
    # 2 slices x (5000, 800) distinct items, each repeated 1-3x
    rows = []
    for i in range(5000):
        for _ in range(1 + i % 3):
            rows.append(("big", f"item-{i}"))
    for i in range(800):
        rows.append(("small", f"tok-{i}"))
    return spark.createDataFrame(rows, "slice string, item string")


def test_estimate_matches_python_replay_exactly(spark, items_df):
    got = {r["slice"]: (r["hll_estimate"], r["v_zero"])
           for r in hll_summary(
               hll_registers(items_df, ["slice"], "item"),
               ["slice"]).collect()}
    assert got["big"] == _py_hll([f"item-{i}" for i in range(5000)])
    assert got["small"] == _py_hll([f"tok-{i}" for i in range(800)])


def test_estimate_accuracy(spark, items_df):
    # standard error ~1.04/sqrt(256) = 6.5%; allow 3 sigma
    got = {r["slice"]: r["hll_estimate"]
           for r in hll_summary(
               hll_registers(items_df, ["slice"], "item"),
               ["slice"]).collect()}
    assert abs(got["big"] / 5000.0 - 1.0) < 0.20
    assert abs(got["small"] / 800.0 - 1.0) < 0.20


def test_register_merge_equals_union(spark, items_df):
    """max-merge of per-half register tables == registers of the union
    (the mergeability contract batch/streaming accumulation relies on)."""
    h1 = items_df.where(F.crc32("item") % 2 == 0)
    h2 = items_df.where(F.crc32("item") % 2 == 1)
    merged = (hll_registers(h1, ["slice"], "item")
              .unionByName(hll_registers(h2, ["slice"], "item"))
              .groupBy("slice", "reg").agg(F.max("max_rho").alias("max_rho")))
    whole = hll_registers(items_df, ["slice"], "item")
    assert (merged.exceptAll(whole).count() == 0
            and whole.exceptAll(merged).count() == 0)
    a = sorted(map(tuple, hll_summary(merged, ["slice"]).collect()))
    b = sorted(map(tuple, hll_summary(whole, ["slice"]).collect()))
    assert a == b


def _py_cms(items, probes):
    """Pure-Python replay of the count-min build + lookup."""
    cells = {}
    for it in items:
        for r in range(CMS_D):
            u = int(hashlib.md5(f"{it}#{r}".encode()).hexdigest()[:8], 16)
            cells[(r, u % CMS_W)] = cells.get((r, u % CMS_W), 0) + 1
    out = {}
    for p in probes:
        out[p] = min(
            cells.get((r, int(hashlib.md5(f"{p}#{r}".encode())
                              .hexdigest()[:8], 16) % CMS_W), 0)
            for r in range(CMS_D))
    return out


def test_cms_matches_python_replay_and_never_undercounts(spark, items_df):
    items = [r["item"] for r in items_df.collect()]
    probes = ["item-0", "item-17", "tok-5", "absent-x"]
    want = _py_cms(items, probes)
    cells = cms_cells(items_df, [], "item")
    got = {r["item"]: r["cms_count"]
           for r in cms_lookup(
               cells, spark.createDataFrame([(p,) for p in probes],
                                            "item string"),
               "item").collect()}
    assert got == want
    import collections
    truth = collections.Counter(items)
    for p in probes:
        assert got[p] >= truth.get(p, 0)


def test_cms_additive_merge_equals_union(spark, items_df):
    h1 = items_df.where(F.crc32("item") % 2 == 0)
    h2 = items_df.where(F.crc32("item") % 2 == 1)
    merged = (cms_cells(h1, [], "item")
              .unionByName(cms_cells(h2, [], "item"))
              .groupBy("row", "cell").agg(F.sum("cnt").alias("cnt")))
    whole = cms_cells(items_df, [], "item")
    assert (merged.exceptAll(whole).count() == 0
            and whole.exceptAll(merged).count() == 0)


def test_partitioning_invariance(spark, items_df):
    outs = []
    for n in (1, 7):
        outs.append(sorted(map(tuple, hll_summary(
            hll_registers(items_df.repartition(n), ["slice"], "item"),
            ["slice"]).collect())))
    assert outs[0] == outs[1]


# ---- log-histogram quantile sketch ----------------------------------------

QSK_SUB_BITS, QSK_BASE = 4, 16


def _py_bin(v: int) -> int:
    if v < QSK_BASE:
        return v
    e = v.bit_length() - 1
    return (e - QSK_SUB_BITS) * QSK_BASE + (v >> (e - QSK_SUB_BITS))


def _py_upper(b: int) -> int:
    if b < QSK_BASE:
        return b
    return (((b % QSK_BASE) + QSK_BASE + 1) << (b // QSK_BASE - 1)) - 1


@pytest.fixture(scope="module")
def values_df(spark):
    # deterministic spread: exact region, octave boundaries, large values
    vals = ([0, 1, 15, 16, 17, 31, 32, 33] +
            [(i * 7919) % 1_000_003 for i in range(2000)])
    return spark.createDataFrame(
        [("s", v) for v in vals], "slice string, v long")


def test_log_histogram_matches_python_replay(spark, values_df):
    from distributed_lsh_spark.functions.sketch import log_histogram

    vals = [r["v"] for r in values_df.collect()]
    want = {}
    for v in vals:
        want[_py_bin(v)] = want.get(_py_bin(v), 0) + 1
    got = {r["bin_id"]: r["cnt"]
           for r in log_histogram(values_df, ["slice"], "v").collect()}
    assert got == want


def test_log_histogram_additive_merge_equals_union(spark, values_df):
    from distributed_lsh_spark.functions.sketch import log_histogram

    h1 = values_df.where(F.col("v") % 2 == 0)
    h2 = values_df.where(F.col("v") % 2 == 1)
    merged = (log_histogram(h1, ["slice"], "v")
              .unionByName(log_histogram(h2, ["slice"], "v"))
              .groupBy("slice", "bin_id").agg(F.sum("cnt").alias("cnt")))
    whole = log_histogram(values_df, ["slice"], "v")
    assert (merged.exceptAll(whole).count() == 0
            and whole.exceptAll(merged).count() == 0)


def test_histogram_quantiles_bound_exact_order_stat(spark, values_df):
    from distributed_lsh_spark.functions.sketch import (
        histogram_quantiles, log_histogram,
    )

    vals = sorted(r["v"] for r in values_df.collect())
    n = len(vals)
    got = {r["q_pm"]: r["value"]
           for r in histogram_quantiles(
               log_histogram(values_df, ["slice"], "v"),
               ["slice"]).collect()}
    for q_pm, sk in got.items():
        exact = vals[(q_pm * n + 999) // 1000 - 1]
        # pure-Python replay of the whole read: bin the values, pick the
        # bin holding the rank, report its upper bound
        assert sk == _py_upper(_py_bin(exact))
        assert exact <= sk <= int(exact * (1 + 2 ** -QSK_SUB_BITS))


def test_histogram_quantiles_exact_region_and_single_row(spark):
    from distributed_lsh_spark.functions.sketch import (
        histogram_quantiles, log_histogram,
    )

    # all values < 16 -> the sketch IS exact; one-row slice -> every
    # quantile is that row's value
    df = spark.createDataFrame(
        [("a", v) for v in [0, 3, 3, 7, 15]] + [("b", 1_000_000)],
        "slice string, v long")
    got = {(r["slice"], r["q_pm"]): r["value"]
           for r in histogram_quantiles(
               log_histogram(df, ["slice"], "v"),
               ["slice"]).collect()}
    a = sorted([0, 3, 3, 7, 15])
    for q_pm in (500, 900, 990):
        assert got[("a", q_pm)] == a[(q_pm * 5 + 999) // 1000 - 1]
        assert got[("b", q_pm)] == _py_upper(_py_bin(1_000_000))


def test_cms_keyed_lookup_isolates_slices(spark, items_df):
    """A keyed cell table answers each probe per slice; the unkeyed call
    on a keyed table is rejected instead of silently mixing counters."""
    from distributed_lsh_spark.functions.sketch import cms_cells, cms_lookup

    cells = cms_cells(items_df, ["slice"], "item")
    with pytest.raises(ValueError, match="slice columns"):
        cms_lookup(cells, spark.createDataFrame([("item-0",)],
                                                "item string"), "item")
    probes = spark.createDataFrame(
        [("item-0",), ("tok-5",)], "item string")
    got = {(r["slice"], r["item"]): r["cms_count"]
           for r in cms_lookup(cells, probes, "item",
                               keys=["slice"]).collect()}
    import collections
    truth = collections.Counter(
        (r["slice"], r["item"]) for r in items_df.collect())
    # never undercounts within a slice, and absent-in-slice probes are
    # answered from that slice's (possibly colliding) counters only
    for k, v in got.items():
        assert v >= truth.get(k, 0)
    # item-0 exists only in the big slice: the small slice's answer must
    # not leak the big slice's count
    assert got[("small", "item-0")] <= got[("big", "item-0")]
    assert got[("big", "item-0")] >= truth[("big", "item-0")] >= 1
