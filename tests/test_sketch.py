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
