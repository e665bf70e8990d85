"""asof_join (operators/asof.py): the union+window backward as-of join
checked against a brute-force per-probe argmax on a seeded random
instance, plus the edge cases the window formulation must get right
(equal timestamps are inclusive, probes before any build row yield
NULLs, keys with no build rows at all, payload-collision guard)."""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F


def _mk(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


def _brute(probe_rows, build_rows):
    """dict probe_idx -> matched build row (or None): greatest build ts
    <= probe ts within key, ties impossible (build unique per key/ts)."""
    out = {}
    for i, (k, pts, _) in enumerate(probe_rows):
        best = None
        for (bk, bts, v) in build_rows:
            if bk == k and bts <= pts and (best is None or bts > best[0]):
                best = (bts, v)
        out[i] = best
    return out


def test_asof_matches_brute_force(spark):
    from distributed_lsh_spark.operators.asof import asof_join

    rng = random.Random(7)
    t0 = dt.datetime(2024, 1, 1)
    build_rows = []
    seen = set()
    for _ in range(120):
        k = rng.randrange(6)
        ts = t0 + dt.timedelta(minutes=rng.randrange(500))
        if (k, ts) in seen:
            continue
        seen.add((k, ts))
        build_rows.append((k, ts, rng.randrange(10_000)))
    probe_rows = [(rng.randrange(8),  # keys 6,7 have no build rows
                   t0 + dt.timedelta(minutes=rng.randrange(500)), i)
                  for i in range(150)]

    build = _mk(spark, build_rows, ["k", "ts", "v"])
    probe = _mk(spark, probe_rows, ["k", "pts", "probe_id"])
    got = {r["probe_id"]: (r["matched_ts"], r["v"])
           for r in asof_join(probe, build, key="k", probe_ts="pts",
                              build_ts="ts").collect()}
    want = _brute(probe_rows, build_rows)
    assert set(got) == set(range(150))
    for i, exp in want.items():
        assert got[i] == (exp if exp is not None else (None, None)), i


def test_asof_equal_ts_is_inclusive_and_unmatched_is_null(spark):
    from distributed_lsh_spark.operators.asof import asof_join

    t = dt.datetime(2024, 5, 1, 12, 0, 0)
    build = _mk(spark, [(1, t, 100)], ["k", "ts", "v"])
    probe = _mk(spark, [(1, t, 0),                      # equal ts -> match
                        (1, t - dt.timedelta(seconds=1), 1),  # before -> null
                        (2, t, 2)],                     # no build key -> null
                ["k", "pts", "probe_id"])
    got = {r["probe_id"]: r["v"]
           for r in asof_join(probe, build, key="k", probe_ts="pts",
                              build_ts="ts").collect()}
    assert got == {0: 100, 1: None, 2: None}


def test_asof_payload_collision_raises(spark):
    from distributed_lsh_spark.operators.asof import asof_join

    t = dt.datetime(2024, 5, 1)
    build = _mk(spark, [(1, t, 1)], ["k", "ts", "v"])
    probe = _mk(spark, [(1, t, 2)], ["k", "pts", "v"])
    with pytest.raises(ValueError, match="collision"):
        asof_join(probe, build, key="k", probe_ts="pts", build_ts="ts")


def test_asof_join_rejects_output_name_collisions(spark):
    from distributed_lsh_spark.operators.asof import asof_join

    probe = spark.createDataFrame([(1, 10, "x")], "k long, pts long, v string")
    build = spark.createDataFrame([(1, 9, 7)], "k long, bts long, pts long")
    # build payload column named like the probe ts -> ambiguous output
    import pytest as _pytest
    with _pytest.raises(ValueError, match="collision"):
        asof_join(probe, build, "k", "pts", "bts")
    # matched_ts colliding with a payload name -> rejected too
    build2 = spark.createDataFrame([(1, 9, 7)], "k long, bts long, m long")
    with _pytest.raises(ValueError, match="collision"):
        asof_join(probe, build2, "k", "pts", "bts", matched_ts="m")
