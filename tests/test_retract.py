"""retract_components (operators/snapshot.py): deleting docs from an
existing labeling must equal a from-scratch CC over the remaining edges
(plus self-labeled rows for surviving members whose last edge died) —
on random graphs, via both the driver and the distributed CC paths."""

from __future__ import annotations

import random

import pytest


def _df(spark, pairs):
    return spark.createDataFrame(pairs, "id_a long, id_b long")


def _ids(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "doc_id long")


def _expected(old_edges, deleted):
    """From-scratch recompute: labels over remaining edges, plus
    self-labels for surviving previously-labeled docs left edge-less."""
    labeled = {v for e in old_edges for v in e}
    dset = set(deleted)
    rem = [(a, b) for a, b in old_edges if a not in dset and b not in dset]
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in rem:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    want = {}
    for v in labeled - dset:
        want[v] = find(v)
    return want


def _rand_case(seed: int):
    rng = random.Random(seed)
    edges = [(rng.randrange(120), rng.randrange(120)) for _ in range(90)]
    edges = [e for e in edges if e[0] != e[1]]
    labeled = sorted({v for e in edges for v in e})
    # delete ~a quarter of labeled docs plus a few never-labeled ids
    deleted = [v for v in labeled if rng.random() < 0.25]
    deleted += [5000 + rng.randrange(10) for _ in range(5)]
    return edges, deleted


@pytest.mark.parametrize("seed", [3, 19, 42])
def test_retract_matches_full_recompute(spark, seed):
    from distributed_lsh_spark.operators.connected_components import (
        connected_components,
    )
    from distributed_lsh_spark.operators.snapshot import retract_components

    edges, deleted = _rand_case(seed)
    labels = connected_components(_df(spark, edges))
    out = retract_components(labels, _df(spark, edges),
                             _ids(spark, deleted)).collect()
    got = {r.doc_id: r.cluster_id for r in out}
    assert len(out) == len(got), "duplicate doc_id rows"
    assert got == _expected(edges, deleted)


def test_retract_distributed_cc_path(spark):
    from distributed_lsh_spark.operators.connected_components import (
        connected_components,
    )
    from distributed_lsh_spark.operators.snapshot import retract_components

    edges, deleted = _rand_case(7)
    labels = connected_components(_df(spark, edges))
    out = retract_components(labels, _df(spark, edges),
                             _ids(spark, deleted),
                             driver_max_edges=0).collect()
    got = {r.doc_id: r.cluster_id for r in out}
    assert got == _expected(edges, deleted)


def test_retract_edge_cases(spark):
    from distributed_lsh_spark.operators.connected_components import (
        connected_components,
    )
    from distributed_lsh_spark.operators.snapshot import retract_components

    # chain 1-2-3-4; separate pair 10-11
    edges = [(1, 2), (2, 3), (3, 4), (10, 11)]
    labels = connected_components(_df(spark, edges))

    # middle deletion splits: 1 isolated, {3,4} relabel; pair untouched
    got = {r.doc_id: r.cluster_id
           for r in retract_components(labels, _df(spark, edges),
                                       _ids(spark, [2])).collect()}
    assert got == {1: 1, 3: 3, 4: 3, 10: 10, 11: 10}

    # rep deletion relabels the remainder
    got = {r.doc_id: r.cluster_id
           for r in retract_components(labels, _df(spark, edges),
                                       _ids(spark, [1])).collect()}
    assert got == {2: 2, 3: 2, 4: 2, 10: 10, 11: 10}

    # deleting a whole component leaves only the other one
    got = {r.doc_id: r.cluster_id
           for r in retract_components(labels, _df(spark, edges),
                                       _ids(spark, [10, 11])).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}

    # empty deletion and unknown ids are no-ops
    got = {r.doc_id: r.cluster_id
           for r in retract_components(labels, _df(spark, edges),
                                       _ids(spark, [999])).collect()}
    assert got == {r.doc_id: r.cluster_id for r in labels.collect()}
