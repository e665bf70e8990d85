"""incremental_components (operators/snapshot.py): merging a batch's
edges into an existing labeling must equal a from-scratch CC over the
union graph — on random graphs, via both the driver and the distributed
CC paths."""

from __future__ import annotations

import random

import pytest


def _df(spark, pairs):
    return spark.createDataFrame(pairs, "id_a long, id_b long")


def _rand_case(seed: int):
    rng = random.Random(seed)
    old = [(rng.randrange(100), rng.randrange(100)) for _ in range(80)]
    new = []
    for _ in range(60):
        r = rng.random()
        if r < 0.25:      # archive<->archive (threshold-change edges)
            new.append((rng.randrange(100), rng.randrange(100)))
        elif r < 0.7:     # new<->archive
            new.append((rng.randrange(100), 1000 + rng.randrange(40)))
        else:             # new<->new
            new.append((1000 + rng.randrange(40), 1000 + rng.randrange(40)))
    return ([p for p in old if p[0] != p[1]],
            [p for p in new if p[0] != p[1]])


@pytest.mark.parametrize("seed", [7, 11, 13])
def test_incremental_matches_full_recompute(spark, seed):
    from distributed_lsh_spark.operators.connected_components import (
        connected_components,
    )
    from distributed_lsh_spark.operators.snapshot import (
        incremental_components,
    )

    old, new = _rand_case(seed)
    labels = connected_components(_df(spark, old))
    inc = incremental_components(labels, _df(spark, new))
    rows = inc.collect()
    got = {r.doc_id: r.cluster_id for r in rows}
    assert len(rows) == len(got), "duplicate doc_id rows"
    full = connected_components(_df(spark, old + new))
    want = {r.doc_id: r.cluster_id for r in full.collect()}
    assert got == want


def test_incremental_distributed_cc_path(spark):
    from distributed_lsh_spark.operators.connected_components import (
        connected_components,
    )
    from distributed_lsh_spark.operators.snapshot import (
        incremental_components,
    )

    old, new = _rand_case(3)
    labels = connected_components(_df(spark, old))
    inc = incremental_components(labels, _df(spark, new),
                                 driver_max_edges=0)   # force the loop
    full = connected_components(_df(spark, old + new))
    assert {(r.doc_id, r.cluster_id) for r in inc.collect()} == \
        {(r.doc_id, r.cluster_id) for r in full.collect()}


def test_noop_batch_keeps_labels(spark):
    """New edges entirely inside existing clusters change nothing."""
    from distributed_lsh_spark.operators.connected_components import (
        connected_components,
    )
    from distributed_lsh_spark.operators.snapshot import (
        incremental_components,
    )

    old = [(0, 1), (1, 2), (10, 11)]
    labels = connected_components(_df(spark, old))
    inc = incremental_components(labels, _df(spark, [(0, 2), (10, 11)]))
    assert {r.doc_id: r.cluster_id for r in inc.collect()} == \
        {0: 0, 1: 0, 2: 0, 10: 10, 11: 10}
