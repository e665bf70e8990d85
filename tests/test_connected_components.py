"""Large-star/small-star CC vs oracle union-find on random + adversarial
graphs (long chains are the worst case for label propagation)."""

from __future__ import annotations

import random

from distributed_lsh_spark.operators.connected_components import connected_components
from distributed_lsh_spark.oracle.dedup import UnionFind


def _oracle_labels(edges):
    uf = UnionFind()
    for a, b in edges:
        uf.union(a, b)
    return {d: uf.find(d) for d in uf.parent}


def _run(spark, edges):
    df = spark.createDataFrame(list(edges) or [(0, 0)], "id_a long, id_b long")
    if not edges:
        df = df.where("id_a != id_a")
    # both dispatch routes must produce the identical labeling: the driver
    # union-find (default at these sizes) and the distributed
    # large-star/small-star loop (forced via driver_max_edges=0)
    got = {r["doc_id"]: r["cluster_id"] for r in connected_components(df).collect()}
    assert got == _oracle_labels(edges)
    dist = {r["doc_id"]: r["cluster_id"]
            for r in connected_components(df, driver_max_edges=0).collect()}
    assert dist == _oracle_labels(edges)


def test_cc_empty(spark):
    _run(spark, [])


def test_cc_single_edge(spark):
    _run(spark, [(7, 3)])


def test_cc_long_chain(spark):
    _run(spark, [(i, i + 1) for i in range(60)])


def test_cc_random_graph(spark):
    rng = random.Random(7)
    edges = {(rng.randrange(500), rng.randrange(500)) for _ in range(300)}
    edges = {(a, b) for a, b in edges if a != b}
    _run(spark, sorted(edges))


def test_cc_star_and_cliques(spark):
    edges = [(0, i) for i in range(1, 30)]                      # star
    edges += [(100 + i, 100 + j) for i in range(6) for j in range(i + 1, 6)]
    _run(spark, edges)
