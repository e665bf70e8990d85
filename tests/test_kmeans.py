"""Exact deterministic k-means (operators/kmeans.py): the full Lloyd
trajectory is pinned against an independent pure-Python/NumPy reference,
and partitioning-invariance (the property float k-means lacks) is
asserted directly."""

from __future__ import annotations

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"
K, ITERS, SCALE = 4, 3, 1000


def _ref_kmeans(ids: np.ndarray, vecs: np.ndarray, k: int, iters: int,
                scale: int):
    """Independent Lloyd reference: same quantize/init/tie rules,
    written over plain loops (no shared code with the operator)."""
    m = vecs.astype(np.float64) * scale
    q = (np.floor(np.abs(m) + 0.5) * np.sign(m)).astype(np.int64)
    order = np.argsort(ids)
    ids, q = ids[order], q[order]
    S = q[:k].copy()
    c = np.ones(k, dtype=np.int64)
    assign = None
    for t in range(iters):
        assign, nums, dens = [], [], []
        for row in q:
            best = None
            for i in range(k):
                num = int(c[i]) ** 2 * int(row @ row) \
                    - 2 * int(c[i]) * int(row @ S[i]) + int(S[i] @ S[i])
                d = num / int(c[i] ** 2)
                if best is None or d < best[0]:
                    best = (d, i, num, int(c[i] ** 2))
            assign.append(best[1])
            nums.append(best[2])
            dens.append(best[3])
        if t == iters - 1:
            break
        S2, c2 = S.copy(), c.copy()
        for i in range(k):
            members = [j for j, a in enumerate(assign) if a == i]
            if members:
                S2[i] = q[members].sum(axis=0)
                c2[i] = len(members)
        S, c = S2, c2
    return {int(v): (a, n, d) for v, a, n, d in
            zip(ids, assign, nums, dens)}


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet") \
        .select("vec_id", "embedding")


def test_kmeans_matches_pure_python_reference(spark, emb):
    from distributed_lsh_spark.operators.kmeans import kmeans_topics

    rows = emb.collect()
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    vecs = np.array([r.embedding for r in rows], dtype=np.float64)
    ref = _ref_kmeans(ids, vecs, K, ITERS, SCALE)

    got = {r.vec_id: (r.cluster_id, r.d2_num, r.d2_den)
           for r in kmeans_topics(emb, k=K, iters=ITERS,
                                  scale=SCALE).collect()}
    assert got == ref
    # sanity: more than one non-trivial cluster formed
    assert len({a for a, _, _ in got.values()}) > 1


def test_kmeans_partitioning_invariant(spark, emb):
    from distributed_lsh_spark.operators.kmeans import kmeans_topics

    base = sorted(map(tuple, kmeans_topics(
        emb, k=K, iters=2, scale=SCALE).collect()))
    shuffled = sorted(map(tuple, kmeans_topics(
        emb.repartition(7), k=K, iters=2, scale=SCALE).collect()))
    assert base == shuffled


def test_kmeans_rejects_small_corpus(spark, emb):
    from distributed_lsh_spark.operators.kmeans import kmeans_topics

    with pytest.raises(ValueError):
        kmeans_topics(emb.limit(2), k=K, iters=1).count()
