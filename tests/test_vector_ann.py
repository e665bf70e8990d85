"""Embedding ANN: exact top-k baseline correctness + SRP-LSH recall."""

from __future__ import annotations

import numpy as np
import pytest


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(7)
    # clustered vectors so neighbors are meaningful
    centers = rng.standard_normal((10, 32)) * 3
    vecs = np.concatenate([c + rng.standard_normal((40, 32)) * 0.3
                           for c in centers])
    df = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(len(vecs))],
        "vec_id long, embedding array<double>")
    return df, vecs


def _brute_topk(vecs: np.ndarray, qids: list[int], k: int):
    norms = np.linalg.norm(vecs, axis=1)
    out = {}
    for qid in qids:
        sims = vecs @ vecs[qid] / (norms * norms[qid])
        order = sorted(range(len(vecs)),
                       key=lambda i: (-sims[i], i))
        out[qid] = [(i, sims[i]) for i in order if i != qid][:k]
    return out


def test_exact_topk_matches_numpy(emb):
    from distributed_lsh_spark.operators.vector_ann import cosine_topk_exact

    df, vecs = emb
    qids = [0, 40, 80]
    q = df.where(df.vec_id.isin(qids)).withColumnRenamed("vec_id", "query_id")
    got = cosine_topk_exact(df, q, k=5).collect()
    expect = _brute_topk(vecs, qids, k=5)
    for r in got:
        ei, es = expect[r["query_id"]][r["rank"] - 1]
        assert r["vec_id"] == ei
        assert abs(r["sim"] - es) < 1e-9


def test_lsh_topk_high_recall(emb):
    from distributed_lsh_spark.operators.vector_ann import cosine_topk_lsh

    df, vecs = emb
    qids = [0, 40, 80, 120]
    q = df.where(df.vec_id.isin(qids)).withColumnRenamed("vec_id", "query_id")
    got = cosine_topk_lsh(df, q, k=5, tables=16, bits=8, seed=42).collect()
    expect = _brute_topk(vecs, qids, k=5)
    hits = total = 0
    for qid in qids:
        truth = {i for i, _ in expect[qid]}
        found = {r["vec_id"] for r in got if r["query_id"] == qid}
        hits += len(truth & found)
        total += len(truth)
    assert hits / total >= 0.8, f"SRP-LSH recall too low: {hits}/{total}"


def test_ivf_topk_high_recall(emb):
    from distributed_lsh_spark.operators.vector_ann import cosine_topk_ivf

    df, vecs = emb
    qids = [0, 40, 80, 120]
    q = df.where(df.vec_id.isin(qids)).withColumnRenamed("vec_id", "query_id")
    got = cosine_topk_ivf(df, q, k=5, nlist=16, nprobe=4, seed=42).collect()
    expect = _brute_topk(vecs, qids, k=5)
    hits = total = 0
    for qid in qids:
        truth = {i for i, _ in expect[qid]}
        found = {r["vec_id"] for r in got if r["query_id"] == qid}
        hits += len(truth & found)
        total += len(truth)
    assert hits / total >= 0.8, f"IVF recall too low: {hits}/{total}"


def test_ivf_centroids_deterministic(emb):
    from distributed_lsh_spark.operators.vector_ann import train_ivf_centroids

    df, _ = emb
    c1 = train_ivf_centroids(df, nlist=8, seed=42, iters=5)
    c2 = train_ivf_centroids(df, nlist=8, seed=42, iters=5)
    np.testing.assert_array_equal(c1, c2)
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)


def test_cosine_pairs_exact_matches_numpy(spark):
    import numpy as np

    from distributed_lsh_spark.operators.vector_ann import cosine_pairs_exact

    rng = np.random.default_rng(11)
    M = rng.standard_normal((80, 16))
    M[5] = M[3] + 0.01 * rng.standard_normal(16)      # planted near-dup
    M[40] = M[17] * 2.5                                # exact direction dup
    df = spark.createDataFrame(
        [(i, [float(x) for x in M[i]]) for i in range(len(M))],
        "vec_id long, embedding array<float>")
    tau = 0.9
    got = {(r["id_a"], r["id_b"]): r["sim"]
           for r in cosine_pairs_exact(df, tau=tau).collect()}
    Mf = M.astype(np.float32).astype(np.float64)       # matches array<float> storage
    N = Mf / np.linalg.norm(Mf, axis=1, keepdims=True)
    S = N @ N.T
    expect = {(i, j): S[i, j] for i in range(len(M)) for j in range(i + 1, len(M))
              if S[i, j] >= tau}
    assert set(got) == set(expect)
    assert (3, 5) in got and (17, 40) in got
    for k, v in expect.items():
        assert abs(got[k] - v) < 1e-9


def test_ivf_index_persists_and_reuses(emb, tmp_path):
    """IVF -b/-s split: centroids + assignment checkpointed once, reloaded
    for a later query set, identical results to the inline build."""
    import numpy as np

    from distributed_lsh_spark.operators.vector_ann import (
        assign_cells, centroids_from_df, centroids_to_df, cosine_topk_ivf,
        train_ivf_centroids,
    )
    from distributed_lsh_spark.sources.checkpoint import CheckpointManager

    df, _ = emb
    spark = df.sparkSession
    C = train_ivf_centroids(df, nlist=16, seed=42, iters=5)
    ckpt = CheckpointManager(spark, str(tmp_path / "ivf"), run_id="r1")
    ckpt.stage("ivf_centroids", lambda: centroids_to_df(spark, C))
    adf = ckpt.stage("ivf_assign", lambda: assign_cells(df, C))

    # a later session would reload both artifacts
    C2 = centroids_from_df(ckpt.read("ivf_centroids"))
    np.testing.assert_allclose(C2, C, atol=1e-12)
    assert ckpt.is_complete("ivf_assign")

    qids = [0, 40]
    q = df.where(df.vec_id.isin(qids)).withColumnRenamed("vec_id", "query_id")
    inline = cosine_topk_ivf(df, q, k=5, nlist=16, nprobe=4, seed=42).collect()
    reused = cosine_topk_ivf(df, q, k=5, nprobe=4,
                             centroids=C2, assignment=adf).collect()
    assert sorted([(r["query_id"], r["vec_id"], r["rank"]) for r in inline]) == \
           sorted([(r["query_id"], r["vec_id"], r["rank"]) for r in reused])


def test_cosine_pairs_lsh_matches_exact(spark):
    """Beyond-broadcast miner: every returned pair must be exactly verified
    (subset of the exact miner, sims equal), and recall on planted near-dup
    pairs must be high at (tables=16, bits=8)."""
    import numpy as np

    from distributed_lsh_spark.operators.vector_ann import (
        cosine_pairs_exact, cosine_pairs_lsh,
    )

    rng = np.random.default_rng(13)
    M = rng.standard_normal((150, 32))
    planted = [(3, 5), (17, 40), (60, 61), (100, 120)]
    for a, b in planted:
        M[b] = M[a] + 0.05 * rng.standard_normal(32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in M[i]]) for i in range(len(M))],
        "vec_id long, embedding array<double>")
    tau = 0.9
    exact = {(r["id_a"], r["id_b"]): r["sim"]
             for r in cosine_pairs_exact(df, tau=tau).collect()}
    got = {(r["id_a"], r["id_b"]): r["sim"]
           for r in cosine_pairs_lsh(df, tau=tau, tables=16, bits=8,
                                     seed=42).collect()}
    assert set(got) <= set(exact)                      # precision 1.0
    for k in got:
        assert abs(got[k] - exact[k]) < 1e-9
    assert len(got) >= 0.9 * len(exact)                # recall
    for p in planted:
        assert p in got


def test_cosine_pairs_dispatch(spark, monkeypatch):
    """`cosine_pairs` routes by corpus size: exact under the broadcast
    budget, SRP-LSH + exact verify above it — and the LSH route still
    recovers the planted pairs the exact miner finds."""
    import numpy as np

    from distributed_lsh_spark.operators import vector_ann as va

    rng = np.random.default_rng(7)
    M = rng.standard_normal((120, 32))
    planted = [(2, 9), (30, 77), (110, 111)]
    for a, b in planted:
        M[b] = M[a] + 0.05 * rng.standard_normal(32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in M[i]]) for i in range(len(M))],
        "vec_id long, embedding array<double>")
    tau = 0.9

    picked = []
    real_exact, real_lsh = va.cosine_pairs_exact, va.cosine_pairs_lsh
    monkeypatch.setattr(va, "cosine_pairs_exact",
                        lambda *a, **k: picked.append("exact") or real_exact(*a, **k))
    monkeypatch.setattr(va, "cosine_pairs_lsh",
                        lambda *a, **k: picked.append("lsh") or real_lsh(*a, **k))

    # under budget -> exact path (n_rows hint: no count() job needed)
    small = va.cosine_pairs(df, tau, n_rows=120)
    assert picked == ["exact"]
    exact_pairs = {(r["id_a"], r["id_b"]) for r in small.collect()}

    # above budget -> LSH path, results still match on the planted fixture
    big = va.cosine_pairs(df, tau, n_rows=10_000_000,
                          tables=16, bits=8, seed=42)
    assert picked == ["exact", "lsh"]
    lsh_pairs = {(r["id_a"], r["id_b"]) for r in big.collect()}
    assert lsh_pairs <= exact_pairs                    # precision 1.0
    for p in planted:
        assert p in lsh_pairs

    # no hint -> one count() decides (route by actual size: exact here)
    picked.clear()
    va.cosine_pairs(df, tau)
    assert picked == ["exact"]


def test_multiprobe_beats_single_probe_at_equal_tables(emb):
    """Hamming-1 multi-probe (Lv et al. VLDB'07): candidate superset of
    single-probe at the same (tables, bits, seed) -> recall never lower;
    and a 4x-smaller multi-probe index matches the big single-probe
    index's recall on the clustered fixture."""
    from distributed_lsh_spark.operators.vector_ann import (
        cosine_topk_lsh, cosine_topk_lsh_multiprobe)

    df, vecs = emb
    qids = [0, 40, 80, 120]
    q = df.where(df.vec_id.isin(qids)).withColumnRenamed("vec_id", "query_id")
    expect = _brute_topk(vecs, qids, k=5)

    def recall(got):
        hits = total = 0
        for qid in qids:
            truth = {i for i, _ in expect[qid]}
            found = {r["vec_id"] for r in got if r["query_id"] == qid}
            hits += len(truth & found)
            total += len(truth)
        return hits / total

    kw = dict(k=5, bits=8, seed=42)
    r_single = recall(cosine_topk_lsh(df, q, tables=16, **kw).collect())
    r_multi = recall(cosine_topk_lsh_multiprobe(df, q, tables=16,
                                                **kw).collect())
    assert r_multi >= r_single
    # 4x fewer tables, same recall bar as the full single-probe index
    r_small = recall(cosine_topk_lsh_multiprobe(df, q, tables=4,
                                                **kw).collect())
    assert r_small >= 0.8, f"multi-probe tables=4 recall: {r_small}"


def test_multiprobe_is_deterministic(emb):
    from distributed_lsh_spark.operators.vector_ann import (
        cosine_topk_lsh_multiprobe)

    df, _ = emb
    q = df.where(df.vec_id == 0).withColumnRenamed("vec_id", "query_id")
    a = sorted(map(tuple, cosine_topk_lsh_multiprobe(
        df, q, k=5, tables=4, bits=8, seed=42).collect()))
    b = sorted(map(tuple, cosine_topk_lsh_multiprobe(
        df, q, k=5, tables=4, bits=8, seed=42).collect()))
    assert a == b
