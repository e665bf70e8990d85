"""Containment dedup (operators/containment.py): asymmetric doc-in-doc
pairs are found at Jaccard values the MinHash-LSH path would never keep;
scores match a pure-Python shingle-set replay exactly."""

from __future__ import annotations

import random

from distributed_lsh_spark.conf import DEFAULT_CONFIG as CFG
from distributed_lsh_spark.functions.signature import with_signatures
from distributed_lsh_spark.operators.containment import containment_pairs
from distributed_lsh_spark.oracle.dedup import shingle_set


def _corpus() -> dict[int, str]:
    """Unique long docs; doc 100 embeds doc 0's full text verbatim inside
    ~2x unrelated context (containment ~ 1, Jaccard ~ 1/3); docs 200/201
    are a classic symmetric near-dup pair."""
    rng = random.Random(7)
    vocab = [f"w{i:04d}" for i in range(3000)]
    docs = {d: " ".join(rng.choice(vocab) for _ in range(80)) for d in range(10)}
    pre = " ".join(rng.choice(vocab) for _ in range(80))
    post = " ".join(rng.choice(vocab) for _ in range(80))
    docs[100] = f"{pre} {docs[0]} {post}"
    base = [rng.choice(vocab) for _ in range(100)]
    near = list(base)
    near[50] = rng.choice(vocab)
    docs[200] = " ".join(base)
    docs[201] = " ".join(near)
    return docs


def _python_oracle(docs_py: dict[int, str], tau: float) -> dict:
    sets = {d: set(shingle_set(t, CFG.shingle_k)) for d, t in docs_py.items()}
    out = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sets[a] & sets[b])
            if not inter:
                continue
            cont = inter / min(len(sets[a]), len(sets[b]))
            if cont >= tau:
                jac = inter / len(sets[a] | sets[b])
                contained = a if len(sets[a]) <= len(sets[b]) else b
                out[(a, b)] = (cont, jac, contained)
    return out


def test_containment_matches_python_oracle_and_beats_jaccard(spark):
    docs_py = _corpus()
    expect = _python_oracle(docs_py, CFG.jaccard_threshold)
    # the fixture's point: an asymmetric pair Jaccard would have dropped
    assert (0, 100) in expect
    assert expect[(0, 100)][1] < CFG.jaccard_threshold

    df = spark.createDataFrame(list(docs_py.items()), "doc_id long, text string")
    got = {(r["id_a"], r["id_b"]): (r["containment"], r["jaccard"], r["contained_id"])
           for r in containment_pairs(with_signatures(df, CFG),
                                      tau=CFG.jaccard_threshold).collect()}
    assert set(got) == set(expect)
    for pair, (cont, jac, contained) in expect.items():
        g = got[pair]
        assert abs(g[0] - cont) < 1e-12 and abs(g[1] - jac) < 1e-12
        assert g[2] == contained
    # the contained side of the planted pair is the short doc
    assert got[(0, 100)][2] == 0


def test_df_cap_keeps_non_boilerplate_pairs(spark):
    """A hot shingle shared by every doc is dropped from the INDEX at a
    tiny df_cap, yet the genuine containment pair (discoverable through
    its many uncapped shingles) survives with its exact score."""
    docs_py = _corpus()
    phrase = " common boiler plate phrase here"
    docs_py = {d: t + phrase for d, t in docs_py.items()}
    expect = _python_oracle(docs_py, CFG.jaccard_threshold)
    assert (0, 100) in expect

    df = spark.createDataFrame(list(docs_py.items()), "doc_id long, text string")
    got = {(r["id_a"], r["id_b"]) for r in
           containment_pairs(with_signatures(df, CFG),
                             tau=CFG.jaccard_threshold, df_cap=5).collect()}
    assert got == set(expect)


def test_equal_size_mutual_containment_labels_lower_id(spark):
    docs_py = {1: "a b c d e f g h", 2: "a b c d e f g h"}
    df = spark.createDataFrame(list(docs_py.items()), "doc_id long, text string")
    rows = containment_pairs(with_signatures(df, CFG), tau=0.9).collect()
    assert len(rows) == 1
    assert rows[0]["contained_id"] == 1 and rows[0]["containment"] == 1.0


def test_ensemble_r_tuning_monotone_and_sane():
    """r(p,q) decreases as the qualifying pair's worst Jaccard shrinks,
    and every choice meets the recall floor it was tuned for."""
    from distributed_lsh_spark.operators.containment import _ensemble_r

    picks = [_ensemble_r(j, 128, 0.98)
             for j in (0.8, 0.4, 0.2, 0.1, 0.05)]
    assert picks == sorted(picks, reverse=True)
    assert picks[0] > 1 and picks[-1] >= 1
    for j, r in zip((0.8, 0.4, 0.2, 0.1, 0.05), picks):
        b = 128 // r
        assert 1 - (1 - j ** r) ** b >= 0.98


def test_lsh_ensemble_candidates_match_exact_index(spark):
    """The size-partitioned LSH candidate path feeds verification the
    same final pair set as the exhaustive df-capped inverted index on a
    corpus of planted asymmetric (prefix-copy) and symmetric near-dup
    pairs — the Jaccard-missed class the ensemble exists for."""
    rng = random.Random(11)
    vocab = [f"w{i:04d}" for i in range(4000)]
    docs_py = {d: " ".join(rng.choice(vocab) for _ in range(120))
               for d in range(30)}
    # ~40% prefix copies (the gate's planting shape): containment ~1,
    # Jaccard ~0.4 -- below the 0.8 LSH threshold, 1-slice size gap
    for d in range(0, 30, 7):
        toks = docs_py[d].split()
        docs_py[1000 + d] = " ".join(toks[:48]) + " planted marker"
    df = spark.createDataFrame(list(docs_py.items()),
                               "doc_id long, text string")
    sigs = with_signatures(df, CFG).localCheckpoint(eager=False)

    from distributed_lsh_spark.operators.containment import (
        lsh_ensemble_candidates,
    )

    exact = {(r["id_a"], r["id_b"]): (r["containment"], r["contained_id"])
             for r in containment_pairs(sigs, tau=0.8).collect()}
    assert any(a % 7 == 0 and b == 1000 + a for a, b in exact), \
        "fixture must plant contained pairs"

    cands = lsh_ensemble_candidates(sigs, tau=0.8, num_perm=CFG.num_perm)
    got = {(r["id_a"], r["id_b"]): (r["containment"], r["contained_id"])
           for r in containment_pairs(sigs, tau=0.8,
                                      candidates=cands).collect()}
    assert got == exact

    # pruning actually happened: the band family proposes close to the
    # true pair count, nowhere near the all-pairs quadratic
    n_docs = len(docs_py)
    n_cands = cands.count()
    assert len(exact) <= n_cands < n_docs * (n_docs - 1) // 4
