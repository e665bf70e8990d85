"""DSIR importance-resampling weights (operators/dsir.py): the full
hashed-n-gram scoring chain replayed in plain Python (no Spark SQL, no
DuckDB), semantic direction pins, and Gumbel-key determinism."""

from __future__ import annotations

import hashlib
import math
import re

DIM = 64  # tiny table so bucket collisions are exercised


def _toks(text: str) -> list[str]:
    return [t for t in re.sub(r"[^a-z0-9]+", " ", text.lower()).split()
            if t]


def _grams(text: str) -> list[str]:
    t = _toks(text)
    return t + [f"{a} {b}" for a, b in zip(t, t[1:])]


def _fid(g: str, dim: int) -> int:
    return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % dim


def _python_dsir(raw: dict[int, str], target_ids: set[int],
                 dim: int) -> dict[int, tuple[int, int]]:
    """doc_id -> (n_grams, logw_micro), the operator's exact contract."""
    cr: dict[int, int] = {}
    ct: dict[int, int] = {}
    per_doc: dict[int, dict[int, int]] = {}
    for doc_id, text in raw.items():
        feats: dict[int, int] = {}
        for g in _grams(text):
            feats[_fid(g, dim)] = feats.get(_fid(g, dim), 0) + 1
        per_doc[doc_id] = feats
        for fid, m in feats.items():
            cr[fid] = cr.get(fid, 0) + m
            if doc_id in target_ids:
                ct[fid] = ct.get(fid, 0) + m
    nr, nt = sum(cr.values()), sum(ct.values())
    lr = {fid: round((math.log((ct.get(fid, 0) + 1) / float(nt + dim))
                      - math.log((cr.get(fid, 0) + 1) / float(nr + dim)))
                     * 1e6)
          for fid in range(dim)}
    out = {}
    for doc_id, feats in per_doc.items():
        out[doc_id] = (sum(feats.values()),
                       sum(m * lr[fid] for fid, m in feats.items()))
    return out


def _python_gumbel_micro(doc_id: int) -> int:
    h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
    u = ((h % 2147483648) + 0.5) / 2147483648.0
    return round(-math.log(-math.log(u)) * 1e6)


RAW = {
    0: "alpha beta gamma delta alpha beta",
    1: "alpha beta gamma delta epsilon zeta",
    2: "stock market crash panic sell now buy gold",
    3: "alpha beta gamma delta eta theta",
    4: "win free money click here now spam spam spam",
    5: "x",  # single token: unigram feature only, no bigrams
}
TARGETS = {0, 3}


def _spark_rows(spark):
    from distributed_lsh_spark.operators.dsir import dsir_weights

    raw = spark.createDataFrame(list(RAW.items()), "doc_id long, text string")
    target = raw.where(raw.doc_id.isin(list(TARGETS)))
    return {r.doc_id: r for r in dsir_weights(raw, target, dim=DIM).collect()}


def test_dsir_matches_plain_python(spark):
    want = _python_dsir(RAW, TARGETS, DIM)
    got = _spark_rows(spark)
    assert set(got) == set(RAW)
    for doc_id, (n_grams, logw) in want.items():
        assert got[doc_id].n_grams == n_grams, doc_id
        assert got[doc_id].logw_micro == logw, doc_id
        assert got[doc_id].key_micro == logw + _python_gumbel_micro(doc_id)


def test_dsir_scores_target_like_docs_higher(spark):
    got = _spark_rows(spark)
    # doc 1 shares most grams with the target family; docs 2/4 share none
    assert got[1].logw_micro > got[2].logw_micro
    assert got[1].logw_micro > got[4].logw_micro
    # the target docs themselves score positive, off-target junk negative
    for t in TARGETS:
        assert got[t].logw_micro > 0
    assert got[4].logw_micro < 0


def test_dsir_single_token_doc_scores_via_unigram(spark):
    got = _spark_rows(spark)
    assert got[5].n_grams == 1  # one unigram, zero bigrams
    # weight 1 only if its bucket ratio is flat; key still drawn
    assert got[5].key_micro == got[5].logw_micro + _python_gumbel_micro(5)


def test_top_n_by_key_equals_naive_sort(spark):
    from distributed_lsh_spark.operators.dsir import top_n_by_key

    # adversarial keys: negatives, cross-bucket spread, same-bucket ties,
    # and EQUAL keys (tie broken by doc_id)
    rows = [(i, k) for i, k in enumerate(
        [-2_500_000, -999_999, 0, 1, 999_999, 1_000_000, 1_000_001,
         3_141_592, 3_141_592, -3_141_592, 7_000_000, 6_999_999])]
    df = spark.createDataFrame(rows, "doc_id long, key_micro long")
    for n in (1, 3, 5, 12, 50):
        got = [(r.sel_rank, r.doc_id)
               for r in top_n_by_key(df, "key_micro", n)
               .orderBy("sel_rank").collect()]
        want = sorted(rows, key=lambda t: (-t[1], t[0]))[:n]
        assert got == [(i + 1, d) for i, (d, _) in enumerate(want)], n


def test_top_n_by_key_empty_input(spark):
    from distributed_lsh_spark.operators.dsir import top_n_by_key

    df = spark.createDataFrame([], "doc_id long, key_micro long")
    assert top_n_by_key(df, "key_micro", 5).count() == 0


def test_dsir_keys_deterministic_across_runs(spark):
    a = _spark_rows(spark)
    b = _spark_rows(spark)
    assert {d: r.key_micro for d, r in a.items()} == \
        {d: r.key_micro for d, r in b.items()}


def test_cli_curate_dsir_select(spark, tmp_path, capsys):
    """curate --dsir-target/--dsir-keep: checkpointed selection tier,
    removal attribution, resume identity, and flag validation."""
    import json
    import os

    import pytest

    from distributed_lsh_spark.cli import main

    src = str(tmp_path / "pages")
    out = str(tmp_path / "cur")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .select("doc_id", "text")
    docs.write.parquet(src)
    target = str(tmp_path / "target.txt")
    with open(target, "w") as fh:
        for r in docs.where("doc_id % 7 = 3").collect():
            fh.write(r.text + "\n")

    args = ["curate", "--input", src, "--output", out, "--run-id", "d1",
            "--cores", "8", "--no-quality",
            "--dsir-target", target, "--dsir-keep", "10"]
    main(args)
    r1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r1["n_survivors"] == 10
    assert r1["survivors_stage"] == "dsir_select"
    pre_dsir = r1["tiers"][-1]["docs_out"]
    assert r1["dsir_removed"] == pre_dsir - 10
    surv = spark.read.parquet(os.path.join(out, "d1", "dsir_select", "data"))
    assert surv.count() == 10
    assert {"logw_micro", "key_micro"} <= set(surv.columns)
    kept1 = sorted(r.doc_id for r in surv.select("doc_id").collect())

    # resume: same args -> identical kept set from the manifest
    main(args)
    r2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r2["n_survivors"] == 10
    surv2 = spark.read.parquet(os.path.join(out, "d1", "dsir_select",
                                            "data"))
    assert sorted(r.doc_id for r in surv2.select("doc_id").collect()) \
        == kept1

    # config-echo invalidation: a different keep-N rebuilds
    main(args[:-1] + ["5"])
    r3 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r3["n_survivors"] == 5

    # flag pairing is validated
    with pytest.raises(SystemExit):
        main(["curate", "--input", src, "--output", out, "--run-id", "dx",
              "--cores", "8", "--dsir-keep", "10"])
    with pytest.raises(SystemExit):
        main(["curate", "--input", src, "--output", out, "--run-id", "dy",
              "--cores", "8", "--dsir-target", target])
