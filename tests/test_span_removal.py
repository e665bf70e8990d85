"""functions/suffix.cross_coverage + operators/substring.remove_shared_spans:
matching-statistics coverage vs the O(n*m) diagonal-run mirror, and the
removal operator's survivor policy on planted spans."""

from __future__ import annotations

import random

from distributed_lsh_spark.functions.suffix import (
    cross_coverage, oracle_coverage_dp,
)


def test_cross_coverage_hand_cases():
    a = "x1 x2 x3 x4 x5".split()
    b = ("p q " + "x1 x2 x3 x4 x5" + " r s").split()
    # min_len 5: the shared 5-token run covers b[2..6]
    got = list(cross_coverage(b, [a], 5))
    assert got == [False, False, True, True, True, True, True, False, False]
    # min_len 6: nothing long enough
    assert not any(cross_coverage(b, [a], 6))
    # empty / short partners never cover
    assert not any(cross_coverage(b, [[], ["x1"]], 2))
    assert list(cross_coverage([], [a], 1)) == []


def test_cross_coverage_multiple_partners_union():
    b = "a1 a2 a3 m1 m2 m3 z1 z2 z3".split()
    p1 = "a1 a2 a3".split()          # covers [0,3)
    p2 = "z1 z2 z3".split()          # covers [6,9)
    got = list(cross_coverage(b, [p1, p2], 3))
    assert got == [True] * 3 + [False] * 3 + [True] * 3


def test_cross_coverage_matches_dp_on_random_sequences():
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(12)]   # small vocab -> many matches
    for trial in range(40):
        na, nb = rng.randint(0, 30), rng.randint(0, 30)
        a = [rng.choice(vocab) for _ in range(na)]
        b = [rng.choice(vocab) for _ in range(nb)]
        for min_len in (1, 2, 3, 5):
            got = list(cross_coverage(b, [a], min_len))
            want = oracle_coverage_dp(b, [a], min_len)
            assert got == want, (trial, min_len, a, b)


def test_remove_shared_spans_survivor_policy(spark):
    span = " ".join(f"s{i}" for i in range(25))
    docs = [
        (1, "unique alpha text " + span),            # lowest id: survives
        (2, "other beta words " + span + " tail x"),  # loses the span
        (3, "third gamma " + span),                   # loses the span
        (4, "no shared content here at all"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    from distributed_lsh_spark.operators.substring import remove_shared_spans

    got = {r["doc_id"]: r for r in
           remove_shared_spans(df, window=20, guarantee=5).collect()}
    assert len(got) == 4
    assert got[1]["n_removed"] == 0                  # survivor keeps span
    assert span in got[1]["clean_text"]
    for did, prefix in ((2, "other beta words"), (3, "third gamma")):
        assert got[did]["n_removed"] == 25
        assert span.split()[0] not in got[did]["clean_text"]
        assert got[did]["clean_text"].startswith(prefix)
    assert got[2]["clean_text"].endswith("tail x")
    assert got[4]["n_removed"] == 0
    # token accounting: n_tokens - n_removed == cleaned token count
    for did in got:
        r = got[did]
        n_clean = len(r["clean_text"].split()) if r["clean_text"] else 0
        assert r["n_tokens"] - r["n_removed"] == n_clean


def test_cli_curate_remove_spans(spark, tmp_path, capsys):
    import datetime
    import json

    from distributed_lsh_spark.cli import main

    span = " ".join(f"q{i}" for i in range(30))
    rows = []
    for i in range(8):
        # no underscores: the normalizer splits on them, and a shared
        # trailing "29" would legitimately extend the planted run
        body = f"page body number {i} " + " ".join(
            f"t{i}x{j}" for j in range(30))
        if i in (2, 5):  # plant the span into two distinct pages
            body += " " + span
        rows.append((f"http://h{i}.example.com/p", 
                     datetime.datetime(2024, 1, 1 + i), body, "en"))
    src = str(tmp_path / "pages")
    out = str(tmp_path / "run")
    spark.createDataFrame(
        rows, "url string, warc_ts timestamp, text string, lang string") \
        .write.parquet(src)

    args = ["curate", "--input", src, "--output", out, "--run-id", "s1",
            "--no-quality", "--remove-spans", "--span-window", "20",
            "--cores", "8"]
    main(args)
    r = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r["n_survivors"] == 8          # rewrite drops spans, not docs
    assert r["span_tokens_removed"] == 30  # one 30-token copy cut
    import os
    cleaned = spark.read.parquet(os.path.join(out, "s1", "span_clean",
                                              "data"))
    texts = {u: t for u, t in cleaned.select("url", "text").collect()}
    keep, cut = sorted(u for u in texts if "q0 " in texts[u] + " "), None
    survivors_with_span = [u for u in texts if " q0 " in " " + texts[u]]
    assert len(survivors_with_span) == 1  # lowest-id copy survives
    # resume: rerun is pure manifest reads, same numbers
    main(args)
    r2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r2["span_tokens_removed"] == 30


def test_remove_shared_spans_partner_cap_keeps_lowest(spark):
    # >= window + guarantee - 1 = 24 tokens: winnow DISCOVERY is then
    # guaranteed for both pairs, so the cap is the only variable
    s1 = " ".join(f"a{i}" for i in range(25))
    s2 = " ".join(f"b{i}" for i in range(25))
    docs = [
        (1, "one " + s1),                   # lowest-id partner: carries s1
        (2, "two " + s2),                   # dropped by the cap
        (3, "tail doc " + s1 + " mid " + s2),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    from distributed_lsh_spark.operators.substring import remove_shared_spans

    got = {r["doc_id"]: r for r in
           remove_shared_spans(df, window=20, guarantee=5,
                               max_partners=1).collect()}
    # doc 3 keeps only partner 1 (lowest id): s1 removed, s2 SURVIVES
    assert got[3]["n_removed"] == 25
    assert "a0" not in got[3]["clean_text"]
    assert "b0" in got[3]["clean_text"]
    # uncapped: both spans removed
    got2 = {r["doc_id"]: r for r in
            remove_shared_spans(df, window=20, guarantee=5).collect()}
    assert got2[3]["n_removed"] == 50
