"""Distributed BPE merge learning (operators/bpe.py): the Spark
trajectory vs an independent pure-Python BPE reference (3rd leg of the
Spark/DuckDB/Python check), plus unit pins on the greedy-leftmost merge
contract the regexp formulation must honor."""

from __future__ import annotations

import collections
import re
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from distributed_lsh_spark.operators.bpe import learn_bpe, word_counts  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def python_bpe(word_freq: dict[str, int], k: int) -> list[tuple]:
    """Reference BPE (Sennrich et al. 2016 Algorithm 1 shape): count
    adjacent pairs weighted by word frequency, merge the most frequent
    (ties: lexicographically smallest pair), leftmost-greedy."""
    seqs = {w: tuple(w) for w in word_freq}
    merges = []
    for step in range(1, k + 1):
        stats = collections.Counter()
        for w, s in seqs.items():
            for i in range(len(s) - 1):
                stats[(s[i], s[i + 1])] += word_freq[w]
        if not stats:
            break
        (left, right), c = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, left, right, left + right, c))
        for w, s in seqs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = tuple(out)
    return merges


def test_spark_bpe_matches_python_reference(spark):
    df = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("text")
    merges, final_words = learn_bpe(spark, word_counts(df), 8)
    got = [tuple(r) for r in merges.orderBy("step").collect()]

    import pandas as pd
    texts = pd.read_parquet(f"{SF_DIR}/documents.parquet")["text"]
    wf = collections.Counter()
    for t in texts:
        wf.update(x for x in re.split(r"[^a-z0-9]+", t.lower()) if x)
    assert got == python_bpe(dict(wf), 8)
    # merged symbols must concatenate their parts and counts be positive
    assert all(m == l + r and c > 0 for _, l, r, m, c in got)
    # final sequences reassemble their words exactly
    for row in final_words.collect():
        assert row["seq"].replace(" ", "") == row["word"]


@pytest.mark.parametrize("freqs,expected_first", [
    # overlap chain: 'aaaa' x1 -> pair (a,a) counted 3 times, merged
    # greedy-leftmost into 'aa aa' (not 'a aa a')
    ({"aaaa": 1}, ("a", "a", "aa", 3)),
    # tie on count 2: ('a','b') vs ('b','a') — lexicographic tie-break
    ({"abab": 1}, ("a", "b", "ab", 2)),
])
def test_merge_contract_on_crafted_words(spark, freqs, expected_first):
    words = spark.createDataFrame(list(freqs.items()), "word string, cnt long")
    merges, final_words = learn_bpe(spark, words, 1)
    (row,) = merges.collect()
    assert (row["left"], row["right"], row["merged"],
            row["pair_count"]) == expected_first
    seqs = {r["word"]: r["seq"] for r in final_words.collect()}
    if set(freqs) == {"aaaa"}:
        assert seqs["aaaa"] == "aa  aa"
    else:
        assert seqs["abab"] == "ab  ab"


def test_bpe_encode_matches_python_reference(spark):
    """Per-doc encoded lengths under the learned merges, recomputed in
    pure Python (word-level encode == doc-level encode because merges
    never cross word boundaries)."""
    from distributed_lsh_spark.entry_queries import QUERIES

    sp = QUERIES["bpe_encode"](spark, SF_DIR).toPandas()

    import pandas as pd
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")[["doc_id", "text"]]
    wf = collections.Counter()
    toks = {}
    for _, row in docs.iterrows():
        ts = [x for x in re.split(r"[^a-z0-9]+", row.text.lower()) if x]
        toks[row.doc_id] = ts
        wf.update(ts)
    merges = python_bpe(dict(wf), 8)
    seqs = {w: list(w) for w in wf}
    for _, left, right, merged, _c in merges:
        for w, s in seqs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out
    nsym = {w: len(s) for w, s in seqs.items()}
    got = sp.set_index("doc_id")
    for doc_id, ts in toks.items():
        if not ts:
            assert doc_id not in got.index
            continue
        r = got.loc[doc_id]
        assert r.n_tokens == len(ts)
        assert r.n_chars == sum(len(w) for w in ts)
        assert r.n_symbols == sum(nsym[w] for w in ts)
    assert (sp.n_symbols <= sp.n_chars).all()
    assert (sp.n_tokens <= sp.n_symbols).all()


def test_batched_rounds_equal_serial_trajectory(spark):
    """VERDICT r4 item 5: the batched trainer (top-N provably-independent
    merges per counting round) must be trajectory-identical to the
    strictly serial one — same merge table, same order, same counts —
    on the gate corpus and on corpora crafted to trigger the unsafe
    cases the round-break guard exists for."""
    df = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("text")
    wc = word_counts(df).localCheckpoint(eager=True)
    serial, _ = learn_bpe(spark, wc, 24, batch_size=1)
    batched, _ = learn_bpe(spark, wc, 24, batch_size=8)
    s = [tuple(r) for r in serial.orderBy("step").collect()]
    b = [tuple(r) for r in batched.orderBy("step").collect()]
    assert b == s and len(s) == 24

    crafted = {
        # conflict bar: (a,b)=100 wins, (b,c)=90 conflicts, and (d,e)=80
        # must NOT batch (the serial trainer picks the surviving (b,c)
        # first) — the guard has to end the round
        "ab": 100, "bc": 90, "de": 80,
        # created-pair case: merging (a,b) inside 'xab' creates (x,ab)
        # that outranks later candidates
        "xab": 70,
        # ties on equal counts resolved lexicographically
        "mn": 60, "pq": 60,
    }
    words = spark.createDataFrame(list(crafted.items()),
                                  "word string, cnt long")
    for k in (1, 3, 6):
        s2, _ = learn_bpe(spark, words, k, batch_size=1)
        b2, _ = learn_bpe(spark, words, k, batch_size=8)
        assert [tuple(r) for r in b2.orderBy("step").collect()] == \
               [tuple(r) for r in s2.orderBy("step").collect()]
    # and both equal the pure-Python reference
    s3, _ = learn_bpe(spark, words, 6, batch_size=8)
    assert [tuple(r) for r in s3.orderBy("step").collect()] == \
        python_bpe(crafted, 6)
