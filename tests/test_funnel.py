"""Tiered dedup funnel (operators/funnel.py): tier semantics vs a pure-
Python oracle on the planted pages corpus, metrics-chain coherence, the
no-url degradation, and checkpointed resume (metrics from manifests)."""

from __future__ import annotations

import hashlib

import pytest

from distributed_lsh_spark.conf import DEFAULT_CONFIG as CFG
from distributed_lsh_spark.fixtures import pages_spark_df
from distributed_lsh_spark.operators.funnel import curation_funnel
from distributed_lsh_spark.oracle.dedup import DedupOracle


def _python_funnel(rows):
    """Pure-Python replay of tiers 1/2/4 over the fixture rows
    (doc_id = row index; url/warc_ts from the fixture)."""
    # tier 1: keep latest (warc_ts, doc_id) per url
    best: dict[str, int] = {}
    for i, r in enumerate(rows):
        j = best.get(r["url"])
        if j is None or (r["warc_ts"], i) > (rows[j]["warc_ts"], j):
            best[r["url"]] = i
    t1 = sorted(best.values())
    # tier 2: keep min doc_id per md5(text)
    first: dict[str, int] = {}
    for i in t1:
        h = hashlib.md5(rows[i]["text"].encode()).hexdigest()
        first.setdefault(h, i)
    t2 = sorted(first.values())
    # tier 4 (no quality tier): drop non-representative cluster members
    oc = DedupOracle(CFG, {i: rows[i]["text"] for i in t2})
    non_reps = {d for d, c in oc.clusters().items() if d != c}
    t4 = [i for i in t2 if i not in non_reps]
    return t1, t2, t4


@pytest.fixture(scope="module")
def funnel_input(spark, tiny_corpus):
    return (pages_spark_df(spark, tiny_corpus)
            .select("doc_id", "text", "url", "warc_ts"))


def test_funnel_tiers_match_python_oracle(spark, tiny_corpus, funnel_input):
    res = curation_funnel(funnel_input, CFG, ts_col="warc_ts")
    t1, t2, t4 = _python_funnel(tiny_corpus.rows)
    assert sorted(r["doc_id"] for r in
                  res.tiers["url_latest"].select("doc_id").collect()) == t1
    assert sorted(r["doc_id"] for r in
                  res.tiers["exact"].select("doc_id").collect()) == t2
    assert sorted(r["doc_id"] for r in
                  res.survivors.select("doc_id").collect()) == t4
    # survivors keep the non-key columns (url rides through every tier)
    assert set(res.survivors.columns) == {"doc_id", "text", "url", "warc_ts"}


def test_funnel_metrics_chain(spark, tiny_corpus, funnel_input):
    rows = {r["tier"]: r for r in curation_funnel(
        funnel_input, CFG, ts_col="warc_ts").metrics.collect()}
    t1, t2, t4 = _python_funnel(tiny_corpus.rows)
    assert rows["input"]["docs_out"] == len(tiny_corpus.rows)
    assert rows["url_latest"]["docs_out"] == len(t1)
    assert rows["exact"]["docs_out"] == len(t2)
    assert rows["near_dup"]["docs_out"] == len(t4)
    assert "quality" not in rows          # no keep rule passed
    order = ["input", "url_latest", "exact", "near_dup"]
    for prev, cur in zip(order, order[1:]):
        assert rows[cur]["docs_in"] == rows[prev]["docs_out"]
        assert (rows[cur]["docs_removed"]
                == rows[cur]["docs_in"] - rows[cur]["docs_out"])
    # the fixture plants exact-dup families and near-dup pairs: both dedup
    # tiers must actually remove rows, or the test is vacuous
    assert rows["exact"]["docs_removed"] > 0
    assert rows["near_dup"]["docs_removed"] > 0


def test_funnel_without_url_column(spark, tiny_corpus, funnel_input):
    res = curation_funnel(funnel_input.drop("url", "warc_ts"), CFG)
    assert "url_latest" not in res.tiers
    tiers = [r["tier"] for r in res.metrics.orderBy("tier_no").collect()]
    assert tiers == ["input", "exact", "near_dup"]
    # exact tier now sees ALL rows (url-dup snapshots included): survivors
    # = exactly one doc per distinct text
    n_exact = [r["docs_out"] for r in res.metrics.collect()
               if r["tier"] == "exact"][0]
    texts = {r["text"] for r in tiny_corpus.rows}
    assert n_exact == len(texts)


def test_funnel_checkpointed_resume(spark, tiny_corpus, funnel_input, tmp_path):
    from distributed_lsh_spark.sources.checkpoint import CheckpointManager

    direct = {(r["tier_no"], r["tier"], r["docs_in"], r["docs_out"])
              for r in curation_funnel(funnel_input, CFG,
                                       ts_col="warc_ts").metrics.collect()}

    ck = CheckpointManager(spark, str(tmp_path / "funnel"), run_id="r1")
    res = curation_funnel(funnel_input, CFG, ts_col="warc_ts", ckpt=ck)
    got = {(r["tier_no"], r["tier"], r["docs_in"], r["docs_out"])
           for r in res.metrics.collect()}
    assert got == direct                  # manifest counts == computed counts
    for name in ("funnel_url_latest", "funnel_exact", "funnel_near_dup"):
        assert ck.is_complete(name)
    # the raw input must NOT be staged (it would copy the whole crawl)
    assert not ck.is_complete("funnel_input")

    # resume: a fresh manager over the same root serves every tier from the
    # committed stages — metrics identical, survivors identical
    ck2 = CheckpointManager(spark, str(tmp_path / "funnel"), run_id="r1")
    res2 = curation_funnel(funnel_input, CFG, ts_col="warc_ts", ckpt=ck2)
    got2 = {(r["tier_no"], r["tier"], r["docs_in"], r["docs_out"])
            for r in res2.metrics.collect()}
    assert got2 == direct
    assert (sorted(r["doc_id"] for r in res2.survivors.collect())
            == sorted(r["doc_id"] for r in res.survivors.collect()))


def test_funnel_empty_input(spark):
    """Degenerate input: an empty pages frame flows through every tier
    (groupBys, semi-joins, the LSH near-dup build) and yields all-zero
    metrics and zero survivors."""
    empty = spark.createDataFrame(
        [], "doc_id long, text string, url string, warc_epoch long")
    res = curation_funnel(empty, CFG)
    assert res.survivors.count() == 0
    rows = res.metrics.orderBy("tier_no").collect()
    assert [r["tier"] for r in rows] == ["input", "url_latest", "exact",
                                         "near_dup"]
    assert all(r["docs_in"] == 0 and r["docs_out"] == 0
               and r["docs_removed"] == 0 for r in rows)


def test_funnel_containment_tier(spark, tiny_corpus, funnel_input):
    """Optional fifth tier: a doc embedded verbatim inside a longer
    partner (containment ~1, Jaccard far below threshold — invisible to
    the near-dup tier) is dropped, the container survives, and the
    metrics chain extends by exactly one coherent row."""
    import pyspark.sql.functions as F

    base = funnel_input.drop("url", "warc_ts")
    # donor: a doc that survives the BASE funnel (the corpus plants dup
    # clusters, so an arbitrary doc may be a dropped near-dup member)
    base_ids = sorted(r["doc_id"] for r in
                      curation_funnel(base, CFG)
                      .survivors.select("doc_id").collect())
    donor_id = next(i for i in base_ids
                    if len(tiny_corpus.rows[i]["text"].split()) >= 30)
    donor = tiny_corpus.rows[donor_id]["text"]
    # plant: doc 900000 = the donor's text inside ~2x unrelated context —
    # containment ~1 but Jaccard ~1/3, invisible to the near-dup tier
    filler = " ".join(f"ctxw{i:03d}" for i in range(120))
    container = spark.createDataFrame(
        [(900000, f"{filler} {donor} {filler}")], "doc_id long, text string")
    pages = base.unionByName(container)

    plain = curation_funnel(pages, CFG)
    assert "containment" not in plain.tiers
    plain_ids = {r["doc_id"] for r in
                 plain.survivors.select("doc_id").collect()}
    # the pair is invisible to the near-dup tier: both members survive
    assert {donor_id, 900000} <= plain_ids

    res = curation_funnel(pages, CFG,
                          drop_contained=CFG.jaccard_threshold)
    got_ids = {r["doc_id"] for r in
               res.survivors.select("doc_id").collect()}
    assert donor_id not in got_ids, "contained doc must be dropped"
    assert 900000 in got_ids, "container must survive"
    assert plain_ids - got_ids >= {donor_id}

    rows = {r["tier"]: r for r in res.metrics.orderBy("tier_no").collect()}
    assert list(r["tier"] for r in
                res.metrics.orderBy("tier_no").collect())[-1] == "containment"
    assert rows["containment"]["docs_in"] == rows["near_dup"]["docs_out"]
    assert rows["containment"]["docs_out"] == len(got_ids)
    assert rows["containment"]["docs_removed"] >= 1


def test_funnel_fuzzy_exact_tier_collapses_variants(spark):
    """fuzzy_exact=True keys tier 2 by the normalized token stream: a
    byte-distinct case/punct variant collapses (min doc_id survives),
    while the default byte key keeps both."""
    from pyspark.sql import functions as F

    from distributed_lsh_spark.operators.funnel import curation_funnel

    rows = [(1, "hello world sample text one two three four five six"),
            (2, "  HELLO, world (SAMPLE) text ONE two three four five six!"),
            (3, "entirely different content body seven eight nine ten")]
    pages = spark.createDataFrame(rows, "doc_id long, text string")

    # same survivor set either way (the variant's token stream is
    # identical, so the LSH tier catches it downstream at Jaccard 1.0) —
    # what changes is WHICH tier pays: fuzzy_exact collapses it in the
    # cheap hash tier before any shingling/banding happens
    plain = curation_funnel(pages, url_col="__no_url__")
    assert sorted(r.doc_id for r in plain.survivors.collect()) == [1, 3]
    pm = {r["tier"]: r for r in plain.metrics.collect()}
    assert pm["exact"]["docs_removed"] == 0
    assert pm["near_dup"]["docs_removed"] == 1

    fz = curation_funnel(pages, url_col="__no_url__", fuzzy_exact=True)
    assert sorted(r.doc_id for r in fz.survivors.collect()) == [1, 3]
    m = {r["tier"]: r for r in fz.metrics.collect()}
    assert m["exact"]["docs_removed"] == 1
    assert m["near_dup"]["docs_removed"] == 0
