"""Web-scale curation extras: C4-style global line dedup, Gopher
repetition signals, per-URL latest-crawl dedup — Spark vs the DuckDB
oracle at sf0.001, plus semantic pins on the planted structures."""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from distributed_lsh_spark.entry_queries import ORACLE_SQL, QUERIES  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["documents", "embeddings"]
NAMES = ["line_dedup", "gopher_repetition", "url_latest_dedup",
         "dedup_funnel", "token_rarity", "domain_stats", "semantic_dedup",
         "host_boilerplate", "dedup_funnel_contained", "gopher_quality",
         "line_dedup_keep_first", "fuzzy_exact_dup_groups",
         "corpus_profile", "pair_similarity_histogram", "export_shards",
         "c4_line_filter", "bpe_merge_learn", "bpe_encode", "doc_chunking",
         "anchor_texts", "kmeans_topics", "incremental_clusters",
         "pair_diagnostics", "filter_agreement", "tokenizer_fertility",
         "robots_filter", "main_content_extract", "url_change_stats",
         "tfidf_terms", "line_lang_segments", "cluster_audit"]


@pytest.fixture(scope="module")
def duck():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


@pytest.fixture(scope="module")
def results(spark, duck):
    out = {}
    for name in NAMES:
        sp = QUERIES[name](spark, SF_DIR).toPandas()
        dk = duck.sql(ORACLE_SQL[name]).df()
        out[name] = (sp, dk)
    return out


@pytest.mark.parametrize("name", NAMES)
def test_matches_duckdb_oracle(results, name):
    sp, dk = results[name]
    assert sorted(sp.columns) == sorted(dk.columns), name
    assert len(sp) == len(dk), name
    cols = sorted(sp.columns)
    sp = sp[cols].sort_values(cols).reset_index(drop=True)
    dk = dk[cols].sort_values(cols).reset_index(drop=True)
    for c in cols:
        a, b = sp[c], dk[c]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            assert (abs(a.astype(float) - b.astype(float)) < 1e-9).all(), (name, c)
        else:
            assert (a.astype(str) == b.astype(str)).all(), (name, c)


def test_line_dedup_planted_lines_removed(results):
    sp, _ = results["line_dedup"]
    planted = sp[sp.doc_id >= 2_000_000]
    assert len(planted) > 0
    # each planted doc shares its leading 24 tokens (3 full lines) with its
    # original, so at least those lines must be flagged duplicate
    assert (planted.n_removed >= planted.n_lines - 1).all()
    originals = sp[(sp.doc_id % 61 == 0) & (sp.doc_id < 2_000_000)]
    assert (originals.n_removed > 0).any()


def test_keep_first_removal_is_subset_of_c4_removal(results):
    """Per doc: a line occurrence removed under keep-first (an earlier
    occurrence exists) is necessarily a duplicated line, so it is also
    removed under C4 semantics — n_removed_kf <= n_removed_c4 everywhere,
    strictly less where a doc holds a line's FIRST occurrence."""
    kf, _ = results["line_dedup_keep_first"]
    ld, _ = results["line_dedup"]
    m = kf.merge(ld, on="doc_id", suffixes=("_kf", "_c4"))
    assert len(m) == len(kf) == len(ld)
    assert (m.n_lines_kf == m.n_lines_c4).all()
    assert (m.n_removed_kf <= m.n_removed_c4).all()
    # the %61 originals hold the first occurrences of the collided lines:
    # C4 removes them, keep-first keeps them
    orig = m[(m.doc_id % 61 == 0) & (m.doc_id < 2_000_000)]
    assert (orig.n_removed_kf < orig.n_removed_c4).any()
    # the +2M partial copies lose (at least) all but their last line
    cp = m[m.doc_id >= 2_000_000]
    assert len(cp) > 0
    assert (cp.n_removed_kf >= cp.n_lines_kf - 1).all()


def test_fuzzy_groups_capture_normalization_variants(results):
    sp, _ = results["fuzzy_exact_dup_groups"]
    assert (sp.n_dups >= 2).all()
    # every %71 base doc gained a '  >>> UPPER !!!  ' variant at +4M:
    # byte-distinct, normalization-identical -> a real group keyed by the
    # original (minimum) doc_id
    import pandas as pd
    base = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    planted_src = sorted(int(i) for i in base.doc_id if i % 71 == 0)
    assert len(planted_src) > 0
    for i in planted_src:
        assert (sp.keep_id == i).any(), i


def test_gopher_planted_docs_have_dup_lines(results):
    sp, _ = results["gopher_repetition"]
    planted = sp[(sp.doc_id % 53 == 0) & (sp.n_tokens >= 32)]
    assert len(planted) > 0
    # prepending the first 16 tokens re-aligns lines 1-2 as dups of 3-4
    assert (planted.dup_line_frac > 0).all()
    assert ((sp.top_token_frac > 0) & (sp.top_token_frac <= 1)).all()


def test_url_latest_keeps_newest_crawl(results):
    sp, _ = results["url_latest_dedup"]
    assert (sp.n_crawls > 1).any()
    # winner must carry the max epoch of its url group — recompute directly
    import pandas as pd

    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")[["doc_id"]]
    docs["url_key"] = docs.doc_id % 97
    docs["epoch"] = 1735689600 + (docs.doc_id * 7919) % 1_000_000
    best = docs.groupby("url_key").epoch.max()
    sp2 = sp.copy()
    sp2["url_key"] = sp2.kept_doc_id % 97
    got = sp2.set_index("url_key").warc_epoch.sort_index()
    assert (got.values == best.sort_index().values).all()


def test_token_rarity_hapax_mass_matches_python(results, duck):
    """Independent pin (same tokenizer re-implemented in Python, no SQL):
    the corpus-wide hapax mass — sum over docs of n_hapax — must equal
    the number of tokens whose corpus frequency is exactly 1, and the
    rare mass must equal the total occurrences of tokens with tf <= 5."""
    import collections
    import re

    sp, _ = results["token_rarity"]
    texts = duck.sql("SELECT text FROM documents").fetchall()
    tf = collections.Counter()
    for (t,) in texts:
        tf.update(x for x in re.split(r"[^a-z0-9]+", t.lower()) if x)
    assert sp.n_hapax.sum() == sum(1 for c in tf.values() if c == 1)
    assert sp.n_rare.sum() == sum(c for c in tf.values() if c <= 5)
    assert (sp.n_hapax <= sp.n_rare).all()
    assert (sp.n_rare <= sp.n_tokens).all()
    assert (sp.max_tf >= 1).all()


def test_domain_stats_partition_the_corpus(results, duck):
    """The 7 derived hosts partition the corpus: doc counts per host match
    a pure-Python derivation and sum to the corpus size."""
    sp, _ = results["domain_stats"]
    ids = [r[0] for r in duck.sql("SELECT doc_id FROM documents").fetchall()]
    import collections
    exp = collections.Counter(f"h{(i % 97) % 7}.example.com" for i in ids)
    got = dict(zip(sp.host, sp.n_docs))
    assert got == dict(exp)
    assert sp.n_docs.sum() == len(ids)
    assert ((sp.keep_frac >= 0) & (sp.keep_frac <= 1)).all()


def test_funnel_gate_tiers_all_remove_rows(results):
    """Every funnel tier must remove at least one row in the gate (the
    planting guarantees url/exact removals; quality/near-dup removals are
    the corpus's natural ones) — otherwise the gate row is vacuous."""
    sp, _ = results["dedup_funnel"]
    removed = dict(zip(sp.tier, sp.docs_removed))
    for tier in ("url_latest", "exact", "quality", "near_dup"):
        assert removed[tier] > 0, tier
    assert removed["input"] == 0


def test_semantic_dedup_planted_copies_cluster(results):
    """Every planted identical-embedding copy (vec_id % 101 == 0, copy at
    +1M) must land in a 2+-member cluster whose max member is the copy."""
    sp, _ = results["semantic_dedup"]
    planted = set(sp[sp.max_vec_id >= 1_000_000].cluster_id)
    import pandas as pd
    emb_ids = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")["vec_id"]
    expected = {int(v) for v in emb_ids if v % 101 == 0}
    assert planted == expected
    assert (sp.n_members >= 2).all()
    assert (sp.n_dropped == sp.n_members - 1).all()


def test_host_boilerplate_planted_nav_removed_rare_kept(results):
    """The ~50%-of-host planted nav line is removed from EVERY even
    doc_id; the ~4% rare line never fires the 30% threshold, so odd
    multiples of 23 (rare line only) lose nothing."""
    sp, _ = results["host_boilerplate"]
    by_id = dict(zip(sp.doc_id, sp.n_removed))
    assert all(by_id[d] >= 1 for d in by_id if d % 2 == 0), \
        "planted nav line must be removed on every even doc"
    rare_only = [d for d in by_id if d % 23 == 0 and d % 2 == 1]
    assert rare_only and all(by_id[d] == 0 for d in rare_only), \
        "the rare line alone must never cross the host threshold"


def test_funnel_contained_tier_removes_rows(results):
    """The 5-tier gate row must remove rows at the containment tier
    (planted ~60% prefixes) and agree with the 4-tier row upstream of
    the extra planting's side effects."""
    sp, _ = results["dedup_funnel_contained"]
    removed = dict(zip(sp.tier, sp.docs_removed))
    assert list(sp.tier)[-1] == "containment"
    assert removed["containment"] > 0
    for tier in ("url_latest", "exact", "quality", "near_dup"):
        assert removed[tier] > 0, tier


def test_corpus_profile_matches_python_census(results, duck):
    """Independent pin: per-lang doc counts, token totals, and EXACT
    percentiles recomputed in pure Python (numpy linear interpolation ==
    Spark `percentile` == DuckDB `quantile_cont`)."""
    import collections
    import re

    import numpy as np

    sp, _ = results["corpus_profile"]
    rows = duck.sql("SELECT lang, text FROM documents").fetchall()
    toks = collections.defaultdict(list)
    for lang, t in rows:
        toks[lang].append(len([x for x in re.split(r"[^a-z0-9]+", t.lower())
                               if x]))
    assert sorted(sp.lang) == sorted(toks)
    assert sp.n_docs.sum() == len(rows)
    for r in sp.itertuples():
        ns = toks[r.lang]
        assert r.n_docs == len(ns)
        assert r.total_tokens == sum(ns)
        assert abs(r.p50_tokens - round(float(np.percentile(ns, 50)), 6)) < 1e-9
        assert abs(r.p90_tokens - round(float(np.percentile(ns, 90)), 6)) < 1e-9
        assert r.p50_tokens <= r.p90_tokens


def test_pair_histogram_partitions_the_verified_pairs(results, duck):
    """The histogram's mass must equal the gated dup-pair row count, its
    bins must live in [16, 20] (τ=0.8 -> bin 16 is the lowest possible),
    and every bin's min/max must sit inside the bin's [lo, lo+0.05)
    interval (bin 20 = exactly 1.0)."""
    sp, _ = results["pair_similarity_histogram"]
    n_pairs = len(duck.sql(ORACLE_SQL["minhash_lsh_dup_pairs"]).df())
    assert sp.n_pairs.sum() == n_pairs > 0
    assert ((sp.bin_no >= 16) & (sp.bin_no <= 20)).all()
    for r in sp.itertuples():
        assert r.bin_lo - 1e-9 <= r.min_jaccard <= r.max_jaccard, r
        hi = r.bin_lo + 0.05 if r.bin_no < 20 else 1.0 + 1e-12
        assert r.max_jaccard < hi + 1e-9, r


def test_export_shards_manifest_matches_python(results, duck):
    """Full manifest recomputed in pure Python over the raw texts: shard
    assignment, counts, and the xor content fingerprint must all match
    (order-independence of the fingerprint is what makes the manifest
    comparable across exports)."""
    import collections
    import re

    from distributed_lsh_spark.functions.md5hash import py_md5_h64

    sp, _ = results["export_shards"]
    rows = duck.sql("SELECT doc_id, text FROM documents").fetchall()
    agg = collections.defaultdict(lambda: [0, 0, 0, None, None])
    for doc_id, t in rows:
        h = py_md5_h64(t)
        s = h % 16
        a = agg[s]
        a[0] += 1
        a[1] += len([x for x in re.split(r"[^a-z0-9]+", t.lower()) if x])
        a[2] ^= h & ((1 << 64) - 1)
        a[3] = doc_id if a[3] is None else min(a[3], doc_id)
        a[4] = doc_id if a[4] is None else max(a[4], doc_id)
    assert sp.n_docs.sum() == len(rows)
    assert set(sp.shard_id) == set(agg)
    for r in sp.itertuples():
        n, tok, fp, lo, hi = agg[r.shard_id]
        fp_signed = fp - (1 << 64) if fp >= (1 << 63) else fp
        assert (r.n_docs, r.n_tokens, r.content_fp, r.min_doc_id,
                r.max_doc_id) == (n, tok, fp_signed, lo, hi), r.shard_id


def test_gopher_quality_planted_failure_modes(results):
    """Each planted structural hazard trips exactly its own rule:
    10 bullet lines (% 43) fail the 90% bullet cap, 2-of-3
    ellipsis-ended lines (% 47) fail the 30% cap, '#' runs (% 59) break
    the symbol ratio for short docs, while the mild 2-bullet planting
    (% 41, 2/3 lines) keeps the bullet rule satisfied."""
    sp, _ = results["gopher_quality"]

    def only(mod):
        """Docs planted by exactly ONE modulus (doc 0 matches them all
        and stacks every planting, diluting each individual fraction)."""
        return [r for r in sp.itertuples()
                if r.doc_id % mod == 0
                and sum(r.doc_id % m == 0 for m in (41, 43, 47, 59)) == 1]

    b43 = only(43)
    assert b43 and all(10 * r.n_bullet_lines > 9 * r.n_lines for r in b43)
    e47 = only(47)
    assert e47 and all(10 * r.n_ellipsis_lines > 3 * r.n_lines for r in e47)
    s59 = only(59)
    assert s59 and all(r.n_symbols >= 6 for r in s59)
    b41 = only(41)
    assert b41 and all(10 * r.n_bullet_lines <= 9 * r.n_lines for r in b41)
    assert 0 < sp.keep_gopher.sum() < len(sp), "rule must be non-vacuous"


def test_c4_line_filter_rules_fire_and_compose(results):
    """Each C4 rule fires on exactly the docs whose (doc_id, pos)
    arithmetic plants its trigger; doc 0 stacks every modulus and must
    land in the lorem branch (CASE precedence)."""
    sp, _ = results["c4_line_filter"]
    by_id = sp.set_index("doc_id")
    assert by_id.loc[0, "drop_reason"] == "lorem_ipsum"
    lorem = sp[sp.doc_id % 107 == 0]
    assert len(lorem) > 0 and (lorem.drop_reason == "lorem_ipsum").all()
    brace = sp[(sp.doc_id % 109 == 0) & (sp.doc_id % 107 != 0)]
    assert len(brace) > 0 and (brace.drop_reason == "brace").all()
    # pages never trip lorem/brace unless planted
    clean = sp[(sp.doc_id % 107 != 0) & (sp.doc_id % 109 != 0)]
    assert set(clean.drop_reason) <= {"kept", "too_few_sentences"}
    kept = sp[sp.drop_reason == "kept"]
    assert len(kept) > 0 and (kept.n_kept >= 5).all()
    few = sp[sp.drop_reason == "too_few_sentences"]
    assert (few.n_kept < 5).all()
    assert (sp.n_kept <= sp.n_lines).all()
    # a javascript-planted page with >= 2 lines loses its pos==1 line even
    # though it ends in '.', so n_kept < n_lines there
    js = sp[(sp.doc_id % 29 == 0) & (sp.doc_id % 107 != 0)
            & (sp.doc_id % 109 != 0) & (sp.n_lines >= 2)]
    assert len(js) > 0 and (js.n_kept < js.n_lines).all()


def test_anchor_texts_matches_pure_python(results):
    """Third-engine pin: rebuild the (dst, anchor) multiset from doc_id
    arithmetic in plain Python (no regex, no SQL) and recompute every
    aggregate including the modal anchor's lowest-term tie-break."""
    from collections import Counter

    sp, _ = results["anchor_texts"]
    ids = duckdb.sql(
        f"SELECT doc_id FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).df()["doc_id"].tolist()
    per_dst: dict[int, Counter] = {}
    for i in ids:
        for dst, anch in (((i * 13 + 1) % 89, f"t{(i * 7 + 1) % 31}"),
                          ((i * 29 + 2) % 83, f"t{(i * 7 + 2) % 31}")):
            per_dst.setdefault(dst, Counter())[anch] += 1
    expected = {}
    for dst, ctr in per_dst.items():
        top = min(ctr.items(), key=lambda kv: (-kv[1], kv[0]))
        expected[dst] = (sum(ctr.values()), len(ctr), top[0], top[1])
    got = {r.page: (r.n_links, r.n_terms, r.top_anchor, r.top_cnt)
           for r in sp.itertuples()}
    assert got == expected
    # the tie/mode logic is exercised: some page has a contested mode
    assert any(len(c) > 1 for c in per_dst.values())


def test_pair_diagnostics_signal_invariants(results):
    """Cross-signal sanity on the jointly-gated diagnostics row:
    containment >= jaccard always (min <= union), shared counts positive,
    and byte-near-identical pairs (jaccard ~ 1) sit at Hamming ~ 0."""
    sp, _ = results["pair_diagnostics"]
    assert len(sp) > 0
    assert (sp.containment >= sp.jaccard - 1e-9).all()
    assert (sp.shared_shingles > 0).all()
    assert ((sp.hamming >= 0) & (sp.hamming <= 64)).all()
    near = sp[sp.jaccard >= 0.999]
    if len(near):
        assert (near.hamming <= 3).all()


def test_url_change_stats_matches_pure_python(results):
    """Replay the revisit/change statistics with plain Python over the
    arithmetic construction (independent of BOTH engines' window
    machinery)."""
    import hashlib

    sp, _ = results["url_change_stats"]
    ids = duckdb.sql(
        f"SELECT doc_id FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).df()["doc_id"].tolist()
    crawls: dict[str, list] = {}
    for i in ids:
        p = i % 97
        url = f"https://h{p % 7}.example.com/p/{p}"
        crawls.setdefault(url, []).append(
            (1735689600 + (i * 7919) % 1_000_000, i, f"page {p} v{(i*13) % 4}"))
    for url, rows in crawls.items():
        rows.sort()
        got = sp[sp["url"] == url].iloc[0]
        assert got["n_crawls"] == len(rows)
        assert got["n_versions"] == len({c for _, _, c in rows})
        changes = [(e, c) for (e, _, c), (pe, _, pc) in
                   zip(rows[1:], rows[:-1]) if c != pc]
        assert got["n_changes"] == len(changes)
        assert got["first_epoch"] == rows[0][0]
        assert got["last_epoch"] == rows[-1][0]
        assert got["latest_md5"] == hashlib.md5(
            rows[-1][2].encode()).hexdigest()
        assert got["last_change_epoch"] == (
            max(e for e, _ in changes) if changes else rows[0][0])


def test_tfidf_terms_matches_pure_python(results, duck):
    """Replay the whole TF-IDF chain (tokenize, tf, df, micro-nat idf,
    tie-broken top-3) in plain Python — independent of both engines."""
    import collections
    import math
    import re

    sp, _ = results["tfidf_terms"]
    rows = duck.sql("SELECT doc_id, text FROM documents").fetchall()
    per_doc = {}
    dfreq = collections.Counter()
    for i, t in rows:
        toks = collections.Counter(
            x for x in re.split(r"[^a-z0-9]+", t.lower()) if x)
        per_doc[i] = toks
        dfreq.update(toks.keys())
    n_docs = len(rows)
    for i, toks in per_doc.items():
        scored = sorted(
            ((-c * round(math.log(n_docs / dfreq[w]) * 1e6), w, c)
             for w, c in toks.items()))
        exp = [(w, c, dfreq[w], -s) for s, w, c in scored[:3]]
        got = sp[sp.doc_id == i].sort_values("rank")
        assert [tuple(r) for r in
                got[["term", "tf", "df", "score_micro"]].itertuples(
                    index=False)] == exp, i


def test_line_lang_segments_planted_docs_mixed(results):
    """Every %31 doc gains a French tail long enough to guarantee a full
    pure-French line; %37 a German one.  Counts must partition lines."""
    sp, _ = results["line_lang_segments"]
    fr = sp[sp.doc_id % 31 == 0]
    de = sp[sp.doc_id % 37 == 0]
    assert len(fr) > 0 and len(de) > 0
    assert (fr.n_fr >= 1).all()
    assert (de.n_de >= 1).all()
    assert fr.is_mixed.any() and de.is_mixed.any()
    total = sp.n_en + sp.n_de + sp.n_fr + sp.n_es + sp.n_und
    assert (total == sp.n_lines).all()
    # a doc whose lines all vote und must carry doc_lang 'und'
    und = sp[(sp.n_en == 0) & (sp.n_de == 0) & (sp.n_fr == 0) &
             (sp.n_es == 0)]
    assert (und.doc_lang == "und").all()


def test_cluster_audit_planted_chains_bridged(results):
    """Every %53==1 family plants a 3-chain A~B~C with j(A,C) < tau:
    exactly one bridged (non-complete) 3-doc cluster per family, rooted
    at the family's lowest planted id; real corpus dup families stay
    complete graphs (density 1e6 ppm)."""
    sp, _ = results["cluster_audit"]
    planted = sp[sp.cluster_id >= 3_000_000]
    real = sp[sp.cluster_id < 3_000_000]
    assert len(planted) > 0 and len(real) > 0
    assert (planted.n_docs == 3).all()
    assert (planted.n_edges == 2).all()
    assert (planted.density_ppm == 666_666).all()
    assert (planted.is_bridged == 1).all()
    # chain edges sit at j = 76/(76+t), t in {10,11,12} — all above tau;
    # the query rounds to 6 dp, so allow a half-ulp of that rounding
    assert (planted.min_jaccard >= 0.8).all()
    assert (planted.min_jaccard <= 76 / 86 + 5e-7).all()
    assert (real.density_ppm == 1_000_000).all()
    assert (real.is_bridged == 0).all()
    # density is exact integer arithmetic: complete graph <=> not bridged
    complete = sp.n_edges * 2 == sp.n_docs * (sp.n_docs - 1)
    assert ((sp.is_bridged == 0) == complete).all()
