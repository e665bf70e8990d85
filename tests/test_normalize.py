"""NFC normalization: scalar spec on pinned composed/decomposed cases,
Python-unicodedata vs DuckDB-utf8proc cross-implementation parity, and
the gate row."""

from __future__ import annotations

import duckdb
import pytest

from distributed_lsh_spark.functions.normalize import nfc

CASES = [
    ("café", "café"),        # decomposed -> precomposed
    ("café", "café"),         # already NFC
    ("Å", "Å"),               # ANGSTROM SIGN -> Å (singleton)
    ("Å", "Å"),              # A + COMBINING RING -> Å
    ("ﬁne", "ﬁne"),           # fi ligature: NFC keeps it (NFKC wouldn't)
    ("ascii stays", "ascii stays"),
    ("", ""),
    (None, None),
]


@pytest.mark.parametrize("raw,want", CASES)
def test_scalar_spec(raw, want):
    assert nfc(raw) == want


def test_python_matches_duckdb_utf8proc():
    # two unrelated UAX #15 implementations must agree on every case
    con = duckdb.connect()
    for raw, want in CASES:
        if raw is None:
            continue
        got = con.execute("SELECT nfc_normalize(?)", [raw]).fetchone()[0]
        assert got == nfc(raw) == want, repr(raw)


def test_gate_row_matches_oracle(spark):
    from distributed_lsh_spark.entry_queries import ORACLE_SQL, QUERIES

    sf = "/root/testdata/sf0.001"
    sdf = QUERIES["unicode_nfc_dedup"](spark, sf).toPandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    ddf = con.execute(ORACLE_SQL["unicode_nfc_dedup"]).df()
    assert len(sdf) == len(ddf) > 0
    for c in sdf.columns:
        assert list(sdf[c].astype(str)) == list(ddf[c].astype(str)), c
    # the planting really produced both changed and unchanged docs, and
    # the singleton/composition folds shrank codepoint counts
    assert set(sdf["changed"]) == {0, 1}
    assert sdf["cp_delta"].max() == 1 and sdf["cp_delta"].min() == 0
