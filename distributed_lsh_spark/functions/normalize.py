"""Unicode NFC normalization — the canonical-equivalence fold every
webtext pipeline applies before hashing text (UAX #15).

Crawled html carries the same visible string under different codepoint
sequences — precomposed U+00E9 vs e + COMBINING ACUTE, U+212B ANGSTROM
SIGN vs Å — and every byte-keyed stage downstream (exact dedup md5,
line-dedup xxhash64, shingle hashing) treats them as distinct documents
unless normalized first.  NFC is the standard choice (canonical
composition; unlike NFKC it never changes visible text, only its
encoding), applied as a map-only Arrow-batched pass fused into the
ingest scan — no shuffle, no state.

One spec, two independent engines for the gate: the UDF delegates to
Python's unicodedata (UAX #15); the DuckDB oracle uses its built-in
`nfc_normalize` (utf8proc).  Both implement the same published
algorithm, so the gate cross-checks two unrelated implementations —
parity pinned on composed/decomposed/compatibility cases in
tests/test_normalize.py.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


def nfc(text: str | None) -> str | None:
    """Scalar spec (None-safe)."""
    return None if text is None else unicodedata.normalize("NFC", text)


@F.pandas_udf(T.StringType())
def nfc_udf(texts: pd.Series) -> pd.Series:
    return texts.map(nfc, na_action="ignore")


__all__ = ["nfc", "nfc_udf"]
