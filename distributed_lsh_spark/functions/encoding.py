"""Mojibake (encoding-damage) detection and repair — the ftfy-style
pass a Common-Crawl pipeline runs before any byte-keyed stage.

Crawled pages routinely declare the wrong charset: UTF-8 bytes decoded
as Latin-1/cp1252 turn every non-ASCII character into a 2-3 character
artifact ("café" -> "cafÃ©"), and decoder give-ups leave
U+FFFD replacement characters.  Both damage every downstream stage that
keys on bytes (exact dedup md5, line/shingle hashing, language ID), so
the pipeline detects and — where the damage is the reversible
UTF-8-as-Latin-1 class — repairs it at ingest.

Detection is a single codegen regexp (no UDF): the artifact signature
is a lead byte-image in U+00C0-U+00FF followed by a continuation
byte-image in U+0080-U+00BF — exactly the shape valid UTF-8 multibyte
sequences take when each byte is widened to its Latin-1 codepoint.
Real Latin-1 text can contain isolated accented letters, but they are
followed by ASCII letters, not continuation-range codepoints, so the
pattern fires on genuine mojibake and stays quiet on clean text; the
caller applies a count threshold (>= 2 in the gated query) before
trusting the verdict, since a single match can occur in legitimate
multilingual text.

Repair is the exact inverse of the corruption: re-encode the text as
Latin-1 (recovering the original UTF-8 bytes) and decode as UTF-8.  If
either step fails — characters above U+00FF (the text is genuinely
multilingual, not mojibake) or the recovered bytes are not valid UTF-8
(mixed/irreversible damage) — the text is returned unchanged, so the
repair is total and idempotent: repairing already-clean text that
round-trips (pure ASCII) is the identity, and a second repair of a
fixed string is a no-op via the failure path.  U+FFFD damage is
information-LOSS and is never repairable; it is detected (n_repl) but
passes through unchanged.

Applied as a map-only Arrow-batched pass fused into the ingest scan —
no shuffle, no state.  The gated query (`encoding_quality` in
entry_queries.py) plants the corruption by appending the
UTF-8-as-Latin-1 image of a fixed unicode phrase; its DuckDB oracle
replays detection with its own regexp engine and STATES the expected
repaired md5 from the clean construction — it never runs a repair — so
the gate value-checks the real UDF's byte-level output.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

# lead byte-image followed by continuation byte-image: the UTF-8-as-
# Latin-1 signature (see module docstring)
MOJIBAKE_PATTERN = "[\u00C0-\u00FF][\u0080-\u00BF]"
REPLACEMENT_CHAR = "\ufffd"


def fix_mojibake(text: str | None) -> str | None:
    """Scalar spec (None-safe): invert UTF-8-read-as-Latin-1, or return
    the input unchanged if the text is not in the reversible class."""
    if text is None:
        return None
    try:
        return text.encode("latin-1").decode("utf-8")
    except (UnicodeEncodeError, UnicodeDecodeError):
        return text


@F.pandas_udf(T.StringType())
def fix_mojibake_udf(texts: pd.Series) -> pd.Series:
    return texts.map(fix_mojibake, na_action="ignore")


def mojibake_artifacts(col) -> "F.Column":
    """Count of mojibake artifact sequences — one codegen regexp scan."""
    return F.regexp_count(col, F.lit(MOJIBAKE_PATTERN))


def replacement_chars(col) -> "F.Column":
    """Count of U+FFFD decoder give-ups — one codegen regexp scan."""
    return F.regexp_count(col, F.lit(REPLACEMENT_CHAR))


__all__ = ["MOJIBAKE_PATTERN", "REPLACEMENT_CHAR", "fix_mojibake",
           "fix_mojibake_udf", "mojibake_artifacts", "replacement_chars"]
