"""HTML -> text extraction: pure, versioned, byte-stable.

BASELINE.json input_hint mandates "byte-identical extracted text per url"
between engine and oracle, so extraction is ONE pure-Python function
(`extract_text`, EXTRACTOR_VERSION-stamped) used by BOTH:
  * the Spark side wraps it in an Arrow-vectorized pandas UDF (string in /
    string out; the per-row function is pure string processing — regex state
    machines, not per-row Python object churn);
  * the oracle calls it directly.

No environment-dependent libraries (bs4/lxml would tie bytes to lib
versions).  The algorithm is a small deterministic state machine:
  1. decode UTF-8 (errors -> U+FFFD, deterministic)
  2. drop <script>/<style>/<!-- --> blocks (case-insensitive)
  3. <br>, </p>, </div>, </li>, </tr>, </h1..6> emit '\\n'; other tags a space
  4. decode the 5 XML entities + numeric charrefs
  5. collapse runs of spaces/tabs to one space, strip line edges, collapse
     blank lines to one '\\n'
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

EXTRACTOR_VERSION = "1.0.0"

_DROP_BLOCKS = re.compile(
    r"<script\b.*?</script\s*>|<style\b.*?</style\s*>|<!--.*?-->",
    re.IGNORECASE | re.DOTALL)
_BREAK_TAGS = re.compile(
    r"<\s*(?:br|/p|/div|/li|/tr|/h[1-6])\b[^>]*>", re.IGNORECASE)
_ANY_TAG = re.compile(r"<[^>]*>")
_NUM_REF = re.compile(r"&#(x[0-9a-fA-F]+|[0-9]+);")
_ENTITIES = {"&amp;": "&", "&lt;": "<", "&gt;": ">", "&quot;": '"',
             "&apos;": "'", "&nbsp;": " "}
_SPACE_RUN = re.compile(r"[ \t\r\f\v]+")
_BLANK_LINES = re.compile(r"\n\s*\n+")


def _decode_numref(m: re.Match) -> str:
    body = m.group(1)
    try:
        cp = int(body[1:], 16) if body[0] in "xX" else int(body)
        return chr(cp) if 0 < cp <= 0x10FFFF else ""
    except (ValueError, OverflowError):
        return ""


def extract_text(html: bytes | str) -> str:
    """Deterministic text extraction (see module docstring)."""
    s = html.decode("utf-8", errors="replace") if isinstance(html, (bytes, bytearray)) else html
    s = _DROP_BLOCKS.sub(" ", s)
    s = _BREAK_TAGS.sub("\n", s)
    s = _ANY_TAG.sub(" ", s)
    for ent, ch in _ENTITIES.items():
        s = s.replace(ent, ch)
    s = _NUM_REF.sub(_decode_numref, s)
    s = _SPACE_RUN.sub(" ", s)
    s = "\n".join(line.strip() for line in s.split("\n"))
    s = _BLANK_LINES.sub("\n", s)
    return s.strip()


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return html.map(extract_text)


def with_extracted_text(df, html_col: str = "html", out: str = "text"):
    """pages(html binary) -> + text string (Arrow batches; S2 analogue:
    the reference's vector parse, MapReduce-LSH/.../lsh/builder/
    HashReducer.java:162-184, grafted to text extraction per input_hint)."""
    return df.withColumn(out, extract_text_udf(F.col(html_col)))
