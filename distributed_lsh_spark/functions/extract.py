"""HTML -> text extraction: pure, versioned, byte-stable, batch-vectorized.

BASELINE.json input_hint mandates "byte-identical extracted text per url"
between engine and oracle, so extraction is ONE spec (`extract_text`,
EXTRACTOR_VERSION-stamped) evaluated two ways:
  * `extract_text` — pure-Python reference (the oracle calls it directly);
  * `extract_text_batch` — the SAME regex pass sequence executed batch-wise
    in Arrow C++ (pyarrow.compute.replace_substring_regex / RE2), used by
    the Spark UDF; per-row Python survives only for (a) the utf-8 decode
    (a C call per row) and (b) numeric character references, which need a
    chr() callback and run ONLY on the rows that still contain "&#" after
    entity decoding.

Parity by construction: every pattern is written with EXPLICIT character
classes — no \\b, \\s, or \\w, whose unicode semantics differ between
Python re and RE2 — and the identical pattern source strings are compiled
by both engines.  (v2.0.0: \\b after tag names became [^A-Za-z0-9_>]-style
classes and str.strip() became an explicit python-whitespace-class regex;
output bytes change only for HTML with non-ASCII letters glued to tag
names or exotic unicode whitespace at line edges.)

No environment-dependent libraries (bs4/lxml would tie bytes to lib
versions).  The algorithm is a small deterministic pass sequence:
  1. decode UTF-8 (errors -> U+FFFD, deterministic)
  2. drop <script>/<style>/<!-- --> blocks (case-insensitive)
  3. <br>, </p>, </div>, </li>, </tr>, </h1..6> emit '\\n'; other tags a space
  4. decode the 6 named entities, then numeric charrefs
  5. collapse runs of spaces/tabs to one space, strip line edges, collapse
     blank lines to one '\\n', strip the whole string
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

EXTRACTOR_VERSION = "2.0.0"

# Exactly the set str.isspace() is true for (so the class-regex strip ==
# str.strip()); enumerated once, pinned by a test.
PY_WHITESPACE = "".join(chr(c) for c in (
    [0x09, 0x0A, 0x0B, 0x0C, 0x0D, 0x1C, 0x1D, 0x1E, 0x1F, 0x20, 0x85, 0xA0,
     0x1680] + list(range(0x2000, 0x200B)) +
    [0x2028, 0x2029, 0x202F, 0x205F, 0x3000]))
_WS = PY_WHITESPACE                     # incl. newline
_WSNN = _WS.replace("\n", "")           # excl. newline (per-line strip)
_NW = "[^A-Za-z0-9_>]"                  # "word boundary, then not >"

# Pattern SOURCE strings shared verbatim by Python re and RE2.
P_DROP_BLOCKS = (rf"(?is)<script(?:{_NW}[^>]*)?>.*?</script[{_WS}]*>"
                 rf"|<style(?:{_NW}[^>]*)?>.*?</style[{_WS}]*>"
                 r"|<!--.*?-->")
P_BREAK_TAGS = (rf"(?i)<[{_WS}]*(?:br|/p|/div|/li|/tr|/h[1-6])"
                rf"(?:{_NW}[^>]*)?>")
P_ANY_TAG = r"<[^>]*>"
P_SPACE_RUN = r"[ \t\r\f\v]+"
P_LINE_EDGES = rf"(?m)^[{_WSNN}]+|[{_WSNN}]+$"
P_BLANK_LINES = r"\n\n+"
P_FULL_EDGES = rf"^[{_WS}]+|[{_WS}]+$"

_DROP_BLOCKS = re.compile(P_DROP_BLOCKS)
_BREAK_TAGS = re.compile(P_BREAK_TAGS)
_ANY_TAG = re.compile(P_ANY_TAG)
_SPACE_RUN = re.compile(P_SPACE_RUN)
_LINE_EDGES = re.compile(P_LINE_EDGES)
_BLANK_LINES = re.compile(P_BLANK_LINES)
_FULL_EDGES = re.compile(P_FULL_EDGES)
_NUM_REF = re.compile(r"&#(x[0-9a-fA-F]+|[0-9]+);")
_ENTITIES = {"&amp;": "&", "&lt;": "<", "&gt;": ">", "&quot;": '"',
             "&apos;": "'", "&nbsp;": " "}


def _decode_numref(m: re.Match) -> str:
    body = m.group(1)
    try:
        cp = int(body[1:], 16) if body[0] in "xX" else int(body)
        return chr(cp) if 0 < cp <= 0x10FFFF else ""
    except (ValueError, OverflowError):
        return ""


def extract_text(html: bytes | str) -> str:
    """Deterministic text extraction — the pure-Python reference for the
    byte-identity contract (see module docstring)."""
    s = html.decode("utf-8", errors="replace") if isinstance(html, (bytes, bytearray)) else html
    s = _DROP_BLOCKS.sub(" ", s)
    s = _BREAK_TAGS.sub("\n", s)
    s = _ANY_TAG.sub(" ", s)
    for ent, ch in _ENTITIES.items():
        s = s.replace(ent, ch)
    s = _NUM_REF.sub(_decode_numref, s)
    s = _SPACE_RUN.sub(" ", s)
    s = _LINE_EDGES.sub("", s)
    s = _BLANK_LINES.sub("\n", s)
    s = _FULL_EDGES.sub("", s)
    return s


def extract_text_batch(html: pd.Series) -> pd.Series:
    """Arrow/RE2 evaluation of the same pass sequence (hot path: the tag
    regexes run over raw HTML, ~10x the size of the output text)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    decoded = [b.decode("utf-8", errors="replace")
               if isinstance(b, (bytes, bytearray)) else b
               for b in html]
    arr = pa.array(decoded, type=pa.string())
    arr = pc.replace_substring_regex(arr, pattern=P_DROP_BLOCKS, replacement=" ")
    arr = pc.replace_substring_regex(arr, pattern=P_BREAK_TAGS, replacement="\n")
    arr = pc.replace_substring_regex(arr, pattern=P_ANY_TAG, replacement=" ")
    for ent, ch in _ENTITIES.items():
        arr = pc.replace_substring(arr, pattern=ent, replacement=ch)
    # numeric charrefs need a chr() callback -> Python, but ONLY for rows
    # still containing "&#" (rare in real corpora)
    flagged = pc.match_substring(arr, "&#")
    if pc.any(flagged).as_py():
        vals = arr.to_pylist()
        for i, hit in enumerate(flagged.to_pylist()):
            if hit:
                vals[i] = _NUM_REF.sub(_decode_numref, vals[i])
        arr = pa.array(vals, type=pa.string())
    arr = pc.replace_substring_regex(arr, pattern=P_SPACE_RUN, replacement=" ")
    arr = pc.replace_substring_regex(arr, pattern=P_LINE_EDGES, replacement="")
    arr = pc.replace_substring_regex(arr, pattern=P_BLANK_LINES, replacement="\n")
    arr = pc.replace_substring_regex(arr, pattern=P_FULL_EDGES, replacement="")
    return arr.to_pandas()


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return extract_text_batch(html)


def with_extracted_text(df, html_col: str = "html", out: str = "text"):
    """pages(html binary) -> + text string (Arrow batches; S2 analogue:
    the reference's vector parse, MapReduce-LSH/.../lsh/builder/
    HashReducer.java:162-184, grafted to text extraction per input_hint)."""
    return df.withColumn(out, extract_text_udf(F.col(html_col)))


# ---- robots-meta directives -------------------------------------------------
# The noindex compliance pass: a page whose <meta name="robots"> carries
# `noindex` (or `none` = noindex + nofollow) asks not to be indexed or
# reused; training-data pipelines drop such pages at ingest.  Detection
# is ONE codegen regexp per directive over lower(html) — attribute order
# is free (two alternates), quotes optional, and `\b` bounds keep
# `robotsx`/`nonenclature` from matching; deliberately NO lookahead so
# the same pattern source string runs on Java regex (Spark) and RE2
# (DuckDB oracle).  A robots directive inside a non-robots meta tag
# (e.g. a description that merely mentions "noindex") cannot match: both
# alternates require name=robots inside the SAME tag ([^>]* never
# crosses the closing '>').
_ROBOTS_A = (r'<meta\b[^>]*\bname\s*=\s*["' "'" r']?robots\b[^>]*'
             r'\bcontent\s*=\s*["' "'" r']?[^>]*\b{d}\b')
_ROBOTS_B = (r'<meta\b[^>]*\bcontent\s*=\s*["' "'" r']?[^>]*\b{d}\b'
             r'[^>]*\bname\s*=\s*["' "'" r']?robots\b')


def _robots_pattern(directive: str) -> str:
    return ("(?:" + _ROBOTS_A.format(d=directive) + "|"
            + _ROBOTS_B.format(d=directive) + ")")


ROBOTS_NOINDEX_PATTERN = _robots_pattern("(?:noindex|none)")
ROBOTS_NOFOLLOW_PATTERN = _robots_pattern("(?:nofollow|none)")


def robots_noindex(html_col) -> "F.Column":
    """True iff the page's robots meta tag carries noindex (or none)."""
    return F.regexp_count(F.lower(F.col(html_col).cast("string")),
                          F.lit(ROBOTS_NOINDEX_PATTERN)) > 0


def robots_nofollow(html_col) -> "F.Column":
    """True iff the page's robots meta tag carries nofollow (or none)."""
    return F.regexp_count(F.lower(F.col(html_col).cast("string")),
                          F.lit(ROBOTS_NOFOLLOW_PATTERN)) > 0


# ---------------------------------------------------------------------------
# rel=canonical link extraction
# ---------------------------------------------------------------------------
# The in-page canonical declaration (<link rel="canonical" href=...>, RFC
# 6596) — the signal Common-Crawl-style pipelines use to fold mirrored /
# paginated / tracking-parameter spellings of one page, complementary to
# pure URL-string canonicalization (functions/url.py).  Same regexp
# discipline as the robots detectors: one pattern source string, no
# lookaround, runs identically on Java regex (Spark codegen) and RE2;
# [^>]* never crosses the tag's closing '>', so rel and href must live in
# the SAME <link> tag.  rel is an HTML space-separated token list: the
# quoted alternate accepts `canonical` as any \b-bounded token inside the
# quotes (e.g. rel="alternate canonical"); the unquoted alternate accepts
# only the bare single token (an unquoted HTML attribute value ends at
# whitespace), which is what keeps `rel=stylesheet href=canonical.css`
# from matching.  href values stop at quote/whitespace/'>'.
_REL_CANON = r"""\brel\s*=\s*(?:["'][^"'>]*\bcanonical\b|canonical\b)"""
_HREF_CAPTURE = r"""\bhref\s*=\s*["']?([^"'\s>]+)"""
CANONICAL_A_PATTERN = (r"(?i)<link\b[^>]*" + _REL_CANON + r"[^>]*"
                       + _HREF_CAPTURE)
CANONICAL_B_PATTERN = (r"(?i)<link\b[^>]*" + _HREF_CAPTURE
                       + r"""["']?[^>]*""" + _REL_CANON)


def canonical_href(html_col) -> "F.Column":
    """href of the page's first rel=canonical <link>, '' when absent.
    Two codegen regexp_extract passes (rel-before-href and href-before-
    rel) coalesced — attribute order, quoting style, case, token-list
    rel values, and extra attributes between rel and href all resolve to
    the same extracted target."""
    h = F.col(html_col).cast("string")
    a = F.regexp_extract(h, CANONICAL_A_PATTERN, 1)
    b = F.regexp_extract(h, CANONICAL_B_PATTERN, 1)
    return F.when(a != "", a).otherwise(b)


# ---------------------------------------------------------------------------
# Publication-date extraction (htmldate-core priority cascade)
# ---------------------------------------------------------------------------
# Public heuristics: htmldate (Barbaresi, JOSS 2020) / trafilatura extract a
# page's publication date from, in priority order, structured metadata
# (OpenGraph <meta property="article:published_time">), the HTML5 <time
# datetime=...> element, and date-shaped URL path segments (/YYYY/MM/DD/).
# This is the context-free core of that cascade — the signal training-data
# pipelines use for temporal filtering (knowledge-cutoff curation) and
# freshness weighting.  Same regexp discipline as the canonical-link
# extractor: one pattern source string, no lookaround (Java regex and RE2
# portable), [^>]* never crosses a tag's closing '>' so attributes cannot
# leak between tags, and month/day are range-bounded so 2024-13-40 never
# parses as a date.  The meta patterns require the content VALUE to start
# with the date, so a description that merely mentions a date (or the
# property name) cannot match.
_DATE_CAPTURE = r"(\d{4}-(?:0[1-9]|1[0-2])-(?:0[1-9]|[12]\d|3[01]))"
_PROP_PUBTIME = r"""\bproperty\s*=\s*["']?article:published_time\b"""
PUBDATE_META_A_PATTERN = (r"(?i)<meta\b[^>]*" + _PROP_PUBTIME
                          + r"""[^>]*\bcontent\s*=\s*["']?""" + _DATE_CAPTURE)
PUBDATE_META_B_PATTERN = (r"(?i)<meta\b[^>]*\bcontent\s*=\s*["
                          r"\"']?" + _DATE_CAPTURE + r"[^>]*" + _PROP_PUBTIME)
PUBDATE_TIME_PATTERN = (r"(?i)<time\b[^>]*\bdatetime\s*=\s*["
                        r"\"']?" + _DATE_CAPTURE)
URL_DATE_PATTERN = (r"/((?:19|20)\d{2})/(0[1-9]|1[0-2])/"
                    r"(0[1-9]|[12]\d|3[01])(?:/|$)")


def published_date(html_col, url_col) -> "F.Column":
    """struct(source, date) of the page's publication date: source in
    ('meta', 'time', 'url', 'none'), date as 'yyyy-MM-dd' ('' when none).
    Four codegen regexp_extract passes over the page plus three over the
    url — meta (both attribute orders coalesced) beats <time datetime>
    beats the URL path, htmldate's extraction order."""
    h = F.col(html_col).cast("string")
    ma = F.regexp_extract(h, PUBDATE_META_A_PATTERN, 1)
    mb = F.regexp_extract(h, PUBDATE_META_B_PATTERN, 1)
    meta = F.when(ma != "", ma).otherwise(mb)
    t = F.regexp_extract(h, PUBDATE_TIME_PATTERN, 1)
    u = F.col(url_col).cast("string")
    uy = F.regexp_extract(u, URL_DATE_PATTERN, 1)
    um = F.regexp_extract(u, URL_DATE_PATTERN, 2)
    ud = F.regexp_extract(u, URL_DATE_PATTERN, 3)
    udate = F.when(uy != "", F.concat_ws("-", uy, um, ud)).otherwise(F.lit(""))
    source = (F.when(meta != "", F.lit("meta"))
              .when(t != "", F.lit("time"))
              .when(udate != "", F.lit("url"))
              .otherwise(F.lit("none")))
    date = (F.when(meta != "", meta).when(t != "", t).otherwise(udate))
    return F.struct(source.alias("source"), date.alias("date"))


# ---------------------------------------------------------------------------
# hreflang alternate extraction (reciprocal translation-pair mining)
# ---------------------------------------------------------------------------
# Public semantics: the hreflang annotation (<link rel="alternate"
# hreflang="xx" href=...>, Google's multilingual-site spec / RFC 8288 web
# linking) declares a page's translations; search engines only honor
# RECIPROCAL declarations (A lists B and B lists A), and parallel-corpus
# miners (e.g. ParaCrawl's candidate stage) use the same confirmed pairs as
# high-precision bitext document alignment.  Extraction discipline as the
# other tag extractors: full <link ...> tags are isolated first (so [^>]*
# can never leak attributes across tags), then per-tag codegen
# regexp_extract pulls hreflang and href; a BCP 47 primary subtag is 2 OR 3
# letters ("fr" ISO 639-1, "fil"/"haw" ISO 639-2/3) — the (?![A-Za-z])
# lookahead rejects longer runs outright instead of silently truncating
# them to a different language, and hreflang="x-default" (the fallback
# pointer, not a language) still never extracts because 'x-' fails the
# two-letter minimum.
LINK_TAG_PATTERN = r"(?i)(<link\b[^>]*>)"
_REL_ALTERNATE = r"""\brel\s*=\s*(?:["'][^"'>]*\balternate\b|alternate\b)"""
HREFLANG_CODE_PATTERN = (r"(?i)\bhreflang\s*=\s*["
                         r"\"']?([A-Za-z]{2,3}(?![A-Za-z])"
                         r"(?:-[A-Za-z0-9]{2,8})?)")


def hreflang_alternates(df, html_col: str = "html", url_col: str = "url"):
    """(src_url, dst_lang, dst_url) per declared alternate — one row per
    <link rel=alternate hreflang=..> tag, self-references dropped.  Scale
    shape: regexp_extract_all isolates the page's <link> tags, posexplode
    emits O(tags) short rows, three codegen regexp passes per tag; no
    shuffle — the caller's reciprocity join is the first exchange."""
    tags = (df.select(
        F.col(url_col).alias("src_url"),
        F.posexplode(F.regexp_extract_all(
            F.col(html_col).cast("string"),
            F.lit(LINK_TAG_PATTERN), 1)).alias("pos", "tag")))
    is_alt = F.regexp_count(F.col("tag"),
                            F.lit(r"(?i)" + _REL_ALTERNATE)) > 0
    lang = F.regexp_extract(F.col("tag"), HREFLANG_CODE_PATTERN, 1)
    href = F.regexp_extract(
        F.col("tag"), r"""(?i)\bhref\s*=\s*["']?([^"'\s>]+)""", 1)
    return (tags.where(is_alt)
            .select("src_url", F.lower(lang).alias("dst_lang"),
                    href.alias("dst_url"))
            .where((F.col("dst_lang") != "") & (F.col("dst_url") != "")
                   & (F.col("dst_url") != F.col("src_url"))))


def reciprocal_hreflang_pairs(df, html_col: str = "html",
                              url_col: str = "url"):
    """Confirmed translation document pairs (lang_a, lang_b, url_a,
    url_b), url_a < url_b: the alternates where A declares B AND B
    declares A — the reciprocity rule that makes hreflang a
    high-precision bitext alignment signal (unconfirmed declarations are
    routinely stale or spam).  One equi-join on the (src, dst) url pair
    + one dedup shuffle; both sides are the same O(#declarations) frame
    of short url/lang strings."""
    d = hreflang_alternates(df, html_col, url_col)
    rev = (d.select(F.col("src_url").alias("r_src"),
                    F.col("dst_lang").alias("r_lang"),
                    F.col("dst_url").alias("r_dst")))
    conf = d.join(rev, (d.src_url == rev.r_dst) & (d.dst_url == rev.r_src))
    a_first = F.col("src_url") < F.col("dst_url")
    return (conf.select(
        F.when(a_first, F.col("r_lang")).otherwise(F.col("dst_lang"))
         .alias("lang_a"),
        F.when(a_first, F.col("dst_lang")).otherwise(F.col("r_lang"))
         .alias("lang_b"),
        F.least("src_url", "dst_url").alias("url_a"),
        F.greatest("src_url", "dst_url").alias("url_b"))
        .dropDuplicates())


# ---------------------------------------------------------------------------
# meta-refresh redirect extraction
# ---------------------------------------------------------------------------
# The client-side redirect (<meta http-equiv="refresh" content="N;url=...">,
# WHATWG HTML §pragma directives) — crawls index the source url but the
# content lives at the target, so pipelines resolve these chains before
# url-level dedup.  A timed reload (content="30" with no url=) is NOT a
# redirect and must not extract; both attribute orders are accepted
# (coalesced passes, the canonical-link discipline); [^>]* keeps matching
# inside one tag.
_REFRESH_URL = r"""\bcontent\s*=\s*["']?\d+\s*;\s*url\s*=\s*([^"'\s>]+)"""
_HTTP_EQUIV_REFRESH = r"""\bhttp-equiv\s*=\s*["']?refresh\b"""
META_REFRESH_A_PATTERN = (r"(?i)<meta\b[^>]*" + _HTTP_EQUIV_REFRESH
                          + r"[^>]*" + _REFRESH_URL)
META_REFRESH_B_PATTERN = (r"(?i)<meta\b[^>]*" + _REFRESH_URL
                          + r"[^>]*" + _HTTP_EQUIV_REFRESH)


def meta_refresh_target(html_col) -> "F.Column":
    """Redirect target of the page's meta-refresh pragma, '' when the
    page has none (or only a timed reload)."""
    h = F.col(html_col).cast("string")
    a = F.regexp_extract(h, META_REFRESH_A_PATTERN, 1)
    b = F.regexp_extract(h, META_REFRESH_B_PATTERN, 1)
    return F.when(a != "", a).otherwise(b)


# ---------------------------------------------------------------------------
# JSON-LD structured-data type extraction (schema.org census)
# ---------------------------------------------------------------------------
# Public semantics: schema.org markup ships in <script
# type="application/ld+json"> blocks; the Web Data Commons extraction and
# doctype-targeted corpus builds (keep NewsArticle/Recipe/QAPage, drop
# Product listings) census the "@type" values.  Blocks are isolated FIRST
# — only content inside an ld+json script can contribute, so a plain
# <script> (or prose) that merely mentions "@type" never matches.  Both
# JSON spellings extract: the scalar form ("@type": "NewsArticle") and
# the array form ("@type": ["Product", "Offer"]); the scalar pattern
# requires a quote right after the colon, so an array is never
# double-counted by the scalar pass.
JSONLD_BLOCK_PATTERN = (r"(?is)<script\b[^>]*\btype\s*=\s*["
                        r"\"']?application/ld\+json\b[^>]*>(.*?)</script>")
JSONLD_TYPE_SCALAR_PATTERN = r'"@type"\s*:\s*"([A-Za-z][A-Za-z0-9]*)"'
JSONLD_TYPE_ARRAY_PATTERN = r'"@type"\s*:\s*\[([^\]]*)\]'
_QUOTED_TOKEN = r'"([A-Za-z][A-Za-z0-9]*)"'


def jsonld_type_counts(df, html_col: str = "html", id_col: str = "doc_id"):
    """(id, sd_type, n) — occurrences of each schema.org @type in the
    page's ld+json blocks.  Scale shape: map-only codegen
    regexp_extract_all + two explode paths (scalar and array spellings)
    unioned, then ONE map-side-combining groupBy; rows after the scan
    are (id, short-token) pairs."""
    blocks = (df.select(
        F.col(id_col),
        F.explode(F.regexp_extract_all(
            F.col(html_col).cast("string"),
            F.lit(JSONLD_BLOCK_PATTERN), 1)).alias("block")))
    scalar = blocks.select(
        id_col,
        F.explode(F.regexp_extract_all(
            "block", F.lit(JSONLD_TYPE_SCALAR_PATTERN), 1)).alias("sd_type"))
    arrays = (blocks.select(
        id_col,
        F.explode(F.regexp_extract_all(
            "block", F.lit(JSONLD_TYPE_ARRAY_PATTERN), 1)).alias("arr"))
        .select(id_col,
                F.explode(F.regexp_extract_all(
                    "arr", F.lit(_QUOTED_TOKEN), 1)).alias("sd_type")))
    return (scalar.unionByName(arrays)
            .groupBy(id_col, "sd_type")
            .agg(F.count(F.lit(1)).alias("n")))


# ---------------------------------------------------------------------------
# soft-404 detection (error template served with HTTP 200)
# ---------------------------------------------------------------------------
# Public heuristics: Bar-Yossef, Broder, Kumar & Tomkins, "Sic transit
# gloria telae" (WWW'04) established that a large fraction of dead pages
# answer 200 with an error template; context-free detectors key on error
# phrases in the page's title/h1 plus near-empty main content, and the
# classic false positive — an ARTICLE about 404 errors — is excluded by
# the content-length arm.  Both signals are codegen: one extraction pass
# for title and h1, one lower-cased phrase scan, one body tag-strip for
# the content length.
TITLE_PATTERN = r"(?is)<title[^>]*>([^<]*)</title>"
H1_PATTERN = r"(?is)<h1[^>]*>([^<]*)</h1>"
BODY_PATTERN = r"(?is)<body[^>]*>(.*)</body>"
SOFT404_PHRASE_PATTERN = (r"(?:page not found|not found|404|"
                          r"no longer available|cannot be found|"
                          r"doesn't exist|does not exist)")
#: below this many visible body characters an error-phrased page is an
#: error TEMPLATE, above it an article ABOUT errors.
SOFT404_MIN_CONTENT_CHARS = 200


def soft404_signals(html_col) -> "F.Column":
    """struct(has_error_phrase, n_content_chars, is_soft404) — the
    context-free soft-404 verdict."""
    h = F.col(html_col).cast("string")
    head_txt = F.lower(F.concat_ws(
        " ", F.regexp_extract(h, TITLE_PATTERN, 1),
        F.regexp_extract(h, H1_PATTERN, 1)))
    phrase = F.regexp_count(head_txt, F.lit(SOFT404_PHRASE_PATTERN)) > 0
    body = F.regexp_extract(h, BODY_PATTERN, 1)
    n_chars = F.length(F.regexp_replace(body, r"<[^>]*>", "")).cast("long")
    return F.struct(
        phrase.alias("has_error_phrase"),
        n_chars.alias("n_content_chars"),
        (phrase & (n_chars < SOFT404_MIN_CONTENT_CHARS))
        .alias("is_soft404"))


# ---------------------------------------------------------------------------
# XML sitemap parsing (sitemaps.org protocol)
# ---------------------------------------------------------------------------
# Public format: the sitemaps.org 0.9 protocol — a <urlset> of <url>
# entries (loc + optional lastmod/changefreq/priority) or a
# <sitemapindex> of <sitemap> children — is the crawl-frontier seed
# format.  Entry blocks are isolated first (the jsonld discipline) so a
# <loc> can never pair with another entry's <lastmod>; a page that is
# neither document kind yields no rows.
SITEMAP_URL_BLOCK_PATTERN = r"(?is)<url\s*>(.*?)</url\s*>"
SITEMAP_CHILD_BLOCK_PATTERN = r"(?is)<sitemap\s*>(.*?)</sitemap\s*>"
SITEMAP_LOC_PATTERN = r"(?is)<loc\s*>\s*([^<\s][^<]*?)\s*</loc\s*>"
SITEMAP_LASTMOD_PATTERN = r"(?is)<lastmod\s*>\s*([^<\s][^<]*?)\s*</lastmod\s*>"


def sitemap_entries(df, html_col: str = "html", id_col: str = "doc_id"):
    """(id, kind, loc, lastmod) per sitemap entry: kind in ('urlset',
    'sitemapindex'), lastmod '' when the entry omits it.  Scale shape:
    map-only codegen regexp_extract_all per kind, explode of O(entries)
    short blocks, two regexp passes per block, no shuffle."""
    h = F.col(html_col).cast("string")

    def entries(block_pattern, kind):
        return (df.select(
            F.col(id_col),
            F.explode(F.regexp_extract_all(
                h, F.lit(block_pattern), 1)).alias("entry"))
            .select(id_col, F.lit(kind).alias("kind"),
                    F.regexp_extract("entry", SITEMAP_LOC_PATTERN, 1)
                    .alias("loc"),
                    F.regexp_extract("entry", SITEMAP_LASTMOD_PATTERN, 1)
                    .alias("lastmod"))
            .where(F.col("loc") != ""))

    urlset = entries(SITEMAP_URL_BLOCK_PATTERN, "urlset")
    index = entries(SITEMAP_CHILD_BLOCK_PATTERN, "sitemapindex")
    return urlset.unionByName(index)


# ---------------------------------------------------------------------------
# Main-content extraction (jusText-core, context-free block classification)
# ---------------------------------------------------------------------------
# Public heuristics: jusText (Pomikálek, "Removing boilerplate and
# duplicate content from web corpora", PhD thesis 2011) classifies
# block-level segments by link density + length (+ stopword density and a
# context pass); Readability/trafilatura use the same two core signals.
# This is the context-free core: a block is boilerplate when its anchor-
# text share exceeds `max_link_pm` per-mille or its text is shorter than
# `min_chars`.  Everything is codegen regexp — no Python on the page side.

# block boundary = the closing tag of a block-level element
BLOCK_END_PATTERN = r"(?i)</(?:p|div|nav|li|td|tr|table|ul|ol|section|article|aside|header|footer|h[1-6])>"
# one anchor element including its text (no newlines survive in html here,
# but (?s) keeps the pattern total on raw multi-line documents)
ANCHOR_ELEM_PATTERN = r"(?is)<a[^A-Za-z0-9_>][^>]*>.*?</a>|(?is)<a>.*?</a>"


def block_plain_text(col: "F.Column") -> "F.Column":
    """Visible text of one html block: tags become spaces, space runs
    collapse, edges trim — the block-local analogue of extract_text's
    pass 3+5 (single-block, so line structure is irrelevant)."""
    return F.trim(F.regexp_replace(
        F.regexp_replace(col, r"<[^>]*>", " "), " +", " "))


def main_content_blocks(df, html_col: str = "html", id_col: str = "doc_id",
                        *, min_chars: int = 20, max_link_pm: int = 333):
    """Per non-empty block: (id, pos, btxt, n_chars, anchor_chars,
    link_pm, boiler).  anchor_chars is measured subtractively — visible
    length minus visible length with anchor elements blanked — so the
    whitespace an anchor contributes counts as anchor mass.

    Scale shape: one posexplode over the codegen split (O(blocks) rows
    carrying only block text), three regexp passes per block, integer
    per-mille arithmetic; the only shuffle is whatever the caller
    aggregates afterwards."""
    b = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(html_col), BLOCK_END_PATTERN))
         .alias("pos", "block"))
    txt = block_plain_text(F.col("block"))
    noanchor = block_plain_text(
        F.regexp_replace(F.col("block"), ANCHOR_ELEM_PATTERN, " "))
    d = (b.select(id_col, "pos", txt.alias("btxt"),
                  F.length(txt).cast("long").alias("n_chars"),
                  (F.length(txt) - F.length(noanchor)).cast("long")
                  .alias("anchor_chars"))
          .where(F.col("n_chars") > 0))
    d = d.withColumn("link_pm",
                     F.expr("(1000 * anchor_chars) div n_chars"))
    return d.withColumn(
        "boiler", (F.col("link_pm") > max_link_pm) |
                  (F.col("n_chars") < min_chars))


def extract_main_content(df, html_col: str = "html",
                         id_col: str = "doc_id", *, min_chars: int = 20,
                         max_link_pm: int = 333):
    """Per doc: (id, n_blocks, n_boiler, kept_chars, content) where
    content is the space-joined text of the good blocks in document
    order.  Docs whose html yields zero non-empty blocks produce no
    row.  One map-side-combinable groupBy on the id."""
    blocks = main_content_blocks(df, html_col, id_col,
                                 min_chars=min_chars,
                                 max_link_pm=max_link_pm)
    kept = F.array_sort(F.collect_list(
        F.when(~F.col("boiler"), F.struct(F.col("pos"), F.col("btxt")))))
    return (blocks.groupBy(id_col).agg(
        F.count("*").alias("n_blocks"),
        F.sum(F.col("boiler").cast("long")).alias("n_boiler"),
        F.sum(F.when(~F.col("boiler"), F.col("n_chars"))
               .otherwise(F.lit(0))).alias("kept_chars"),
        F.concat_ws(" ", kept["btxt"]).alias("content")))
