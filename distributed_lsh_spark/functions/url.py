"""URL canonicalization (RFC 3986 §6 syntax-based normalization plus the
tracking-parameter strip every web-dedup pipeline applies before its
per-URL tier).

A Common-Crawl corpus carries the same page under many spellings —
`HTTP://Ex.COM:80/a/../b?utm_source=x#frag` and `http://ex.com/b` are one
url — so keep-latest-per-url dedup (operators/funnel url tier,
streaming/stateful.stateful_url_latest) under-merges unless urls are
canonicalized first.  Normalizations applied, all from the RFC or from
published pipeline practice (C4/RefinedWeb strip fragments + tracking
params):

  1. scheme and host lowercased (§6.2.2.1)
  2. default ports dropped (http:80, https:443) (§6.2.3)
  3. percent-encodings of unreserved chars decoded; all other
     percent-escapes uppercased (§6.2.2.2)
  4. dot-segments removed from the path (§6.2.2.3 / §5.2.4)
  5. empty path -> "/" (§6.2.3)
  6. fragment dropped
  7. query: tracking params removed (utm_*, fbclid, gclid, msclkid,
     mc_eid), remaining pairs sorted by (key, value); empty query dropped

The scalar spec (`canonicalize_url`) is pure Python (stdlib only) so the
DuckDB gate oracle can state expected outputs independently; the Spark
surface is an Arrow-batched pandas UDF (`canonicalize_url_udf`) — string
parsing is genuinely per-row work, and the batch transfer keeps it off
the row-at-a-time Python path.  At 100 TB this is a map-only pass fused
into the ingest scan: no shuffle, no state.
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_DEFAULT_PORTS = {"http": "80", "https": "443"}
_TRACKING_EXACT = {"fbclid", "gclid", "msclkid", "mc_eid"}
_UNRESERVED = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~")
_PCT = re.compile(r"%([0-9A-Fa-f]{2})")


def _norm_pct(s: str) -> str:
    """§6.2.2.2: decode %XX of unreserved chars, uppercase the rest."""
    def sub(m: re.Match) -> str:
        ch = chr(int(m.group(1), 16))
        return ch if ch in _UNRESERVED else "%" + m.group(1).upper()
    return _PCT.sub(sub, s)


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4."""
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if len(out) > 1:
                out.pop()
            continue
        out.append(seg)
    # preserve a trailing slash implied by a final "." / ".."
    if path.endswith(("/.", "/..")) and (not out or out[-1] != ""):
        out.append("")
    return "/".join(out)


def _is_tracking(key: str) -> bool:
    return key.lower().startswith("utm_") or key.lower() in _TRACKING_EXACT


def canonicalize_url(url: str | None) -> str | None:
    """Scalar spec — the single source of truth the UDF and the gate
    oracle both defer to.  Non-http(s) or unparseable inputs pass through
    unchanged (canonicalization must never destroy a key)."""
    if url is None:
        return None
    try:
        parts = urlsplit(url.strip())
        # .hostname/.port parse lazily and THROW on bad ports / brackets
        # ("http://ex.com:80x/"), not at urlsplit — probe them inside the
        # guard so crawl garbage passes through instead of killing a task
        host = (parts.hostname or "").lower()
        port = parts.port
    except ValueError:
        return url
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        return url
    if not host:
        return url
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS[scheme]:
        netloc += ":" + str(port)
    if parts.username:
        cred = parts.username + (":" + parts.password if parts.password
                                 else "")
        netloc = cred + "@" + netloc
    path = _remove_dot_segments(_norm_pct(parts.path)) or "/"
    if not path.startswith("/"):
        path = "/" + path
    pairs = []
    for item in parts.query.split("&"):
        if not item:
            continue
        k, _, v = item.partition("=")
        if _is_tracking(_norm_pct(k)):
            continue
        pairs.append((_norm_pct(k), _norm_pct(v)))
    pairs.sort()
    query = "&".join(k + "=" + v if v else k for k, v in pairs)
    return (f"{scheme}://{netloc}{path}"
            + (f"?{query}" if query else ""))


@F.pandas_udf(T.StringType())
def canonicalize_url_udf(urls: pd.Series) -> pd.Series:
    return urls.map(canonicalize_url, na_action="ignore")


# ---------------------------------------------------------------------------
# SURT keys (Sort-friendly URI Reordering Transform)
# ---------------------------------------------------------------------------
# Public format: the web-archive lookup key used by CDX/CDXJ indexes
# (Internet Archive / OpenWayback / pywb): the whole url lowercases, the
# scheme drops, userinfo drops, host labels reverse comma-joined with a
# NON-DEFAULT port kept (':8080' survives, ':80' on http / ':443' on
# https drop — pywb/OpenWayback canonicalization), then ')' + path, with
# query parameters sorted so equivalent spellings collate together —
# 'http://u:p@www.Example.co.uk:8080/A?b=2&a=1' ->
# 'uk,co,example,www:8080)/a?a=1&b=2'.  Entirely codegen
# (regexp/split/reverse/array_join/sort_array) — no per-row Python;
# compose after `canonicalize_url_udf` when RFC 3986 normalization
# (dot-segments, percent-forms) is also wanted.

def surt_key(url_col) -> "F.Column":
    u = F.lower(F.col(url_col).cast("string"))
    scheme = F.regexp_extract(u, r"^([a-z][a-z0-9+.-]*)://", 1)
    auth = F.regexp_extract(u, r"^[a-z][a-z0-9+.-]*://([^/?#]*)", 1)
    # userinfo is everything through the last '@' of the authority (RFC
    # 3986 allows ':' inside it, so strip before splitting off the port)
    hostport = F.regexp_replace(auth, r"^.*@", "")
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    host = F.regexp_replace(hostport, r":[0-9]+$", "")
    default = ((port == "")
               | ((scheme == "http") & (port == "80"))
               | ((scheme == "https") & (port == "443")))
    path = F.regexp_extract(u, r"^[a-z][a-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    sorted_q = F.array_join(
        F.sort_array(F.split(query, "&")), "&")
    return F.concat(
        rev,
        F.when(default, F.lit(""))
         .otherwise(F.concat(F.lit(":"), port)),
        F.lit(")"),
        F.when(path == "", F.lit("/")).otherwise(path),
        F.when(query == "", F.lit(""))
         .otherwise(F.concat(F.lit("?"), sorted_q)))


__all__ = ["canonicalize_url", "canonicalize_url_udf", "surt_key"]
