"""md5_h64: the ONE 64-bit hash primitive all three engines can compute
identically (Spark JVM, DuckDB SQL, pure Python) — the first 8 bytes of
md5(utf8(s)) read big-endian as a signed 64-bit integer.

WHY: every driver-contract query needs a DuckDB-runnable oracle, and md5 is
the only hash primitive Spark, DuckDB, and hashlib share (Spark xxhash64 /
zlib crc32 / DuckDB hash() are all engine-private).  Queries whose SEMANTICS
are a hash chain (SimHash fingerprints, winnowed substring fingerprints)
use md5_h64 so the chain is reproducible end-to-end in ANSI-ish SQL.

The internal dedup pipeline keeps its faster crc32+FNV rolling hashes
(functions/signature.py) — those are pinned by the NumPy oracle instead.
"""

from __future__ import annotations

import hashlib


def spark_h64(s_expr: str) -> str:
    """Spark SQL fragment: md5_h64 of the string expression `s_expr`.

    Two 8-hex-char halves parsed with conv() (each < 2^32, fits BIGINT),
    recombined with shiftleft|or — Java long wrap gives the signed value.
    """
    m = f"md5(encode({s_expr}, 'UTF-8'))"
    return (f"(shiftleft(cast(conv(substr({m},1,8),16,10) as bigint), 32) | "
            f"cast(conv(substr({m},9,8),16,10) as bigint))")


def duck_h64(s_expr: str) -> str:
    """DuckDB SQL fragment: same value.  Hex halves parse via '0x' cast;
    recombined in HUGEINT then wrapped to the signed 64-bit range."""
    m = f"md5({s_expr})"
    hu = (f"(('0x'||substr({m},1,8))::BIGINT::HUGEINT * 4294967296 "
          f"+ ('0x'||substr({m},9,8))::BIGINT::HUGEINT)")
    return (f"(CASE WHEN {hu} >= 9223372036854775808::HUGEINT "
            f"THEN {hu} - 18446744073709551616::HUGEINT ELSE {hu} END)::BIGINT")


def duck_h64u(s_expr: str) -> str:
    """DuckDB SQL fragment: md5_h64 as the UNSIGNED HUGEINT value (the raw
    first-8-bytes big-endian integer) — used by chains that do modular
    arithmetic on the hash (substring rolling poly)."""
    m = f"md5({s_expr})"
    return (f"(('0x'||substr({m},1,8))::BIGINT::HUGEINT * 4294967296 "
            f"+ ('0x'||substr({m},9,8))::BIGINT::HUGEINT)")


def py_md5_h64(s: str) -> int:
    u = int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")
    return u - (1 << 64) if u >= (1 << 63) else u
