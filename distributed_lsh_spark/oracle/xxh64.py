"""Pure-Python XXH64 — bit-parity with Spark's `xxhash64` SQL function.

Implemented from the public xxHash specification
(github.com/Cyan4973/xxHash/blob/dev/doc/xxhash_spec.md); Spark's
`org.apache.spark.sql.catalyst.expressions.XxHash64` applies the same
algorithm to the UTF-8 bytes of a string (default seed 42), which a unit
test pins (tests/test_oracle.py).  Used so the NumPy dedup oracle assigns
the *same* shingle hashes / doc ids as the Spark plan.
"""

from __future__ import annotations

MASK64 = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK64


def _round(acc: int, x: int) -> int:
    acc = (acc + x * P2) & MASK64
    return (_rotl(acc, 31) * P1) & MASK64


def _merge_round(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * P1 + P4) & MASK64


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * P2) & MASK64
    h ^= h >> 29
    h = (h * P3) & MASK64
    h ^= h >> 32
    return h


def xxh64(data: bytes, seed: int = 42) -> int:
    """XXH64 of `data` -> unsigned 64-bit int."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & MASK64
        v2 = (seed + P2) & MASK64
        v3 = seed & MASK64
        v4 = (seed - P1) & MASK64
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i:i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8:i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16:i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24:i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & MASK64
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + P5) & MASK64
    h = (h + n) & MASK64
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i:i + 8], "little"))
        h = (_rotl(h, 27) * P1 + P4) & MASK64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], "little") * P1) & MASK64
        h = (_rotl(h, 23) * P2 + P3) & MASK64
        i += 4
    while i < n:
        h ^= (data[i] * P5) & MASK64
        h = (_rotl(h, 11) * P1) & MASK64
        i += 1
    return _fmix(h)


def xxh64_long(value: int, seed: int = 42) -> int:
    """XXH64 of one 64-bit little-endian word (Spark's hashLong path)."""
    h = (seed + P5 + 8) & MASK64
    h ^= _round(0, value & MASK64)
    h = (_rotl(h, 27) * P1 + P4) & MASK64
    return _fmix(h)


def _to_signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def spark_xxhash64_string(s: str, seed: int = 42) -> int:
    """Signed 64-bit result matching Spark's `xxhash64(string_col)`."""
    return _to_signed(xxh64(s.encode("utf-8"), seed))


def spark_xxhash64_long(value: int, seed: int = 42) -> int:
    """Signed result matching Spark's `xxhash64(bigint_col)`."""
    return _to_signed(xxh64_long(value & MASK64, seed))
