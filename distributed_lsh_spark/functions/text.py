"""Text normalization and k-shingling — pure JVM expressions.

The reference's equivalent stage is vector parsing
(MapReduce-LSH/.../lsh/builder/HashReducer.java:162-184): string -> point.
Here the "point" is a document's shingle set.  Everything in this module is
built-in `pyspark.sql.functions` / higher-order SQL functions, so it runs
inside whole-stage codegen with zero Python in the hot path, and the parquet
scan underneath keeps column pruning + predicate pushdown.

Normalization contract (must match the NumPy oracle AND the DuckDB oracle
SQL byte-for-byte):
    1. lowercase (ASCII semantics — corpus is ASCII by construction)
    2. every run of chars outside [a-z0-9] becomes a single space
    3. split on spaces, drop empties
    4. shingles = all `k`-grams of consecutive tokens joined by one space;
       a doc with fewer than k tokens yields ONE shingle = the whole token
       sequence (so short docs still participate)
    5. the shingle *set* (distinct), hashed as a rolling 64-bit polynomial
       (x FNV, wraparound) over crc32 token hashes, sorted signed ascending
       — see functions/signature.py and oracle/dedup.py for the spec
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Step 1-3 as a reusable SQL fragment.
_NORMALIZE_SQL = "filter(split(regexp_replace(lower({col}), '[^a-z0-9]+', ' '), ' '), t -> t != '')"

# Step 4: k-grams over the token array; `slice` is 1-based.
_SHINGLE_SQL = (
    "CASE WHEN size({toks}) < {k} THEN array(concat_ws(' ', {toks})) "
    "ELSE transform(sequence(1, size({toks}) - {k} + 1), "
    "i -> concat_ws(' ', slice({toks}, i, {k}))) END"
)

# FNV-ish rolling-poly constant shared with functions.signature / the oracle.
_FNV = 1099511628211


def normalized_tokens(col: str | Column) -> Column:
    """array<string> of normalized tokens (JVM, codegen)."""
    name = col if isinstance(col, str) else col._jc.toString()
    return F.expr(_NORMALIZE_SQL.format(col=name))


# Normalized token STREAM (tokens joined by single spaces) as a plain
# string expression — the lambda-free base of the scalar text queries and
# the line-level dedup family.  Token chars are exactly [a-z0-9].
TOK_STREAM_SQL = ("trim(BOTH ' ' FROM regexp_replace(lower({col}), "
                  "'[^a-z0-9]+', ' '))")

# One "line" = up to LINE_TOKENS consecutive normalized tokens.  The
# greedy regexp consumes tokens left-to-right LINE_TOKENS at a time, so
# the chunking is IDENTICAL to slicing the token array
# t[(i-1)*L+1 : (i-1)*L+L] (what the DuckDB oracles do) — but stays
# whole-stage-codegen, no interpreted HOF slicing.
LINE_TOKENS = 8
LINE_RX = "[^ ]+( [^ ]+){0,%d}" % (LINE_TOKENS - 1)


def token_stream(col: str | Column) -> Column:
    """string of normalized tokens joined by single spaces (JVM, codegen)."""
    name = col if isinstance(col, str) else col._jc.toString()
    return F.expr(TOK_STREAM_SQL.format(col=name))


def doc_lines(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """(id_col, pos, line, lk) — the corpus exploded into 8-token lines
    with their xxhash64 keys; shared by q_line_dedup and the streaming
    line-dedup twin so batch and stream chunk identically."""
    norm = token_stream(text_col)
    return (df.select(id_col,
                      F.posexplode(F.regexp_extract_all(norm, F.lit(LINE_RX), 0))
                       .alias("pos", "line"))
              .withColumn("lk", F.xxhash64("line")))


def shingle_strings(col: str, k: int) -> Column:
    """array<string> of word k-shingles of `col` (JVM)."""
    toks = _NORMALIZE_SQL.format(col=col)
    return F.expr(_SHINGLE_SQL.format(toks=toks, k=k))


def with_shingle_hashes(df: DataFrame, text_col: str = "text", k: int = 5,
                        out: str = "shingles") -> DataFrame:
    """Add `out`: sorted distinct array<long> shingle hashes — JVM
    reference path for the contract implemented fast in
    functions.signature (tok_h = crc32(utf8), rolling poly x FNV with
    64-bit wraparound; Java long overflow == numpy uint64 wraparound, so
    the two agree bit-for-bit — tests pin this).

    Spark's higher-order array functions evaluate interpreted (no
    codegen), so this path is ~10-30x slower than with_signatures; it
    exists for cross-validation and small inputs.

    The array is BOTH the MinHash input and the exact-verification
    payload: exact Jaccard = |array_intersect| / |array_union|, JVM-side
    (SURVEY.md P4/F1: the reference's exact L2 check,
    MapReduce-LSH/.../common/LSHTool.java:184-192, becomes exact Jaccard).

    Tokens/token-hashes are materialized into temp columns first:
    inlining the tokenizer SQL makes Catalyst re-evaluate the regexp+split
    per reference (~20x slowdown measured at sf0.1).
    """
    toks = _NORMALIZE_SQL.format(col=text_col)
    poly = (f"aggregate(slice(_tokh, i, {k}), CAST(0 AS BIGINT), "
            f"(acc, t) -> acc * {_FNV}L + t)")
    whole = f"aggregate(_tokh, CAST(0 AS BIGINT), (acc, t) -> acc * {_FNV}L + t)"
    return (
        df.withColumn("_toks", F.expr(toks))
          .withColumn("_tokh", F.expr(
              "transform(_toks, t -> crc32(encode(t, 'UTF-8')))"))
          .withColumn(out, F.expr(
              f"array_sort(array_distinct(CASE "
              f"WHEN size(_tokh) = 0 THEN array(CAST(0 AS BIGINT)) "
              f"WHEN size(_tokh) < {k} THEN array({whole}) "
              f"ELSE transform(sequence(1, size(_tokh) - {k} + 1), i -> {poly}) "
              f"END))"))
          .drop("_toks", "_tokh")
    )
