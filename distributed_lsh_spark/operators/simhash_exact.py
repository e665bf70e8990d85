"""Exact all-pairs SimHash Hamming search via chunk-LSH.

Pigeonhole exactness: split the 64-bit fingerprint into
`hamming_threshold + 1` bit chunks; any pair within Hamming distance h
differs in at most h chunks, so it MATCHES on at least one chunk — the
chunk equi-join therefore has recall 1.0 (not approximate), and the exact
bit_count verification removes false candidates.  This is the reference's
AND/OR table structure (SURVEY.md P1/J2: L tables OR'ed,
MapReduce-LSH/.../common/LSH.java:117-131) instantiated with bit-slices as
the tables — but with a provable recall guarantee instead of a
probabilistic one.

The fingerprint here is the md5_h64-based SimHash over distinct word
k-grams (functions/md5hash.py) so the whole chain has a DuckDB oracle;
the internal pipeline's crc32-based SimHash (functions/signature.py) is
pinned by the NumPy oracle instead.

Scale: the chunk join is a standard band-style self-join (one shuffle on
(chunk_id, chunk_value)); 16-bit chunks give 65,536 buckets per chunk —
at web scale use the same hot-bucket cap as the MinHash bands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from distributed_lsh_spark.functions.md5hash import spark_h64
from distributed_lsh_spark.functions.text import _NORMALIZE_SQL, _SHINGLE_SQL


def simhash_md5(df: DataFrame, k: int = 5, text_col: str = "text") -> DataFrame:
    """-> (doc_id, simhash): 64-bit SimHash over the doc's DISTINCT word
    k-grams, gram hash = md5_h64(gram string).  Pure JVM: gram explode +
    one groupBy with 64 bit-sum aggregates + disjoint-bit reassembly."""
    toks = _NORMALIZE_SQL.format(col=text_col)
    grams = _SHINGLE_SQL.format(toks="_toks", k=k)
    g = (df.withColumn("_toks", F.expr(toks))
           .select("doc_id",
                   F.explode(F.expr(f"array_distinct({grams})")).alias("_g"))
           .withColumn("_h", F.expr(spark_h64("_g"))))
    bit_sums = [F.sum(F.expr(f"shiftright(_h, {j}) & 1")).alias(f"_b{j}")
                for j in range(64)]
    agg = g.groupBy("doc_id").agg(F.count("*").alias("_n"), *bit_sums)
    # majority bit j set iff 2*cnt_j > n; bits are disjoint so SUM == OR.
    # bit 63 contributes 1L<<63 == Long.MIN_VALUE; the remaining bits sum
    # to < 2^63, so the signed total never overflows.
    fp = " + ".join(
        f"(CASE WHEN 2 * _b{j} > _n THEN {1 << j if j < 63 else -(1 << 63)}L "
        f"ELSE 0L END)" for j in range(64))
    return agg.select("doc_id", F.expr(fp).alias("simhash"))


def simhash_dup_pairs(df: DataFrame, k: int = 5,
                      hamming_threshold: int = 3,
                      text_col: str = "text",
                      cap: int | None = None) -> DataFrame:
    """-> (id_a, id_b, hamming): ALL pairs with Hamming(simhash) <=
    hamming_threshold, found exactly via the chunk-LSH join (see module
    docstring).  `cap` bounds hot chunk buckets at scale (recall then
    degrades only inside capped buckets, mirroring hot_band_cap)."""
    n_chunks = hamming_threshold + 1
    fps = simhash_md5(df, k, text_col)
    # chunk widths as even as possible over 64 bits
    widths = [64 // n_chunks + (1 if i < 64 % n_chunks else 0)
              for i in range(n_chunks)]
    offs, o = [], 0
    for w in widths:
        offs.append(o)
        o += w
    chunk_expr = F.explode(F.array(*[
        F.struct(F.lit(i).alias("chunk_id"),
                 F.expr(f"shiftright(simhash, {offs[i]}) & {(1 << widths[i]) - 1}")
                  .alias("chunk_val"))
        for i in range(n_chunks)])).alias("c")
    chunks = (fps.select("doc_id", "simhash", chunk_expr)
                 .select("doc_id", "simhash",
                         F.col("c.chunk_id").alias("chunk_id"),
                         F.col("c.chunk_val").alias("chunk_val")))
    if cap is not None:
        w = Window.partitionBy("chunk_id", "chunk_val") \
                  .orderBy(F.xxhash64("chunk_id", "doc_id"), "doc_id")
        chunks = (chunks.withColumn("_rn", F.row_number().over(w))
                        .where(F.col("_rn") <= cap).drop("_rn"))
    a = chunks.select(F.col("doc_id").alias("id_a"),
                      F.col("simhash").alias("_fa"), "chunk_id", "chunk_val")
    b = chunks.select(F.col("doc_id").alias("id_b"),
                      F.col("simhash").alias("_fb"), "chunk_id", "chunk_val")
    ham = F.expr("bit_count(_fa ^ _fb)")
    return (a.join(b, ["chunk_id", "chunk_val"])
             .where(F.col("id_a") < F.col("id_b"))
             .where(ham <= hamming_threshold)
             .select("id_a", "id_b", ham.cast("long").alias("hamming"))
             .dropDuplicates(["id_a", "id_b"]))


# ---------------------------------------------------------------- oracle

def py_simhash_md5(text: str, k: int = 5) -> int:
    """Pure-Python mirror of simhash_md5 for parity tests."""
    import re

    from distributed_lsh_spark.functions.md5hash import py_md5_h64

    toks = [t for t in re.sub(r"[^a-z0-9]+", " ", text.lower()).split(" ") if t]
    if len(toks) < k:
        grams = {" ".join(toks)}
    else:
        grams = {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}
    hs = [py_md5_h64(g) for g in grams]
    n = len(hs)
    u = 0
    for j in range(64):
        cnt = sum((h >> j) & 1 for h in hs)
        if 2 * cnt > n:
            u |= 1 << j
    return u - (1 << 64) if u >= (1 << 63) else u


def oracle_simhash_pairs(docs: dict[int, str], k: int = 5,
                         hamming_threshold: int = 3) -> dict[tuple[int, int], int]:
    """Brute-force all-pairs (the chunk join must equal this EXACTLY)."""
    fps = {d: py_simhash_md5(t, k) for d, t in docs.items()}
    ids = sorted(docs)
    out = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = bin((fps[a] ^ fps[b]) & ((1 << 64) - 1)).count("1")
            if h <= hamming_threshold:
                out[(a, b)] = h
    return out
