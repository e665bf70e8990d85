"""Distributed Bloom-filter build + vectorized membership test over an
int64 key column.

Used as an optional PREFILTER for the incremental snapshot probe
(`operators/snapshot.dedup_against_corpus(prefilter="bloom")`): the new
batch's band hashes are folded into a fixed-size bitmap, the huge corpus
band index is pruned map-side against it, and the surviving rows flow
into the exact band join + exact-Jaccard verify — so Bloom false
positives cost only wasted join probes, never a wrong result (no false
negatives by construction; the final output is bit-identical with the
prefilter on or off, which is what `tests/test_snapshot_prefilter.py`
pins).

Reference analogue: the reference probes query points against persisted
bucket tables (MapReduce-LSH/.../lsh/searcher/SearchMapper.java:268-311)
and relies on Hadoop's shuffle to rendezvous corpus and query keys; at
10^12 corpus documents that shuffle moves the WHOLE corpus index per
batch.  The bloom prefilter keeps the corpus index scan map-local: only
buckets that (probably) occur in the batch are shuffled at all.

Scale math (documented, and the reason this exists next to the broadcast
semi-join variant):

  * batch of 10^9 pages x ~9 surviving bands/doc ~= 9x10^9 distinct
    band hashes.  A broadcast HASH relation of 8-byte keys costs
    ~16 B/key in the JVM => ~150 GB: un-broadcastable.  A Bloom bitmap
    at 1% fpp costs ~9.6 bits/key => ~11 GB; at 10^8-key batches it is
    ~1.2 GB — broadcastable where the exact set is not.
  * the corpus side is pruned BEFORE its 16-B band rows enter the
    shuffle: the dominant cost of the monthly-snapshot probe drops from
    O(corpus bands) shuffled to O(corpus bands that collide with the
    batch) + a map-side bitmap test.
  * false-positive rate only inflates the pruned-side survivor count by
    fpp x (non-matching buckets); correctness is unaffected (inner band
    join drops them).

Build strategy: one numpy bitmap per partition (`mapInArrow`, Arrow in,
one binary row out), OR-reduced on the driver — #partitions rows of
m/8 bytes each, not a per-key shuffle.  At very large m, coalesce the
key frame first so the driver reduce sees tens of bitmaps, not
thousands (the helper takes the frame as-given; callers own the
partition count).  Membership is a broadcast-bitmap pandas UDF doing
k vectorized gather+mask passes — no per-row Python.

Hashing: Kirsch-Mitzenmacher double hashing (pos_i = h1 + i*h2 mod m,
"Less hashing, same performance", Kirsch & Mitzenmacher, ESA'06) with
h1/h2 derived from the key by two splitmix64 finalizer rounds (public
constants, Steele et al., OOPSLA'14) — pure uint64 numpy, identical on
build and probe side by construction.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType


def bloom_parameters(n_keys: int, fpp: float = 0.01) -> tuple[int, int]:
    """Optimal (n_bits, n_hashes) for `n_keys` keys at false-positive
    rate `fpp`:  m = -n ln p / (ln 2)^2,  k = m/n ln 2."""
    n_keys = max(1, n_keys)
    m = int(math.ceil(-n_keys * math.log(fpp) / (math.log(2) ** 2)))
    m = max(64, (m + 63) // 64 * 64)  # whole 64-bit words
    k = max(1, int(round(m / n_keys * math.log(2))))
    return m, k


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer over a uint64 array (vectorized)."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _positions(keys: np.ndarray, n_bits: int, n_hashes: int) -> np.ndarray:
    """(n_hashes, len(keys)) uint64 bit positions via double hashing."""
    with np.errstate(over="ignore"):
        h1 = _splitmix64(keys.astype(np.uint64))
        h2 = _splitmix64(h1) | np.uint64(1)  # odd stride
        i = np.arange(n_hashes, dtype=np.uint64)[:, None]
        return (h1[None, :] + i * h2[None, :]) % np.uint64(n_bits)


def build_bloom(df: DataFrame, col: str, n_bits: int,
                n_hashes: int) -> bytes:
    """Fold `df[col]` (int64) into an `n_bits`-bit Bloom bitmap.

    One local numpy bitmap per partition via mapInArrow, OR-reduced on
    the driver: the reduce moves #partitions * n_bits/8 bytes, never a
    per-key row.
    """
    n_bytes = n_bits // 8

    def _partition_bitmap(batches: Iterator[pa.RecordBatch]
                          ) -> Iterator[pa.RecordBatch]:
        bitmap = np.zeros(n_bytes, dtype=np.uint8)
        seen = False
        for batch in batches:
            keys = batch.column(0).to_numpy(zero_copy_only=False)
            if len(keys) == 0:
                continue
            seen = True
            pos = _positions(keys, n_bits, n_hashes).ravel()
            np.bitwise_or.at(bitmap, (pos >> np.uint64(3)).astype(np.int64),
                             np.left_shift(np.uint8(1),
                                           (pos & np.uint64(7)).astype(np.uint8)))
        if seen:
            yield pa.RecordBatch.from_arrays(
                [pa.array([bitmap.tobytes()], type=pa.binary())], ["bitmap"])

    rows = (df.select(F.col(col).cast("long").alias("k"))
              .mapInArrow(_partition_bitmap, "bitmap binary")
              .collect())
    out = np.zeros(n_bytes, dtype=np.uint8)
    for r in rows:
        out |= np.frombuffer(r["bitmap"], dtype=np.uint8)
    return out.tobytes()


def bloom_filter_col(df: DataFrame, col: str, bloom: bytes,
                     n_hashes: int) -> DataFrame:
    """Rows of `df` whose int64 `col` MIGHT be in the bloom (no false
    negatives).  The bitmap ships once per executor as a Spark broadcast;
    the test is k vectorized gathers per Arrow batch."""
    n_bits = len(bloom) * 8
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(bloom)

    @F.pandas_udf(BooleanType())
    def _might_contain(keys: pd.Series) -> pd.Series:
        bitmap = np.frombuffer(bc.value, dtype=np.uint8)
        arr = keys.to_numpy(dtype=np.int64, na_value=0)
        pos = _positions(arr, n_bits, n_hashes)
        hit = np.ones(len(arr), dtype=bool)
        for i in range(pos.shape[0]):
            p = pos[i]
            bits = (bitmap[(p >> np.uint64(3)).astype(np.int64)]
                    >> (p & np.uint64(7)).astype(np.uint8))
            hit &= (bits & np.uint8(1)).astype(bool)
        return pd.Series(hit)

    return df.where(_might_contain(F.col(col).cast("long")))
