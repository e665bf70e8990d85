"""Deterministic distributed k-means (Lloyd) over an embedding column —
the topic-bucketing primitive a pretraining mixture pipeline runs before
per-cluster sampling/temperature weighting (and the clustering stage of
SemDeDup-style pipelines, Abbas et al. 2023).

Why integer-rational arithmetic: a distributed float k-means is not
reproducible — the update step's mean is a shuffled float sum whose
value depends on partitioning and reduce order, so two runs (or two
engines) can flip an assignment near a Voronoi boundary and diverge from
there.  Here every quantity the decision depends on is EXACT:

  - embeddings are quantized ONCE to an integer grid
    (`round(v * scale)` half-away-from-zero on the float64 product —
    bit-identical in numpy, Spark, and DuckDB);
  - a centroid is the exact rational (s, c) = (sum of member vectors,
    member count), never a divided mean;
  - squared distance to centroid i is compared as num_i / c_i^2 with
    num_i = c_i^2*||x||^2 - 2*c_i*(x . s_i) + ||s_i||^2, an exact int64;
    num_i < 2^53 (asserted), so the int->double conversion and the ONE
    division are exactly rounded — identical across engines, runs, and
    partitionings;
  - argmin tie-breaks on lowest centroid id; initial centroids are the
    k smallest ids' vectors.

The whole trajectory is therefore a pure function of the input set, and
the DuckDB oracle replays every iteration in unrolled MATERIALIZED CTEs
(entry_queries._sql_kmeans_topics).

Scale shape (100 TB): assignment is ONE broadcast-centroid Arrow matmul
pass per iteration (O(n*k*d) int64, batch-blocked by Arrow); the update
is a single map-side-combinable groupBy over (cluster, dim) emitting
k*d rows; per-iteration driver traffic is the k*(d+1)-int centroid
state — the global state every distributed Lloyd implementation
synchronizes (same argument as the BPE trainer's argmax row,
operators/bpe.py).  Iterations re-run over the persisted quantized
frame, so lineage never grows.  Overflow headroom is asserted from the
corpus's own max ||q||^2; at cluster counts where c^2*||x||^2 would
leave int64 (~10^5+ members at the default grid), switch the comparison
to the exactly-rounded divided-mean double (deterministic given the
same integer state — still run-reproducible, just not SQL-replayable;
the gate keeps the exact form because it is value-checkable).

Reference analogue: the reference synchronizes per-iteration global
state through the driver in its radius-loop jobs
(Naive-DLSH/src/main/java/ndlsh/LSHSearcher.java:212-252); the centroid
state here plays that role for the clustering loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["quantize_embeddings", "kmeans_topics"]

_ASSIGN_SCHEMA = T.StructType([
    T.StructField("cluster_id", T.LongType()),
    T.StructField("d2_num", T.LongType()),
    T.StructField("d2_den", T.LongType()),
])


def _quant_udf(scale: int):
    """embedding array<float> -> array<long>: round(v*scale) with
    half-away-from-zero ties (== Spark/DuckDB `round`; np.rint would be
    half-to-even).  The product is computed in float64 on every engine,
    so the grid is bit-identical."""

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _q(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        m = np.asarray(list(vecs), dtype=np.float64) * scale
        q = (np.floor(np.abs(m) + 0.5) * np.sign(m)).astype(np.int64)
        return pd.Series(list(q))

    return _q


def quantize_embeddings(df: DataFrame, vec_col: str = "embedding",
                        id_col: str = "vec_id",
                        scale: int = 1000) -> DataFrame:
    """(id, embedding) -> (vec_id, q: array<long>) on the integer grid."""
    return df.select(F.col(id_col).alias("vec_id"),
                     _quant_udf(scale)(F.col(vec_col)).alias("q"))


@F.pandas_udf(T.LongType())
def _sqnorm_udf(qs: pd.Series) -> pd.Series:
    """array<long> -> ||q||^2 (vectorized; avoids an interpreted
    `aggregate` HOF on the corpus scan)."""
    if len(qs) == 0:
        return pd.Series([], dtype="int64")
    Q = np.asarray(list(qs), dtype=np.int64)
    return pd.Series((Q * Q).sum(axis=1))


def _assign_udf(S: np.ndarray, c: np.ndarray):
    """q array<long> -> (cluster_id, d2_num, d2_den) against the
    broadcast centroid state (S: (k,d) int64 sums, c: (k,) int64
    counts).  One int64 matmul per Arrow batch; exact arithmetic."""
    ss = (S * S).sum(axis=1)
    cc = c * c

    @F.pandas_udf(_ASSIGN_SCHEMA)
    def _a(qs: pd.Series) -> pd.DataFrame:
        if len(qs) == 0:
            return pd.DataFrame({"cluster_id": pd.Series([], dtype="int64"),
                                 "d2_num": pd.Series([], dtype="int64"),
                                 "d2_den": pd.Series([], dtype="int64")})
        Q = np.asarray(list(qs), dtype=np.int64)              # (n, d)
        xx = (Q * Q).sum(axis=1)                              # (n,)
        dots = Q @ S.T                                        # (n, k)
        num = cc[None, :] * xx[:, None] - 2 * (c[None, :] * dots) + ss[None, :]
        d = num / cc[None, :]          # exactly-rounded float64 per cell
        cid = np.argmin(d, axis=1)     # ties -> lowest centroid id
        rows = np.arange(len(Q))
        return pd.DataFrame({"cluster_id": cid.astype(np.int64),
                             "d2_num": num[rows, cid],
                             "d2_den": cc[cid]})

    return _a


def kmeans_topics(emb_df: DataFrame, k: int = 8, iters: int = 3,
                  scale: int = 1000, vec_col: str = "embedding",
                  id_col: str = "vec_id") -> DataFrame:
    """Run `iters` exact Lloyd iterations; return the final assignment
    frame (vec_id, cluster_id, d2_num, d2_den), deterministic under any
    partitioning.  cluster_id is the rank of the seed vector's vec_id
    among the k smallest."""
    if k < 1 or iters < 1:
        raise ValueError("k and iters must be >= 1")
    q_df = quantize_embeddings(emb_df, vec_col, id_col, scale).persist()

    seeds = q_df.orderBy("vec_id").limit(k).collect()
    if len(seeds) < k:
        raise ValueError(f"corpus has {len(seeds)} vectors < k={k}")
    dim = len(seeds[0].q)
    S = np.array([r.q for r in seeds], dtype=np.int64)        # (k, d)
    c = np.ones(k, dtype=np.int64)

    # overflow headroom: ||s||^2 <= c^2*max||q||^2 (Cauchy-Schwarz) and
    # |2c(x.s)| <= 2c^2*max||q||^2, so num <= 4*c^2*max||q||^2 — assert
    # c^2*xx_max < 2^51 to keep every term and their sum under 2^53
    xx_max = int(q_df.select(F.max(_sqnorm_udf(F.col("q"))).alias("m"))
                     .first()["m"])

    assigned = None
    for t in range(iters):
        if int(c.max()) ** 2 * xx_max >= 2 ** 51:
            raise OverflowError(
                "exact k-means numerator would exceed 2^53; use the "
                "divided-mean double comparison for clusters this large "
                "(see module docstring)")
        assigned = q_df.select("vec_id", "q",
                               _assign_udf(S, c)("q").alias("a"))
        if t == iters - 1:
            break
        upd = (assigned.select(F.col("a.cluster_id").alias("cid"),
                               F.posexplode("q").alias("pos", "v"))
                       .groupBy("cid", "pos")
                       .agg(F.sum("v").alias("s"),
                            F.count(F.lit(1)).alias("n"))
                       .collect())                            # k*d rows
        S2, c2 = S.copy(), c.copy()   # empty cluster keeps its centroid
        seen = set()
        for row in upd:
            S2[row.cid, row.pos] = row.s
            if row.cid not in seen:
                c2[row.cid] = row.n
                seen.add(row.cid)
        S, c = S2, c2
    return assigned.select("vec_id",
                           F.col("a.cluster_id").alias("cluster_id"),
                           F.col("a.d2_num").alias("d2_num"),
                           F.col("a.d2_den").alias("d2_den"))
