"""c-k-ANN over integer vectors — the reference's native query, Spark-first.

Same semantics as oracle/reference_lsh.ann_search (radius expansion,
candidate cap, exact-distance verify, early finish), expressed as DataFrame
ops instead of the reference's hand-scheduled MapReduce jobs:

  reference                                Spark
  ---------                                -----
  per-(radius,table) BucketTable files     (point_id, table_id, bucket) DF
    (HashReducer.java:189-209)               per radius, from one pandas UDF
  distributed-cache query set (S4)         broadcast join of the tiny query DF
  bucket probe (J1/J2)                     equi-join on (table_id, bucket)
  checkedIndexSet (P6)                     accumulated (query_id, point_id)
                                             anti-join between radii
  searchThreshold cap (A4/T4)              row_number window <= threshold
  exact L2 + dist < c*R (P4/F1)            JVM zip_with/aggregate + filter
  driver radius loop w/ remaining set      Python for-loop, left_anti against
    (C2, LSHSearcher.java:212-252)           finished query ids, count() exit

The hash model/parameters come from the SAME NumPy code the oracle uses
(broadcast to executors inside the bucket pandas UDF) so bucket ids agree
bit-for-bit; tests assert engine == oracle exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from distributed_lsh_spark.oracle.reference_lsh import ReferenceLSHModel


def _bucket_udf(model: ReferenceLSHModel, radius: int):
    """pandas UDF: vec array<int> -> array<long> of L bucket ids (one per
    table).  The model rides the closure (small: L*m*dim doubles)."""

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _buckets(vecs: pd.Series) -> pd.Series:
        pts = np.asarray(list(vecs), dtype=np.int64)
        out = np.empty((len(pts), model.L), dtype=np.int64)
        for tid in range(model.L):
            out[:, tid] = model.bucket_ids(tid, radius, pts)
        return pd.Series(list(out))

    return _buckets


def _exploded_buckets(df: DataFrame, id_col: str, vec_col: str,
                      model: ReferenceLSHModel, radius: int) -> DataFrame:
    b = _bucket_udf(model, radius)
    return (df.select(F.col(id_col), F.posexplode(b(F.col(vec_col)))
                      .alias("table_id", "bucket")))


_L2 = ("sqrt(aggregate(zip_with(q_vec, p_vec, (a, b) -> "
       "CAST(a - b AS DOUBLE) * CAST(a - b AS DOUBLE)), "
       "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x))")


def build_hash_tables(points: DataFrame, model: ReferenceLSHModel) -> DataFrame:
    """The reference's `-b` build verb: persistable hash tables
    (point_id, radius_id, table_id, bucket) for EVERY radius — the
    DataFrame form of the per-(radius, table) BucketTable files the
    reference writes once and searches repeatedly
    (MapReduce-LSH/.../lsh/builder/HashTableBuilder.java:47-61, tables
    persisted at HashReducer.java:189-209).  Checkpoint via
    CheckpointManager and pass to ann_search_spark(tables=...) to skip the
    point-side bucket computation on every query invocation."""
    pts = points.select(F.col("id").alias("point_id"), F.col("vec").alias("p_vec"))
    per_radius = [
        _exploded_buckets(pts, "point_id", "p_vec", model, radius)
        .select("point_id", F.lit(rid).alias("radius_id"), "table_id", "bucket")
        for rid, radius in enumerate(model.radii())
    ]
    out = per_radius[0]
    for df in per_radius[1:]:
        out = out.unionByName(df)
    return out


def ann_search_spark(spark: SparkSession, points: DataFrame, queries: DataFrame,
                     model: ReferenceLSHModel, k: int,
                     tables: DataFrame | None = None) -> DataFrame:
    """points(id, vec array<int>), queries(query_id, vec) ->
    (query_id, point_id, dist, rank) — top-k per finished query.

    Unfinished queries (threshold never produced k accepted candidates in
    any radius) yield no rows, matching the reference's missing-query
    behavior (MapReduce-LSH/.../lsh/searcher/LSHSearcher.java:289-293).

    `tables`: a prebuilt/checkpointed build_hash_tables frame — the
    reference's -b/-s split; when given, the per-radius point buckets are
    read from it instead of recomputed.
    """
    search_threshold = model.prune_factor * model.L + k
    points = points.select(F.col("id").alias("point_id"), F.col("vec").alias("p_vec"))
    points.persist()
    queries = queries.select("query_id", F.col("vec").alias("q_vec"))
    queries.persist()

    remaining = queries
    checked = spark.createDataFrame([], "query_id long, point_id long")
    accepted = spark.createDataFrame([], "query_id long, point_id long, dist double")
    finished = spark.createDataFrame([], "query_id long")

    for rid, radius in enumerate(model.radii()):
        if remaining.isEmpty():
            break
        ratio_radius = model.ratio * radius

        if tables is not None:
            p_buckets = tables.where(F.col("radius_id") == rid) \
                              .select("point_id", "table_id", "bucket")
        else:
            p_buckets = _exploded_buckets(points, "point_id", "p_vec", model, radius)
        q_buckets = _exploded_buckets(remaining, "query_id", "q_vec", model, radius)
        # probe: tiny query side broadcast (S4/J1)
        cands = (p_buckets.join(F.broadcast(q_buckets), ["table_id", "bucket"])
                 .select("query_id", "point_id").dropDuplicates()
                 .join(checked, ["query_id", "point_id"], "left_anti"))
        # deterministic per-query cap (A4): lowest point ids first
        w = Window.partitionBy("query_id").orderBy("point_id")
        new = (cands.withColumn("_rn", F.row_number().over(w))
                    .where(F.col("_rn") <= search_threshold).drop("_rn"))
        new = new.localCheckpoint(eager=True)   # reused 3x below; truncates lineage
        checked = checked.union(new).localCheckpoint(eager=True)

        scored = (new.join(points, "point_id")
                     .join(F.broadcast(remaining), "query_id")
                     .withColumn("dist", F.expr(_L2))
                     .where(F.col("dist") < ratio_radius)
                     .select("query_id", "point_id", "dist"))
        accepted = accepted.union(scored).localCheckpoint(eager=True)

        done = (accepted.groupBy("query_id").agg(F.count("*").alias("n"))
                .where(F.col("n") >= k).select("query_id"))
        finished = finished.union(done.join(finished, "query_id", "left_anti")) \
                           .localCheckpoint(eager=True)
        remaining = queries.join(finished, "query_id", "left_anti")   # P5

    wk = Window.partitionBy("query_id").orderBy("dist", "point_id")
    out = (accepted.join(finished, "query_id", "left_semi")
           .withColumn("rank", F.row_number().over(wk))
           .where(F.col("rank") <= k))
    points.unpersist()
    queries.unpersist()
    return out.select("query_id", "point_id", "dist", "rank")
