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
  driver radius loop w/ remaining set      Python for-loop; per-query finish
    (C2, LSHSearcher.java:212-252)           state driver-side (one
                                             O(n_queries) counts collect per
                                             radius — the reference keeps the
                                             same bookkeeping on its driver);
                                             checked/accepted stay distributed

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


def _all_buckets_udf(model: ReferenceLSHModel):
    """pandas UDF: vec array<int> -> array<long> of n_radii * L bucket ids
    (radius-major).  The model rides the closure (small: L*m*dim doubles).
    ONE UDF pass covers every (radius, table) — the reference's hash-table
    build computes all radii in one job too (HashTableBuilder.java:47-61),
    and it keeps Python-worker round-trips out of the radius loop."""
    radii = model.radii()

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _buckets(vecs: pd.Series) -> pd.Series:
        pts = np.asarray(list(vecs), dtype=np.int64)
        out = np.empty((len(pts), len(radii) * model.L), dtype=np.int64)
        for rid, radius in enumerate(radii):
            for tid in range(model.L):
                out[:, rid * model.L + tid] = model.bucket_ids(tid, radius, pts)
        return pd.Series(list(out))

    return _buckets


def _exploded_buckets(df: DataFrame, id_col: str, vec_col: str,
                      model: ReferenceLSHModel) -> DataFrame:
    """-> (id, radius_id, table_id, bucket) for EVERY radius and table."""
    b = _all_buckets_udf(model)
    return (df.select(F.col(id_col), F.posexplode(b(F.col(vec_col)))
                      .alias("pos", "bucket"))
            .select(F.col(id_col),
                    (F.col("pos") / model.L).cast("int").alias("radius_id"),
                    (F.col("pos") % model.L).cast("int").alias("table_id"),
                    "bucket"))


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
    return _exploded_buckets(pts, "point_id", "p_vec", model)


def ann_accuracy(results: DataFrame, ground_truth: DataFrame, k: int,
                 n_queries: int) -> DataFrame:
    """The reference's evaluation metric (A5) as DataFrame ops: given
    ann_search_spark output (query_id, point_id, dist, rank) and
    ground_truth(query_id, true_dists array<double> ascending), return one
    row (avg_ratio, n_missing) — mean over FINISHED queries of
    mean_j(found_dist_j / true_dist_j), zero-distance neighbors counting
    ratio 1, plus the count of queries that never finished
    (MapReduce-LSH/.../lsh/searcher/LSHSearcher.java:283-316)."""
    per_query = (
        results.where(F.col("rank") <= k)
        .join(F.broadcast(ground_truth), "query_id")
        .withColumn("_true", F.expr("true_dists[rank - 1]"))
        .withColumn("_ratio", F.when(F.col("_true") > 0,
                                     F.col("dist") / F.col("_true"))
                               .otherwise(F.lit(1.0)))
        .groupBy("query_id")
        .agg(F.avg("_ratio").alias("q_ratio"), F.count("*").alias("_n"))
        .where(F.col("_n") >= k))
    return (per_query
            .agg(F.avg("q_ratio").alias("avg_ratio"),
                 F.count("*").alias("_fin"))
            .select("avg_ratio",
                    (F.lit(n_queries) - F.col("_fin")).alias("n_missing")))


def ann_search_spark_fused(spark: SparkSession, points: DataFrame,
                           queries: DataFrame, model: ReferenceLSHModel,
                           k: int, tables: DataFrame | None = None,
                           ) -> DataFrame:
    """The reference's MRLSH form (C1: radius loop INSIDE the job,
    MapReduce-LSH/.../lsh/searcher/SearchMapper.java:244-353) as ONE
    Spark plan: the Python for-loop below only BUILDS the unrolled
    per-radius candidate/cap/checked/accept/finish chain — exactly the
    CTE unrolling the DuckDB oracle uses — and triggers ZERO actions, so
    the whole search runs as ONE action (broadcast exchanges spawn their
    internal jobs, but there are no per-radius driver round-trips and no
    driver-side finish bookkeeping).

    Same semantics as `ann_search_spark` (the C2/NDLSH driver-loop form):
    per-radius searchThreshold cap (lowest point ids), checked-set
    anti-join between radii, exact L2 `dist < c*R`, finished queries
    excluded from later radii, unfinished queries yield no rows.

    Each level's running `checked`/`accepted` state gets a LAZY
    localCheckpoint — Spark's analogue of the MATERIALIZED hint the
    DuckDB oracle needs for the same chain: every level references the
    previous level's frames more than once, and without the barrier
    Catalyst expands the shared subplans into an exponentially-growing
    tree (the analysis alone stops terminating around 6 levels).  The
    lazy barrier cuts the logical plan per level while running NO job;
    the one final action computes the whole chain, caching each barrier
    RDD as it passes.

    Trade-off vs the driver loop (measured on the gate fixture:
    loop 6.4 s, fused 11.4 s at local[32]): no early exit when every
    query finishes (all n_radii levels are planned), the radius levels
    cannot resume individually from checkpoints, and the per-level
    barrier compilation costs more than the driver loop's per-radius
    collect at sandbox scale — so C2 stays the engine's default search.
    The fused form is the C1 semantics row: driver-state-free, one
    action, the shape to prefer when cluster scheduling latency (not
    compute) dominates each radius."""
    search_threshold = model.prune_factor * model.L + k
    pts = points.select(F.col("id").alias("point_id"),
                        F.col("vec").alias("p_vec"))
    qrs = queries.select("query_id", F.col("vec").alias("q_vec"))
    if tables is None:
        tables = _exploded_buckets(pts, "point_id", "p_vec", model)
    q_tables = _exploded_buckets(qrs, "query_id", "q_vec", model)
    # every radius level re-reads both bucket frames; without a barrier
    # each level's subplan embeds its own copy of the bucket pandas-UDF
    # scan and the hashing of all points/queries re-runs once per radius
    # (the driver-loop form lazy-checkpoints these for the same reason)
    tables = tables.localCheckpoint(eager=False)
    q_tables = q_tables.localCheckpoint(eager=False)

    w_cap = Window.partitionBy("query_id").orderBy("point_id")
    checked = accepted = fin = None
    for rid, radius in enumerate(model.radii()):
        ratio_radius = model.ratio * radius
        qb = q_tables.where(F.col("radius_id") == rid) \
                     .select("query_id", "table_id", "bucket")
        if fin is not None:
            qb = qb.join(F.broadcast(fin), "query_id", "left_anti")
        pb = tables.where(F.col("radius_id") == rid) \
                   .select("point_id", "table_id", "bucket")
        cands = (pb.join(F.broadcast(qb), ["table_id", "bucket"])
                 .select("query_id", "point_id").dropDuplicates())
        if checked is not None:
            cands = cands.join(checked, ["query_id", "point_id"], "left_anti")
        new = (cands.withColumn("_rn", F.row_number().over(w_cap))
                    .where(F.col("_rn") <= search_threshold).drop("_rn")
                    .localCheckpoint(eager=False))
        checked = new if checked is None else \
            checked.union(new).localCheckpoint(eager=False)
        scored = (new.join(pts, "point_id")
                     .join(F.broadcast(qrs), "query_id")
                     .withColumn("dist", F.expr(_L2))
                     .where(F.col("dist") < ratio_radius)
                     .select("query_id", "point_id", "dist"))
        accepted = scored if accepted is None else accepted.union(scored)
        accepted = accepted.localCheckpoint(eager=False)
        fin = (accepted.groupBy("query_id").agg(F.count("*").alias("_n"))
               .where(F.col("_n") >= k).select("query_id"))

    wk = Window.partitionBy("query_id").orderBy("dist", "point_id")
    return (accepted.join(F.broadcast(fin), "query_id", "left_semi")
            .withColumn("rank", F.row_number().over(wk))
            .where(F.col("rank") <= k)
            .select("query_id", "point_id", "dist", "rank"))


#: Above this many finished queries, driver-side isin() literal lists stop
#: scaling (O(n_queries)-sized filter expressions rebuilt per radius) and
#: the finished set rides a broadcast join instead.
_FINISHED_ISIN_MAX = 2048


def _fin_df(spark: SparkSession, finished_ids: set[int]) -> DataFrame:
    return spark.createDataFrame([(int(i),) for i in sorted(finished_ids)],
                                 "query_id long")


def _drop_finished(df: DataFrame, finished_ids: set[int],
                   spark: SparkSession) -> DataFrame:
    """Remove finished query ids: isin() literal while the set is small
    (cheapest plan, matches the reference's driver bookkeeping scale),
    broadcast left_anti beyond _FINISHED_ISIN_MAX (large query fan-in)."""
    if not finished_ids:
        return df
    if len(finished_ids) <= _FINISHED_ISIN_MAX:
        return df.where(~F.col("query_id").isin(list(finished_ids)))
    return df.join(F.broadcast(_fin_df(spark, finished_ids)),
                   "query_id", "left_anti")


def _keep_finished(df: DataFrame, finished_ids: set[int],
                   spark: SparkSession) -> DataFrame:
    if not finished_ids:
        return df.where(F.lit(False))
    if len(finished_ids) <= _FINISHED_ISIN_MAX:
        return df.where(F.col("query_id").isin(list(finished_ids)))
    return df.join(F.broadcast(_fin_df(spark, finished_ids)),
                   "query_id", "left_semi")


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

    # Per-query finish state lives DRIVER-side, exactly like the reference's
    # searcher bookkeeping (LSHSearcher.java keeps the remaining/finished
    # query sets on the driver): one collect of (query_id, n_accepted) per
    # radius — O(n_queries) rows — replaces an isEmpty probe, a finished
    # anti-join and two eager checkpoints per radius.  Everything large
    # (checked pairs, accepted candidates) stays distributed; lazy
    # localCheckpoints fold each radius's materialization into the single
    # per-radius counts job instead of separate eager jobs.
    #
    n_queries = queries.count()
    finished_ids: set[int] = set()
    checked = spark.createDataFrame([], "query_id long, point_id long")
    accepted = spark.createDataFrame([], "query_id long, point_id long, dist double")

    # In DISTRIBUTED-state mode, AQE is disabled for the duration of the
    # loop (restored after): under AQE, converting a plan to an RDD —
    # which every lazy localCheckpoint barrier must do — executes the
    # intermediate query stages immediately, so each barrier became its
    # own driver-synchronized job and every radius paid ~3 sequential
    # executions (~8 jobs with broadcast builds) instead of the designed
    # ONE counts action.  With AQE off the barriers are genuinely lazy;
    # every join in the loop carries an explicit broadcast hint so the
    # static planner keeps the plans AQE would have chosen.  AQE never
    # changes results — latency-only.
    # DRIVER-state mode keeps AQE ON: that loop has no per-radius
    # DataFrame barriers at all (the bookkeeping lives in Python sets),
    # so the toggle's rationale does not apply, and AQE's partition
    # coalescing keeps the one per-radius exchange at the width the tiny
    # capped frame deserves.
    driver_state = (n_queries * search_threshold * len(model.radii())
                    <= ANN_DRIVER_STATE_MAX_ROWS)
    aqe_was = spark.conf.get("spark.sql.adaptive.enabled", "true")
    if not driver_state:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        return _search_loop(spark, points, queries, tables, model, k,
                            search_threshold, n_queries, finished_ids,
                            checked, accepted, driver_state)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_was)
        points.unpersist()
        queries.unpersist()


#: Size dispatch for the per-radius result bookkeeping: when the WORST-CASE
#: checked-set size (n_queries * searchThreshold * n_radii) fits under this
#: many rows, the per-radius capped+scored candidates are collected to the
#: driver (one O(threshold * live queries) collect per radius — the
#: reference keeps exactly this bookkeeping on its searcher driver,
#: LSHSearcher.java:212-252) and the checked/accepted state lives in Python
#: sets; above it, the state stays distributed as checkpointed DataFrames.
#: The distributed hashing, bucket probe, per-query cap and exact-L2 scoring
#: run in Spark in BOTH modes — only the bounded bookkeeping moves.
ANN_DRIVER_STATE_MAX_ROWS = 200_000

#: Row bound under which driver-resident bookkeeping frames are emitted as
#: SQL VALUES literals (a true LocalRelation: broadcast builds copy straight
#: from driver memory, no job, no task scheduling) instead of
#: `createDataFrame` (which parallelizes the rows into an RDD, so every
#: broadcast build over it schedules a real task-based job — measured
#: ~0.3-0.4 s of pure latency per build).  Above the bound the SQL text
#: would dominate parse time; the RDD path takes over.
_VALUES_MAX_ROWS = 20_000


def _values_df(spark: SparkSession, rows: list[tuple],
               cols: list[tuple[str, str]], schema) -> DataFrame:
    """Bounded driver-local frame as a VALUES LocalRelation.

    `cols`: [(name, SQL type)] — every cell is CAST to its column's
    declared type so the frame is schema-identical to the
    `createDataFrame(rows, schema)` it replaces (`schema` stays the
    empty/overflow fallback).  Values must be numerics or lists of ints
    (rendered as array literals)."""
    if not rows or len(rows) > _VALUES_MAX_ROWS:
        return spark.createDataFrame(rows, schema)

    def lit(v, typ: str) -> str:
        if isinstance(v, (list, tuple)):
            body = "array(" + ",".join(str(int(x)) for x in v) + ")"
            return f"CAST({body} AS {typ})"
        return f"CAST({v!r} AS {typ})"

    types = [t for _, t in cols]
    names = ",".join(n for n, _ in cols)
    vals = ",".join(
        "(" + ",".join(lit(v, t) for v, t in zip(r, types)) + ")"
        for r in rows)
    return spark.sql(f"SELECT * FROM VALUES {vals} AS t({names})")


def _search_loop(spark: SparkSession, points: DataFrame, queries: DataFrame,
                 tables: DataFrame | None, model, k: int,
                 search_threshold: int, n_queries: int,
                 finished_ids: set[int], checked: DataFrame,
                 accepted: DataFrame, driver_state: bool) -> DataFrame:
    # bucket tables for ALL radii in ONE UDF pass each (the reference's -b
    # build shape); the radius loop below is then pure JVM over these
    if tables is None:
        tables = _exploded_buckets(points, "point_id", "p_vec", model) \
            .localCheckpoint(eager=False)

    radii = model.radii()
    checked_rows: list[tuple[int, int]] = []    # driver-state mode only
    accepted_rows: list[tuple[int, int, float]] = []
    acc_counts: dict[int, int] = {}

    if driver_state:
        # The query set is driver-resident in this mode (bounded by the
        # dispatch), exactly the reference's distributed-cache query set
        # (S4): collect it once, compute its bucket ids with the SAME
        # NumPy model the executor UDF runs (bit-identical by
        # construction), and feed each radius a LocalRelation — its
        # broadcast builds straight from driver memory, with no scan job
        # and no q-side UDF pass at all.
        q_rows = queries.collect()
        q_ids = [int(r["query_id"]) for r in q_rows]
        q_vecs = np.asarray([list(r["q_vec"]) for r in q_rows],
                            dtype=np.int64)
        q_schema = queries.schema
        q_vec_sql = q_schema["q_vec"].dataType.simpleString().upper()
        q_buckets_all: dict[int, list[tuple[int, int, int]]] = {}
        for rid, radius in enumerate(radii):
            rows = []
            for tid in range(model.L):
                for qid, b in zip(q_ids,
                                  model.bucket_ids(tid, radius, q_vecs)):
                    rows.append((qid, tid, int(b)))
            q_buckets_all[rid] = rows
    else:
        q_tables = _exploded_buckets(queries, "query_id", "q_vec", model) \
            .localCheckpoint(eager=False)

    for rid, radius in enumerate(radii):
        if len(finished_ids) >= n_queries:
            break
        ratio_radius = model.ratio * radius

        p_buckets = tables.where(F.col("radius_id") == rid) \
                          .select("point_id", "table_id", "bucket")
        if driver_state:
            # every driver-side frame is a VALUES LocalRelation (not an
            # RDD-backed createDataFrame): its broadcast builds copy from
            # driver memory with no job at all — measured ~0.3-0.4 s of
            # scheduling latency saved per build, x3 builds per radius
            remaining = _values_df(
                spark,
                [(int(r["query_id"]), list(r["q_vec"])) for r in q_rows
                 if int(r["query_id"]) not in finished_ids],
                [("query_id", "BIGINT"), ("q_vec", q_vec_sql)], q_schema)
            q_buckets = _values_df(
                spark,
                [t for t in q_buckets_all[rid] if t[0] not in finished_ids],
                [("query_id", "BIGINT"), ("table_id", "INT"),
                 ("bucket", "BIGINT")],
                "query_id long, table_id int, bucket long")
            checked = _values_df(
                spark, checked_rows,
                [("query_id", "BIGINT"), ("point_id", "BIGINT")],
                "query_id long, point_id long")
        else:
            remaining = _drop_finished(queries, finished_ids, spark)
            q_buckets = _drop_finished(
                q_tables.where(F.col("radius_id") == rid)
                        .select("query_id", "table_id", "bucket"),
                finished_ids, spark)
        # probe: tiny query side broadcast (S4/J1).  ONE exchange per
        # radius: hash-repartition the collisions by query_id FIRST —
        # HashPartitioning(query_id) satisfies both the (query_id,
        # point_id) distinct aggregation and the per-query cap window,
        # so neither adds its own exchange — and anti-join the checked
        # set as an explicit broadcast (bounded: <= n_radii *
        # searchThreshold * n_queries rows, the same driver-side
        # bookkeeping scale the reference assumes), which removes the
        # (query_id, point_id) shuffle of both anti-join sides.
        cands = (p_buckets
                 .join(F.broadcast(q_buckets), ["table_id", "bucket"])
                 .select("query_id", "point_id")
                 .repartition("query_id")
                 .dropDuplicates()
                 .join(F.broadcast(checked), ["query_id", "point_id"],
                       "left_anti"))
        # deterministic per-query cap (A4): lowest point ids first
        w = Window.partitionBy("query_id").orderBy("point_id")
        new = (cands.withColumn("_rn", F.row_number().over(w))
                    .where(F.col("_rn") <= search_threshold).drop("_rn"))

        if driver_state:
            # ONE action per radius: collect the capped candidates WITH
            # their exact distances (<= searchThreshold rows per live
            # query); the checked/accepted/finished bookkeeping is then
            # pure Python — no checkpoints, no counts job, and the final
            # ranking runs over one small LocalRelation.
            got = (F.broadcast(new).join(points, "point_id")
                   .join(F.broadcast(remaining), "query_id")
                   .withColumn("dist", F.expr(_L2))
                   .select("query_id", "point_id", "dist").collect())
            for r in got:
                q, p, d = int(r["query_id"]), int(r["point_id"]), r["dist"]
                checked_rows.append((q, p))
                if d < ratio_radius:      # same double compare as the filter
                    accepted_rows.append((q, p, d))
                    n = acc_counts.get(q, 0) + 1
                    acc_counts[q] = n
                    if n >= k:
                        finished_ids.add(q)
            continue

        new = new.localCheckpoint(eager=False)  # reused below + next radius
        checked = checked.union(new)            # union of checkpointed frames

        # `new` is the bounded side (<= searchThreshold rows per live
        # query); broadcasting it keeps the big point table unshuffled.
        scored = (F.broadcast(new).join(points, "point_id")
                     .join(F.broadcast(remaining), "query_id")
                     .withColumn("dist", F.expr(_L2))
                     .where(F.col("dist") < ratio_radius)
                     .select("query_id", "point_id", "dist"))
        accepted = accepted.union(scored).localCheckpoint(eager=False)

        # the ONE action per radius: materializes new+accepted and returns
        # the per-query accepted counts (CheckCandidateReducer.java:61-73)
        counts = accepted.groupBy("query_id").agg(F.count("*").alias("n")).collect()
        finished_ids.update(int(r["query_id"]) for r in counts if r["n"] >= k)

    if driver_state:
        accepted = _values_df(
            spark, accepted_rows,
            [("query_id", "BIGINT"), ("point_id", "BIGINT"),
             ("dist", "DOUBLE")],
            "query_id long, point_id long, dist double")
    wk = Window.partitionBy("query_id").orderBy("dist", "point_id")
    out = (_keep_finished(accepted, finished_ids, spark)
           .withColumn("rank", F.row_number().over(wk))
           .where(F.col("rank") <= k))
    return out.select("query_id", "point_id", "dist", "rank")
