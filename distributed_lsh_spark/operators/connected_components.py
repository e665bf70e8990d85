"""Distributed union-find: alternating large-star / small-star connected
components over an edge DataFrame (SURVEY.md C4).

The reference answers per-query k-NN and has no clustering; `north_rule`
adds duplicate-cluster resolution.  This is the published
large-star/small-star algorithm (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14) expressed as DataFrame ops:

  large-star(u): for every neighbor v > u, emit (v, min(N+(u)))
  small-star(u): for every neighbor v <= u (edges oriented high->low),
                 emit (v, min(N+(u)))

Alternating the two converges in O(log^2 n) rounds to star graphs whose
centers are the component minima.  The driver loop mirrors the reference's
radius-expansion loop with persisted intermediate state
(Naive-DLSH/.../lsh/searcher/LSHSearcher.java:212-252): every iteration
localCheckpoints the edge set to truncate lineage (Catalyst cannot optimize
across iterations), and the fixpoint test is an aggregate signature instead
of `fs.exists(interPath)`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _symmetrize(e: DataFrame) -> DataFrame:
    return e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def _large_star(e: DataFrame) -> DataFrame:
    sym = _symmetrize(e)
    m = (sym.groupBy("src").agg(F.min("dst").alias("_mn"))
            .select("src", F.least("src", "_mn").alias("m")))
    return (
        sym.join(m, "src")
           .where(F.col("dst") > F.col("src"))
           .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
           .where(F.col("src") != F.col("dst"))
           .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    o = e.select(F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst"))
    m = o.groupBy("src").agg(F.min("dst").alias("m"))
    return (
        o.join(m, "src")
         .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
         .union(m.select(F.col("src"), F.col("m").alias("dst")))
         .where(F.col("src") != F.col("dst"))
         .distinct()
    )


def _signature(e: DataFrame) -> tuple[int, int]:
    # Bounded residues keep the ANSI-mode sum overflow-safe up to ~9e9 edges
    # per signature check; (count, sum) collisions on *consecutive differing*
    # iterations are the only failure mode and are astronomically unlikely.
    row = e.agg(F.count("*").alias("n"),
                F.coalesce(F.sum(F.pmod(F.xxhash64("src", "dst"), F.lit(1_000_000_007))),
                           F.lit(0)).alias("h")).collect()[0]
    return int(row["n"]), int(row["h"])


#: Below this many distinct edges the driver union-find wins outright: the
#: Arrow collect is <= ~1.2 MB (two longs/edge) and finishes in
#: milliseconds, while every large-star/small-star round costs two
#: shuffles plus driver-synchronized jobs — seconds of fixed latency per
#: round regardless of data size.  Kept well below any measured-protocol
#: edge set (the 800k-doc scaling ladder carries ~155k edges) so the
#: distributed algorithm remains the path the scaling evidence measures.
DRIVER_CC_MAX_EDGES = 50_000


def _driver_components(e: DataFrame, pdf=None) -> DataFrame:
    """Exact same labeling contract as the distributed loop, computed by
    union-find (union-by-min-id + path halving) on the driver after one
    Arrow collect.  Only reachable under DRIVER_CC_MAX_EDGES.  `pdf`: the
    already-collected edge frame, when the routing probe fetched it."""
    import numpy as np
    import pandas as pd

    if pdf is None:
        pdf = e.toPandas()
    if not len(pdf):
        return e.sparkSession.createDataFrame([], "doc_id long, cluster_id long")
    src = pdf["src"].to_numpy(np.int64)
    dst = pdf["dst"].to_numpy(np.int64)
    ids, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
    parent = np.arange(len(ids))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    # ids is sorted, so union-by-min-INDEX makes every final root the
    # min doc_id of its component — the distributed loop's labeling.
    for x, y in zip(inv[: len(src)].tolist(), inv[len(src):].tolist()):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    roots = np.array([find(i) for i in range(len(ids))])
    out = pd.DataFrame({"doc_id": ids, "cluster_id": ids[roots]})
    return e.sparkSession.createDataFrame(out, "doc_id long, cluster_id long")


def connected_components(pairs: DataFrame, max_iter: int = 50,
                         checkpoint: bool = True, probe_every: int = 2,
                         n_edges: int | None = None,
                         driver_max_edges: int = DRIVER_CC_MAX_EDGES) -> DataFrame:
    """pairs(id_a, id_b) -> (doc_id, cluster_id = min doc_id in component).

    Every doc that appears in >=1 edge gets a row (component minima label
    themselves).  Deterministic.

    Size dispatch (same pattern as operators/vector_ann.cosine_pairs):
    under `driver_max_edges` distinct edges the O(log^2 n)-round
    distributed loop pays seconds of per-round shuffle + driver latency
    just to label a graph that fits in a ~1 MB collect — union-find on
    the driver returns the identical labeling in one job.  Above the
    threshold, the large-star/small-star loop is the only shape that
    scales.  `n_edges` is an optional size hint (e.g. a checkpoint
    manifest row count) that skips the routing count().

    `probe_every`: run the fixpoint probe (a collect) every N iterations.
    Labels are monotonically non-increasing under large-star/small-star, so
    equal signatures N apart imply nothing changed in between — the test
    stays sound.  N=2 halves the driver-side job count (the constant cost
    that dominated end-to-end scaling at small corpora, BENCH/BASELINE.md);
    the price is up to N-1 extra no-op iterations after convergence.
    """
    e = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")) \
             .where(F.col("src") != F.col("dst")).distinct()
    if checkpoint:
        # persist, not an eager localCheckpoint: the routing probe right
        # below is the job that materializes the cache, so pinning the
        # edge set costs ZERO extra driver round-trips (an eager
        # checkpoint ran its own job first, and under AQE even a lazy one
        # executes the upstream stages at RDD-conversion time)
        e = e.persist()
    if n_edges is None:
        # ONE bounded probe job routes AND fetches: collect at most
        # driver_max_edges+1 rows — if everything fit, that IS the edge
        # set and the driver path needs no second job; an overflowing
        # probe (big graph) falls through to the exact count and the
        # distributed loop.  The probe is driver-safe by construction
        # (<= ~1.2 MB at the default bound).
        probe = e.limit(driver_max_edges + 1).toPandas()
        if len(probe) <= driver_max_edges:
            return _driver_components(e, pdf=probe)
        n_edges = e.count()          # materializes the pinned edge set
    if n_edges <= driver_max_edges:
        return _driver_components(e)

    prev_sig = None
    for it in range(1, max_iter + 1):
        e = _small_star(_large_star(e))
        if checkpoint:
            # lazy: the next probe is the action that materializes the
            # checkpoint (skipped iterations materialize chained, in the
            # same job) — one job per probe, not two per iteration
            e = e.localCheckpoint(eager=False)
        if it % probe_every and it != max_iter:
            continue
        sig = _signature(e)
        if sig == prev_sig:
            break
        prev_sig = sig
    # At fixpoint every edge is (node, component_min); add self-labels for roots.
    labels = e.select(F.col("src").alias("doc_id"), F.col("dst").alias("cluster_id"))
    roots = e.select(F.col("dst").alias("doc_id")).distinct() \
             .withColumn("cluster_id", F.col("doc_id"))
    return (labels.union(roots)
            .groupBy("doc_id").agg(F.min("cluster_id").alias("cluster_id")))
