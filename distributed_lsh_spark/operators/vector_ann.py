"""Approximate nearest neighbors over float embedding columns.

Three paths (SURVEY.md: "similarity search" component):
  * `cosine_topk_exact` — brute-force baseline: broadcast the (small) query
    side, JVM zip_with/aggregate dot products, window top-k.  O(n*q); the
    correctness oracle and the right choice when q is tiny.
  * `cosine_topk_lsh` — scale path: sign-random-projection (SRP) bucketing
    (Charikar'02, the cosine analogue of the reference's p-stable family):
    `tables` independent hash tables of `bits`-bit signs; candidates =
    bucket collisions in any table; exact cosine re-ranking of candidates
    only; per-query top-k.  Recall is tunable via (tables, bits) exactly
    like the reference's (L, m) — AND of bits, OR of tables
    (MapReduce-LSH/.../common/LSH.java:117-131).
  * `cosine_topk_ivf` — IVF (inverted-file) scale path: spherical k-means
    coarse quantizer trained on a bounded deterministic sample, points
    partitioned into `nlist` cells, queries probe their `nprobe` nearest
    cells; exact cosine re-rank of probed cells only.  Data-adaptive
    buckets (vs SRP's data-oblivious hyperplanes) — better recall per
    candidate on clustered embeddings.

Hyperplanes are drawn from a seeded NumPy generator and ride pandas-UDF
closures (no per-row Python; one matmul per Arrow batch).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_DOT = ("aggregate(zip_with(qe, emb, (a, b) -> CAST(a AS DOUBLE) * CAST(b AS DOUBLE)), "
        "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)")
_NORM = "sqrt(aggregate(transform({c}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x))"


def _cosine_col() -> "F.Column":
    return F.expr(f"{_DOT} / ({_NORM.format(c='qe')} * {_NORM.format(c='emb')})")


def cosine_topk_exact(points: DataFrame, queries: DataFrame, k: int = 10,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      query_id_col: str = "query_id") -> DataFrame:
    """Brute force: (query_id, vec_id, sim, rank<=k), deterministic ties."""
    p = points.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("emb"))
    q = queries.select(F.col(query_id_col).alias("query_id"),
                       F.col(vec_col).alias("qe"))
    scored = (F.broadcast(q).crossJoin(p)
              .where(F.col("vec_id") != F.col("query_id"))
              .select("query_id", "vec_id", _cosine_col().alias("sim")))
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def cosine_pairs_exact(points: DataFrame, tau: float,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       ) -> DataFrame:
    """Embedding-cosine near-dup mining, EXACT: all pairs with cosine
    similarity >= tau -> (id_a, id_b, sim).

    Shape: the full normalized matrix is broadcast (ids + float64 rows —
    1 GB per 2M vectors at dim 64) and each partition block-multiplies its
    rows against it in NumPy (mapInPandas; one BLAS matmul per Arrow
    batch, no crossJoin row explosion).  id_a < id_b de-dups the symmetric
    matrix without a shuffle.  Beyond broadcast range, prefilter with the
    SRP-LSH tables below and exact-verify, trading recall for memory —
    the same candidate/verify structure as the text pipeline."""
    sc = points.sparkSession.sparkContext
    rows = points.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    M = np.array([list(r[1]) for r in rows], dtype=np.float64)
    M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-300)
    bc = sc.broadcast((ids, M))

    out_schema = T.StructType([
        T.StructField("id_a", T.LongType()),
        T.StructField("id_b", T.LongType()),
        T.StructField("sim", T.DoubleType()),
    ])

    def block(batches):
        b_ids, b_m = bc.value
        for pdf in batches:
            left_ids = pdf[id_col].to_numpy(dtype=np.int64)
            B = np.array(list(pdf[vec_col]), dtype=np.float64)
            B /= np.maximum(np.linalg.norm(B, axis=1, keepdims=True), 1e-300)
            S = B @ b_m.T
            li, ri = np.nonzero((S >= tau) & (left_ids[:, None] < b_ids[None, :]))
            yield pd.DataFrame({"id_a": left_ids[li], "id_b": b_ids[ri],
                                "sim": S[li, ri]})

    return points.mapInPandas(block, out_schema)


#: Default broadcast budget for the exact miner: ~2M x 64-dim float64 rows
#: is ~1 GB of broadcast + per-executor resident matrix — the documented
#: ceiling of the block-matmul design.  Above it the LSH+exact-verify path
#: is the only shape that survives (same candidate/verify structure as the
#: text pipeline).
EXACT_PAIRS_MAX_ROWS = 2_000_000


def cosine_pairs(points: DataFrame, tau: float, n_rows: int | None = None,
                 max_exact_rows: int = EXACT_PAIRS_MAX_ROWS,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 **lsh_kwargs) -> DataFrame:
    """Embedding-cosine near-dup mining with a size dispatch: EXACT
    block-matmul miner while the corpus fits the broadcast budget,
    SRP-LSH candidates + exact cosine verify beyond it.

    `n_rows` is a caller-supplied size hint (e.g. a checkpoint manifest's
    row count) so no extra count() job runs when the size is already
    known; without it, one count() scan decides the route.  Both routes
    return the same (id_a, id_b, sim) schema and both verify candidates
    with exact cosine, so precision is 1.0 either way — the LSH route
    trades only recall (tunable via tables/bits), never correctness of
    emitted pairs.  This guards the driver collect in
    `cosine_pairs_exact` from ever running on a 10^9-vector corpus."""
    if n_rows is None:
        n_rows = points.count()
    if n_rows <= max_exact_rows:
        return cosine_pairs_exact(points, tau, id_col=id_col, vec_col=vec_col)
    return cosine_pairs_lsh(points, tau, id_col=id_col, vec_col=vec_col,
                            **lsh_kwargs)


def cosine_pairs_lsh(points: DataFrame, tau: float, dim: int | None = None,
                     tables: int = 16, bits: int = 8, seed: int = 42,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     cap_per_bucket: int = 5000) -> DataFrame:
    """Embedding-cosine near-dup mining BEYOND broadcast range: SRP tables
    -> band-style self-join -> exact cosine verify >= tau.

    Same candidate/verify structure as the text MinHash pipeline
    (operators/candidates.py + verify.py): one shuffle on (table_id, code),
    16-byte band rows, deterministic hot-bucket cap, exact verification so
    precision is 1.0 — recall is the only approximation, tunable via
    (tables, bits) like the reference's (L, m) OR/AND family
    (MapReduce-LSH/.../common/LSH.java:117-131).  Use this instead of
    `cosine_pairs_exact` when the corpus exceeds the driver/broadcast
    budget (~2M x 64 float64 = 1 GB)."""
    if dim is None:
        dim = len(points.select(vec_col).first()[0])
    sig = _srp_udf(dim, tables, bits, seed)
    p = points.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("emb"))
    codes = p.select("vec_id",
                     F.posexplode(sig(F.col("emb"))).alias("table_id", "code"))
    if cap_per_bucket:
        wcap = Window.partitionBy("table_id", "code") \
                     .orderBy(F.xxhash64("table_id", "vec_id"), "vec_id")
        codes = (codes.withColumn("_rn", F.row_number().over(wcap))
                      .where(F.col("_rn") <= cap_per_bucket).drop("_rn"))
    a = codes.select(F.col("vec_id").alias("id_a"), "table_id", "code")
    b = codes.select(F.col("vec_id").alias("id_b"), "table_id", "code")
    cands = (a.join(b, ["table_id", "code"])
             .where(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b").dropDuplicates()
             .persist())   # lazy pin; payload joins read it once each
    va = p.select(F.col("vec_id").alias("id_a"), F.col("emb").alias("qe"))
    vb = p.select(F.col("vec_id").alias("id_b"), "emb")
    return (cands.join(va, "id_a").join(vb, "id_b")
            .select("id_a", "id_b", _cosine_col().alias("sim"))
            .where(F.col("sim") >= tau))


def _srp_udf(dim: int, tables: int, bits: int, seed: int):
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((tables * bits, dim))
    weights = (1 << np.arange(bits, dtype=np.int64))

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _sig(vecs: pd.Series) -> pd.Series:
        m = np.asarray(list(vecs), dtype=np.float64)          # (n, dim)
        signs = (m @ planes.T) > 0                            # (n, tables*bits)
        per_table = signs.reshape(len(m), tables, bits)
        codes = (per_table * weights).sum(axis=2)             # (n, tables)
        return pd.Series(list(codes))

    return _sig


def cosine_topk_lsh(points: DataFrame, queries: DataFrame, k: int = 10,
                    dim: int | None = None, tables: int = 8, bits: int = 12,
                    seed: int = 42, id_col: str = "vec_id",
                    vec_col: str = "embedding", query_id_col: str = "query_id",
                    cap_per_bucket: int = 5000) -> DataFrame:
    """SRP-LSH candidates -> exact cosine re-rank -> per-query top-k.

    At 10^9+ vectors this replaces the O(n*q) cross join with one shuffle
    on (table_id, code); `cap_per_bucket` is the hot-bucket guard
    (searchThreshold analogue, SearchMapper.java:266)."""
    if dim is None:
        dim = len(points.select(vec_col).first()[0])
    sig = _srp_udf(dim, tables, bits, seed)

    p = points.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("emb"))
    q = queries.select(F.col(query_id_col).alias("query_id"),
                       F.col(vec_col).alias("qe"))
    pb = p.select("vec_id", F.posexplode(sig(F.col("emb"))).alias("table_id", "code"))
    qb = q.select("query_id", F.posexplode(sig(F.col("qe"))).alias("table_id", "code"))
    return _bucket_topk(p, q, pb, qb, k, cap_per_bucket)


def _bucket_topk(p: DataFrame, q: DataFrame, pb: DataFrame, qb: DataFrame,
                 k: int, cap_per_bucket: int) -> DataFrame:
    """Shared tail of the bucketed cosine searchers: hot-bucket cap ->
    broadcast probe join -> exact cosine re-rank -> per-query top-k."""
    if cap_per_bucket:
        wcap = Window.partitionBy("table_id", "code").orderBy("vec_id")
        pb = (pb.withColumn("_rn", F.row_number().over(wcap))
                .where(F.col("_rn") <= cap_per_bucket).drop("_rn"))

    cands = (pb.join(F.broadcast(qb), ["table_id", "code"])
             .select("query_id", "vec_id").dropDuplicates()
             .where(F.col("vec_id") != F.col("query_id")))
    scored = (cands.join(p, "vec_id").join(F.broadcast(q), "query_id")
              .select("query_id", "vec_id", _cosine_col().alias("sim")))
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def cosine_topk_lsh_multiprobe(points: DataFrame, queries: DataFrame,
                               k: int = 10, dim: int | None = None,
                               tables: int = 8, bits: int = 12,
                               seed: int = 42, id_col: str = "vec_id",
                               vec_col: str = "embedding",
                               query_id_col: str = "query_id",
                               cap_per_bucket: int = 5000) -> DataFrame:
    """Multi-probe SRP-LSH (Lv et al. VLDB'07, applied to hyperplane
    codes): each query probes its own bucket PLUS every bucket at
    Hamming distance 1 in each table — bits+1 probes per table, the
    standard perturbation set for sign-random-projection codes (the
    nearest-miss bucket differs in exactly one hyperplane sign).

    Why it matters at 10^9 vectors: recall is bought with QUERY-side
    probe fan-out instead of POINT-side table count.  The point index —
    the expensive side: tables x n_vectors rows, shuffled, persisted,
    re-read per batch — shrinks ~(bits+1)x for equal recall, while the
    extra probes ride the tiny broadcast query frame.  The probe
    expansion is pure codegen (posexplode over XOR literals); candidate
    generation, hot-bucket cap, exact re-rank, and top-k are the exact
    cosine_topk_lsh tail.

    Reference analogue: probing neighboring buckets generalizes the
    reference's radius-expansion re-probe (LSHSearcher.java radius loop)
    from rehash-per-radius to bit-perturbation within one table set."""
    if dim is None:
        dim = len(points.select(vec_col).first()[0])
    sig = _srp_udf(dim, tables, bits, seed)

    p = points.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("emb"))
    q = queries.select(F.col(query_id_col).alias("query_id"),
                       F.col(vec_col).alias("qe"))
    pb = p.select("vec_id", F.posexplode(sig(F.col("emb"))).alias("table_id", "code"))
    qb0 = q.select("query_id",
                   F.posexplode(sig(F.col("qe"))).alias("table_id", "code"))
    probe_set = F.array(
        F.col("code"),
        *[F.col("code").bitwiseXOR(F.lit(1 << b)) for b in range(bits)])
    qb = (qb0.select("query_id", "table_id",
                     F.explode(probe_set).alias("code")))
    return _bucket_topk(p, q, pb, qb, k, cap_per_bucket)


def train_ivf_centroids(points: DataFrame, nlist: int, seed: int = 42,
                        iters: int = 10, sample_cap: int = 65536,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        ) -> np.ndarray:
    """Spherical-k-means coarse quantizer: returns (nlist, dim) unit-norm
    centroids.  Trains on a bounded DETERMINISTIC sample (lowest ids after
    a fixed modular thinning) — standard IVF practice (FAISS trains on
    ~256*nlist vectors); the full corpus is never collected.  Seeded init,
    fixed iteration count, empty cells keep their previous centroid — the
    whole function is a pure function of (sample, nlist, seed)."""
    n_total = points.count()
    step = max(1, n_total // sample_cap)
    sample = (points.select(id_col, vec_col)
              .where(F.xxhash64(F.col(id_col)) % step == 0)
              .orderBy(id_col).limit(sample_cap).collect())
    M = np.array([list(r[1]) for r in sample], dtype=np.float64)
    M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-300)
    rng = np.random.default_rng(seed)
    k = min(nlist, len(M))
    C = M[rng.choice(len(M), size=k, replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(M @ C.T, axis=1)
        for j in range(k):
            members = M[assign == j]
            if len(members):
                c = members.sum(axis=0)
                C[j] = c / max(np.linalg.norm(c), 1e-300)
    return C


def _ivf_cells_udf(centroids: np.ndarray, nprobe: int):
    """pandas_udf: vec -> the nprobe nearest cell ids (one matmul per
    Arrow batch; deterministic ties by lower cell id via stable argsort
    on (-sim, id))."""
    C = centroids

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def _cells(vecs: pd.Series) -> pd.Series:
        m = np.asarray(list(vecs), dtype=np.float64)
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-300)
        sims = m @ C.T                                        # (n, nlist)
        top = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
        return pd.Series([row.astype(np.int32) for row in top])

    return _cells


def centroids_to_df(spark, centroids: np.ndarray) -> DataFrame:
    """(nlist, dim) -> checkpointable (cell_id int, centroid array<double>)."""
    return spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(centroids)],
        "cell_id int, centroid array<double>")


def centroids_from_df(df: DataFrame) -> np.ndarray:
    rows = sorted(df.collect(), key=lambda r: r["cell_id"])
    return np.array([list(r["centroid"]) for r in rows], dtype=np.float64)


def assign_cells(points: DataFrame, centroids: np.ndarray,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 ) -> DataFrame:
    """Map-only one-cell assignment: (vec_id, cell_id).  This is the IVF
    build artifact — checkpoint it (CheckpointManager) together with the
    centroids frame and reuse across query sets, exactly like the ANN
    hash-table build (-b/-s split)."""
    one_cell = _ivf_cells_udf(centroids, 1)
    return points.select(
        F.col(id_col).alias("vec_id"),
        F.element_at(one_cell(F.col(vec_col)), 1).alias("cell_id"))


def cosine_topk_ivf(points: DataFrame, queries: DataFrame, k: int = 10,
                    nlist: int = 64, nprobe: int = 8, seed: int = 42,
                    iters: int = 10, id_col: str = "vec_id",
                    vec_col: str = "embedding", query_id_col: str = "query_id",
                    centroids: np.ndarray | None = None,
                    assignment: DataFrame | None = None) -> DataFrame:
    """IVF candidates -> exact cosine re-rank -> per-query top-k.

    Scale shape: points are assigned to ONE cell each (map-only pandas
    UDF), queries explode to `nprobe` cells; the candidate join is a
    single equi-join on cell_id with the tiny query side broadcast — the
    inverted-file partitioning means each query touches nprobe/nlist of
    the corpus instead of all of it.  At 10^9+ vectors, pass a persisted
    `assignment` (assign_cells artifact) + its `centroids` so repeat
    query sets skip the corpus-wide assignment scan."""
    if centroids is None:
        centroids = train_ivf_centroids(points, nlist, seed=seed, iters=iters,
                                        id_col=id_col, vec_col=vec_col)
    p = points.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("emb"))
    q = queries.select(F.col(query_id_col).alias("query_id"),
                       F.col(vec_col).alias("qe"))
    probe_cells = _ivf_cells_udf(centroids, nprobe)
    pc = assignment if assignment is not None else \
        assign_cells(points, centroids, id_col=id_col, vec_col=vec_col)
    qc = q.select("query_id", F.explode(probe_cells(F.col("qe"))).alias("cell_id"))

    cands = (pc.join(F.broadcast(qc), "cell_id")
             .select("query_id", "vec_id").dropDuplicates()
             .where(F.col("vec_id") != F.col("query_id")))
    scored = (cands.join(p, "vec_id").join(F.broadcast(q), "query_id")
              .select("query_id", "vec_id", _cosine_col().alias("sim")))
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))
