"""Self-contained DuckDB oracle SQL for the c-k-ANN driver-gate query.

The reference's native query (MapReduce-LSH/.../lsh/searcher/
LSHSearcher.java:212-252, SearchMapper.java:244-353) is a sequential
radius-expansion loop with driver state (checked set, finished queries).
Pure SQL can't run a data-dependent loop, but the number of radii is a
model constant (radii = c^i, HashReducer.java:66-72), so the loop UNROLLS
into one CTE block per radius:

  cand{i}    bucket-collision candidates at radius i for still-unfinished
             queries, minus already-checked (query, point) pairs (P6)
  new{i}     per-query cap at searchThreshold = pruneFactor*L + k, lowest
             point ids first (A4, SearchMapper.java:266 + documented
             determinism fix)
  checked{i} running union of capped candidates
  acc{i}     running union of candidates passing exact L2 < c*R (P4/F1)
  fin{i}     queries with >= k accepted so far (CheckCandidateReducer.
             java:61-73); they drop out of cand{i+1}

The bucket tables (P1/P2) are COMPUTED IN SQL too: the hash family's
parameters (Gaussian projections, uniform shifts, standard-hash ints) are
embedded as float64/int literals and the whole chain — explicit
left-to-right dot product, + shift, floor((hv + U/2)/(w*R)), then the
iterated standard-hash compression with the 64->32 fold
(x & (2^32-1)) + 5*(x >> 32) mod 2^31-1 (LSH.java:242-270) — replays in
DuckDB arithmetic.  This reproduces NumPy's buckets bit-for-bit on the
gate fixture: the only floating-point freedom is the dot-product
summation order (BLAS vs sequential), measured at <= 1e-16 relative,
while the nearest floor() argument to an integer boundary sits 9.5e-6
away (pinned by tests/test_ann_parity.py::
test_bucket_ids_reproducible_without_numpy) — eleven orders of magnitude
of slack.  Everything downstream (candidate join, dedup, cap order,
checked anti-join, acceptance, finish logic, top-k ranking) is replayed
independently in SQL as before, so the ENTIRE gate query is now
SQL-independent of the engine's NumPy code.

Every per-radius CTE is MATERIALIZED: each references the previous round's
CTEs twice, and DuckDB's default inlining makes the plan exponential in
n_radii without it.  The bucket fold chain is MATERIALIZED per step for
the same reason.
"""

from __future__ import annotations


def _bucket_ctes(fx) -> str:
    """CTEs computing pb/qb — (id, radius_id, table_id, bucket) for every
    (radius, table) — from the embedded hash-family parameters, replaying
    ReferenceLSHModel.bucket_ids in DuckDB arithmetic."""
    m_ = fx.model
    d = fx.points.shape[1]
    proj_rows = ",".join(
        "(%d,%d,%s,%s)" % (
            tid, i,
            ",".join(repr(float(m_.proj[tid][i][j])) for j in range(d)),
            repr(float(m_.shift[tid][i])))
        for tid in range(m_.L) for i in range(m_.m))
    pcols = ",".join(f"p{j + 1}" for j in range(d))
    # every float literal is CAST to DOUBLE: DuckDB parses decimal-point
    # literals as exact DECIMALs, whose arithmetic would diverge from the
    # float64 chain being replayed (and overflow DECIMAL(18) in the fold);
    # repr() round-trips through DECIMAL -> DOUBLE to the identical double
    dcols = ",".join(f"CAST(p{j + 1} AS DOUBLE) AS p{j + 1}"
                     for j in range(d))
    radii_rows = ",".join(
        f"({rid},{repr(4.0 * radius)})"          # WIDTH * radius, as the
        for rid, radius in enumerate(m_.radii()))  # model computes it
    u2 = f"CAST({repr(m_.U / 2.0)} AS DOUBLE)"
    # explicit left-to-right dot product — the order the reproducibility
    # pytest pins against NumPy's BLAS result
    dot = "v.vec[1] * p.p1"
    for j in range(1, d):
        dot = f"({dot}) + v.vec[{j + 1}] * p.p{j + 1}"
    parts = [f"""proj_raw(tid, i, {pcols}, shift) AS (VALUES {proj_rows}),
proj AS MATERIALIZED (
  SELECT tid, i, {dcols}, CAST(shift AS DOUBLE) AS shift FROM proj_raw
),
radii_raw(rid, wr) AS (VALUES {radii_rows}),
radii AS (SELECT rid, CAST(wr AS DOUBLE) AS wr FROM radii_raw),
all_vecs(side, id, vec) AS (
  SELECT 'p', point_id, vec FROM pts
  UNION ALL SELECT 'q', query_id, vec FROM qrs
),
hv_all AS MATERIALIZED (
  SELECT v.side, v.id, p.tid, p.i, ({dot}) + p.shift AS hv
  FROM all_vecs v CROSS JOIN proj p
),
s_all AS MATERIALIZED (
  SELECT h.side, h.id, r.rid, h.tid, h.i,
         CAST(floor((h.hv + {u2}) / r.wr) AS BIGINT) AS s
  FROM hv_all h CROSS JOIN radii r
)"""]
    prev = None
    for i in range(m_.m):
        std_i = int(m_.standard_hash[i])
        if prev is None:
            x = f"(s.s * {std_i})"
            src = f"FROM s_all s WHERE s.i = {i}"
        else:
            x = f"(b.bucket + s.s * {std_i})"
            src = (f"FROM {prev} b JOIN s_all s ON s.side = b.side "
                   f"AND s.id = b.id AND s.rid = b.rid AND s.tid = b.tid "
                   f"AND s.i = {i}")
        parts.append(f"""bf{i} AS MATERIALIZED (
  SELECT s.side, s.id, s.rid, s.tid,
         (({x} & 4294967295) + 5 * ({x} >> 32)) % 2147483647 AS bucket
  {src}
)""")
        prev = f"bf{i}"
    parts.append(f"""pb(point_id, radius_id, table_id, bucket) AS (
  SELECT id, rid, tid, bucket FROM {prev} WHERE side = 'p'
),
qb(query_id, radius_id, table_id, bucket) AS (
  SELECT id, rid, tid, bucket FROM {prev} WHERE side = 'q'
)""")
    return ",\n".join(parts)


def _chain_parts(fx) -> tuple[list, str, str]:
    """Build the shared unrolled-radius CTE chain for fx; returns
    (parts, last_acc_cte_name, last_fin_cte_name) so the top-k and
    accuracy-metric oracles append their own final SELECTs."""
    model, k = fx.model, fx.k
    thr = model.prune_factor * model.L + k
    d = fx.points.shape[1]

    def vec_vals(arr):
        return ",".join(
            "(%d,[%s])" % (i, ",".join(str(int(v)) for v in row))
            for i, row in enumerate(arr))

    # exact L2 in the same (double) arithmetic as the Spark zip_with chain;
    # integer coords <= max_coordinate keep every intermediate exact.
    l2 = "sqrt(" + " + ".join(
        f"CAST(q.vec[{i + 1}] - p.vec[{i + 1}] AS DOUBLE) * "
        f"CAST(q.vec[{i + 1}] - p.vec[{i + 1}] AS DOUBLE)" for i in range(d)) + ")"

    parts = [f"""WITH pts(point_id, vec) AS (VALUES {vec_vals(fx.points)}),
qrs(query_id, vec) AS (VALUES {vec_vals(fx.queries)}),
{_bucket_ctes(fx)},
dist AS MATERIALIZED (
  SELECT q.query_id, p.point_id, {l2} AS dist FROM qrs q, pts p
)"""]
    prev_checked, prev_acc, prev_fin = None, None, None
    for rid, radius in enumerate(model.radii()):
        cr = model.ratio * radius
        rem = (f"AND qb.query_id NOT IN (SELECT query_id FROM {prev_fin})"
               if prev_fin else "")
        anti = (f"AND NOT EXISTS (SELECT 1 FROM {prev_checked} c "
                f"WHERE c.query_id = qb.query_id AND c.point_id = pb.point_id)"
                if prev_checked else "")
        parts.append(f"""cand{rid} AS MATERIALIZED (
  SELECT DISTINCT qb.query_id, pb.point_id
  FROM qb JOIN pb ON qb.table_id = pb.table_id AND qb.bucket = pb.bucket
  WHERE qb.radius_id = {rid} AND pb.radius_id = {rid} {rem} {anti}
),
new{rid} AS MATERIALIZED (
  SELECT query_id, point_id FROM (
    SELECT query_id, point_id,
           row_number() OVER (PARTITION BY query_id ORDER BY point_id) AS rn
    FROM cand{rid}) WHERE rn <= {thr}
),
checked{rid} AS MATERIALIZED (
  {f'SELECT * FROM {prev_checked} UNION ALL ' if prev_checked else ''}SELECT * FROM new{rid}
),
acc{rid} AS MATERIALIZED (
  {f'SELECT * FROM {prev_acc} UNION ALL ' if prev_acc else ''}SELECT n.query_id, n.point_id, d.dist
  FROM new{rid} n JOIN dist d ON d.query_id = n.query_id AND d.point_id = n.point_id
  WHERE d.dist < {cr}
),
fin{rid} AS MATERIALIZED (
  SELECT query_id FROM acc{rid} GROUP BY query_id HAVING count(*) >= {k}
)""")
        prev_checked, prev_acc, prev_fin = f"checked{rid}", f"acc{rid}", f"fin{rid}"
    return parts, prev_acc, prev_fin


def sql_ann_topk(fx) -> str:
    """fx: fixtures.AnnGateFixture -> one DuckDB SQL string returning
    (query_id, point_id, dist, rank) for finished queries, top-k by
    (dist, point_id)."""
    parts, prev_acc, prev_fin = _chain_parts(fx)
    parts.append(f"""ranked AS (
  SELECT a.query_id, a.point_id, a.dist,
         row_number() OVER (PARTITION BY a.query_id
                            ORDER BY a.dist, a.point_id) AS rank
  FROM {prev_acc} a JOIN {prev_fin} f ON f.query_id = a.query_id
)
SELECT CAST(query_id AS BIGINT) AS query_id,
       CAST(point_id AS BIGINT) AS point_id,
       round(dist, 6) AS dist, rank
FROM ranked WHERE rank <= {fx.k} ORDER BY query_id, rank""")
    return ",\n".join(parts[:-1]) + ",\n" + parts[-1]


def sql_ann_accuracy(fx) -> str:
    """The reference's evaluation metric (A5, LSHSearcher.java:283-316)
    replayed independently in SQL on the same unrolled chain: ground truth
    is the EXACT per-query top-k (brute force over the embedded vectors —
    the `dist` CTE already holds every pair distance), the found list is
    the chain's ranked output, and the metric is
    mean over finished queries of mean_j(found_j / true_j), zero-distance
    true neighbors counting ratio 1, plus the number of queries the search
    never finished -> one row (avg_ratio, n_missing)."""
    parts, prev_acc, prev_fin = _chain_parts(fx)
    nq, k = fx.queries.shape[0], fx.k
    parts.append(f"""ranked AS (
  SELECT a.query_id, a.point_id, a.dist,
         row_number() OVER (PARTITION BY a.query_id
                            ORDER BY a.dist, a.point_id) AS rank
  FROM {prev_acc} a JOIN {prev_fin} f ON f.query_id = a.query_id
),
truth AS MATERIALIZED (
  SELECT query_id, dist,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY dist, point_id) AS rank
  FROM dist
),
per_query AS (
  SELECT r.query_id,
         avg(CASE WHEN t.dist > 0 THEN r.dist / t.dist ELSE 1.0 END)
           AS q_ratio
  FROM ranked r
  JOIN truth t ON t.query_id = r.query_id AND t.rank = r.rank
  WHERE r.rank <= {k}
  GROUP BY r.query_id HAVING count(*) >= {k}
)
SELECT round(avg(q_ratio), 6) AS avg_ratio,
       CAST({nq} - count(*) AS BIGINT) AS n_missing
FROM per_query""")
    return ",\n".join(parts[:-1]) + ",\n" + parts[-1]
