"""Bit-faithful NumPy re-implementation of the reference's p-stable LSH:
hash-table construction and c-k-ANN query semantics
(BASELINE.json: "validated ... against the reference's hash-table
construction and ANN-query test cases").

Faithful pieces (citations under /root/reference/MapReduce-LSH/core/src/
main/java/cn/edu/sysu/distributedLSH/):
  * parameter derivation: f, p1, p2, m, L, u, U
    (common/LSH.java:74-104,192-215) — via plans.planner.reference_parameters
  * hash family h_{i,j}(v) = a.v + b, a ~ N(0,1), b ~ U[0, 2^f * w]
    (common/LSH.java:141-176)
  * bucket quantization floor((h + U/2) / (w*R)) with range guard, then
    standard-hash compression Sum(comp_i * sh_i) with the 64->32 fold
    (x & (2^32-1)) + 5*(x >> 32), mod 2^31-1  (common/LSH.java:242-270)
  * radius schedule radii[i] = c^i (lsh/builder/HashReducer.java:66-72)
  * per-radius candidate collection across L tables, dedup (P6), cap at
    searchThreshold = pruneFactor*L + k (lsh/searcher/SearchMapper.java:266),
    exact L2 acceptance dist < c*R (SearchMapper.java:107-126), bounded
    k-max-heap, finish when k neighbors found or radii exhausted (NDLSH
    driver loop, Naive-DLSH/.../lsh/searcher/LSHSearcher.java:212-252,
    CheckCandidateReducer.java:61-73)

Documented determinism fixes (the reference is irreproducible run-to-run):
  * parameters drawn from seeded numpy Generator instead of the unseeded
    java.util.Random (common/LSHTool.java:11)
  * candidates are capped in sorted-index order instead of Java HashSet
    iteration order (Naive-DLSH/.../lsh/searcher/CollectCandidateReducer.java:
    124-146 iterates a HashMap)

The Spark ANN module (operators/ann.py) implements the SAME semantics with
DataFrame ops; tests assert exact agreement with this oracle.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from distributed_lsh_spark.plans.planner import reference_parameters

MASK32 = (1 << 32) - 1
PRIME_31 = (1 << 31) - 1
MAX_HASH_BASE = 1 << 29     # LSH.java:19
WIDTH = 4.0                 # LSH.java:23


@dataclass
class ReferenceLSHModel:
    """The hash family + derived parameters for one dataset."""

    dim: int
    max_coordinate: int
    cardinality: int
    ratio: int = 2
    seed: int = 42
    prune_factor: int = 3

    m: int = field(init=False)
    L: int = field(init=False)
    n_radii: int = field(init=False)
    u: int = field(init=False)
    U: float = field(init=False)
    proj: np.ndarray = field(init=False)         # (L, m, dim) float64
    shift: np.ndarray = field(init=False)        # (L, m) float64
    standard_hash: np.ndarray = field(init=False)  # (m,) int64 in [1, 2^29)

    def __post_init__(self) -> None:
        d, t, n, c = self.dim, self.max_coordinate, self.cardinality, self.ratio
        f = int(np.ceil(np.log2(d) + np.log2(t)))
        if f > 60:
            raise ValueError("origVecBitWidth (f) > 60")  # LSH.java:79-82
        params = reference_parameters(n, d, t, c, WIDTH)
        self.m, self.L, self.n_radii = params.m, params.L, params.n_radii

        rng = np.random.default_rng(self.seed)
        self.proj = rng.standard_normal((self.L, self.m, d))
        max_shift = float((1 << f) * int(WIDTH))     # LSH.java:144
        self.shift = rng.uniform(0.0, max_shift, size=(self.L, self.m))
        self.standard_hash = rng.integers(1, MAX_HASH_BASE, size=self.m,
                                          dtype=np.int64)

        # hashVecBitWidth u (LSH.java:192-215): bound on the quantized coord
        mx = float(2 ** f)
        sums = np.abs(self.proj).sum(axis=2)                      # (L, m)
        hv = 2.0 * (sums * t + self.shift) / WIDTH
        mx = max(mx, float(hv.max()))
        self.u = int(np.ceil(np.log2(mx) - 1)) + 1
        if self.u > 30:
            raise ValueError("hashVecBitWidth too large (>= 31)")  # LSH.java:211-214
        self.U = float((1 << self.u) * WIDTH)                      # LSH.java:94

    # ---- bucket function (LSH.java:220-270) ---------------------------
    def bucket_ids(self, table_id: int, radius: int, points: np.ndarray) -> np.ndarray:
        """Vectorized calcHashValue for an (n, dim) int array -> (n,) int32."""
        hv = points @ self.proj[table_id].T + self.shift[table_id]   # (n, m)
        shifted = np.floor((hv + self.U / 2.0) / (WIDTH * radius)).astype(np.int64)
        if (shifted < 0).any() or (shifted >= (1 << self.u)).any():
            raise ValueError("Illegal coordinate in the hash space")  # LSH.java:252-257
        out = np.zeros(len(points), dtype=np.int64)
        for i in range(self.m):
            out += shifted[:, i] * self.standard_hash[i]
            out = (out & MASK32) + 5 * (out >> 32)    # LSH.java:263-265
            out %= PRIME_31
        return out

    def radii(self) -> list[int]:
        return [self.ratio ** i for i in range(self.n_radii)]  # HashReducer.java:66-72


def build_hash_tables(model: ReferenceLSHModel, points: np.ndarray,
                      ) -> dict[tuple[int, int], dict[int, list[int]]]:
    """(radiusID, tableID) -> {bucketID: [point index...]} — the BucketTable
    construction (MapReduce-LSH/.../lsh/builder/HashReducer.java:189-209)."""
    tables: dict[tuple[int, int], dict[int, list[int]]] = {}
    for rid, radius in enumerate(model.radii()):
        for tid in range(model.L):
            buckets: dict[int, list[int]] = {}
            for idx, b in enumerate(model.bucket_ids(tid, radius, points)):
                buckets.setdefault(int(b), []).append(idx)
            tables[(rid, tid)] = buckets
    return tables


@dataclass
class AnnResult:
    query_id: int
    neighbors: list[tuple[float, int]]       # sorted ascending (dist, index)
    finished_radius: int | None              # radiusID where k was reached


def ann_search(model: ReferenceLSHModel, points: np.ndarray, queries: np.ndarray,
               k: int, tables: dict | None = None) -> list[AnnResult]:
    """NDLSH-style radius-expansion search (see module docstring)."""
    if tables is None:
        tables = build_hash_tables(model, points)
    search_threshold = model.prune_factor * model.L + k   # SearchMapper.java:266
    results: list[AnnResult] = []

    for qid, q in enumerate(queries):
        accepted: list[tuple[float, int]] = []   # pool == k-heap contents:
        # the heap only ever drops entries once >= k are accepted, and the
        # final top-k by (dist, idx) is a deterministic refinement of the
        # reference heap's dist-only ordering (ties broken by index).
        checked: set[int] = set()                # P6 across radii
        finished = None
        for rid, radius in enumerate(model.radii()):
            ratio_radius = model.ratio * radius
            cands: set[int] = set()
            for tid in range(model.L):
                b = int(model.bucket_ids(tid, radius, q[None, :])[0])
                cands.update(tables[(rid, tid)].get(b, ()))
            cands -= checked
            new = sorted(cands)[:search_threshold]       # deterministic cap (A4)
            for idx in new:
                checked.add(idx)
                dist = float(np.sqrt(((points[idx] - q).astype(np.float64) ** 2).sum()))
                if dist < ratio_radius:                   # P4: dist < c*R
                    accepted.append((dist, idx))
            if len(accepted) >= k:                        # CheckCandidateReducer.java:61-64
                finished = rid
                break
        results.append(AnnResult(
            query_id=qid,
            neighbors=sorted(accepted)[:k],
            finished_radius=finished))
    return results


def avg_ratio(results: list[AnnResult], ground_truth: np.ndarray, k: int,
              ) -> tuple[float, int]:
    """The reference's accuracy metric: mean over finished queries of
    mean_j(found_dist_j / true_dist_j), plus missing-query count
    (MapReduce-LSH/.../lsh/searcher/LSHSearcher.java:283-316)."""
    ratios, missing = [], 0
    for r in results:
        if len(r.neighbors) < k:
            missing += 1
            continue
        found = np.array([d for d, _ in r.neighbors[:k]])
        true = ground_truth[r.query_id][:k]
        with np.errstate(divide="ignore", invalid="ignore"):
            ratio = np.where(true > 0, found / true, 1.0)
        ratios.append(float(ratio.mean()))
    return (float(np.mean(ratios)) if ratios else float("nan")), missing
