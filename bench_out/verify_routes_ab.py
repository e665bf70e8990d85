"""Disclosed measurement of the verify stage's TWO dispatch routes on the
same corpus: auto (broadcast route at this pair density) vs
BROADCAST_PAIRS_MAX_ROWS forced to 0 (the bucketed-shuffle route
production takes at 10^10+ pairs).  Results must be identical; report
wall seconds per route (min of N) + pair-count parity."""
import sys, time
sys.path.insert(0, "/root/repo")
N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 2

from bench_scaling import ensure_corpus
corpus = ensure_corpus(N_DOCS)

from distributed_lsh_spark.session import get_spark
from distributed_lsh_spark.conf import DEFAULT_CONFIG as C
from distributed_lsh_spark.pipeline import run_dedup
import distributed_lsh_spark.operators.verify as V

spark = get_spark(app_name="verify_routes", cores=32)
df = spark.read.parquet(corpus).select("doc_id", "text")
# warmup (real shape, slice)
run_dedup(df.where("pmod(doc_id, 10) = 0"), C).count()
spark.catalog.clearCache()

orig = V.BROADCAST_PAIRS_MAX_ROWS
out = {}
for route, cap in (("broadcast_auto", orig), ("forced_shuffle", 0)):
    V.BROADCAST_PAIRS_MAX_ROWS = cap
    best, n = 1e9, None
    for rep in range(REPS):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        n = run_dedup(df, C).count()
        dt = time.perf_counter() - t0
        best = min(best, dt)
        print(f"  {route} rep{rep}: {dt:.2f}s clustered={n}", flush=True)
    out[route] = (best, n)
V.BROADCAST_PAIRS_MAX_ROWS = orig
(b, nb), (s, ns) = out["broadcast_auto"], out["forced_shuffle"]
print(f"RESULT docs={N_DOCS} broadcast={b:.2f}s shuffle={s:.2f}s "
      f"ratio={s/b:.3f} clustered_equal={nb == ns} ({nb})", flush=True)
spark.stop()
