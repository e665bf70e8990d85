"""Per-stage scaling diagnostic: times signature / band+verify / CC
separately at two parallelism levels to localize non-scaling cost.

Usage: python tools/scaling_diag.py [--docs 400000] [--cores 2 8]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def run_level(cores: int, corpus: str) -> dict:
    from pyspark.sql import functions as F

    from distributed_lsh_spark.conf import DEFAULT_CONFIG as CFG
    from distributed_lsh_spark.operators.connected_components import connected_components
    from distributed_lsh_spark.pipeline import build_stages, exact_collapse
    from distributed_lsh_spark.session import get_spark

    spark = get_spark(app_name=f"diag_{cores}", cores=cores,
                      shuffle_partitions=max(cores * 2, 16))
    try:
        df = spark.read.parquet(corpus).select("doc_id", "text")
        # warmup on a 10% slice (real shape)
        from distributed_lsh_spark.pipeline import run_dedup
        run_dedup(df.where("pmod(doc_id, 10) = 0"), CFG).count()
        spark.catalog.clearCache()

        t = {}
        t0 = time.perf_counter()
        base, exact_edges = exact_collapse(df)
        exact_edges = exact_edges.localCheckpoint(eager=True)
        n_reps = base.count()
        t["exact_prepass"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        st = build_stages(base, CFG, persist=True)
        st.signatures.count()      # materialize the persist
        t["signatures"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        edges = st.verified.select("id_a", "id_b") \
                  .unionByName(exact_edges.select("id_a", "id_b")) \
                  .localCheckpoint(eager=True)
        n_edges = edges.count()
        t["band_verify"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        n_clustered = connected_components(edges).count()
        t["cc"] = time.perf_counter() - t0

        t = {k: round(v, 2) for k, v in t.items()}
        t.update({"cores": cores, "n_reps": n_reps, "n_edges": n_edges,
                  "n_clustered": n_clustered,
                  "total": round(sum(v for k, v in t.items()
                                     if isinstance(v, float)), 2)})
        return t
    finally:
        spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=400_000)
    ap.add_argument("--cores", type=int, nargs=2, default=[2, 8])
    args = ap.parse_args()
    from bench_scaling import ensure_corpus
    corpus = ensure_corpus(args.docs)
    for cores in args.cores:
        res = run_level(cores, corpus)
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
