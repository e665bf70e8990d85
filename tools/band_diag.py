"""Drill into band_verify: time candidate generation (with/without the
hot-bucket cap window) and verification separately.

Usage: python tools/band_diag.py [cores] [docs]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    docs_n = int(sys.argv[2]) if len(sys.argv) > 2 else 400_000

    from distributed_lsh_spark.conf import DEFAULT_CONFIG as CFG
    from distributed_lsh_spark.functions.hashing import band_keys
    from distributed_lsh_spark.operators.candidates import candidate_pairs
    from distributed_lsh_spark.operators.verify import verify_pairs
    from distributed_lsh_spark.pipeline import build_stages, exact_collapse, run_dedup
    from distributed_lsh_spark.session import get_spark
    from bench_scaling import ensure_corpus

    corpus = ensure_corpus(docs_n)
    spark = get_spark(app_name=f"banddiag_{cores}", cores=cores,
                      shuffle_partitions=max(cores * 2, 16))
    df = spark.read.parquet(corpus).select("doc_id", "text")
    run_dedup(df.where("pmod(doc_id, 20) = 0"), CFG).count()  # warmup
    spark.catalog.clearCache()

    base, _ = exact_collapse(df)
    st = build_stages(base, CFG, persist=True)
    st.signatures.count()

    t = {}
    t0 = time.perf_counter()
    bands = band_keys(st.signatures, CFG)
    n_band_rows = bands.count()
    t["band_keys_only"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    p_capped = candidate_pairs(bands, CFG)         # window cap + join + dropDup
    n_capped = p_capped.count()
    t["cands_capped"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    p_nocap = candidate_pairs(bands, CFG, cap=None)
    n_nocap = p_nocap.count()
    t["cands_nocap"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    n_ver = verify_pairs(p_capped, st.docs, CFG).count()
    t["verify_bcast"] = time.perf_counter() - t0

    t = {k: round(v, 2) for k, v in t.items()}
    t.update({"cores": cores, "n_band_rows": n_band_rows,
              "n_capped": n_capped, "n_nocap": n_nocap, "n_verified": n_ver})
    print(json.dumps(t), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
