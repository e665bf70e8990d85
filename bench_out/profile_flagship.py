"""Decompose flagship pipeline cost at sf0.1 with per-action timing (guide §1)."""
import sys, time
sys.path.insert(0, "/root/repo")
from distributed_lsh_spark.session import get_spark
from distributed_lsh_spark.conf import DEFAULT_CONFIG as CFG

SF = "/root/testdata/sf0.1"
spark = get_spark(app_name="profile", cores=32, shuffle_partitions=12)

def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"{dt:8.3f}s  {label}", flush=True)
    return out

def noop(df):
    df.write.format("noop").mode("overwrite").save()

# warm
from distributed_lsh_spark.entry_queries import QUERIES
t("warm minhash sf0.001", lambda: QUERIES["minhash_lsh_dup_pairs"](spark, "/root/testdata/sf0.001").count())

df = spark.read.parquet(f"{SF}/documents.parquet")
t("read+count docs", lambda: df.count())

from distributed_lsh_spark.pipeline import build_stages, exact_collapse, run_dedup
from distributed_lsh_spark.functions.signature import with_signatures
from pyspark.sql import functions as F

base = df.select("doc_id", "text")
# signature stage alone
sigs = with_signatures(base.repartition(96), CFG)
t("signatures noop (96 parts)", lambda: noop(sigs))
sigs2 = with_signatures(base.repartition(32), CFG)
t("signatures noop (32 parts)", lambda: noop(sigs2))
sigs3 = with_signatures(base, CFG)
t("signatures noop (input parts)", lambda: noop(sigs3))

# full verified chain
for rep in range(2):
    spark.catalog.clearCache()
    st = t(f"build_stages lazy rep{rep}", lambda: build_stages(df, CFG, persist=True))
    t(f"  verified count rep{rep}", lambda: st.verified.count())
    st.signatures.unpersist()

# clusters
for rep in range(2):
    spark.catalog.clearCache()
    t(f"run_dedup count rep{rep}", lambda: run_dedup(df, CFG).count())

# minhash query end-to-end again
t("q_minhash count", lambda: QUERIES["minhash_lsh_dup_pairs"](spark, SF).count())
t("q_dedup_clusters count", lambda: QUERIES["dedup_clusters"](spark, SF).count())
spark.stop()
