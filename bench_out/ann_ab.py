"""Isolated ann_topk timing on the current tree: 3 reps in one session."""
import sys, time
sys.path.insert(0, "/root/repo")
from distributed_lsh_spark.session import get_spark
from distributed_lsh_spark.entry_queries import QUERIES

spark = get_spark(app_name="ann_ab")
sc = spark.sparkContext
SF = "/root/testdata/sf0.1"
# warm the JVM/python workers on an unrelated cheap query
QUERIES["exact_dup_groups"](spark, SF).write.format("noop").mode("overwrite").save()
for rep in range(3):
    t0 = time.time(); j0 = len(sc.statusTracker().getJobIdsForGroup(None) or [])
    QUERIES["ann_topk"](spark, SF).write.format("noop").mode("overwrite").save()
    t1 = time.time(); j1 = len(sc.statusTracker().getJobIdsForGroup(None) or [])
    print(f"rep{rep}: {t1-t0:.3f}s  jobs={j1-j0}", flush=True)
spark.stop()
