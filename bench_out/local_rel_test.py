import sys, time
sys.path.insert(0, "/root/repo")
from distributed_lsh_spark.session import get_spark
from pyspark.sql import functions as F
spark = get_spark(app_name="lr_test")
big = spark.range(100000).select(F.col("id").alias("point_id"), (F.col("id")%97).alias("bucket")).persist()
big.count()

# variant A: createDataFrame-backed small side
rows = [(i, i%97) for i in range(50)]
for rep in range(3):
    t0=time.time()
    sm = spark.createDataFrame(rows, "query_id long, bucket long")
    n = big.join(F.broadcast(sm), "bucket").select("query_id","point_id").collect()
    print(f"A createDataFrame rep{rep}: {time.time()-t0:.3f}s rows={len(n)}", flush=True)

# variant B: VALUES LocalRelation small side
vals = ",".join(f"({i},{i%97})" for i in range(50))
for rep in range(3):
    t0=time.time()
    sm = spark.sql(f"SELECT * FROM VALUES {vals} AS t(query_id, bucket)")
    n = big.join(F.broadcast(sm), "bucket").select("query_id","point_id").collect()
    print(f"B VALUES rep{rep}: {time.time()-t0:.3f}s rows={len(n)}", flush=True)
spark.stop()
