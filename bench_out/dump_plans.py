"""Dump .explain('formatted') for named queries into plans/r06/<q>_<tag>.txt."""
import io, sys
from contextlib import redirect_stdout
sys.path.insert(0, "/root/repo")
from distributed_lsh_spark.session import get_spark
from distributed_lsh_spark.entry_queries import QUERIES

tag = sys.argv[1]
names = sys.argv[2:]
SF = "/root/testdata/sf0.1"
spark = get_spark(app_name="plans", cores=8, shuffle_partitions=12)
for name in names:
    df = QUERIES[name](spark, SF)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    with open(f"/root/repo/plans/r06/{name}_{tag}.txt", "w") as f:
        f.write(buf.getvalue())
    txt = buf.getvalue()
    print(f"{name}: {txt.count('Exchange')} Exchange, "
          f"{txt.count('ArrowEvalPython')+txt.count('BatchEvalPython')+txt.count('MapInPandas')+txt.count('FlatMapGroupsInPandas')} py-nodes, "
          f"{txt.count('SortMergeJoin')} SMJ, {txt.count('BroadcastHashJoin')} BHJ",
          flush=True)
spark.stop()
