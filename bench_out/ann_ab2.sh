#!/bin/bash
for round in 1 2; do
  for v in old new; do
    cp /tmp/ann_$v.py /root/repo/distributed_lsh_spark/operators/ann.py
    echo "== $v round $round =="
    python /root/repo/bench_out/ann_ab.py 2>/dev/null
  done
done
cp /tmp/ann_new.py /root/repo/distributed_lsh_spark/operators/ann.py
