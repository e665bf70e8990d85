"""Watermarked streaming rollup == batch rollup on the same files
(batch/stream parity for the windowed aggregation path)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from distributed_lsh_spark.streaming.dedup_stream import streaming_hourly_counts


def test_streaming_hourly_matches_batch(spark, tmp_path):
    src = str(tmp_path / "events_in")
    out = str(tmp_path / "events_out")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet") \
              .select("event_id", "ts", "user_id", "event_type", "value")
    ev.coalesce(2).write.parquet(src)

    agg = streaming_hourly_counts(spark, src + "/*")
    q = (agg.writeStream.outputMode("append")
         .format("parquet").option("path", out)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    got = {(r["hour_ts"], r["event_type"]): (r["n"], r["sum_value_cents"])
           for r in spark.read.parquet(out).collect()}

    batch = (ev.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
             .agg(F.count("*").alias("n"),
                  F.sum(F.round(F.col("value") * 100).cast("long")).alias("s"))
             .select(F.col("win.start").alias("hour_ts"), "event_type", "n", "s"))
    expect = {(r["hour_ts"], r["event_type"]): (r["n"], r["s"])
              for r in batch.collect()}
    # availableNow + append emits windows the watermark has closed; with a
    # bounded input every window except possibly the last open one closes
    assert got, "stream produced no output"
    for key, val in got.items():
        assert expect[key] == val
    missing = set(expect) - set(got)
    # only trailing windows (still open at end-of-stream) may be absent
    if missing:
        max_emitted = max(k[0] for k in got)
        assert all(k[0] >= max_emitted for k in missing)
