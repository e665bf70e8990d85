from distributed_lsh_spark.streaming.dedup_stream import (
    incremental_dedup_stream,
    streaming_hourly_counts,
)

__all__ = ["incremental_dedup_stream", "streaming_hourly_counts"]
