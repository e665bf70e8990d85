"""Multimodal columns: image/audio/video as opaque `binary` with typed
metadata; decode/feature-extract/resize/frame-sample as Arrow-vectorized
UDFs over mapInPandas.

The Spark-side plumbing (schemas, batch iteration, partitioning, UDF
signatures) is real and tested; the actual media decoding is STUBBED —
this container has no image/audio libraries — behind `_decode_image`:
with `fake=True` (default) it derives a small deterministic feature vector
from the bytes (so tests pin end-to-end behavior); with `fake=False` it
raises NotImplementedError where a real decoder (PIL/ffmpeg) would plug in.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),        # image|audio|video
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.IntegerType(), True),
    T.StructField("payload", T.BinaryType(), True),      # opaque bytes
])

FEATURE_DIM = 64


def _decode_image(payload: bytes, fake: bool = True) -> np.ndarray:
    """STUB decode -> FEATURE_DIM float32 features.

    fake=True: deterministic features from the byte content (xxhash-free:
    a fixed linear hash over byte histogram), so the distributed plumbing
    is testable without media libs.  fake=False is the real-decoder seam.
    """
    if not fake:
        raise NotImplementedError(
            "real image decoding requires PIL/libjpeg — not in this container; "
            "plug a decoder in here")
    hist = np.bincount(np.frombuffer(payload or b"\x00", dtype=np.uint8),
                       minlength=256).astype(np.float64)
    hist /= max(hist.sum(), 1.0)
    # fixed random projection (seeded) of the byte histogram
    rng = np.random.RandomState(1234)
    proj = rng.standard_normal((FEATURE_DIM, 256))
    return (proj @ hist).astype(np.float32)


def media_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """(media_id, payload, ...) -> (media_id, kind, feature array<float>).

    mapInPandas: batch-iterating Arrow frames keeps peak memory bounded by
    batch size even when payloads are MBs each — at scale, pair with
    spark.sql.execution.arrow.maxRecordsPerBatch to cap batch bytes.
    """
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [_decode_image(p, fake=fake).tolist() for p in pdf["payload"]]
            yield pd.DataFrame({"media_id": pdf["media_id"],
                                "kind": pdf["kind"], "feature": feats})

    return df.mapInPandas(batches, schema=out_schema)


def frame_sample(df: DataFrame, every_ms: int = 1000, fake: bool = True) -> DataFrame:
    """video rows -> one row per sampled frame (media_id, frame_ts_ms,
    feature).  Frame extraction is stubbed like decode: frame features are
    derived deterministically from (payload, frame index)."""
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_ts_ms", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"media_id": [], "frame_ts_ms": [], "feature": []}
            for mid, dur, payload in zip(pdf["media_id"], pdf["duration_ms"],
                                         pdf["payload"]):
                n = max(1, int(dur or 0) // every_ms)
                base = _decode_image(payload, fake=fake)
                for j in range(n):
                    f = base.copy()
                    f[j % FEATURE_DIM] += float(j + 1)  # deterministic per-frame twist
                    rows["media_id"].append(mid)
                    rows["frame_ts_ms"].append(j * every_ms)
                    rows["feature"].append(f.tolist())
            yield pd.DataFrame(rows)

    return df.where(F.col("kind") == "video").mapInPandas(batches, schema=out_schema)
