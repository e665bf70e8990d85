"""JSONL source/sink for pages tables — the LLM-pipeline interchange format.

Web-corpus tooling (CC downstreams, tokenizer pipelines, data loaders)
overwhelmingly speaks gzipped JSONL of {url, timestamp, text, lang}-shaped
records.  This module is the boundary adapter: parquet stays the internal
format (columnar pruning, pushdown, splittable), JSONL is for hand-off.

Scale notes:
* `read_jsonl` takes an EXPLICIT schema and never infers — schema
  inference is a full extra pass over the input (at 100 TB, a full extra
  scan) and silently widens types on dirty data.  Corrupt lines land in
  `_corrupt_record` (PERMISSIVE) instead of failing the job, and can be
  audited with one filter.
* gzip JSONL is not splittable: parallelism == file count.  `write_jsonl`
  therefore exposes `shards` (repartition before write) so the producer
  chooses the downstream task width; readers of third-party dumps should
  expect one task per .gz file.
* binary columns (the north-star `html`) are dropped on write — JSON has
  no binary type, and doubling a 100-TB corpus as base64 is never what a
  text hand-off wants.  Timestamps round-trip via Spark's default
  ISO-8601 JSON encoding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# the north-star pages shape minus the binary html column
PAGES_JSONL_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("_corrupt_record", T.StringType()),
])


def read_jsonl(spark: SparkSession, path: str,
               schema: T.StructType = PAGES_JSONL_SCHEMA) -> DataFrame:
    """JSONL (optionally .gz) -> DataFrame under an explicit schema.

    PERMISSIVE mode: malformed lines become rows with only
    `_corrupt_record` set, so one job both loads the clean data and
    quantifies the dirt.  Spark disallows plans whose referenced columns
    are ONLY the corrupt column (QUERY_ONLY_CORRUPT_RECORD_COLUMN), so
    audits must co-select a data column
    (`df.where(c.isNotNull()).select("url", "_corrupt_record")`) and
    pipelines should drop corrupt rows by filtering null DATA fields.
    """
    return (spark.read.schema(schema)
                 .option("mode", "PERMISSIVE")
                 .option("columnNameOfCorruptRecord", "_corrupt_record")
                 .json(path))


def write_jsonl(df: DataFrame, path: str, compression: str = "gzip",
                shards: int | None = None) -> int:
    """DataFrame -> gzipped JSONL shards; returns the row count written.

    Drops binary columns (JSON cannot carry them) and `shards` controls
    the output file count — i.e. the read parallelism every downstream
    gzip consumer will get.
    """
    keep = [f.name for f in df.schema.fields
            if not isinstance(f.dataType, T.BinaryType)]
    out = df.select(*keep)
    n = out.count()
    if shards:
        out = out.repartition(shards)
    (out.write.mode("overwrite")
        .option("compression", compression)
        .json(path))
    return n
