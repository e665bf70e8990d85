"""Custom stateful streaming operator via `applyInPandasWithState`:
first-seen exact dedup over a content-hash key.

The foreachBatch pipeline (`dedup_stream.py`) carries the NEAR-dup path;
this operator is the stateful EXACT path a streaming ingest runs first
(the same exact-before-LSH ordering as the batch pipeline): group rows by
`md5(text)`, keep per-key state `(canonical_id, n_seen)` in the Spark
state store, and emit every row labeled with its canonical id and a
duplicate flag.

Semantics (documented divergence from batch `exact_dup_groups`):
  * canonical_id = the lowest doc_id in the FIRST micro-batch where the
    hash appears, sticky forever after (first-seen-wins).  Batch mode has
    the whole corpus and picks the global min id; a stream cannot.
  * state is the Spark state store: checkpointed with the query, restored
    across restarts, sharded by the groupBy hash — per-key state is a
    16-byte tuple, so 10^12 distinct pages is ~16 TB of state spread over
    the cluster's state stores (RocksDB provider at production scale).

Scale shape: one shuffle on the content hash per micro-batch (same key as
the batch exact pre-pass); state lookups are local to each state-store
partition.  No history rescan ever — the state store IS the history.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = ("doc_id long, text string, content_hash string, "
              "canonical_id long, is_dup boolean")
STATE_SCHEMA = "canonical_id long, n_seen long"


def _dedup_group(key: tuple, pdfs: Iterator[pd.DataFrame],
                 state: GroupState) -> Iterator[pd.DataFrame]:
    (canonical, n_seen) = state.get if state.exists else (None, 0)
    for pdf in pdfs:
        pdf = pdf.sort_values("doc_id")               # deterministic in-batch order
        ids = pdf["doc_id"].to_numpy()
        if canonical is None and len(ids):
            canonical = int(ids[0])
        yield pd.DataFrame({
            "doc_id": ids,
            "text": pdf["text"],                      # passthrough (not in state)
            "content_hash": pdf["content_hash"],
            "canonical_id": canonical,
            "is_dup": ids != canonical,
        })
        n_seen += len(ids)
    state.update((canonical, n_seen))


def stateful_exact_dedup(stream_df: DataFrame, key_expr=None) -> DataFrame:
    """(doc_id, text) stream -> (doc_id, text, content_hash, canonical_id,
    is_dup) stream with per-hash state in the Spark state store.

    `key_expr` customizes the dedup key (default: byte-level md5(text));
    see stateful_fuzzy_exact_dedup for the normalized-key twin."""
    key = key_expr if key_expr is not None else F.md5("text")
    keyed = stream_df.select(
        "doc_id", "text", key.alias("content_hash"))
    return keyed.groupBy("content_hash").applyInPandasWithState(
        _dedup_group, OUT_SCHEMA, STATE_SCHEMA, "append",
        GroupStateTimeout.NoTimeout)


def stateful_fuzzy_exact_dedup(stream_df: DataFrame) -> DataFrame:
    """Streaming twin of entry_queries.q_fuzzy_exact_dup_groups (Dolma
    exact-after-normalization): per-key state over md5 of the NORMALIZED
    token stream, so case/punctuation/spacing variants of already-seen
    content label is_dup in their arrival batch even though their bytes
    (and the byte-level twin's key) differ.  Same state-store shape and
    per-key cost as the byte-exact twin — the key is one codegen regexp
    scan upstream of the same stateful operator."""
    from distributed_lsh_spark.functions.text import token_stream

    return stateful_exact_dedup(
        stream_df, F.md5(token_stream("text").cast("binary")))


def run_stateful_dedup(spark: SparkSession, input_dir: str, state_dir: str,
                       schema: str = "doc_id long, text string",
                       max_files_per_trigger: int = 1,
                       fuzzy: bool = False):
    """Run the stateful exact-dedup stream over parquet drops in
    `input_dir` with availableNow (drains what is there, then stops);
    labeled rows land in `state_dir`/labeled, query state under
    `state_dir`/checkpoint.  Re-invoking after new drops resumes from the
    checkpoint with per-key state intact.  `fuzzy=True` keys state by the
    normalized token stream (stateful_fuzzy_exact_dedup) instead of raw
    bytes."""
    src = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", max_files_per_trigger)
           .parquet(input_dir))
    labeled = (stateful_fuzzy_exact_dedup(src) if fuzzy
               else stateful_exact_dedup(src))
    return (labeled.writeStream
            .format("parquet")
            .option("path", f"{state_dir}/labeled")
            .option("checkpointLocation", f"{state_dir}/checkpoint")
            .outputMode("append")
            .trigger(availableNow=True)
            .start())


# --------------------------------------------------------------------------
# stateful keep-latest-per-url: the funnel's url tier as a stream
# --------------------------------------------------------------------------

URL_OUT_SCHEMA = ("url string, doc_id long, warc_epoch long, "
                  "n_crawls long, changed boolean")
URL_STATE_SCHEMA = "doc_id long, warc_epoch long, n_crawls long"


def _latest_group(key: tuple, pdfs: "Iterator[pd.DataFrame]",
                  state: GroupState) -> "Iterator[pd.DataFrame]":
    (doc_id, epoch, n) = state.get if state.exists else (None, None, 0)
    for pdf in pdfs:
        n += len(pdf)
        # lexicographic max over (epoch, doc_id) — the batch tier's
        # max(struct(ts, doc_id)) keep rule
        top = pdf.sort_values(["warc_epoch", "doc_id"]).iloc[-1]
        be, bd = int(top["warc_epoch"]), int(top["doc_id"])
        changed = epoch is None or (be, bd) > (epoch, doc_id)
        if changed:
            epoch, doc_id = be, bd
        yield pd.DataFrame({"url": [key[0]], "doc_id": [doc_id],
                            "warc_epoch": [epoch], "n_crawls": [n],
                            "changed": [changed]})
    state.update((doc_id, epoch, n))


def stateful_url_latest(stream_df: DataFrame) -> DataFrame:
    """(doc_id, url, warc_epoch) stream -> one row per (url, micro-batch
    the url appears in) carrying the url's CURRENT winner under the batch
    funnel's keep rule (max (warc_epoch, doc_id)), its crawl count so
    far, and whether this batch changed the winner.

    The streaming twin of the funnel's url_latest tier.  Global
    keep-latest is inherently revisionary — a later batch can dethrone an
    earlier winner — so the stream emits the running winner in append
    mode (one row per appearance) instead of retracting: downstream takes
    each url's row with max (warc_epoch, doc_id), which is exactly the
    final winner because winners are monotone under the keep rule.
    State per url is a 24-byte tuple in the state store (same scale
    argument as stateful_exact_dedup); one shuffle on url per batch —
    the same key the batch tier groups by."""
    keyed = stream_df.select("url", "doc_id", "warc_epoch")
    return keyed.groupBy("url").applyInPandasWithState(
        _latest_group, URL_OUT_SCHEMA, URL_STATE_SCHEMA, "append",
        GroupStateTimeout.NoTimeout)


def run_stateful_url_latest(spark: SparkSession, input_dir: str,
                            state_dir: str,
                            schema: str = ("doc_id long, url string, "
                                           "warc_epoch long"),
                            max_files_per_trigger: int = 1):
    """availableNow runner, same contract as run_stateful_dedup: winners
    land in `state_dir`/latest, query state under `state_dir`/checkpoint;
    re-invoking after new drops resumes with per-url state intact."""
    src = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", max_files_per_trigger)
           .parquet(input_dir))
    return (stateful_url_latest(src).writeStream
            .format("parquet")
            .option("path", f"{state_dir}/latest")
            .option("checkpointLocation", f"{state_dir}/checkpoint")
            .outputMode("append")
            .trigger(availableNow=True)
            .start())
