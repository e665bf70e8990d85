"""Host-scoped boilerplate line stripping — the REWRITE form of the
gated `host_boilerplate` rule (entry_queries.q_host_boilerplate): an
8-token line occurring in >= tau_permille/1000 of a host's documents
(and in >= min_docs of them) is site chrome; every occurrence is cut
and the document is rebuilt from its surviving lines.

Like the whole line-dedup family (q_line_dedup, the streaming twins),
"lines" are 8-token chunks of the NORMALIZED token stream
(functions/text.doc_lines), so the rewritten text is the cleaned
normalized stream — the form a tokenizer pipeline consumes — not the
raw page bytes.

Scale shape: one explode -> one map-side-combining (host, lk) groupBy
(12-byte rows) -> one narrow join -> one per-doc groupBy for the
ordered reconstruction; the threshold is integer per-mille arithmetic.
The streaming counterpart is
streaming/dedup_stream.incremental_host_boilerplate_stream (verdict
state + changelog; the rule is non-monotone, see its docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from distributed_lsh_spark.functions.text import doc_lines


def strip_host_boilerplate(pages: DataFrame, *, host_col: str = "host",
                           tau_permille: int = 300,
                           min_docs: int = 2) -> DataFrame:
    """pages(doc_id, text, <host_col>) -> (doc_id, clean_text, n_lines,
    n_removed): text rebuilt without the host's boilerplate lines.

    Documents whose every line is boilerplate come back with
    clean_text = '' (they are pure chrome); zero-line documents (empty
    text) come back unchanged with n_lines = 0.
    """
    base = pages.select("doc_id", "text", F.col(host_col).alias("_host"))
    lines = (doc_lines(base.select("doc_id", "text"))
             .join(base.select("doc_id", "_host"), "doc_id"))
    host_docs = base.groupBy("_host").agg(F.count("*").alias("_hn"))
    boiler = (lines.groupBy("_host", "lk")
              .agg(F.count_distinct("doc_id").alias("_ln"))
              .join(host_docs, "_host")
              .where((F.col("_ln") >= min_docs)
                     & (F.col("_ln") * 1000 >= tau_permille * F.col("_hn")))
              .select("_host", "lk", F.lit(1).alias("_boiler")))
    flagged = (lines.join(boiler, ["_host", "lk"], "left")
               .select("doc_id", "pos", "_boiler",
                       F.when(F.col("_boiler").isNull(), F.col("line"))
                        .alias("line")))
    kept = F.array_sort(F.collect_list(
        F.when(F.col("_boiler").isNull(), F.struct("pos", "line"))))
    rebuilt = (flagged.groupBy("doc_id")
               .agg(F.count("*").alias("n_lines"),
                    F.count("_boiler").alias("n_removed"),
                    F.concat_ws(" ", kept["line"]).alias("clean_text")))
    # zero-line docs (empty/whitespace text) never explode a row — carry
    # them through unchanged so the rewrite tier is total
    return (base.join(rebuilt, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("clean_text", F.lit("")).alias("clean_text"),
                    F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
                    F.coalesce("n_removed", F.lit(0)).alias("n_removed")))
