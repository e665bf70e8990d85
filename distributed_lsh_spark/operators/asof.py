"""Backward as-of join without a range join.

Spark has no ASOF JOIN operator (DuckDB/Pandas do); the naive SQL
formulation — an inequality join ``b.ts <= p.ts`` plus an argmax per
probe row — explodes to |probe| x |build| rows per key before the
row_number prunes it, which is exactly the quadratic blowup a temporal
join on a busy key cannot afford at scale.

The classic distributed formulation used here instead: tag both sides,
union them, sort once per key, and carry the most recent build payload
forward with ``last(..., ignorenulls=True)`` over an unbounded-preceding
window.  One shuffle on the key, O(n log n) per key, no intermediate
blowup — the same plan shape as sessionization.

The DuckDB oracle for the gated query (`events_asof_join` in
entry_queries.py) deliberately uses the OTHER formulation (inequality
join + row_number) so the two engines cross-check algorithm against
algorithm, not a translation against itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(probe: DataFrame, build: DataFrame, key: str,
              probe_ts: str, build_ts: str,
              matched_ts: str = "matched_ts") -> DataFrame:
    """For every probe row, attach the build row with the greatest
    ``build_ts <= probe_ts`` in the same ``key`` group (backward as-of,
    inclusive on equality: at equal timestamps the build row sorts
    first, so it IS visible to the probe).

    Requirements: ``build`` must be unique per (key, build_ts) — ties
    there would make the carried payload order-dependent; pre-aggregate
    (e.g. keep the max event per timestamp) before calling.  Probe rows
    with no earlier build row get NULL payload columns (left-join
    semantics); callers wanting inner semantics filter them out.

    Output columns: ``key``, ``probe_ts``, ``matched_ts`` (the matched
    build timestamp), then the probe payload columns, then the build
    payload columns.

    Scale: ONE hash shuffle on ``key`` and one per-key sort — the same
    cost envelope as a window sessionization; a skewed key degrades to a
    single-partition sort of that key's rows, never to a cross product.
    """
    b_payload = [c for c in build.columns if c not in (key, build_ts)]
    p_payload = [c for c in probe.columns if c not in (key, probe_ts)]
    overlap = set(b_payload) & set(p_payload)
    if overlap:
        raise ValueError(f"payload column collision: {sorted(overlap)}")
    # the output is (key, probe_ts, matched_ts, p_payload..., b_payload...);
    # any other name collision would emit ambiguous duplicate columns
    taken = {key, probe_ts, matched_ts}
    clash = (taken & set(b_payload)) | (taken & set(p_payload)) \
        | ({probe_ts, matched_ts} & {key})
    if matched_ts == probe_ts or clash:
        raise ValueError(
            f"output column collision: {sorted(clash or {matched_ts})} — "
            f"rename via matched_ts= or pre-select the inputs")

    b = build.select(
        F.col(key).alias("_k"), F.col(build_ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        F.col(build_ts).alias("_bts"),
        *[F.col(c).alias(f"_b_{c}") for c in b_payload],
        *[F.lit(None).cast(probe.schema[c].dataType).alias(f"_p_{c}")
          for c in p_payload])
    p = probe.select(
        F.col(key).alias("_k"), F.col(probe_ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(build.schema[build_ts].dataType).alias("_bts"),
        *[F.lit(None).cast(build.schema[c].dataType).alias(f"_b_{c}")
          for c in b_payload],
        *[F.col(c).alias(f"_p_{c}") for c in p_payload])

    w = (Window.partitionBy("_k")
         .orderBy(F.col("_ts").asc(), F.col("_tag").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = [F.last(f"_b_{c}", ignorenulls=True).over(w).alias(c)
               for c in b_payload]
    out = (b.unionByName(p)
           .select("_k", "_ts", "_tag",
                   F.last("_bts", ignorenulls=True).over(w).alias(matched_ts),
                   *carried,
                   *[F.col(f"_p_{c}").alias(c) for c in p_payload])
           .where(F.col("_tag") == 1)
           .select(F.col("_k").alias(key), F.col("_ts").alias(probe_ts),
                   matched_ts, *p_payload, *b_payload))
    return out


__all__ = ["asof_join"]
