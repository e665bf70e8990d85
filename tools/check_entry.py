"""Local replica of the driver's correctness gate: run each queries()[name]
on Spark and oracle_sql()[name] on DuckDB at the same sf, compare row count,
column names, and order-insensitive values (sorted by all columns).

Usage: python tools/check_entry.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, ".")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def compare(name: str, spark_df, duck_df) -> list[str]:
    problems = []
    s_cols = list(spark_df.columns)
    d_cols = list(duck_df.columns)
    if sorted(s_cols) != sorted(d_cols):
        return [f"{name}: column mismatch spark={s_cols} duck={d_cols}"]
    import pandas as pd
    sp = spark_df.toPandas()[sorted(s_cols)]
    dp = duck_df[sorted(s_cols)]
    if len(sp) != len(dp):
        return [f"{name}: row count spark={len(sp)} duck={len(dp)}"]
    sp = sp.sort_values(sorted(s_cols)).reset_index(drop=True)
    dp = dp.sort_values(sorted(s_cols)).reset_index(drop=True)
    for c in sorted(s_cols):
        a, b = sp[c], dp[c]
        # the driver's value-hash is dtype-sensitive (int64 vs HUGEINT->float64
        # mismatched in round 1 even when values printed identically)
        if a.dtype.kind != b.dtype.kind and {a.dtype.kind, b.dtype.kind} & {"f", "i", "u"}:
            problems.append(f"{name}.{c}: dtype kind mismatch spark={a.dtype} duck={b.dtype}")
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            bad = [(i, x, y) for i, (x, y) in enumerate(zip(a, b))
                   if not (pd.isna(x) and pd.isna(y)) and not math.isclose(float(x), float(y), rel_tol=1e-9, abs_tol=1e-9)]
        else:
            eq = a.astype(str) == b.astype(str)
            bad = [(i, a[i], b[i]) for i in eq[~eq].index]
        if bad:
            problems.append(f"{name}.{c}: {len(bad)} diffs, first {bad[:3]}")
    return problems


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    import __spark_entry__ as entry
    from distributed_lsh_spark.session import get_spark

    qs, sqls = entry.queries(), entry.oracle_sql()
    spark = get_spark(cores=8)
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            if name in sqls:
                ddf = con.sql(sqls[name]).df()
                probs = compare(name, sdf, ddf)
            else:
                n = sdf.count()
                probs = [] if n >= 0 else [f"{name}: count failed"]
                print(f"  (rows-only: {n})", end=" ")
        except Exception as exc:  # noqa: BLE001
            probs = [f"{name}: EXCEPTION {type(exc).__name__}: {exc}"]
        if probs:
            failures += 1
            print(f"FAIL {name}")
            for p in probs:
                print("   ", p[:500])
        else:
            print(f"ok   {name}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
