"""Driver-contract consistency: every oracle_sql key exists in queries();
every oracle SQL parses and runs in DuckDB at sf0.001 (no Spark needed)."""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entry  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def test_oracle_keys_subset_of_queries():
    qs, sqls = entry.queries(), entry.oracle_sql()
    assert set(sqls) <= set(qs)
    assert len(qs) >= 12


def test_every_oracle_sql_runs_in_duckdb(con):
    for name, sql in entry.oracle_sql().items():
        df = con.sql(sql).df()
        assert df is not None, name
        assert len(df.columns) >= 1, name


def test_dup_pair_oracles_share_columns(con):
    sqls = entry.oracle_sql()
    a = con.sql(sqls["minhash_lsh_dup_pairs"]).df()
    b = con.sql(sqls["ngram_jaccard_dup_pairs"]).df()
    assert list(a.columns) == list(b.columns) == ["id_a", "id_b", "jaccard"]
