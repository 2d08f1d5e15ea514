"""Driver-contract tests: entry() runs, every oracle key has a query, and
query/oracle column names line up (the driver hash-compares by sorted
column name)."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry_mod

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_oracle_keys_subset_of_queries():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    missing = set(o) - set(q)
    assert not missing, f"oracle_sql keys without queries: {missing}"


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql()))
def test_oracle_columns_match(spark, sf_dir, name):
    """Column-name parity between Spark query and DuckDB oracle — schema
    only (values are the driver's job; tools/check_oracle.py runs full
    value comparison)."""
    sdf = entry_mod.queries()[name](spark, sf_dir)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    rel = con.execute(f"SELECT * FROM ({entry_mod.oracle_sql()[name]}) LIMIT 0")
    duck_cols = [d[0] for d in rel.description]
    assert sorted(sdf.columns) == sorted(duck_cols)
