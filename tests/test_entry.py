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


# --- Value parity for driver-ungated queries -------------------------------
# The round driver hash-verifies only the FIRST 50 entries of queries();
# everything after that prefix would otherwise be column-checked only. This
# test closes the trust gap: full order-insensitive value comparison (same
# normalization as tools/check_oracle.py) at sf0.001 for every oracled query
# OUTSIDE the driver's window. The first 50 are deliberately excluded — the
# driver itself verifies those at sf0.01.

sys_path_tools = __import__("pathlib").Path(__file__).resolve().parent.parent / "tools"
import sys  # noqa: E402

sys.path.insert(0, str(sys_path_tools))
import check_oracle  # noqa: E402

_UNGATED = [n for n in list(entry_mod.queries())[50:] if n in entry_mod.oracle_sql()]


@pytest.fixture(scope="module")
def duck_con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", _UNGATED)
def test_oracle_values_ungated(spark, sf_dir, duck_con, name):
    sdf = entry_mod.queries()[name](spark, sf_dir)
    result = check_oracle.compare(name, sdf, duck_con)
    assert result["status"] == "OK", result
