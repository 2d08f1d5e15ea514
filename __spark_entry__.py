"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` exposes
one callable per implemented operator from SURVEY.md section 2 (plus the
LLM-pipeline operators); ``oracle_sql()`` gives the DuckDB-equivalent SQL
for every SQL-expressible query. Implementations live in
``kaspi_etl_spark`` — this module is just the wiring.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kaspi_etl_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: daily net revenue over sf0.001 (dashboard.py:51-56
    semantics on the synthetic orders table)."""
    return registry.q_daily_net_revenue(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(registry.ORACLES)
