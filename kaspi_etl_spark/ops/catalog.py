"""Catalog ETL — cleaning, validation split, coverage report.

Reference: scripts/enhanced_catalog_parser.py:169-220 (P7 validation with
error/warning channels), :243-253 (value cleaning X3), :263-275 (A6 report
counts); scripts/etl_catalog_simple.py:119-151 (A5 value_counts).

Spark design: validation flags as ``when()`` columns computed once, then
the stream splits by flag into valid/reject DataFrames (two filters over
one cached scan — Catalyst reuses the exchange). No UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..clean import decimal_comma_to_double, strip_non_numeric_int


def clean_catalog(raw: DataFrame) -> DataFrame:
    """X3/F2/F3 cleaning over the all-string catalog scan."""
    return (
        raw.withColumn("weight_kg", decimal_comma_to_double("Weight_kg"))
        .withColumn("initial_price", strip_non_numeric_int("Initial_KSP_Price"))
        .withColumn("stock_entered", strip_non_numeric_int("Stock_entered", default=0))
        .withColumn("sku_id", F.trim(F.col("SKU_ID")))
        .withColumn("store_name", F.trim(F.col("Store_name")))
    )


def with_validation(df: DataFrame) -> DataFrame:
    """P7: error/warning flags (enhanced_catalog_parser.py:184-216).

    Missing SKU_ID -> reject; missing Store_name -> warning only.
    """
    missing_sku = F.col("sku_id").isNull() | (F.col("sku_id") == "")
    missing_store = F.col("store_name").isNull() | (F.col("store_name") == "")
    bad_price = F.col("initial_price").isNotNull() & (F.col("initial_price") < 0)
    return df.withColumn("is_valid", ~(missing_sku | bad_price)).withColumn(
        "warning",
        F.when(missing_store, F.lit("missing_store")).otherwise(F.lit(None).cast("string")),
    )


def split_valid(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """P7 dual output: (valid, rejects)."""
    flagged = with_validation(df)
    return flagged.filter(F.col("is_valid")), flagged.filter(~F.col("is_valid"))


def value_counts(df: DataFrame, col: str) -> DataFrame:
    """A5: frequency desc (etl_catalog_simple.py:138-146). Ties broken by
    value asc for determinism."""
    return (
        df.groupBy(col)
        .agg(F.count("*").cast("long").alias("count"))
        .orderBy(F.desc("count"), F.asc(col))
    )


def coverage_report(df: DataFrame, cols: list[str]) -> DataFrame:
    """A6: single-pass not-null/non-empty counts per column
    (enhanced_catalog_parser.py:263-275)."""
    aggs = [
        F.count(
            F.when(F.col(c).isNotNull() & (F.col(c).cast("string") != ""), 1)
        ).cast("long").alias(f"{c}_filled")
        for c in cols
    ]
    return df.agg(F.count("*").cast("long").alias("total_rows"), *aggs)
