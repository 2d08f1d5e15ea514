"""Readers for the reference's ingest formats (SURVEY.md 2.1 S1-S6, S10).

All file readers take glob paths — the reference's per-file loops (S4)
collapse into one multi-path scan so Spark parallelizes across files.
"""

from __future__ import annotations

import os
from glob import glob

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_semicolon_csv(
    spark: SparkSession,
    path: str,
    columns: list[str] | None = None,
    normalize_headers: bool = True,
) -> DataFrame:
    """S1 + P2: semicolon CSV, all-string, skip malformed lines
    (scripts/etl_sales.py:12-13 — sep=';', dtype=str, on_bad_lines='skip'),
    headers whitespace-collapsed and lowercased (etl_sales.py:45)."""
    reader = (
        spark.read.option("header", True)
        .option("sep", ";")
        .option("mode", "DROPMALFORMED")
        .option("encoding", "UTF-8")
    )
    if columns:
        reader = reader.schema(T.StructType([T.StructField(c, T.StringType()) for c in columns]))
    df = reader.csv(path)
    if normalize_headers:
        from ..clean import normalize_header

        df = df.toDF(*[normalize_header(c) for c in df.columns])
    return df


def read_typed_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """S2: typed CSV scan (scripts/etl_stock.py:16)."""
    return spark.read.schema(schema).option("header", True).csv(path)


def read_latest_csv(spark: SparkSession, pattern: str, schema: T.StructType) -> DataFrame:
    """S5: newest file by mtime (scripts/etl_stock.py:11). File listing is
    a driver-side metadata operation — cheap at any scale."""
    files = glob(pattern)
    if not files:
        raise FileNotFoundError(pattern)
    latest = max(files, key=os.path.getmtime)
    return read_typed_csv(spark, latest, schema)


def read_excel_bridge(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    """S3: Excel has no native Spark reader; bridge via driver-side pandas
    (scripts/etl_sales.py:43). Gated behind an import-try — openpyxl may be
    absent; production clusters would use the spark-excel datasource.
    """
    try:
        import pandas as pd

        pdf = pd.read_excel(path)  # requires openpyxl at runtime
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            "Excel bridge needs pandas+openpyxl or the com.crealytics:spark-excel datasource"
        ) from exc
    return spark.createDataFrame(pdf, schema=schema) if schema else spark.createDataFrame(pdf)


def read_nested_json(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """S12-consumer: nested AnalyzeResult JSON with explicit schema
    (permissive mode keeps corrupt rows observable)."""
    return spark.read.schema(schema).option("mode", "PERMISSIVE").json(path)


def read_parquet_evolving(
    spark: SparkSession, *paths: str, merge_schema: bool = True
) -> DataFrame:
    """Schema-evolution-tolerant parquet scan: unions files written at
    different schema versions (a long-lived fact table gains columns
    over the years) into the merged superset schema; files missing a
    column read it as NULL.

    Cost note for 100 TB: ``mergeSchema`` footer-merges EVERY file's
    schema at planning time — expensive on millions of files, which is
    why Spark defaults it OFF. Prefer a declared schema
    (``spark.read.schema(newest).parquet(...)``) once the superset is
    known; use this reader for discovery / ad-hoc reads where the
    superset isn't known up front.
    """
    return spark.read.option("mergeSchema", str(merge_schema).lower()).parquet(
        *paths
    )
