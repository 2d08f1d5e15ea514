"""Sales ETL — the reference's etl_sales pipeline as one lazy Spark chain.

Reference: scripts/etl_sales.py — per-file loop + rename (P1/P2) + project
(P3) + day-first dates (F8) + const fee (P4) + trim (F1) + broadcast SKU-map
join (J1) + coalesce fallback (P5) + tiered delivery fee (F9) + union (U1)
+ overwrite sink (S7).

Scale notes: the per-file loop collapses into one multi-path scan; the SKU
map is a small dimension -> broadcast hash join (no shuffle of the fact
side); everything else is narrow (no shuffle at all before the sink).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..clean import dayfirst_date, delivery_fee_kzt, normalize_header

# Russian -> canonical rename map (scripts/etl_sales.py:46-54).
RENAME_MAP = {
    "№_заказа": "order_id",
    "дата_поступления_заказа": "order_date",
    "дата_изменения_статуса": "status_date",
    "статус": "status",
    "название_товара_в_kaspi_магазине": "sku_name_raw",
    "количество": "qty",
    "сумма": "gross_price_kzt",
}

CANONICAL_COLS = [
    "order_id",
    "order_date",
    "status_date",
    "status",
    "sku_name_raw",
    "qty",
    "gross_price_kzt",
]


def normalize_and_rename(df: DataFrame) -> DataFrame:
    """P1 + P2: header normalization then RU->canonical rename; unknown
    columns are ignored (errors='ignore' semantics)."""
    normed = df.toDF(*[normalize_header(c) for c in df.columns])
    for src, dst in RENAME_MAP.items():
        if src in normed.columns:
            normed = normed.withColumnRenamed(src, dst)
    keep = [c for c in CANONICAL_COLS if c in normed.columns]
    return normed.select(*keep)


def clean_orders(raw: DataFrame, sku_map: DataFrame, fee_pct: float = 0.12) -> DataFrame:
    """The full etl_sales transform (scripts/etl_sales.py:56-66).

    ``raw`` has canonical columns with string dates; ``sku_map`` is the
    (sku_name_raw, sku_key, weight_g) dimension.
    """
    df = raw.withColumn("order_date", dayfirst_date("order_date"))
    if "status_date" in raw.columns:
        df = df.withColumn("status_date", dayfirst_date("status_date"))
    df = df.withColumn("kaspi_fee_pct", F.lit(fee_pct)).withColumn(
        "sku_name_raw", F.trim(F.col("sku_name_raw"))
    )
    joined = df.join(F.broadcast(sku_map), "sku_name_raw", "left")
    return joined.withColumn(
        "sku_key", F.coalesce(F.col("sku_key"), F.upper(F.col("sku_name_raw")))
    ).withColumn(
        "delivery_cost_kzt",
        delivery_fee_kzt(F.col("gross_price_kzt"), F.col("weight_g")),
    )


def write_orders(df: DataFrame, path: str) -> None:
    """S7: full-replace sink, date-partitioned for scale (etl_sales.py:76-78).

    At 100 TB, partitioning by order_date gives partition pruning for the
    dashboard's trailing-window queries.
    """
    df.write.mode("overwrite").partitionBy("order_date").parquet(path)
