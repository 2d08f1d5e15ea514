"""StructType registry for every canonical table (FIXTURES.md) plus the
driver's synthetic volume tables (TESTDATA.md).

Explicit schemas everywhere: ingest never relies on inference, matching the
reference's declared-DDL + forced-string-ingest hybrid (SURVEY.md 1.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Driver synthetic tables (TPC-H-ish; /root/testdata/sf*/)
# ---------------------------------------------------------------------------

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] | None = None) -> dict[str, DataFrame]:
    """Read the driver parquet tables as DataFrames (schema from parquet)."""
    return {n: spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in (names or TESTDATA_TABLES)}


# ---------------------------------------------------------------------------
# Domain tables (reference-shaped; FIXTURES.md sections 1-8)
# ---------------------------------------------------------------------------

# FIXTURES.md 1 — marketplace order export after canonical rename.
# Reference: etl_sales.py rename map (scripts/etl_sales.py:46-54).
ORDERS_RAW = T.StructType(
    [
        T.StructField("order_id", T.LongType()),
        T.StructField("order_date", T.StringType()),  # day-first "31.07.2025"
        T.StructField("status_date", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("sku_name_raw", T.StringType()),
        T.StructField("qty", T.IntegerType()),
        T.StructField("gross_price_kzt", T.LongType()),
    ]
)

# Canonical orders after ETL (scripts/etl_sales.py:56-66 output columns).
ORDERS = T.StructType(
    [
        T.StructField("order_id", T.LongType()),
        T.StructField("order_date", T.DateType()),
        T.StructField("status_date", T.DateType()),
        T.StructField("status", T.StringType()),
        T.StructField("sku_name_raw", T.StringType()),
        T.StructField("qty", T.IntegerType()),
        T.StructField("gross_price_kzt", T.LongType()),
        T.StructField("kaspi_fee_pct", T.DoubleType()),
        T.StructField("sku_key", T.StringType()),
        T.StructField("weight_g", T.DoubleType()),
        T.StructField("delivery_cost_kzt", T.LongType()),
    ]
)

# FIXTURES.md 2 — SKU map projection used by the J1 join (etl_sales.py:14-22).
SKU_MAP = T.StructType(
    [
        T.StructField("sku_name_raw", T.StringType()),
        T.StructField("sku_key", T.StringType()),
        T.StructField("weight_g", T.DoubleType()),
    ]
)

# FIXTURES.md 3 — typed stock CSV (scripts/etl_stock.py:16).
STOCK = T.StructType(
    [
        T.StructField("sku_key", T.StringType()),
        T.StructField("qty_on_hand", T.IntegerType()),
    ]
)

# FIXTURES.md 4 — purchases after canonical rename (etl_purchases.py:32-52).
PURCHASES = T.StructType(
    [
        T.StructField("po_id", T.StringType()),
        T.StructField("sku_key", T.StringType()),
        T.StructField("order_date", T.DateType()),
        T.StructField("arrival_date", T.DateType()),
        T.StructField("qty", T.IntegerType()),
        T.StructField("unit_cogs_kzt", T.DoubleType()),
        T.StructField("freight_kzt", T.DoubleType()),
        T.StructField("total_cogs_kzt", T.DoubleType()),
    ]
)

# FIXTURES.md 5 — flat (exploded) sellers table for offer analytics.
SELLERS = T.StructType(
    [
        T.StructField("masterProductId", T.StringType()),
        T.StructField("productId", T.StringType()),
        T.StructField("label", T.StringType()),
        T.StructField("variantSize", T.StringType()),
        T.StructField("variantColor", T.StringType()),
        T.StructField("ratingAvg", T.DoubleType()),
        T.StructField("ratingCount", T.IntegerType()),
        T.StructField("name", T.StringType()),
        T.StructField("price", T.LongType()),
        T.StructField("deliveryDate", T.StringType()),
    ]
)

# FIXTURES.md 6 — repricing inputs.
PRICEBOT_SETTINGS = T.StructType(
    [
        T.StructField("merchantId", T.StringType()),
        T.StructField("sku", T.StringType()),
        T.StructField("active", T.BooleanType()),
        T.StructField("minPrice", T.LongType()),
        T.StructField("maxPrice", T.LongType()),
        T.StructField("stepKzt", T.LongType()),
        T.StructField("intervalMin", T.IntegerType()),
        T.StructField("ignoredOpponents", T.ArrayType(T.StringType())),
        T.StructField("currentPrice", T.LongType()),
    ]
)

OPPONENTS = T.StructType(
    [
        T.StructField("productId", T.StringType()),
        T.StructField("sku", T.StringType()),
        T.StructField("merchantId", T.StringType()),
        T.StructField("merchantName", T.StringType()),
        T.StructField("price", T.LongType()),
        T.StructField("isYou", T.BooleanType()),
    ]
)

# FIXTURES.md 7 — streaming price-watch events
# (apps/kaspi_offers_dashboard/scripts/price_watch.ts:53-63).
PRICE_WATCH_EVENTS = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("masterProductId", T.StringType()),
        T.StructField("variantId", T.StringType()),
        T.StructField("variantColor", T.StringType()),
        T.StructField("variantSize", T.StringType()),
        T.StructField("seller", T.StringType()),
        T.StructField("price", T.LongType()),
        T.StructField("deliveryDate", T.StringType()),
    ]
)

# FIXTURES.md 8 — size chart + customers for the J8 range join
# (scripts/size_recommendation_engine.py:34-117).
SIZE_CHART = T.StructType(
    [
        T.StructField("product_type", T.StringType()),
        T.StructField("gender", T.StringType()),
        T.StructField("h_min", T.IntegerType()),
        T.StructField("h_max", T.IntegerType()),
        T.StructField("w_min", T.IntegerType()),
        T.StructField("w_max", T.IntegerType()),
        T.StructField("size", T.StringType()),
    ]
)

CUSTOMERS_FIT = T.StructType(
    [
        T.StructField("customer_id", T.LongType()),
        T.StructField("height_cm", T.IntegerType()),
        T.StructField("weight_kg", T.IntegerType()),
        T.StructField("gender", T.StringType()),
        T.StructField("product_type", T.StringType()),
        T.StructField("age", T.IntegerType()),
    ]
)

# Catalog raw (FIXTURES.md 2) — all-string semicolon CSV columns.
CATALOG_RAW_COLUMNS = [
    "SKU_ID",
    "Kaspi_name_core",
    "MY_SIZE",
    "Size_kaspi",
    "Kaspi_art_1",
    "SKU_ID_KSP",
    "Kaspi_name_source",
    "Initial_KSP_Price",
    "Stock_entered",
    "SKU_key",
    "Secondary",
    "Product_Type",
    "Sub_Category",
    "Brend",
    "Model",
    "Color",
    "Our_Size",
    "Gender",
    "Season",
    "BaseCost_CNY",
    "Weight_kg",
    "Gender2",
    "Store_name",
    "Kaspi_art_2",
]

CATALOG_RAW = T.StructType([T.StructField(c, T.StringType()) for c in CATALOG_RAW_COLUMNS])
