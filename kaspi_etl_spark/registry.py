"""Query registry — pairs every implemented operator with a DuckDB oracle.

Each entry maps a SURVEY.md section-2 operator (or an LLM-pipeline op) onto
the driver's synthetic tables (TESTDATA.md). The Spark side runs the real
engine operators from kaspi_etl_spark.ops/llm; the oracle side is ANSI SQL
DuckDB runs on the same parquet files. Column names and value semantics
must match bit-for-bit:

  - integer outputs are cast to BIGINT on both sides;
  - money/metric sums run over exact integers or DECIMAL casts so the
    reduction is order-independent (a plain double SUM differs between
    engines and between runs);
  - variance/stddev are computed from exact integer sum/sum-of-squares,
    with the final arithmetic done in IEEE doubles identically on both
    sides;
  - every fractional SQL literal is CAST(x AS DOUBLE) so DuckDB's DECIMAL
    literals don't change arithmetic semantics.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .clean import dayfirst_date, delivery_fee_kzt
from .ops import analytics as analytics_ops
from .ops import catalog as catalog_ops
from .ops import inventory as inventory_ops
from .ops import offers as offers_ops
from .ops import purchases as purchases_ops
from .ops import reprice as reprice_ops
from .ops import revenue as revenue_ops
from .ops import sizing as sizing_ops

# ---------------------------------------------------------------------------
# Shared testdata -> domain derivations.
# The SQL fragments are the single source of truth for the oracle side; the
# _spark_* functions must mirror them operation-for-operation.
# ---------------------------------------------------------------------------

SQL_ORDERS_KASPI = """
  SELECT o_orderkey AS order_id,
         CAST(o_orderdate AS DATE) AS order_date,
         o_orderstatus AS status,
         CAST(1 + o_orderkey % 3 AS INT) AS qty,
         CAST(round(o_totalprice) AS BIGINT) AS gross_price_kzt,
         CAST(0.12 AS DOUBLE) AS kaspi_fee_pct,
         CAST(o_orderkey % 5000 AS DOUBLE) AS weight_g
  FROM orders
"""

# Tiered delivery fee (F9) over a gross/weight pair — SQL mirror of
# clean.delivery_fee_kzt.
SQL_DELIVERY_FEE = """
  CAST(CASE WHEN gross_price_kzt >= 15000 THEN 0
            WHEN gross_price_kzt >= 10000 THEN 699
            WHEN gross_price_kzt >= 5000 THEN 799
            ELSE 999 END
       + COALESCE(GREATEST(0, CAST(CEIL(weight_g / 1000.0) AS BIGINT) - 3) * 399, 0)
       AS BIGINT)
"""

SQL_SALES_SKU = """
  SELECT 'SKU_' || CAST(l_partkey AS VARCHAR) AS sku_key,
         CAST(l_shipdate AS DATE) AS order_date,
         CAST(l_quantity AS INT) AS qty,
         CAST(round(l_extendedprice) AS BIGINT) AS gross_price_kzt,
         CAST(0.12 AS DOUBLE) AS kaspi_fee_pct,
         CAST(NULL AS DOUBLE) AS weight_g
  FROM lineitem
"""

SQL_SELLERS = """
  SELECT 'M' || CAST(l_partkey % 50 AS VARCHAR) AS masterProductId,
         CAST(l_partkey AS VARCHAR) AS productId,
         'Seller ' || CAST(l_suppkey AS VARCHAR) AS name,
         CASE WHEN l_orderkey % 37 = 0 THEN CAST(0 AS BIGINT)
              ELSE CAST(round(l_extendedprice) AS BIGINT) END AS price,
         CASE WHEN l_orderkey % 11 = 0 THEN ''
              ELSE strftime(l_shipdate, '%Y-%m-%d') END AS deliveryDate,
         CAST(l_orderkey % 500 AS INT) AS ratingCount,
         l_orderkey * 10 + l_linenumber AS row_uid
  FROM lineitem
"""

SQL_STOCK = """
  SELECT 'SKU_' || CAST(p_partkey AS VARCHAR) AS sku_key,
         CAST((p_partkey * 7) % 50 AS INT) AS qty_on_hand
  FROM part
"""

SQL_SETTINGS = """
  SELECT 'SKU_' || CAST(p_partkey AS VARCHAR) AS sku,
         p_partkey % 10 <> 0 AS active,
         CAST(round(p_retailprice * CAST(0.8 AS DOUBLE)) AS BIGINT) AS minPrice,
         CASE WHEN p_partkey % 13 = 0 THEN CAST(0 AS BIGINT)
              ELSE CAST(round(p_retailprice * CAST(1.4 AS DOUBLE)) AS BIGINT) END AS maxPrice,
         CAST(CASE p_partkey % 3 WHEN 0 THEN 1 WHEN 1 THEN 50 ELSE 100 END AS BIGINT) AS stepKzt,
         CAST(round(p_retailprice) AS BIGINT) AS currentPrice
  FROM part
"""

SQL_OPPONENTS = """
  SELECT 'SKU_' || CAST(l_partkey AS VARCHAR) AS sku,
         CAST(l_partkey AS VARCHAR) AS productId,
         'M' || CAST(l_suppkey AS VARCHAR) AS merchantId,
         'Merchant ' || CAST(l_suppkey AS VARCHAR) AS merchantName,
         CASE WHEN l_orderkey % 37 = 0 THEN CAST(0 AS BIGINT)
              ELSE CAST(round(l_extendedprice) AS BIGINT) END AS price,
         l_suppkey = 1 AS isYou
  FROM lineitem
"""

GLOBAL_IGNORE_MERCHANTS = ["M3", "M7"]

SQL_CUSTOMERS_FIT = """
  SELECT c_custkey AS customer_id,
         CAST(150 + c_custkey % 45 AS INT) AS height_cm,
         CAST(45 + (c_custkey * 7) % 75 AS INT) AS weight_kg,
         CASE WHEN c_custkey % 2 = 0 THEN 'Men' ELSE 'Women' END AS gender,
         'CL' AS product_type
  FROM customer
"""


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def orders_kaspi(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _read(spark, sf_dir, "orders")
    return o.select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.col("o_orderstatus").alias("status"),
        (F.lit(1) + F.col("o_orderkey") % 3).cast("int").alias("qty"),
        F.round(F.col("o_totalprice")).cast("long").alias("gross_price_kzt"),
        F.lit(0.12).alias("kaspi_fee_pct"),
        (F.col("o_orderkey") % 5000).cast("double").alias("weight_g"),
    ).withColumn(
        "delivery_cost_kzt",
        delivery_fee_kzt(F.col("gross_price_kzt"), F.col("weight_g")),
    )


def sales_sku(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _read(spark, sf_dir, "lineitem")
    return li.select(
        F.concat(F.lit("SKU_"), F.col("l_partkey").cast("string")).alias("sku_key"),
        F.col("l_shipdate").cast("date").alias("order_date"),
        F.col("l_quantity").cast("int").alias("qty"),
        F.round(F.col("l_extendedprice")).cast("long").alias("gross_price_kzt"),
        F.lit(0.12).alias("kaspi_fee_pct"),
        F.lit(None).cast("double").alias("weight_g"),
    ).withColumn(
        "delivery_cost_kzt",
        delivery_fee_kzt(F.col("gross_price_kzt"), F.col("weight_g")),
    )


def sellers_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _read(spark, sf_dir, "lineitem")
    return li.select(
        F.concat(F.lit("M"), (F.col("l_partkey") % 50).cast("string")).alias("masterProductId"),
        F.col("l_partkey").cast("string").alias("productId"),
        F.concat(F.lit("Seller "), F.col("l_suppkey").cast("string")).alias("name"),
        F.when(F.col("l_orderkey") % 37 == 0, F.lit(0).cast("long"))
        .otherwise(F.round(F.col("l_extendedprice")).cast("long"))
        .alias("price"),
        F.when(F.col("l_orderkey") % 11 == 0, F.lit(""))
        .otherwise(F.date_format("l_shipdate", "yyyy-MM-dd"))
        .alias("deliveryDate"),
        (F.col("l_orderkey") % 500).cast("int").alias("ratingCount"),
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("row_uid"),
    )


def stock_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _read(spark, sf_dir, "part")
    return p.select(
        F.concat(F.lit("SKU_"), F.col("p_partkey").cast("string")).alias("sku_key"),
        ((F.col("p_partkey") * 7) % 50).cast("int").alias("qty_on_hand"),
    )


def settings_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _read(spark, sf_dir, "part")
    return p.select(
        F.concat(F.lit("SKU_"), F.col("p_partkey").cast("string")).alias("sku"),
        (F.col("p_partkey") % 10 != 0).alias("active"),
        F.round(F.col("p_retailprice") * F.lit(0.8)).cast("long").alias("minPrice"),
        F.when(F.col("p_partkey") % 13 == 0, F.lit(0).cast("long"))
        .otherwise(F.round(F.col("p_retailprice") * F.lit(1.4)).cast("long"))
        .alias("maxPrice"),
        F.when(F.col("p_partkey") % 3 == 0, 1)
        .when(F.col("p_partkey") % 3 == 1, 50)
        .otherwise(100)
        .cast("long")
        .alias("stepKzt"),
        F.lit(5).alias("intervalMin"),
        F.lit(None).cast("array<string>").alias("ignoredOpponents"),
        F.round(F.col("p_retailprice")).cast("long").alias("currentPrice"),
    )


def opponents_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _read(spark, sf_dir, "lineitem")
    return li.select(
        F.concat(F.lit("SKU_"), F.col("l_partkey").cast("string")).alias("sku"),
        F.col("l_partkey").cast("string").alias("productId"),
        F.concat(F.lit("M"), F.col("l_suppkey").cast("string")).alias("merchantId"),
        F.concat(F.lit("Merchant "), F.col("l_suppkey").cast("string")).alias("merchantName"),
        F.when(F.col("l_orderkey") % 37 == 0, F.lit(0).cast("long"))
        .otherwise(F.round(F.col("l_extendedprice")).cast("long"))
        .alias("price"),
        (F.col("l_suppkey") == 1).alias("isYou"),
    )


def customers_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _read(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("customer_id"),
        (F.lit(150) + F.col("c_custkey") % 45).cast("int").alias("height_cm"),
        (F.lit(45) + (F.col("c_custkey") * 7) % 75).cast("int").alias("weight_kg"),
        F.when(F.col("c_custkey") % 2 == 0, F.lit("Men")).otherwise(F.lit("Women")).alias("gender"),
        F.lit("CL").alias("product_type"),
    )


# ---------------------------------------------------------------------------
# Queries + oracles
# ---------------------------------------------------------------------------

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, sql: str | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return deco


# --- Revenue / dashboard (A1-A4, F9, P6, J2, F10, O3) ----------------------

@register(
    "daily_net_revenue",
    f"""
    WITH orders_kaspi AS ({SQL_ORDERS_KASPI}),
    enriched AS (
      SELECT *, {SQL_DELIVERY_FEE} AS delivery_cost_kzt FROM orders_kaspi
    )
    SELECT order_date,
           CAST(SUM(CAST(CAST(gross_price_kzt AS DOUBLE) * (CAST(1.0 AS DOUBLE) - kaspi_fee_pct)
                         - CAST(delivery_cost_kzt AS DOUBLE) AS DECIMAL(18,6))) AS DOUBLE)
             AS net_revenue
    FROM enriched GROUP BY order_date
    """,
)
def q_daily_net_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return revenue_ops.daily_net_revenue(orders_kaspi(spark, sf_dir))


@register(
    "revenue_kpis",
    f"""
    WITH orders_kaspi AS ({SQL_ORDERS_KASPI}),
    enriched AS (
      SELECT *, {SQL_DELIVERY_FEE} AS delivery_cost_kzt FROM orders_kaspi
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS orders_cnt,
           CAST(SUM(CAST(CAST(gross_price_kzt AS DOUBLE) * (CAST(1.0 AS DOUBLE) - kaspi_fee_pct)
                         - CAST(delivery_cost_kzt AS DOUBLE) AS DECIMAL(18,6))) AS DOUBLE)
             AS net_revenue
    FROM enriched
    """,
)
def q_revenue_kpis(spark: SparkSession, sf_dir: str) -> DataFrame:
    return revenue_ops.kpis(orders_kaspi(spark, sf_dir))


@register(
    "margin_by_sku",
    f"""
    WITH sales AS ({SQL_SALES_SKU}),
    enriched AS (
      SELECT *, {SQL_DELIVERY_FEE} AS delivery_cost_kzt FROM sales
    )
    SELECT sku_key,
           CAST(SUM(CAST(CAST(gross_price_kzt AS DOUBLE) * (CAST(1.0 AS DOUBLE) - kaspi_fee_pct)
                         - CAST(delivery_cost_kzt AS DOUBLE) AS DECIMAL(18,6))) AS DOUBLE)
             AS net_revenue,
           CAST(SUM(qty) AS BIGINT) AS units
    FROM enriched GROUP BY sku_key
    """,
)
def q_margin_by_sku(spark: SparkSession, sf_dir: str) -> DataFrame:
    return revenue_ops.margin_by_sku(sales_sku(spark, sf_dir))


@register(
    "daily_demand",
    f"""
    WITH sales AS ({SQL_SALES_SKU})
    SELECT sku_key,
           CAST(SUM(qty) AS DOUBLE) / CAST(30.0 AS DOUBLE) AS daily_demand
    FROM sales
    WHERE order_date >= (SELECT MAX(order_date) FROM sales) - INTERVAL 30 DAY
    GROUP BY sku_key
    """,
)
def q_daily_demand(spark: SparkSession, sf_dir: str) -> DataFrame:
    return inventory_ops.daily_demand(sales_sku(spark, sf_dir))


@register(
    "inventory_reorder",
    f"""
    WITH sales AS ({SQL_SALES_SKU}),
    stock AS ({SQL_STOCK}),
    demand AS (
      SELECT sku_key, CAST(SUM(qty) AS DOUBLE) / CAST(30.0 AS DOUBLE) AS daily_demand
      FROM sales
      WHERE order_date >= (SELECT MAX(order_date) FROM sales) - INTERVAL 30 DAY
      GROUP BY sku_key
    ),
    joined AS (
      SELECT s.sku_key, s.qty_on_hand, COALESCE(d.daily_demand, CAST(0.0 AS DOUBLE)) AS daily_demand
      FROM stock s LEFT JOIN demand d USING (sku_key)
    )
    SELECT sku_key, qty_on_hand, daily_demand,
           CAST(CEIL(daily_demand * CAST(14.0 AS DOUBLE)
                     + (CAST(1.65 AS DOUBLE) * (daily_demand * CAST(0.2 AS DOUBLE))) * sqrt(CAST(14.0 AS DOUBLE)))
                AS BIGINT) AS rop,
           qty_on_hand < CAST(CEIL(daily_demand * CAST(14.0 AS DOUBLE)
                     + (CAST(1.65 AS DOUBLE) * (daily_demand * CAST(0.2 AS DOUBLE))) * sqrt(CAST(14.0 AS DOUBLE)))
                AS BIGINT) AS need_reorder
    FROM joined
    """,
)
def q_inventory_reorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    return inventory_ops.inventory_panel(
        stock_table(spark, sf_dir), sales_sku(spark, sf_dir), lead_days=14.0
    ).select("sku_key", "qty_on_hand", "daily_demand", "rop", "need_reorder")


# --- Offer analytics (P9, A7, W1, A8-A13, F14-F16) -------------------------

@register(
    "seller_dedupe",
    f"""
    WITH sellers AS ({SQL_SELLERS}),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY productId, lower(trim(name))
        ORDER BY CASE WHEN price > 0 THEN 0 ELSE 1 END ASC,
                 price ASC,
                 CASE WHEN deliveryDate IS NOT NULL AND deliveryDate <> '' THEN 0 ELSE 1 END ASC,
                 deliveryDate ASC,
                 row_uid ASC
      ) AS rn FROM sellers
    )
    SELECT masterProductId, productId, name, price, deliveryDate
    FROM ranked WHERE rn = 1
    """,
)
def q_seller_dedupe(spark: SparkSession, sf_dir: str) -> DataFrame:
    deduped = offers_ops.dedupe_sellers(sellers_table(spark, sf_dir), tie_breakers=["row_uid"])
    return deduped.select("masterProductId", "productId", "name", "price", "deliveryDate")


# Exact integer-based variance/stddev (see module docstring).
SQL_VARIANT_STATS = """
      SELECT productId,
             CAST(COUNT(*) AS BIGINT) AS sellers_pos,
             CAST(MIN(price) AS BIGINT) AS min_price,
             quantile_cont(CAST(price AS DOUBLE), 0.5) AS median_price,
             CAST(MAX(price) AS BIGINT) AS max_price,
             CAST(MAX(price) - MIN(price) AS BIGINT) AS spread,
             CAST(SUM(price) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_price,
             sqrt(GREATEST(CAST(0.0 AS DOUBLE),
                  CAST(SUM(price * price) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                  - (CAST(SUM(price) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
                    * (CAST(SUM(price) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))))
               AS stddev_price
      FROM sellers WHERE price > 0 GROUP BY productId
"""


@register(
    "variant_stats",
    f"""
    WITH sellers AS ({SQL_SELLERS})
    {SQL_VARIANT_STATS.replace("FROM sellers", "FROM sellers", 1)}
    """,
)
def q_variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return offers_ops.basic_stats(sellers_table(spark, sf_dir))


QUERIES_DOC = "Populated at import time by the @register decorators above."
