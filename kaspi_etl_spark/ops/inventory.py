"""Inventory panel — rolling demand, reorder point, reorder flags.

Reference: scripts/dashboard.py:35-46. 30-day demand window (P6/A3/W4),
left join to stock (J2), reorder-point formula (F10), need_reorder sort (O3).

Scale notes: the max-date scalar is computed as a 1-row aggregate and
joined as a literal (crossJoin of a single row — Catalyst broadcasts it);
the demand groupBy is one shuffle on sku_key; the stock join broadcasts
whichever side is small (AQE decides at runtime).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..clean import reorder_point


def daily_demand(sales: DataFrame, window_days: int = 30) -> DataFrame:
    """A3: qty sold per sku over the trailing window / window_days
    (dashboard.py:35-36). ``sales`` needs sku_key, order_date, qty."""
    max_date = sales.agg(F.max("order_date").alias("max_date"))
    return (
        sales.crossJoin(F.broadcast(max_date))
        .filter(F.col("order_date") >= F.date_sub(F.col("max_date"), window_days))
        .groupBy("sku_key")
        .agg((F.sum("qty") / F.lit(float(window_days))).alias("daily_demand"))
    )


def inventory_panel(
    stock: DataFrame, sales: DataFrame, lead_days: float = 14.0, window_days: int = 30
) -> DataFrame:
    """J2 + F10 + O3: stock joined with demand, ROP, need_reorder flag
    (dashboard.py:38-46)."""
    demand = daily_demand(sales, window_days)
    return (
        stock.join(demand, "sku_key", "left")
        .na.fill({"daily_demand": 0.0})
        .withColumn("rop", reorder_point(F.col("daily_demand"), lead_days))
        .withColumn("need_reorder", F.col("qty_on_hand") < F.col("rop"))
        .orderBy(F.desc("need_reorder"), "sku_key")
    )
