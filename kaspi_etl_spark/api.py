"""Nested AnalyzeResult document API (SURVEY.md 3.3).

Reference: the `/api/analyze` response shape — AnalyzeResult ->
Variant[] -> Seller[] with per-variant stats and global analytics
(apps/kaspi_offers_dashboard/CURSOR_TASK.md:39-92; construction
server/scrape.ts:779-817).

Spark design: the flat seller table aggregates bottom-up —
collect_list(struct(...)) sellers per variant (price-asc order pinned via
sort_array, SURVEY.md 7 risk 7), variants per master, then a join against
the global_analytics rollup. Everything stays a DataFrame; `.toJSON()` on
the result reproduces the HTTP document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ops.analytics import global_analytics, variant_stats
from .ops.offers import with_bot_flags


def analyze(sellers: DataFrame) -> DataFrame:
    """Build the nested AnalyzeResult document per masterProductId.

    ``sellers``: flat table (masterProductId, productId, variantSize,
    variantColor, name, price, deliveryDate, ratingCount, row_uid).
    Returns one row per master: variants array (sellers nested, price
    asc) + global analytics columns.
    """
    flagged = with_bot_flags(sellers)
    seller_structs = flagged.groupBy("masterProductId", "productId").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("price"),
                    F.col("name"),
                    F.col("deliveryDate"),
                    F.col("isPriceBot"),
                    F.col("row_uid"),
                )
            )
        ).alias("sellers"),
        F.first("variantSize").alias("variantSize"),
        F.first("variantColor").alias("variantColor"),
    )
    stats = variant_stats(sellers).select(
        "productId",
        F.struct(
            F.col("min_price").alias("min"),
            F.col("median_price").alias("median"),
            F.col("max_price").alias("max"),
            F.col("spread"),
            F.col("stddev_price").alias("stddev"),
            F.col("sellersCount"),
        ).alias("stats"),
    )
    variants = seller_structs.join(stats, "productId").select(
        "masterProductId",
        F.struct(
            F.col("productId"),
            F.col("variantSize"),
            F.col("variantColor"),
            F.col("sellers"),
            F.col("stats"),
        ).alias("variant"),
    )
    nested = variants.groupBy("masterProductId").agg(
        F.array_sort(F.collect_list("variant")).alias("variants")
    )
    return nested.join(global_analytics(sellers), "masterProductId")
