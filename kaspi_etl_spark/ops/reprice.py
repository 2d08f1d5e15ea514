"""Repricing engine ("pricebot") — competitor-aware target prices.

Reference: PRICEBOT_SPEC_V2.md section 8 + run/bulk routes
(BUNDLE/app/api/pricebot/pricebot/run/route.ts, bulk/route.ts) and the
rjQF run-route competitor variant. Semantics:

  1. offers join per-SKU settings (J7), defaulting inactive/zero rules.
  2. drop ignored opponents — global + per-SKU ignore lists (P11).
  3. best competitor = cheapest remaining opponent that is not us (W2).
  4. target = clamp(best - step, [min, max]); no competitors ->
     clamp(current); hysteresis: keep current when |target-current|<=step
     (F17).
  5. KPI stats (A14) and run telemetry (A15).

Scale notes: settings and ignore lists are small dimensions -> broadcast
joins; opponents aggregate is one shuffle on sku. The anti-join for
ignores uses the exploded per-SKU ignore arrays broadcast to each
executor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..clean import reprice_target


def filter_ignored(opponents: DataFrame, settings: DataFrame, global_ignore: DataFrame) -> DataFrame:
    """P11: remove opponents in the global or per-SKU ignore sets.

    ``global_ignore``: (merchantId) rows; ``settings.ignoredOpponents``:
    array of opponent merchant ids per sku.
    """
    per_sku = settings.select(
        "sku", F.explode_outer("ignoredOpponents").alias("ign_merchant")
    ).filter(F.col("ign_merchant").isNotNull())
    out = opponents.join(
        F.broadcast(global_ignore.withColumnRenamed("merchantId", "ign_global")),
        opponents["merchantId"] == F.col("ign_global"),
        "left_anti",
    )
    return out.join(
        F.broadcast(per_sku),
        (out["sku"] == per_sku["sku"]) & (out["merchantId"] == per_sku["ign_merchant"]),
        "left_anti",
    )


def best_competitor(opponents: DataFrame) -> DataFrame:
    """W2: cheapest non-self opponent per sku (rank-1 competitor)."""
    return (
        opponents.filter((~F.col("isYou")) & (F.col("price") > 0))
        .groupBy("sku")
        .agg(F.min("price").cast("long").alias("best_price"))
    )


def proposals(
    settings: DataFrame,
    opponents: DataFrame,
    global_ignore: DataFrame,
) -> DataFrame:
    """J7 + P11 + W2 + F17: one repricing proposal per active SKU.

    Output: sku, ourPrice, bestOpponent, targetPrice, delta, reason.
    """
    kept = filter_ignored(opponents, settings, global_ignore)
    best = best_competitor(kept)
    base = settings.filter(F.col("active")).join(F.broadcast(best), "sku", "left")
    step = F.coalesce(F.col("stepKzt"), F.lit(1)).cast("long")
    target = reprice_target(
        F.col("best_price"),
        step,
        F.coalesce(F.col("minPrice"), F.lit(0)).cast("long"),
        # max falls back to min (run/route.ts: max || (min>0?min:price))
        F.coalesce(
            F.when(F.col("maxPrice") > 0, F.col("maxPrice")),
            F.when(F.col("minPrice") > 0, F.col("minPrice")),
            F.col("currentPrice"),
        ).cast("long"),
        F.coalesce(F.col("currentPrice"), F.lit(0)).cast("long"),
    )
    reason = (
        F.when(F.col("best_price").isNull(), F.lit("no_competitors"))
        .when(target == F.col("currentPrice"), F.lit("no_change"))
        .otherwise(F.lit("undercut"))
    )
    return base.select(
        "sku",
        F.col("currentPrice").cast("long").alias("ourPrice"),
        F.col("best_price").alias("bestOpponent"),
        target.alias("targetPrice"),
        (target - F.col("currentPrice")).cast("long").alias("delta"),
        reason.alias("reason"),
    )


def kpi_stats(settings: DataFrame, stock: DataFrame | None = None) -> DataFrame:
    """A14: totalSKUs / activeSKUs / zeroStock / competing counts in one
    pass (BUNDLE/.../stats/route.ts:15-42)."""
    joined = settings
    if stock is not None:
        joined = settings.join(F.broadcast(stock), settings["sku"] == stock["sku_key"], "left")
    zero_stock = (
        F.count(F.when(F.coalesce(F.col("qty_on_hand"), F.lit(0)) <= 0, 1))
        if stock is not None
        else F.lit(0)
    )
    return joined.agg(
        F.count("*").cast("long").alias("totalSKUs"),
        F.count(F.when(F.col("active"), 1)).cast("long").alias("activeSKUs"),
        zero_stock.cast("long").alias("zeroStock"),
        F.count(F.when(F.col("minPrice") > 0, 1)).cast("long").alias("configuredSKUs"),
    )


def run_telemetry(props: DataFrame) -> DataFrame:
    """A15: count + avgDelta for a run (run/route.ts:46-47)."""
    return props.agg(
        F.count("*").cast("long").alias("count"),
        (
            F.sum("delta").cast("double") / F.count("*").cast("double")
        ).alias("avgDelta"),
    )
