"""Offer analytics core — seller dedupe, per-variant price stats, deltas,
bot flags, predictions, stability.

Reference: server/scrape.ts:543-563 (dedupeSellers), :710-754 (stats +
bot heuristic + predictions + stability); canonical spec
apps/kaspi_offers_dashboard/CURSOR_TASK.md:98-110 (basicStats — POPULATION
stddev, exact even-count median).

Scale notes: dedupe and stats are window/groupBy over productId — one
shuffle each, partial-aggregated map-side. Exact median uses
``percentile`` (required for oracle parity; swap to percentile_approx for
approximate-at-scale dashboards). Stats joins back via window functions
instead of a self-join, so no extra shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..clean import is_price_bot, predicted_min, stability_score


def dedupe_sellers_agg(
    sellers: DataFrame,
    payload_cols: list[str],
    unique_col: str = "row_uid",
) -> DataFrame:
    """P9 fast path: same total order as dedupe_sellers, but as a
    min(struct(...)) hash aggregation instead of a sort-based window —
    partial-aggregates map-side, so the shuffle carries one row per
    (productId, seller) key instead of every input row. The right shape
    for 100 TB; requires a unique ``unique_col`` so the struct comparison
    never reaches payload fields.
    """
    key = F.lower(F.trim(F.col("name"))).alias("_k")
    rank = F.struct(
        F.when(F.col("price") > 0, 0).otherwise(1).alias("k1"),
        F.col("price").alias("k2"),
        F.when(
            F.col("deliveryDate").isNotNull() & (F.col("deliveryDate") != ""), 0
        ).otherwise(1).alias("k3"),
        # Struct comparison orders nulls FIRST, but the window form sorts
        # deliveryDate asc_nulls_last — encode null as an explicit
        # sort-after flag + '' so both paths pick the same winner when
        # tied candidates mix null and empty-string deliveryDate.
        F.when(F.col("deliveryDate").isNull(), 1).otherwise(0).alias("k4n"),
        F.coalesce(F.col("deliveryDate"), F.lit("")).alias("k4"),
        F.col(unique_col).alias("k5"),
        *[F.col(c).alias(f"p_{c}") for c in payload_cols],
    )
    best = (
        sellers.groupBy(F.col("productId"), key)
        .agg(F.min(rank).alias("b"))
    )
    return best.select(
        "productId", *[F.col(f"b.p_{c}").alias(c) for c in payload_cols]
    )


def dedupe_sellers(sellers: DataFrame, tie_breakers: list[str] | None = None) -> DataFrame:
    """P9: per (productId, lower(trim(name))) keep the best record.

    Reference dedupeSellers (server/scrape.ts:543-563) keeps the lowest
    positive price and prefers non-empty delivery, with first-seen order
    breaking ties. Encounter order is not reproducible on a distributed
    engine, so the total order is pinned (documented divergence, SURVEY.md
    7 risk 1): positive price first, price asc, delivery_nonempty desc,
    deliveryDate asc, then caller-supplied ``tie_breakers`` columns (pass a
    unique id to make the winner fully deterministic).
    """
    key = F.lower(F.trim(F.col("name")))
    order = [
        F.when(F.col("price") > 0, 0).otherwise(1).asc(),
        F.col("price").asc(),
        F.when(
            F.col("deliveryDate").isNotNull() & (F.col("deliveryDate") != ""), 0
        ).otherwise(1).asc(),
        F.col("deliveryDate").asc_nulls_last(),
    ] + [F.col(c).asc_nulls_last() for c in (tie_breakers or [])]
    w = Window.partitionBy("productId", key).orderBy(*order)
    return (
        sellers.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def exact_stddev_pop(col: Column) -> tuple[Column, Column]:
    """Population (mean, stddev) from exact integer sums.

    Plain ``stddev_pop`` over doubles is aggregation-order dependent and
    differs between engines run-to-run; summing the integer column and its
    square exactly, then doing the arithmetic in doubles, is deterministic
    and matches an oracle computing the same way (SURVEY.md 7 risk 2:
    population variance, divide by n).
    """
    n = F.count("*").cast("double")
    s = F.sum(col).cast("double")
    s2 = F.sum(col * col).cast("double")
    mean = s / n
    var = F.greatest(F.lit(0.0), s2 / n - mean * mean)
    return mean, F.sqrt(var)


def basic_stats(sellers: DataFrame, group_col: str = "productId") -> DataFrame:
    """A7: per-variant seller-price statistics (CURSOR_TASK.md:98-110).

    min/max/exact-median/mean/population-stddev/spread over positive
    prices. Exact median (even-count averaging) via ``percentile`` —
    required by the oracle; swap percentile_approx at dashboard scale.
    """
    pos = sellers.filter(F.col("price") > 0)
    price_d = F.col("price").cast("double")
    mean, stddev = exact_stddev_pop(F.col("price"))
    return pos.groupBy(group_col).agg(
        F.count("*").cast("long").alias("sellers_pos"),
        F.min("price").cast("long").alias("min_price"),
        F.percentile(price_d, F.lit(0.5)).alias("median_price"),
        F.max("price").cast("long").alias("max_price"),
        (F.max("price") - F.min("price")).cast("long").alias("spread"),
        mean.alias("avg_price"),
        stddev.alias("stddev_price"),
    )


def with_price_deltas(sellers: DataFrame) -> DataFrame:
    """W1: delta vs group min and pct (components/SellersTable.tsx:20-36)."""
    w = Window.partitionBy("productId")
    grp_min = F.min(F.when(F.col("price") > 0, F.col("price"))).over(w)
    delta = (F.col("price") - grp_min).cast("long")
    return (
        sellers.withColumn("min_price", grp_min.cast("long"))
        .withColumn("delta", delta)
        .withColumn(
            "delta_pct",
            F.when(grp_min > 0, delta.cast("double") / grp_min.cast("double")),
        )
    )


def with_bot_flags(sellers: DataFrame) -> DataFrame:
    """F14 over W1 stats: per-seller isPriceBot (server/scrape.ts:719-732)."""
    w = Window.partitionBy("productId")
    pos_price = F.when(F.col("price") > 0, F.col("price").cast("double"))
    grp_min = F.min(pos_price).over(w)
    grp_median = F.percentile(pos_price, F.lit(0.5)).over(w)
    return sellers.withColumn(
        "isPriceBot",
        F.coalesce(
            is_price_bot(F.col("price").cast("double"), grp_min, grp_median)
            & (F.col("price") > 0),
            F.lit(False),
        ),
    )


def variant_summary(sellers: DataFrame) -> DataFrame:
    """A7 + F14 + F15 + F16: per-variant stats with bot counts, predicted
    mins and stability (server/scrape.ts:710-754)."""
    flagged = with_bot_flags(sellers)
    _, stddev = exact_stddev_pop(F.col("price"))
    stats = (
        flagged.filter(F.col("price") > 0)
        .groupBy("productId")
        .agg(
            F.min("price").cast("long").alias("min_price"),
            F.max("price").cast("long").alias("max_price"),
            F.percentile(F.col("price").cast("double"), F.lit(0.5)).alias("median_price"),
            stddev.alias("stddev_price"),
            (F.max("price") - F.min("price")).cast("long").alias("spread"),
            F.sum(F.when(F.col("isPriceBot"), 1).otherwise(0)).cast("long").alias("bot_count"),
            F.count("*").cast("long").alias("sellers_cnt"),
        )
    )
    return (
        stats.withColumn(
            "predicted_min_24h", predicted_min(F.col("min_price"), F.col("bot_count"), 20)
        )
        .withColumn(
            "predicted_min_7d", predicted_min(F.col("min_price"), F.col("bot_count"), 40)
        )
        .withColumn(
            "stability",
            stability_score(F.coalesce(F.col("stddev_price"), F.lit(0.0)), F.col("min_price")),
        )
    )
