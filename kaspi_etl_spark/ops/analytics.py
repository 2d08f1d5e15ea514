"""Global market analytics over per-variant stats — computeGlobalAnalytics.

Reference: apps/kaspi_offers_dashboard/CURSOR_TASK.md:118-170 and
lib/analytics.ts spec — per-variant basicStats (population stddev, exact
even-count median over non-zero prices), spread aggregates over positive
spreads (A8), unique seller names across all variants (A9), botShare (A10),
attractivenessIndex / stabilityScore / bestEntryPrice (A11-A13) with the
priceStep tiers and bot-dampening.

Scale notes: two shuffles total — one groupBy(productId) for variant stats,
one groupBy(master) for the rollup + an exact countDistinct(name). All
joins are on the master key after aggregation (tiny). For 100 TB
dashboards, approx_count_distinct + percentile_approx are drop-in
replacements where oracle-exactness is not required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..clean import clamp01, price_step
from .offers import exact_stddev_pop, with_bot_flags


def variant_stats(sellers: DataFrame) -> DataFrame:
    """Per-variant basicStats over non-zero prices (lib/analytics.ts
    basicStats): min/median/max/spread/stddev_pop + raw sellersCount.
    Variants with no positive price get all-zero stats, as the reference
    returns {0,0,0,0,0}."""
    all_variants = sellers.groupBy("masterProductId", "productId").agg(
        F.count("*").cast("long").alias("sellersCount")
    )
    pos = sellers.filter(F.col("price") > 0)
    price_d = F.col("price").cast("double")
    _, stddev = exact_stddev_pop(F.col("price"))
    stats = pos.groupBy("productId").agg(
        F.min("price").cast("long").alias("min_price"),
        F.percentile(price_d, F.lit(0.5)).alias("median_price"),
        F.max("price").cast("long").alias("max_price"),
        (F.max("price") - F.min("price")).cast("long").alias("spread"),
        stddev.alias("stddev_price"),
    )
    return (
        all_variants.join(stats, "productId", "left")
        .na.fill({"min_price": 0, "median_price": 0.0, "max_price": 0, "spread": 0, "stddev_price": 0.0})
    )


def global_analytics(sellers: DataFrame) -> DataFrame:
    """A8-A13 per master product (CURSOR_TASK.md computeGlobalAnalytics).

    ``sellers`` is the flat exploded table (FIXTURES.md 5) with a
    ratingCount column; the reference's master-level ratingCount is taken
    as max(ratingCount) per master (the reference carries one value per
    master document).
    """
    flagged = with_bot_flags(sellers)
    variants = variant_stats(sellers)

    pos_spread = F.when(F.col("spread") > 0, F.col("spread").cast("double"))
    rel_stddev = F.when(
        F.col("min_price") > 0, F.col("stddev_price") / F.col("min_price").cast("double")
    ).otherwise(F.lit(0.0))
    # Empty positive-spread sets aggregate to 0, as the reference returns 0
    # for empty lists (lib/analytics.ts: `spreads.length ? ... : 0`).
    per_master = variants.groupBy("masterProductId").agg(
        F.coalesce(
            F.sum(F.when(F.col("spread") > 0, F.col("spread"))).cast("double")
            / F.count(pos_spread).cast("double"),
            F.lit(0.0),
        ).alias("avgSpreadRaw"),
        F.coalesce(F.percentile(pos_spread, F.lit(0.5)), F.lit(0.0)).alias("medianSpreadRaw"),
        F.coalesce(F.max(pos_spread), F.lit(0.0)).alias("maxSpreadRaw"),
        F.min(F.when(F.col("min_price") > 0, F.col("min_price"))).cast("long").alias("minAcross"),
        (
            F.sum(rel_stddev.cast("decimal(18,9)")).cast("double") / F.count("*").cast("double")
        ).alias("relStdAvg"),
    )

    seller_level = flagged.groupBy("masterProductId").agg(
        F.countDistinct("name").cast("long").alias("uniqueSellers"),
        (
            F.sum(F.when(F.col("isPriceBot"), 1).otherwise(0)).cast("double")
            / F.count("*").cast("double")
        ).alias("botShareRaw"),
        F.max("ratingCount").cast("long").alias("ratingCount"),
    )

    j = per_master.join(seller_level, "masterProductId")

    # Attractiveness (lib/analytics.ts): 0..1 scores combined to 0..100.
    spread_score = clamp01(
        F.col("avgSpreadRaw")
        / F.coalesce(
            F.when(F.col("medianSpreadRaw") != 0, F.col("medianSpreadRaw")),
            F.when(F.col("avgSpreadRaw") != 0, F.col("avgSpreadRaw")),
            F.lit(1.0),
        )
    )
    scarcity = clamp01(F.lit(1.0) - F.col("uniqueSellers").cast("double") / F.lit(20.0))
    demand = clamp01(
        F.log10(F.coalesce(F.col("ratingCount"), F.lit(0)).cast("double") + 1.0) / F.lit(3.0)
    )
    attractiveness = F.round(
        100.0
        * clamp01(
            F.lit(0.45) * spread_score
            + F.lit(0.25) * scarcity
            + F.lit(0.20) * demand
            - F.lit(0.20) * clamp01(F.col("botShareRaw"))
        ),
        0,
    ).cast("long")
    stability = F.round(100.0 * clamp01(F.lit(1.0) - F.col("relStdAvg")), 0).cast("long")

    # bestEntryPrice: undercut minAcross by priceStep, dampened to 25% of
    # the step when botShare > 0.35; round to tens; floor at 0.
    step = price_step(F.col("minAcross")).cast("double")
    dampen = F.when(F.col("botShareRaw") > 0.35, step * 0.25).otherwise(step)
    best_entry = F.when(
        F.col("minAcross").isNotNull(),
        F.greatest(
            F.lit(0).cast("long"),
            (F.round((F.col("minAcross").cast("double") - dampen) / 10.0, 0) * 10).cast("long"),
        ),
    ).otherwise(F.lit(0).cast("long"))

    return j.select(
        "masterProductId",
        F.round(F.col("avgSpreadRaw"), 0).cast("long").alias("avgSpread"),
        F.round(F.col("medianSpreadRaw"), 0).cast("long").alias("medianSpread"),
        F.round(F.col("maxSpreadRaw"), 0).cast("long").alias("maxSpread"),
        "uniqueSellers",
        F.round(F.col("botShareRaw"), 2).alias("botShare"),
        attractiveness.alias("attractivenessIndex"),
        stability.alias("stabilityScore"),
        best_entry.alias("bestEntryPrice"),
    )


def cusum_profile(
    daily: DataFrame,
    date_col: str = "order_date",
    value_col: str = "daily_gross",
    h_sigmas: int = 5,
) -> DataFrame:
    """Two-sided CUSUM drift detection over a daily metric series —
    the changepoint monitor next to daily_revenue_outliers' z-score
    (which flags single spikes; CUSUM accumulates small sustained
    shifts that never individually cross a z threshold).

    Exact-integer reduction: with S_t = cumulative sum of (x_t - mu)
    (mu = floor-mean) and the S_0 = 0 convention, the standard
    recursions C+_t = max(0, C+_{t-1} + x_t - mu) and
    C-_t = max(0, C-_{t-1} - (x_t - mu)) close to

        C+_t = S_t - min(0, min_{j<=t} S_j)
        C-_t = max(0, max_{j<=t} S_j) - S_t

    so both sides are running-sum + running-extremum windows — no
    recursion, all BIGINT. The alarm threshold is h_sigmas * sigma with
    sigma = isqrt(floor(sum(x^2)/n) - mu^2) (exact integer sqrt via the
    floor(sqrt)+correction trick, same as corpus_mix_temperature).

    Scale: the input is a per-day rollup, so the unpartitioned ordered
    window runs over rows bounded by calendar days regardless of raw
    data volume — aggregate first, window the tiny series.

    Returns (date, value, s_cum, cusum_pos, cusum_neg, is_alarm).
    """
    x = F.col(value_col).cast("long")
    stats = daily.select(
        F.col(date_col).alias("_d"),
        x.alias("_x"),
    ).select(
        "_d",
        "_x",
        F.expr("sum(_x) over () div count(*) over ()").alias("_mu"),
        F.expr("sum(_x * _x) over () div count(*) over ()").alias("_m2"),
    )
    var = F.greatest(F.col("_m2") - F.col("_mu") * F.col("_mu"), F.lit(0))
    r0 = F.floor(F.sqrt(var.cast("double"))).cast("long")
    sigma = (
        F.when((r0 + 1) * (r0 + 1) <= var, r0 + 1)
        .when(r0 * r0 > var, r0 - 1)
        .otherwise(r0)
    )
    staged = stats.select(
        "_d",
        "_x",
        "_mu",
        (F.lit(h_sigmas) * sigma).alias("_h"),
    )
    w_pre = Window.orderBy("_d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    s = F.sum(F.col("_x") - F.col("_mu")).over(w_pre)
    cum = staged.select(
        "_d", "_x", "_h", s.alias("_s")
    ).select(
        "_d",
        "_x",
        "_h",
        "_s",
        F.least(F.lit(0).cast("long"), F.min("_s").over(w_pre)).alias("_smin"),
        F.greatest(F.lit(0).cast("long"), F.max("_s").over(w_pre)).alias("_smax"),
    )
    pos = (F.col("_s") - F.col("_smin")).cast("long")
    neg = (F.col("_smax") - F.col("_s")).cast("long")
    return cum.select(
        F.col("_d").alias(date_col),
        F.col("_x").alias(value_col),
        F.col("_s").cast("long").alias("s_cum"),
        pos.alias("cusum_pos"),
        neg.alias("cusum_neg"),
        ((pos > F.col("_h")) | (neg > F.col("_h"))).alias("is_alarm"),
    )


def mad_outliers(
    daily: DataFrame,
    date_col: str = "order_date",
    value_col: str = "daily_gross",
) -> DataFrame:
    """Robust outlier flags via median / MAD (median absolute deviation)
    — the heavy-tail-safe sibling of the mean/stddev z-score: one wild
    day inflates a stddev enough to mask the next three anomalies, but
    moves the median by at most one rank.

    Exact-integer discipline around interpolated medians: medians of an
    even count are half-integers, so everything is carried DOUBLED
    (med2 = 2*median(x), dev2 = |2x - med2|, mad4 = 2*median(dev2) =
    4*MAD — all exactly integer-valued) and the flag
    |x - med| > 3 * 1.4826 * MAD becomes the pure-BIGINT comparison
    20000 * dev2 > 44478 * mad4. Two holistic window passes over the
    per-day rollup (rows bounded by calendar days at any raw volume).

    Returns (date, value, dev2, med2, mad4, is_outlier).
    """
    w_all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    base = daily.select(
        F.col(date_col).alias("_d"), F.col(value_col).cast("long").alias("_x")
    )
    s1 = base.select(
        "_d",
        "_x",
        (F.percentile("_x", F.lit(0.5)).over(w_all) * 2).cast("long").alias("_med2"),
    ).select(
        "_d",
        "_x",
        "_med2",
        F.abs(2 * F.col("_x") - F.col("_med2")).cast("long").alias("_dev2"),
    )
    s2 = s1.select(
        "_d",
        "_x",
        "_med2",
        "_dev2",
        (F.percentile("_dev2", F.lit(0.5)).over(w_all) * 2).cast("long").alias("_mad4"),
    )
    return s2.select(
        F.col("_d").alias(date_col),
        F.col("_x").alias(value_col),
        F.col("_dev2").alias("dev2"),
        F.col("_med2").alias("med2"),
        F.col("_mad4").alias("mad4"),
        (20000 * F.col("_dev2") > 44478 * F.col("_mad4")).alias("is_outlier"),
    )


def psi_drift(
    binned: DataFrame,
    bin_col: str = "bin",
    period_col: str = "is_b",
    n_bins: int = 10,
) -> DataFrame:
    """Population Stability Index between two periods of a binned metric
    — the standard ML-ops distribution-drift monitor (PSI < 0.1 stable,
    > 0.25 action). Input: one row per observation with its bin id and a
    boolean period flag.

    Exact fixed-point: with add-one smoothing p_i = (a_i+1)/(A+n_bins),
    q_i = (b_i+1)/(B+n_bins), each term (p_i - q_i)*log2(p_i/q_i)
    becomes BIGINT arithmetic — the difference clears to the integer
    numerator (a_i+1)(B+n_bins) - (b_i+1)(A+n_bins) and the log ratio
    to flog2((a_i+1)(B+n_bins)) - flog2((b_i+1)(A+n_bins)) via the
    shared LUT kernel, so per-bin terms and their total are exact and
    shuffle-order-independent (PSI reported in BITS, a constant ln 2
    factor off the conventional nats). Missing bins materialize from a
    literal grid so zero-count bins still contribute their smoothed
    mass. One groupBy over the observations; everything after runs on
    n_bins rows.

    Returns one row per bin: (bin, n_a, n_b, psi_term_scaled,
    psi_total_scaled, psi_bits) — scaled by (A+n_bins)(B+n_bins)*2^20.
    """
    from ..llm import lm as lm_ops

    counts = binned.groupBy(
        F.col(bin_col).cast("long").alias("_bin")
    ).agg(
        F.sum(F.when(~F.col(period_col), 1).otherwise(0)).alias("_a"),
        F.sum(F.when(F.col(period_col), 1).otherwise(0)).alias("_b"),
    )
    spark = binned.sparkSession
    grid = spark.range(n_bins).select(F.col("id").cast("long").alias("_bin"))
    full = grid.join(counts, "_bin", "left").select(
        "_bin",
        F.coalesce("_a", F.lit(0)).cast("long").alias("_a"),
        F.coalesce("_b", F.lit(0)).cast("long").alias("_b"),
    )
    w_all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    tot = full.select(
        "_bin",
        "_a",
        "_b",
        (F.sum("_a").over(w_all) + n_bins).alias("_at"),
        (F.sum("_b").over(w_all) + n_bins).alias("_bt"),
    ).select(
        "_bin",
        "_a",
        "_b",
        "_at",
        "_bt",
        ((F.col("_a") + 1) * F.col("_bt")).alias("_pn"),
        ((F.col("_b") + 1) * F.col("_at")).alias("_qn"),
    )
    tot = lm_ops.with_flog2(tot, "_pn", "_lp")
    tot = lm_ops.with_flog2(tot, "_qn", "_lq")
    per = tot.select(
        "_bin",
        "_a",
        "_b",
        "_at",
        "_bt",
        ((F.col("_pn") - F.col("_qn")) * (F.col("_lp") - F.col("_lq"))).alias("_t"),
    )
    return per.select(
        F.col("_bin").alias(bin_col),
        F.col("_a").alias("n_a"),
        F.col("_b").alias("n_b"),
        F.col("_t").cast("long").alias("psi_term_scaled"),
        F.sum("_t").over(w_all).cast("long").alias("psi_total_scaled"),
        (
            F.sum("_t").over(w_all).cast("double")
            / (
                F.col("_at").cast("double")
                * F.col("_bt").cast("double")
                * F.lit(float(lm_ops.FLOG2_ONE))
            )
        ).alias("psi_bits"),
    )
