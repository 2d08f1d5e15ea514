"""Offer-analytics unit tests, including the two reference vitest canaries
(apps/kaspi_offers_dashboard/test/analytics.test.ts, parseSellers.test.ts)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from kaspi_etl_spark.ops import offers


def sellers_df(spark):
    # Two variants, four distinct sellers total — the analytics.test.ts
    # fixture shape (uniqueSellers must be exactly 4).
    rows = [
        ("v1", "Alpha", 12990, "12.9"),
        ("v1", "Beta", 13000, ""),
        ("v1", "alpha ", 12980, ""),  # dup of Alpha after lower(trim)
        ("v2", "Gamma", 5000, "13.9"),
        ("v2", "Delta", 5100, "13.9"),
        ("v2", "Gamma", 0, "14.9"),  # zero-price dup loses
    ]
    return spark.createDataFrame(rows, "productId string, name string, price long, deliveryDate string")


def test_dedupe_sellers_tie_break(spark):
    out = offers.dedupe_sellers(sellers_df(spark)).collect()
    by_key = {(r.productId, r.name.strip().lower()): r for r in out}
    assert len(out) == 4
    # lowest positive price wins for alpha
    assert by_key[("v1", "alpha")].price == 12980
    # positive price beats zero price for Gamma
    assert by_key[("v2", "gamma")].price == 5000


def test_dedupe_agg_matches_window_on_null_vs_empty_delivery(spark):
    """The min(struct) fast path must pick the same winner as the window
    form when tied candidates mix null and empty-string deliveryDate at
    equal price: struct comparison is NULLS FIRST, the window sorts
    asc_nulls_last, so k4 needs the explicit null-after encoding."""
    rows = [
        # equal price, delivery '' vs NULL — asc_nulls_last prefers ''
        ("v1", "Seller", 1000, "", "u1"),
        ("v1", "seller", 1000, None, "u2"),
    ]
    df = spark.createDataFrame(
        rows, "productId string, name string, price long, deliveryDate string, row_uid string"
    )
    payload = ["name", "price", "deliveryDate", "row_uid"]
    win = offers.dedupe_sellers(df, tie_breakers=["row_uid"]).collect()
    agg = offers.dedupe_sellers_agg(df, payload).collect()
    assert len(win) == len(agg) == 1
    assert win[0].row_uid == agg[0].row_uid == "u1"


def test_unique_sellers_canary(spark):
    # analytics.test.ts:17 — exact distinct seller count across variants == 4
    deduped = offers.dedupe_sellers(sellers_df(spark))
    n = deduped.select(F.lower(F.trim("name"))).distinct().count()
    assert n == 4


def test_basic_stats_population_stddev_and_even_median(spark):
    df = spark.createDataFrame(
        [("v1", "a", 100), ("v1", "b", 200), ("v1", "c", 300), ("v1", "d", 400)],
        "productId string, name string, price long",
    )
    row = offers.basic_stats(df).collect()[0]
    # even-count exact median averages the middle two (CURSOR_TASK.md:104-105)
    assert row.median_price == 250.0
    # POPULATION stddev (divide by n, CURSOR_TASK.md:107-108)
    mean = 250.0
    var_pop = sum((x - mean) ** 2 for x in (100, 200, 300, 400)) / 4
    assert math.isclose(row.stddev_price, math.sqrt(var_pop), rel_tol=1e-12)
    assert row.spread == 300
    assert row.min_price == 100 and row.max_price == 400


def test_bot_flags(spark):
    # min=10000, median-min must be <=30 for bots (server/scrape.ts:719-732)
    df = spark.createDataFrame(
        [("v1", "a", 10000), ("v1", "b", 10010), ("v1", "c", 10020)],
        "productId string, name string, price long",
    )
    out = {r.name: r.isPriceBot for r in offers.with_bot_flags(df).collect()}
    assert out == {"a": True, "b": True, "c": True}
    # spread-out prices: median-min > 30 -> no bots
    df2 = spark.createDataFrame(
        [("v1", "a", 10000), ("v1", "b", 10100), ("v1", "c", 10200)],
        "productId string, name string, price long",
    )
    out2 = {r.name: r.isPriceBot for r in offers.with_bot_flags(df2).collect()}
    assert out2 == {"a": False, "b": False, "c": False}


def test_variant_summary_predictions(spark):
    # 3 bots -> predicted_min_24h = min-20, 7d = min-40 (server/scrape.ts:735-747)
    df = spark.createDataFrame(
        [("v1", "a", 10000), ("v1", "b", 10010), ("v1", "c", 10020)],
        "productId string, name string, price long",
    )
    row = offers.variant_summary(df).collect()[0]
    assert row.bot_count == 3
    assert row.predicted_min_24h == 9980
    assert row.predicted_min_7d == 9960
    assert 0 <= row.stability <= 100


def test_price_deltas(spark):
    df = spark.createDataFrame(
        [("v1", "a", 100), ("v1", "b", 150)],
        "productId string, name string, price long",
    )
    out = {r.name: (r.delta, r.delta_pct) for r in offers.with_price_deltas(df).collect()}
    assert out["a"] == (0, 0.0)
    assert out["b"][0] == 50
    assert math.isclose(out["b"][1], 0.5)


def test_blocked_name_matches_semantics(spark):
    from kaspi_etl_spark.ops import entity

    rows = [
        (1, "blue bolt"),
        (2, "blue belt"),   # dist 1, same first token
        (3, "red bolt"),    # dist ~3 from 'blue bolt'? verify filter
        (4, "blue bolts"),  # dist 1 from 'blue bolt'
        (5, "green widget"),
        (6, "grean widget"),  # dist 1, same last token, different first
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    out = {(r.id_a, r.id_b): r.dist
           for r in entity.blocked_name_matches(df, max_dist=2).collect()}
    assert out[(1, 2)] == 1 and out[(1, 4)] == 1
    # last-token pass catches pairs whose FIRST token differs
    assert out[(5, 6)] == 1
    # 'red bolt' vs 'blue bolt' is blocked together (last token) but
    # fails the distance verify (dist 3)
    assert (1, 3) not in out
    # a pair matched by BOTH passes appears exactly once (distinct)
    assert len([k for k in out if k == (2, 4)]) <= 1
