"""Unit tests for the column-expression cleaning library (SURVEY.md 2.9)
with hand-computed expectations."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from kaspi_etl_spark import clean


def _vals(spark, col, rows, schema="v string"):
    df = spark.createDataFrame(rows, schema)
    return [r[0] for r in df.select(col).collect()]


def test_norm_key(spark):
    assert _vals(spark, clean.norm_key("v"), [("  ab12 ",), ("x",)]) == ["AB12", "X"]


def test_decimal_comma(spark):
    out = _vals(spark, clean.decimal_comma_to_double("v"), [("0,95",), ("1.5",), ("junk",)])
    assert out == [0.95, 1.5, None]


def test_strip_non_numeric_int(spark):
    out = _vals(spark, clean.strip_non_numeric_int("v", default=0), [("1 234 kg",), ("",)])
    assert out == [1234, 0]


def test_price_from_text(spark):
    # vitest canary: parseSellers expects 12 990 -> 12990
    # (apps/kaspi_offers_dashboard/test/parseSellers.test.ts:4-20)
    out = _vals(spark, clean.price_from_text("v"), [("12 990 ₸",), ("7 500",), ("5",)])
    assert out[0] == 12990
    assert out[2] == 5


def test_id_from_url(spark):
    out = _vals(spark, clean.id_from_url("v"), [("/shop/p/thing-12345/",), ("nope",)])
    assert out == ["12345", ""]


def test_ru_date(spark):
    out = _vals(spark, clean.ru_date_to_dmy("v"), [("12 сентября",)])
    assert out == ["12.9"]


def test_dayfirst_date(spark):
    out = _vals(
        spark, clean.dayfirst_date("v"), [("05.09.2025",), ("2025-09-05",), ("garbage",)]
    )
    assert out == [datetime.date(2025, 9, 5), datetime.date(2025, 9, 5), None]


def test_delivery_fee_tiers(spark):
    # scripts/etl_sales.py:28-33 — 0/699/799/999 bands + 399/kg over 3 kg
    df = spark.createDataFrame(
        [(15000, 1000), (10000, 1000), (5000, 1000), (4999, 1000), (4999, 4500)],
        "price long, weight_g long",
    )
    out = [
        r[0]
        for r in df.select(clean.delivery_fee_kzt(F.col("price"), F.col("weight_g"))).collect()
    ]
    # ceil(4.5kg)-3 = 2 extra kg -> 999 + 2*399 = 1797
    assert out == [0, 699, 799, 999, 1797]


def test_reorder_point(spark):
    # scripts/dashboard.py:8-10: d=2, L=14 -> ceil(28 + 1.65*0.4*sqrt(14)) = ceil(30.47) = 31
    df = spark.createDataFrame([(2.0,)], "d double")
    out = [r[0] for r in df.select(clean.reorder_point(F.col("d"), 14.0)).collect()]
    assert out == [31]


def test_price_step_tiers(spark):
    df = spark.createDataFrame([(4999,), (5000,), (19999,), (99999,), (100000,)], "p long")
    out = [r[0] for r in df.select(clean.price_step(F.col("p"))).collect()]
    assert out == [20, 50, 50, 100, 200]


def test_reprice_target_clamp_and_hysteresis(spark):
    # PRICEBOT_SPEC_V2.md:92-99: target = clamp(best-step, [min,max]);
    # keep current when |target-current| <= step.
    df = spark.createDataFrame(
        [
            (10000, 50, 9000, 11000, 10500),  # best-step=9950 -> change
            (10000, 50, 9970, 11000, 10000),  # clamp->9970, |diff|=30<=50 -> keep
            (None, 50, 9000, 11000, 12000),  # no competitor -> clamp(current)=11000
        ],
        "best long, step long, minp long, maxp long, cur long",
    )
    out = [
        r[0]
        for r in df.select(
            clean.reprice_target(
                F.col("best"), F.col("step"), F.col("minp"), F.col("maxp"), F.col("cur")
            )
        ).collect()
    ]
    assert out == [9950, 10000, 11000]


def test_bool_from_text(spark):
    out = _vals(spark, clean.bool_from_text("v"), [("ON",), ("true",), ("1",), ("off",)])
    assert out == [True, True, True, False]


def test_round_to_tens_and_clamp(spark):
    df = spark.createDataFrame([(12994.0,), (12995.0,)], "v double")
    out = [r[0] for r in df.select(clean.round_to_tens(F.col("v"))).collect()]
    assert out == [12990, 13000]
    out2 = _vals(
        spark,
        clean.clamp01(F.col("v").cast("double")),
        [("1.5",), ("-0.2",), ("0.3",)],
    )
    assert out2 == [1.0, 0.0, 0.3]
