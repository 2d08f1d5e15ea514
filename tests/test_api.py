"""Nested AnalyzeResult API tests (SURVEY.md 3.3)."""

from __future__ import annotations

from kaspi_etl_spark import api


def sellers_df(spark):
    rows = [
        ("m1", "v1", "44", "C1", "Alpha", 12990, "2025-09-12", 10, 1),
        ("m1", "v1", "44", "C1", "Beta", 13000, "", 10, 2),
        ("m1", "v2", "46", "C1", "Gamma", 5000, "2025-09-13", 20, 3),
        ("m1", "v2", "46", "C1", "Delta", 5100, "2025-09-13", 20, 4),
    ]
    return spark.createDataFrame(
        rows,
        "masterProductId string, productId string, variantSize string, "
        "variantColor string, name string, price long, deliveryDate string, "
        "ratingCount int, row_uid long",
    )


def test_analyze_nested_shape(spark):
    doc = api.analyze(sellers_df(spark)).collect()
    assert len(doc) == 1
    row = doc[0]
    assert row.masterProductId == "m1"
    # variants sorted by productId; sellers sorted by price asc
    assert [v.productId for v in row.variants] == ["v1", "v2"]
    v1 = row.variants[0]
    assert [s.price for s in v1.sellers] == [12990, 13000]
    assert v1.stats.min == 12990 and v1.stats.max == 13000
    assert v1.stats.sellersCount == 2
    # analytics.test.ts canary: unique sellers across variants == 4
    assert row.uniqueSellers == 4
    assert 0 <= row.attractivenessIndex <= 100
    assert row.variants[1].stats.spread == 100


def test_analyze_json_roundtrip(spark):
    js = api.analyze(sellers_df(spark)).toJSON().collect()
    import json

    parsed = json.loads(js[0])
    assert parsed["variants"][0]["sellers"][0]["name"] == "Alpha"
