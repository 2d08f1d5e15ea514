"""Tests for HTML/JSON-LD parsers, REST bridges, file readers, and the
delivery normalizer."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from kaspi_etl_spark import clean
from kaspi_etl_spark.sources import html_parse, readers, rest

# Inline fixture equivalent to the reference vitest case
# (apps/kaspi_offers_dashboard/test/parseSellers.test.ts:4-20).
SELLERS_HTML = """
<table>
<tr><span class="sellers-table__merchant-name">TechnoShop</span>
<span class="sellers-table__delivery">Доставка 15 сентября</span> 12 990 ₸</tr>
<tr><span class="sellers-table__merchant-name">OtherStore</span>
<span class="sellers-table__delivery"></span> 13 490 ₸</tr>
</table>
"""


def test_parse_sellers_html_canary(spark):
    df = spark.createDataFrame([(SELLERS_HTML,)], "html string")
    rows = (
        df.select(F.explode(html_parse.parse_sellers_html(F.col("html"))).alias("s"))
        .select("s.*")
        .collect()
    )
    by_name = {r.name: r for r in rows}
    assert "TechnoShop" in by_name
    assert by_name["TechnoShop"].price == 12990  # parseSellers.test.ts canary
    assert "Доставка" in by_name["TechnoShop"].deliveryDate
    assert by_name["OtherStore"].price == 13490
    # sorted by price asc
    assert [r.price for r in rows] == sorted(r.price for r in rows)


def test_parse_sellers_dedupe_keeps_lowest(spark):
    html = (
        '<tr> 12 990 <span class="sellers-table__merchant-name">Shop</span></tr>'
        '<tr> 11 990 <span class="sellers-table__merchant-name">shop</span></tr>'
    )
    df = spark.createDataFrame([(html,)], "html string")
    rows = (
        df.select(F.explode(html_parse.parse_sellers_html(F.col("html"))).alias("s"))
        .select("s.*")
        .collect()
    )
    assert len(rows) == 1 and rows[0].price == 11990


def test_extract_jsonld_rating(spark):
    html = (
        "<html><script type=\"application/ld+json\"> "
        '{"aggregateRating": {"ratingValue": 4.6, "reviewCount": 132}} </script></html>'
    )
    df = spark.createDataFrame([(html,), ("<html>none</html>",)], "html string")
    out = df.select(html_parse.extract_jsonld_rating(F.col("html")).alias("r")).collect()
    assert out[0].r.ratingValue == 4.6 and out[0].r.reviewCount == 132
    assert out[1].r is None


def test_normalize_delivery(spark):
    df = spark.createDataFrame(
        [
            ("Постомат 12 сентября\nДоставка 15 сентября",),
            ("just a plain   note",),
            ("Доставка 3 января",),
        ],
        "v string",
    )
    out = [r[0] for r in df.select(clean.normalize_delivery("v", year=2025)).collect()]
    assert out[0] == "postamat - 12.9.2025, delivery - 15.9.25"
    assert out[1] == "just a plain note"
    assert out[2] == "delivery - 3.1.25"


def test_rest_source_with_fake_transport(spark):
    pages = {0: [{"code": "A", "qty": 1}, {"code": "B", "qty": 2}], 1: [{"code": "C", "qty": 3}]}

    calls = []

    def transport(url, params):
        calls.append(params["page"])
        return pages.get(params["page"], [])

    schema = T.StructType(
        [T.StructField("code", T.StringType()), T.StructField("qty", T.LongType())]
    )
    df = rest.read_rest_pages(spark, "http://fake/products", schema, transport=transport)
    assert {r.code for r in df.collect()} == {"A", "B", "C"}
    assert calls == [0, 1, 2]  # stops on first empty page


def test_rest_source_retries_then_raises(spark):
    def flaky(url, params):
        raise RuntimeError("boom")

    schema = T.StructType([T.StructField("code", T.StringType())])
    import pytest

    with pytest.raises(RuntimeError):
        rest.read_rest_pages(
            spark, "http://fake", schema, transport=flaky, retries=2, backoff_s=0.0
        )


def test_rest_sink_posts_rows(spark, tmp_path):
    out_dir = tmp_path / "posts"
    out_dir.mkdir()
    out = str(out_dir)

    def post_fn(row):
        # executor-side side effect; local[*] shares the filesystem
        with open(f"{out}/{row['code']}.json", "w") as f:
            json.dump(row, f)

    df = spark.createDataFrame([("A", 1), ("B", 2)], "code string, qty long")
    rest.write_rest_per_row(df, post_fn, parallelism=2)
    files = sorted(p.name for p in out_dir.iterdir())
    assert files == ["A.json", "B.json"]


def test_csv_readers(spark, tmp_path):
    p = tmp_path / "cat.csv"
    p.write_text("SKU ID;Store name\nA1;Main\nB2;Other\n", encoding="utf-8")
    df = readers.read_semicolon_csv(spark, str(p))
    assert df.columns == ["sku_id", "store_name"]
    assert df.count() == 2

    q = tmp_path / "stock_2025.csv"
    q.write_text("sku_key,qty_on_hand\nA1,5\n", encoding="utf-8")
    schema = T.StructType(
        [T.StructField("sku_key", T.StringType()), T.StructField("qty_on_hand", T.IntegerType())]
    )
    df2 = readers.read_typed_csv(spark, str(q), schema)
    assert df2.collect()[0].qty_on_hand == 5


def test_recursive_seller_probe_known_paths():
    """F20 full variant (opponents/route.ts:182-249): known dotted paths
    win before any recursion."""
    js = {"data": {"content": [
        {"merchantId": "m1", "merchantName": "Shop A", "price": 12990},
        {"merchantId": "m2", "merchantName": "Shop B", "price": 13100},
    ]}}
    out = rest.extract_sellers(js)
    assert [s["merchantId"] for s in out] == ["m1", "m2"]
    assert out[0]["price"] == 12990.0


def test_recursive_seller_probe_deep_search():
    """No known path matches -> BFS finds the first seller-like array
    anywhere in the tree; candidate keys coalesce (sellerId/seller/value)."""
    js = {"meta": {"x": 1}, "payload": {"wrap": [{"deep": {"arr": [
        {"sellerId": 7, "seller": "Depth Shop", "value": "4990"},
        {"note": "not seller-like"},
    ]}}]}}
    out = rest.extract_sellers(js, merchant_id="7")
    # the array is taken once one element matches; the non-seller row is
    # then dropped by the id/name filter (route.ts:249)
    assert len(out) == 1
    assert out[0] == {
        "merchantId": "7", "merchantName": "Depth Shop", "price": 4990.0, "isYou": True,
    }


def test_recursive_seller_probe_prices_fallback_and_filter():
    """Non-numeric price falls back to the prices[] list (route.ts:243-246);
    rows with neither id nor name are dropped."""
    js = [
        {"name": "P-list Shop", "price": "abc",
         "prices": [{"price": None}, {"price": "777"}]},
        {"price": 100},  # no merchant-ish key -> dropped
    ]
    out = rest.extract_sellers(js)
    assert out == [
        {"merchantId": "P-list Shop", "merchantName": "P-list Shop",
         "price": 777.0, "isYou": False}
    ]


def test_recursive_seller_probe_null_coalescing():
    """JS ?? parity: explicit null price falls through to offerPrice."""
    js = {"items": [{"merchantId": "m", "name": "N", "price": None, "offerPrice": 55}]}
    assert rest.extract_sellers(js)[0]["price"] == 55.0


def test_sellers_from_json_udf(spark):
    df = spark.createDataFrame(
        [("1", '{"offers": {"items": [{"merchantUID": "u9", "merchant": "U Shop", "offerPrice": 250}]}}'),
         ("2", "not json"),
         ("3", None)],
        "id string, body string",
    )
    probe = rest.sellers_from_json_udf(merchant_id="u9")
    out = df.select("id", F.explode_outer(probe(F.col("body"))).alias("s")).collect()
    by_id = {r.id: r.s for r in out}
    assert by_id["1"].merchantName == "U Shop" and by_id["1"].price == 250.0
    assert by_id["1"].isYou is True
    assert by_id["2"] is None and by_id["3"] is None


def test_recursive_seller_probe_known_path_wins_even_if_not_seller_like():
    """Reference parity (route.ts:228-229): BFS fallback triggers only on
    an EMPTY known-path array. A non-empty items[] with no price-ish keys
    is mapped as-is (price 0), even when a seller-like array sits deeper
    in the tree (ADVICE r2)."""
    js = {
        "items": [{"name": "x"}],
        "payload": {"deep": [
            {"sellerId": 9, "seller": "Deep Shop", "price": 500},
        ]},
    }
    out = rest.extract_sellers(js)
    assert out == [
        {"merchantId": "x", "merchantName": "x", "price": 0.0, "isYou": False}
    ]


def test_read_parquet_evolving_merges_added_column(spark, tmp_path):
    from pyspark.sql import functions as F

    from kaspi_etl_spark.sources import readers

    v1 = str(tmp_path / "v1")
    v2 = str(tmp_path / "v2")
    spark.range(3).select("id").write.parquet(v1)
    spark.range(3, 6).select(
        "id", (F.col("id") * 10).alias("added")
    ).write.parquet(v2)

    df = readers.read_parquet_evolving(spark, v1, v2)
    assert {f.name for f in df.schema.fields} == {"id", "added"}
    rows = {r["id"]: r["added"] for r in df.collect()}
    # old files surface the new column as NULL; new files carry values
    assert rows[0] is None and rows[4] == 40
    # without mergeSchema the union would silently read one schema —
    # the helper's merge_schema=False passthrough documents that mode
    assert readers.read_parquet_evolving(
        spark, v1, v2, merge_schema=False
    ).count() == 6
