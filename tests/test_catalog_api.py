"""Catalog API sync flow, confirmation messages, batch-dedupe
determinism."""

from __future__ import annotations

import json

from kaspi_etl_spark.ops import catalog_api, purchases, sizing


def test_map_and_new_products(spark):
    catalog = spark.createDataFrame(
        [("K1", "Shirt"), ("K2", "Pants"), ("K3", "Hat")], "kaspi_code string, name string"
    )
    code_map = spark.createDataFrame([("K1", 101)], "code string, product_id long")
    mapped = catalog_api.map_product_ids(catalog, code_map)
    got = {r.kaspi_code: r.product_id for r in mapped.collect()}
    assert got == {"K1": 101, "K2": None, "K3": None}

    existing = spark.createDataFrame([("K1",), ("K3",)], "code string")
    missing = catalog_api.new_products(catalog, existing)
    assert [r.kaspi_code for r in missing.collect()] == ["K2"]


def test_sync_new_products(spark, tmp_path):
    out = str(tmp_path)
    catalog = spark.createDataFrame(
        [("K1", "Shirt"), ("K2", "Pants")], "kaspi_code string, name string"
    )
    existing = spark.createDataFrame([("K1",)], "code string")

    def post_fn(row):
        with open(f"{out}/{row['kaspi_code']}.json", "w") as f:
            json.dump(row, f)

    n = catalog_api.sync_new_products(catalog, existing, post_fn, parallelism=2)
    assert n == 1
    assert json.load(open(f"{out}/K2.json"))["name"] == "Pants"


def test_confirmation_message_tiers(spark):
    recs = spark.createDataFrame(
        [
            ("Айгуль", "Куртка", "M", 0.95, "Perfect match", "S,L"),
            ("Dana", "Шапка", "56", 0.5, "Approximate", ""),
        ],
        "customer_name string, product_name string, recommended_size string, "
        "confidence_score double, reasoning string, alternative_sizes string",
    )
    msgs = {r.customer_name: r.message for r in sizing.with_confirmation_message(recs).collect()}
    assert "Мы уверены" in msgs["Айгуль"]
    assert "*M*" in msgs["Айгуль"]
    assert "Альтернативные размеры: S, L" in msgs["Айгуль"]
    assert "Приблизительный размер" in msgs["Dana"]
    assert "Альтернативные" not in msgs["Dana"]


def test_dedupe_batch_deterministic(spark):
    rows = [
        ("po1", "A", "2025-01-02", 5),
        ("po1", "A", "2025-01-01", 9),  # earlier date wins
        ("po2", "B", "2025-01-01", 1),
    ]
    df = spark.createDataFrame(rows, "po_id string, sku_key string, order_date string, qty long")
    out = {(r.po_id, r.sku_key): (r.order_date, r.qty) for r in purchases.dedupe_batch(df).collect()}
    assert out == {("po1", "A"): ("2025-01-01", 9), ("po2", "B"): ("2025-01-01", 1)}
    # stable across repeated runs
    out2 = {(r.po_id, r.sku_key): (r.order_date, r.qty) for r in purchases.dedupe_batch(df).collect()}
    assert out == out2


def test_change_feed_ops_and_nulls(spark):
    from kaspi_etl_spark.ops.purchases import change_feed

    old = spark.createDataFrame(
        [("p1", "A", 1), ("p1", "B", 2), ("p1", "C", None), ("p1", "D", 4)],
        "po_id string, sku_key string, qty int",
    )
    new = spark.createDataFrame(
        [("p1", "A", 1),      # unchanged -> omitted
         ("p1", "B", 9),      # update
         ("p1", "C", None),   # unchanged incl. null value -> omitted
         ("p1", "E", 5)],     # insert; D missing -> delete
        "po_id string, sku_key string, qty int",
    )
    out = {(r.sku_key): (r.op, r.qty) for r in change_feed(old, new).collect()}
    assert out == {"B": ("update", 9), "D": ("delete", 4), "E": ("insert", 5)}
