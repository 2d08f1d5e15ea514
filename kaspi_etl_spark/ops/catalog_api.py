"""Catalog API sync — the etl_catalog_api.py dataflow recomposed.

Reference: scripts/etl_catalog_api.py — fetch existing products (S10),
map kaspi codes to product ids (J3), find catalog rows not yet on the
marketplace (J4/U3 anti-join), create them via per-row POSTs (S11).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def map_product_ids(catalog: DataFrame, code_map: DataFrame) -> DataFrame:
    """J3: kaspi code -> product id via broadcast left join
    (etl_catalog_api.py:143-151; dict .map in the reference).
    ``code_map``: (code, product_id)."""
    m = code_map.select(F.col("code").alias("kaspi_code"), "product_id")
    return catalog.join(F.broadcast(m), "kaspi_code", "left")


def new_products(catalog: DataFrame, existing: DataFrame) -> DataFrame:
    """J4: catalog rows whose code is absent from the marketplace
    (etl_catalog_api.py:236-244 membership loop -> left_anti join)."""
    return catalog.join(
        existing.select(F.col("code").alias("kaspi_code")).distinct(),
        "kaspi_code",
        "left_anti",
    )


def sync_new_products(
    catalog: DataFrame,
    existing: DataFrame,
    post_fn: Callable[[dict[str, Any]], None],
    parallelism: int = 5,
) -> int:
    """Full S10->J4->S11 flow: compute missing products, POST each via
    the bounded-fan-out REST sink, return how many were pushed."""
    from ..sources.rest import write_rest_per_row

    missing = new_products(catalog, existing)
    n = missing.count()
    if n:
        write_rest_per_row(missing, post_fn, parallelism=parallelism)
    return n
