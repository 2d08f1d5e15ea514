"""Export path tests (S16/P10).

The headline ``export_flat`` is the direct flat computation; the
``export_roundtrip`` query nests sellers into per-variant arrays and
flattens them back. Equality of the two proves the re-nesting round-trip
is lossless without paying the collect_list/explode cost on the bench path.
"""

from __future__ import annotations

from kaspi_etl_spark import registry
from kaspi_etl_spark.ops import export as export_ops


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_export_flat_direct_equals_roundtrip(spark, sf_dir):
    direct = registry.q_export_flat(spark, sf_dir)
    nested = registry.q_export_roundtrip(spark, sf_dir)
    assert direct.columns == nested.columns
    assert _sorted_rows(direct) == _sorted_rows(nested)


def test_export_flat_has_placeholder_and_in_stock_filter(spark, sf_dir):
    flat = registry.q_export_flat(spark, sf_dir)
    placeholders = flat.filter("name = 'Out of stock'")
    for row in placeholders.limit(5).collect():
        assert row.price == 0 and row.deliveryDate == ""
    in_stock = export_ops.in_stock_only(flat)
    assert in_stock.filter("name = 'Out of stock' AND price = 0").count() == 0
