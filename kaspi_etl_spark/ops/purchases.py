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


def change_feed(
    old: DataFrame, new: DataFrame, keys: list[str] | None = None
) -> DataFrame:
    """CDC between two keyed snapshots: one row per changed key with
    op = insert | update | delete (unchanged keys are not emitted).
    Inserts/updates carry the new values, deletes the old values —
    the change stream a MERGE INTO would apply, derived from plain
    snapshots with one full-outer join on the key.

    Both inputs must be unique per key (dedupe_batch upstream).
    """
    keys = keys or UPSERT_KEYS
    vals = [c for c in new.columns if c not in keys]
    # presence flags come from explicit tags, not value columns (values
    # may legitimately be null):
    o = old.select(*keys, F.lit(1).alias("_o_present"), *[F.col(c).alias(f"_o_{c}") for c in vals])
    n = new.select(*keys, F.lit(1).alias("_n_present"), *[F.col(c).alias(f"_n_{c}") for c in vals])
    j = o.join(n, keys, "full")
    differs = None
    for c in vals:
        d = ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
        differs = d if differs is None else (differs | d)
    op = (
        F.when(F.col("_o_present").isNull(), F.lit("insert"))
        .when(F.col("_n_present").isNull(), F.lit("delete"))
        .when(differs if differs is not None else F.lit(False), F.lit("update"))
    )
    out_vals = [
        F.coalesce(F.col(f"_n_{c}"), F.col(f"_o_{c}")).alias(c) for c in vals
    ]
    return (
        j.withColumn("op", op)
        .filter(F.col("op").isNotNull())
        .select("op", *keys, *out_vals)
    )


def scd2_history(
    snapshots: DataFrame,
    key: str,
    ts_col: str,
    value_cols: list[str],
) -> DataFrame:
    """Slowly-changing-dimension type 2 from a stream of keyed snapshots:
    collapse consecutive identical values, emit one validity interval per
    value run — effective_from / effective_to (null = current) /
    is_current / version.

    Complements ``change_feed`` (two-snapshot CDC) with the full-history
    form. One window shuffle on the key; at 100 TB the key partitioning
    carries both window passes (lag + lead) in a single exchange.

    Input must be unique per (key, ts) — dedupe_batch upstream.
    """
    w = Window.partitionBy(key).orderBy(ts_col)
    changed = None
    for c in value_cols:
        d = ~F.col(c).eqNullSafe(F.lag(c).over(w))
        changed = d if changed is None else (changed | d)
    runs = (
        snapshots.withColumn(
            "_chg",
            F.when(F.lag(ts_col).over(w).isNull(), F.lit(True)).otherwise(changed),
        )
        .filter(F.col("_chg"))
        .drop("_chg")
    )
    return runs.select(
        key,
        *value_cols,
        F.col(ts_col).alias("effective_from"),
        F.lead(ts_col).over(w).alias("effective_to"),
        F.lead(ts_col).over(w).isNull().alias("is_current"),
        F.row_number().over(w).cast("long").alias("version"),
    )


def upsert(existing: DataFrame, incoming: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """S8/J5: delete-then-insert by composite key, as a pure transform.

    Rows in ``existing`` whose key appears in ``incoming`` are replaced.
    """
    keys = keys or UPSERT_KEYS
    kept = existing.join(incoming.select(*keys).distinct(), keys, "left_anti")
    return kept.unionByName(incoming)
