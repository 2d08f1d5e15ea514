"""MERGE INTO — the unifying upsert/CDC primitive as (a) a pure frame
transform and (b) a stage-and-swap parquet writer.

The engine grew several merge-shaped pieces bottom-up — S8 upsert
(`sinks.upsert_parquet`), SCD2 history (`ops/purchases.scd2_history`),
snapshot diff (`ops/asof.snapshot_diff`), incremental state folds
(`streaming/incremental.py`). This module is the one API in front of
them, shaped like SQL/Delta `MERGE INTO`:

    MERGE INTO target USING source ON <keys>
    WHEN MATCHED THEN UPDATE | DELETE | IGNORE
    WHEN NOT MATCHED THEN INSERT
    WHEN NOT MATCHED BY SOURCE THEN DELETE   (full-sync mode)

Scale shape: ONE full-outer join keyed on the merge keys (map-side
pruned by AQE when one side is small), struct-packed sides so the row
choice is a single column expression, no window, no driver data. On a
partitioned table, merge per-partition (the source's touched partitions
only) exactly like `sinks.upsert_parquet` documents.

Reference anchor: the reference's delete-then-append upsert
(etl_purchases.py:57-64) is `when_matched='update'`,
`insert_unmatched=True`, `delete_unmatched_target=False`.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WHEN_MATCHED = ("update", "delete", "ignore")


def merge_frames(
    target: DataFrame,
    source: DataFrame,
    on: list[str],
    when_matched: str = "update",
    insert_unmatched: bool = True,
    delete_unmatched_target: bool = False,
) -> DataFrame:
    """Pure MERGE transform: returns the post-merge table.

    - matched + ``update``: the source row replaces the target row;
      ``delete``: the row is dropped; ``ignore``: the target row stays.
    - unmatched source rows insert when ``insert_unmatched``.
    - unmatched target rows drop when ``delete_unmatched_target``
      (the WHEN NOT MATCHED BY SOURCE THEN DELETE full-sync clause).

    Duplicate source keys RAISE (same contract as Delta's MERGE: a
    target row matching two source rows is ambiguous). NULL merge keys
    never match (equi-join semantics): a NULL-key source row is always
    'unmatched' and inserts (or is skipped), never updates anything.

    Columns must line up (same schema both sides) — MERGE with column
    mapping belongs in a select before the call.
    """
    if when_matched not in WHEN_MATCHED:
        raise ValueError(f"when_matched must be one of {WHEN_MATCHED}")
    if set(target.columns) != set(source.columns):
        raise ValueError(
            f"schema mismatch: target {sorted(target.columns)} vs "
            f"source {sorted(source.columns)}"
        )
    # NULL-key rows are excluded from the ambiguity check: they never
    # match a target row (equi-join semantics, documented above), so two
    # NULL-key source rows are two independent inserts, not an ambiguous
    # update. groupBy would lump them into one NULL group and raise.
    non_null_keys = None
    for k in on:
        c = F.col(k).isNotNull()
        non_null_keys = c if non_null_keys is None else non_null_keys & c
    dup = (
        source.filter(non_null_keys)
        .groupBy(*on)
        .count()
        .filter(F.col("count") > 1)
        .limit(1)
        .count()
    )
    if dup:
        raise ValueError(
            "duplicate source keys: a MERGE where one target row matches "
            "several source rows is ambiguous — dedupe the source first "
            "(ops/purchases.dedupe_batch)"
        )
    cols = target.columns
    t = target.select(
        *[F.col(k).alias(f"_tk_{k}") for k in on],
        F.struct(*[F.col(c) for c in cols]).alias("_trow"),
    )
    s = source.select(
        *[F.col(k).alias(f"_sk_{k}") for k in on],
        F.struct(*[F.col(c) for c in cols]).alias("_srow"),
    )
    cond = None
    for k in on:
        c = F.col(f"_tk_{k}") == F.col(f"_sk_{k}")
        cond = c if cond is None else cond & c
    joined = t.join(s, cond, "full_outer")
    matched = F.col("_trow").isNotNull() & F.col("_srow").isNotNull()
    target_only = F.col("_srow").isNull() & F.col("_trow").isNotNull()
    source_only = F.col("_trow").isNull() & F.col("_srow").isNotNull()

    keep_matched = {
        "update": F.col("_srow"),
        "ignore": F.col("_trow"),
        "delete": F.lit(None),
    }[when_matched]
    out_row = (
        F.when(matched, keep_matched)
        .when(
            target_only,
            F.lit(None) if delete_unmatched_target else F.col("_trow"),
        )
        .when(source_only, F.col("_srow") if insert_unmatched else F.lit(None))
    )
    return (
        joined.withColumn("_out", out_row)
        .filter(F.col("_out").isNotNull())
        .select(*[F.col("_out")[c].alias(c) for c in cols])
    )


def merge_into(
    spark: SparkSession,
    source: DataFrame,
    path: str,
    on: list[str],
    when_matched: str = "update",
    insert_unmatched: bool = True,
    delete_unmatched_target: bool = False,
) -> None:
    """MERGE INTO a plain-parquet table at ``path`` (stage-and-swap with
    rename-based crash recovery; an absent table bootstraps from the
    source's inserts)."""
    from .. import sinks

    sinks.recover_swap(path)
    if os.path.exists(path):
        merged = merge_frames(
            spark.read.parquet(path),
            source,
            on,
            when_matched=when_matched,
            insert_unmatched=insert_unmatched,
            delete_unmatched_target=delete_unmatched_target,
        )
    else:
        if not insert_unmatched:
            return
        merged = source
    sinks.publish_swap(merged, path)
