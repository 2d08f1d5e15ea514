"""As-of (time-travel) join — the operator Spark lacks natively.

Not present in the reference, but its price-watch domain motivates it
("the latest snapshot at or before this moment"); included as a
first-class custom operator per the engine's training-pipeline charter.

Spark design — the union-tag composition, NOT a range self-join:
tag both sides, union, sort within each key by (ts, tag), and carry the
most recent right-side value forward with a last(ignorenulls) window.
One shuffle on the key; no point-in-interval explosion; skew only if a
single key dominates (then salt the window by coarse time bucket).

DuckDB's native ASOF JOIN is the oracle, so the composition is verified
value-exact against a reference implementation of the semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For every left row, attach the right row with the greatest
    ``right_ts`` <= ``left_ts`` for the same key (left outer: no prior
    right row -> nulls).

    Ties: a right row at exactly left_ts matches (>= semantics, like
    DuckDB ASOF). If multiple right rows share one timestamp, the last
    one in (ts, its own ordering) wins — pass a uniquifying column in
    ``value_cols`` ordering upstream if that matters.

    NULL keys follow equi-join semantics (NULL matches nothing): a
    NULL-key left row gets NULL as-of columns. Without the filter below
    the carry-forward window would group all NULL keys into one
    partition and happily 'match' them to each other — a divergence
    from every SQL engine's ASOF that only NULL-key data exposes
    (adversarial sweep finding). NULL right timestamps likewise cannot
    be 'the latest at-or-before' anything.
    """
    value_cols = value_cols or [
        c for c in right.columns if c not in (key, right_ts)
    ]
    right = right.filter(F.col(key).isNotNull() & F.col(right_ts).isNotNull())
    # The right row travels as ONE nullable struct so the carry-forward
    # is atomic (independent per-column carries could stitch together
    # values from different right rows when some columns are null).
    r_struct = F.struct(*[F.col(c) for c in value_cols])
    r_tag = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        r_struct.alias("_rrow"),
    )
    l_tag = left.select(
        F.col(key),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.lit(None).cast(r_tag.schema["_rrow"].dataType).alias("_rrow"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
    )
    r_tag = r_tag.withColumn(
        "_lrow", F.lit(None).cast(l_tag.schema["_lrow"].dataType)
    )
    unioned = l_tag.unionByName(r_tag)
    # right rows sort before left rows at the same timestamp (_is_left
    # ascending) so an exactly-simultaneous snapshot is visible.
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_ts").asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "_rmatch", F.last("_rrow", ignorenulls=True).over(w)
    ).filter(F.col("_is_left") == 1)
    return carried.select(
        *[F.col("_lrow")[c].alias(c) for c in left.columns],
        *[F.col("_rmatch")[c].alias(f"{c}{suffix}") for c in value_cols],
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level diff between two table snapshots: one row per key that
    was added, removed, or changed, with the change kind.

    The CDC primitive for plain-parquet pipelines (Delta's CHANGE DATA
    FEED without the format): FULL OUTER join on the keys, change kind
    from null-side analysis, 'changed' decided by comparing the
    non-key columns as one struct (null-safe: <=> via eqNullSafe on the
    struct). One shuffle on the key columns; at scale, run it
    per-partition after partition pruning (unchanged partitions skip
    entirely when writers maintain partition-level fingerprints).

    Output: keys + change ('added' | 'removed' | 'changed').
    """
    compare_cols = compare_cols or [c for c in new.columns if c not in keys]
    o = old.select(
        *[F.col(k).alias(f"_ok_{k}") for k in keys],
        F.struct(*[F.col(c) for c in compare_cols]).alias("_oval"),
    )
    n = new.select(
        *[F.col(k).alias(f"_nk_{k}") for k in keys],
        F.struct(*[F.col(c) for c in compare_cols]).alias("_nval"),
    )
    cond = None
    for k in keys:
        c = F.col(f"_ok_{k}") == F.col(f"_nk_{k}")
        cond = c if cond is None else cond & c
    joined = o.join(n, cond, "full_outer")
    change = (
        F.when(F.col(f"_ok_{keys[0]}").isNull(), F.lit("added"))
        .when(F.col(f"_nk_{keys[0]}").isNull(), F.lit("removed"))
        .when(~F.col("_oval").eqNullSafe(F.col("_nval")), F.lit("changed"))
    )
    return (
        joined.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(
            *[
                F.coalesce(F.col(f"_ok_{k}"), F.col(f"_nk_{k}")).alias(k)
                for k in keys
            ],
            "change",
        )
    )
