"""Declarative data-quality verification (Deequ-style).

A check suite over a table compiles to ONE aggregation pass: every
constraint contributes one metric expression to a single ``df.agg(...)``
(so a 40-constraint suite still reads the table once and shuffles one
row), and the 1-row result is exploded into the per-constraint report
(constraint, metric, passed).

Referential-integrity checks need a second table and therefore a join —
they're separate report rows unioned onto the single-pass suite
(orphan-count via left-anti join, keyed on the FK: the standard shape).

Metrics are exact: ratios are integer-count divisions done in IEEE
doubles identically on any engine, so pass/fail is deterministic —
no sampling, no approximation.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# A constraint: (name, pre-agg metric expression, metric -> passed).
Spec = tuple[str, Column, Callable[[Column], Column]]


def metrics_report(df: DataFrame, specs: list[Spec]) -> DataFrame:
    """Run all constraints in one aggregation pass; one report row each."""
    aggs = [m.cast("double").alias(f"_m{i}") for i, (_, m, _) in enumerate(specs)]
    row = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(name).alias("constraint"),
                F.col(f"_m{i}").alias("metric"),
                passed(F.col(f"_m{i}")).alias("passed"),
            )
            for i, (name, _, passed) in enumerate(specs)
        ]
    )
    return row.select(F.explode(entries).alias("e")).select("e.*")


def ratio(cond: Column) -> Column:
    """Fraction of rows satisfying ``cond`` — exact integer counts divided
    once in doubles."""
    return F.sum(cond.cast("long")).cast("double") / F.count("*").cast(
        "double"
    )


def completeness(col: str) -> Column:
    return ratio(F.col(col).isNotNull())


def uniqueness(col: str) -> Column:
    return F.count_distinct(F.col(col)).cast("double") / F.count("*").cast(
        "double"
    )


def orphan_count(
    child: DataFrame, parent: DataFrame, fk: str, pk: str, name: str
) -> DataFrame:
    """Referential-integrity report row: rows of ``child`` whose ``fk``
    has no match in ``parent.pk`` (left-anti join, counted)."""
    orphans = child.join(
        parent.select(F.col(pk).alias(fk)).distinct(), fk, "left_anti"
    )
    return orphans.agg(
        F.lit(name).alias("constraint"),
        F.count("*").cast("double").alias("metric"),
        (F.count("*") == 0).alias("passed"),
    )


def observed_write_metrics(
    df: DataFrame, watch_cols: list[str]
) -> tuple[DataFrame, "Observation"]:
    """Attach in-flight data-quality metrics to a frame so the NEXT
    action over it (typically the write) also produces row count and
    per-column null counts — zero extra scans, unlike a separate
    metrics_report pass over the same input.

    Returns (observed_df, observation); after the action completes,
    ``observation.get`` yields {'n_rows': ..., 'nulls_<col>': ...}.
    This is the production form of the DQ suite for write paths: the
    declarative metrics_report stays for audits, the observation rides
    along with every load. (Spark computes observed metrics as
    accumulator-style aggregates during the action — they are exact,
    not sampled.)
    """
    from pyspark.sql import Observation

    obs = Observation("write_metrics")
    metrics = [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}")
        for c in watch_cols
    ]
    return df.observe(obs, *metrics), obs


def column_drift_profile(
    df: DataFrame,
    period_col: str,
    columns: list[str],
) -> DataFrame:
    """Per-column schema-level drift profile between two periods — the
    column-granular companion of the PSI distribution monitor: for every
    profiled column, row/non-null/distinct counts in period A (period
    flag false) vs period B (true), the counts a data-contract checker
    diffs to catch silent upstream changes (a column going sparse, a
    category set exploding).

    One melt (stack generator, zero extra scans) + one groupBy; distinct
    counts run on the stringified value, which is injective per engine,
    so COUNT(DISTINCT) matches any SQL mirror even where float
    formatting differs. Rows with a NULL period flag are excluded (no
    period to attribute them to). Exact integers only.
    """
    n = len(columns)
    pairs = ", ".join(f"'{c}', CAST({c} AS STRING)" for c in columns)
    melted = (
        df.filter(F.col(period_col).isNotNull())
        .select(
            F.col(period_col).alias("_b"),
            F.expr(f"stack({n}, {pairs}) AS (col_name, val)"),
        )
    )
    return (
        melted.groupBy("col_name")
        .agg(
            F.sum(F.when(~F.col("_b"), 1).otherwise(0)).cast("long").alias("n_a"),
            F.sum(F.when(F.col("_b"), 1).otherwise(0)).cast("long").alias("n_b"),
            F.count(F.when(~F.col("_b"), F.col("val")))
            .cast("long")
            .alias("nonnull_a"),
            F.count(F.when(F.col("_b"), F.col("val"))).cast("long").alias("nonnull_b"),
            F.countDistinct(F.when(~F.col("_b"), F.col("val")))
            .cast("long")
            .alias("distinct_a"),
            F.countDistinct(F.when(F.col("_b"), F.col("val")))
            .cast("long")
            .alias("distinct_b"),
        )
    )
