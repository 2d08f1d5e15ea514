"""Privacy transforms beyond regex PII (llm/pii.py): k-anonymity.

Before a curated dataset leaves the pipeline, quasi-identifier
combinations that occur fewer than k times re-identify individuals by
joinability. ``k_anonymize`` suppresses (NULLs out) the quasi columns
for any row whose full quasi combination has fewer than k occurrences,
which makes the released table k-anonymous over those columns by
construction; ``suppression_report`` is the audit view.

Scale shape: one groupBy over the quasi columns (output bounded by the
number of distinct combinations — usually tiny vs the data) broadcast
back onto the rows; no row-side shuffle at all when the combination
table fits a broadcast, which is the normal case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quasi_counts(df: DataFrame, quasi_cols: list[str]) -> DataFrame:
    """(quasi..., grp_n) occurrence counts per combination. NULLs in
    quasi columns group together (standard groupBy semantics) — a NULL
    combination is itself a joinable signature and gets no free pass."""
    return df.groupBy(*quasi_cols).agg(
        F.count("*").cast("long").alias("grp_n")
    )


def k_anonymize(
    df: DataFrame, quasi_cols: list[str], k: int, count_col: str = "grp_n"
) -> DataFrame:
    """All input rows with quasi columns suppressed (NULL) wherever the
    row's combination occurs fewer than k times; appends ``count_col``.
    Row count is preserved — suppression, not deletion, so aggregate
    utility survives."""
    if k < 1:
        raise ValueError("k must be >= 1")
    # null-safe join: a NULL quasi value is a real combination (see
    # quasi_counts) — a plain equi-join would leave such rows with a
    # NULL count and silently skip their suppression decision (caught
    # by the adversarial-data sweep, which NULLs optional columns)
    counts = quasi_counts(df, quasi_cols)
    right = counts
    for c in quasi_cols:
        right = right.withColumnRenamed(c, f"_q_{c}")
    cond = None
    for c in quasi_cols:
        eq = F.col(c).eqNullSafe(F.col(f"_q_{c}"))
        cond = eq if cond is None else (cond & eq)
    joined = df.join(F.broadcast(right), cond, "left").drop(
        *[f"_q_{c}" for c in quasi_cols]
    )
    out = joined
    for c in quasi_cols:
        out = out.withColumn(
            c, F.when(F.col(count_col) >= k, F.col(c)).otherwise(F.lit(None))
        )
    return out


def suppression_report(
    df: DataFrame, quasi_cols: list[str], k: int
) -> DataFrame:
    """Audit view: per combination, its size and whether it is released
    or suppressed at this k."""
    return quasi_counts(df, quasi_cols).select(
        *quasi_cols,
        "grp_n",
        (F.col("grp_n") < k).cast("long").alias("suppressed"),
    )


def l_diversify(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l: int,
) -> DataFrame:
    """l-diversity on top of k-anonymity's suppression mechanics: a
    quasi-identifier combination is released only if its group contains
    at least ``l`` DISTINCT values of the sensitive attribute —
    k-anonymity alone still leaks when a 50-person group all shares one
    diagnosis (the homogeneity attack l-diversity exists to stop).

    Same shape as k_anonymize: one bounded groupBy (count + distinct
    sensitive count) broadcast back onto the rows via the null-safe
    quasi join; rows in insufficiently diverse groups get their quasi
    columns suppressed to NULL, row count preserved. Appends grp_n and
    sens_l. NULL sensitive values count as one distinct value (they
    group; a group of all-NULL sensitives has sens_l = 1)."""
    if l < 1:
        raise ValueError("l must be >= 1")
    counts = df.groupBy(*quasi_cols).agg(
        F.count("*").cast("long").alias("grp_n"),
        (
            F.countDistinct(sensitive_col)
            + F.max(F.col(sensitive_col).isNull().cast("int"))
        )
        .cast("long")
        .alias("sens_l"),
    )
    right = counts
    for c in quasi_cols:
        right = right.withColumnRenamed(c, f"_q_{c}")
    cond = None
    for c in quasi_cols:
        eq = F.col(c).eqNullSafe(F.col(f"_q_{c}"))
        cond = eq if cond is None else (cond & eq)
    joined = df.join(F.broadcast(right), cond, "left").drop(
        *[f"_q_{c}" for c in quasi_cols]
    )
    out = joined
    for c in quasi_cols:
        out = out.withColumn(
            c, F.when(F.col("sens_l") >= l, F.col(c)).otherwise(F.lit(None))
        )
    return out
