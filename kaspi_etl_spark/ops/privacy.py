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

from pyspark.sql import DataFrame, Window
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


def t_closeness(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    t_max_ppm: int,
) -> DataFrame:
    """t-closeness release (Li, Li & Venkatasubramanian 2007): a
    quasi-identifier group is released only if the distribution of its
    ORDERED sensitive attribute is within Earth-Mover's Distance
    ``t_max_ppm`` (parts-per-million) of the GLOBAL distribution — the
    skewness-attack guard l-diversity misses (a group with l distinct
    but extreme values still leaks; closeness bounds how much the group
    deviates from the table-wide base rate).

    For an ordered discrete domain v_1 < ... < v_m the exact EMD is
    ``(1/(m-1)) * sum_i |cum_i(p) - cum_i(q)|``; on common denominators
    it is computed entirely in integers:
    ``t_ppm = 1e6 * sum_i |cum_gc_i * N - cum_gl_i * g_n|
      // ((m-1) * g_n * N)`` through DECIMAL(38) products (HUGEINT in
    the oracle mirror).

    Shape: one global band count (bounded at the band domain), one
    per-(group, band) count, a dense group x band GRID (cross join of
    two bounded dims) so absent cells contribute zeros, one cumulative
    window over the grid (<= m rows per group — literal-bounded), and
    the null-safe broadcast join back onto the rows (the l_diversify
    mechanics). NULL sensitive values carry no position in an ordered
    EMD: they are excluded from both distributions (documented trade);
    a group with ONLY NULL sensitives has no distribution and is
    suppressed conservatively. Appends grp_n (non-NULL-sensitive group
    size) and t_ppm; quasi columns of failing groups become NULL, row
    count preserved.
    """
    s = F.col(sensitive_col)
    base = df.filter(s.isNotNull())
    # r11 (guide §1.2): every distribution input below is an exact
    # integer identity over the bounded (quasi, band) CELL table —
    # grp_n = sum of a group's cells, _gl = sum of a band's cells,
    # n = sum of all cells, bands = the cell table's distinct band
    # keys (groupBy keeps NULL quasi/band groups in both forms).
    # Materialize the cells once and scan the base table ONCE instead
    # of five times (groups/bands/glob/n_row/gc were each a separate
    # full-scan aggregation in the static plan: 14 parquet scans).
    gc = (
        base.groupBy(*quasi_cols, s.alias("_band"))
        .agg(F.count(F.lit(1)).cast("long").alias("_gc"))
        .localCheckpoint()
    )
    groups = gc.groupBy(*quasi_cols).agg(
        F.sum("_gc").cast("long").alias("grp_n")
    )
    bands = gc.select("_band").distinct()
    glob = gc.groupBy("_band").agg(F.sum("_gc").cast("long").alias("_gl"))
    n_row = gc.agg(F.sum("_gc").cast("long").alias("_n"))
    m_row = bands.agg(
        F.greatest(F.count(F.lit(1)) - 1, F.lit(1)).cast("long").alias("_m1")
    )
    grid = groups.crossJoin(F.broadcast(bands))
    right = gc
    for c in quasi_cols:
        right = right.withColumnRenamed(c, f"_q_{c}")
    cond = F.col("_band").eqNullSafe(F.col("_rb"))
    right = right.withColumnRenamed("_band", "_rb")
    for c in quasi_cols:
        cond = cond & F.col(c).eqNullSafe(F.col(f"_q_{c}"))
    cells = (
        grid.join(right, cond, "left")
        .select(
            *quasi_cols,
            "grp_n",
            "_band",
            F.coalesce(F.col("_gc"), F.lit(0)).cast("long").alias("_gc"),
        )
        .join(F.broadcast(glob), "_band")
        .crossJoin(F.broadcast(n_row))
    )
    w = (
        Window.partitionBy(*quasi_cols)
        .orderBy("_band")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = cells.select(
        *quasi_cols,
        "grp_n",
        "_n",
        F.abs(
            F.sum(
                F.col("_gc").cast("decimal(19,0)") * F.col("_n").cast("decimal(19,0)")
                - F.col("_gl").cast("decimal(19,0)")
                * F.col("grp_n").cast("decimal(19,0)")
            ).over(w)
        ).alias("_ad"),
    )
    stats = (
        cum.groupBy(*quasi_cols, "grp_n", "_n")
        .agg(F.sum("_ad").alias("_sad"))
        .crossJoin(F.broadcast(m_row))
        .select(
            *quasi_cols,
            "grp_n",
            F.expr(
                "CAST((CAST(1000000 AS DECIMAL(38,0)) * _sad)"
                " div (CAST(_m1 AS DECIMAL(38,0)) * CAST(grp_n AS DECIMAL(38,0))"
                "      * CAST(_n AS DECIMAL(38,0))) AS BIGINT)"
            ).alias("t_ppm"),
        )
    )
    rstats = stats
    for c in quasi_cols:
        rstats = rstats.withColumnRenamed(c, f"_q_{c}")
    jcond = None
    for c in quasi_cols:
        eq = F.col(c).eqNullSafe(F.col(f"_q_{c}"))
        jcond = eq if jcond is None else (jcond & eq)
    joined = df.join(F.broadcast(rstats), jcond, "left").drop(
        *[f"_q_{c}" for c in quasi_cols]
    )
    keep = F.col("t_ppm").isNotNull() & (F.col("t_ppm") <= t_max_ppm)
    out = joined
    for c in quasi_cols:
        out = out.withColumn(c, F.when(keep, F.col(c)).otherwise(F.lit(None)))
    return out
