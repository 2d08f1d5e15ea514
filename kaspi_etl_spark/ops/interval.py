"""Binned interval join — point-in-interval matching without a
nested-loop join.

Spark compiles a bare `p BETWEEN start AND end` join predicate (no
equi-key) to BroadcastNestedLoopJoin or a cartesian product — both
quadratic and both banned by this repo's global plan guard. The scale
form bins the number line:

    bucket(x)    = floor(x / W)
    intervals    explode to every bucket they overlap
    points       live in exactly ONE bucket
    join         equi-join on bucket, then the exact BETWEEN filter

A point has one bucket, so each qualifying (point, interval) candidate
appears EXACTLY once — no dedup stage. Cost: the interval side inflates
by avg_interval_length / W rows (pick W near the typical interval
length), the join is a plain hash equi-join, and a long outlier
interval degrades to many bucket rows, never to a cross product. This
is the standard "range join via binning" rewrite (Databricks ships it
as a range-join hint; open-source Spark has no native operator).

Inputs are exact integers (day numbers, epoch seconds/micros already
materialized by the caller) — binning floats invites boundary-ulp
divergence, and timestamps should be reduced to integers with explicit
timezone-free arithmetic (e.g. datediff from a fixed epoch) BEFORE the
join so no engine- or session-timezone coupling can sneak in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _floordiv(col: str, w: int):
    """Exact floor division as integer Column math (Spark's `div`
    truncates toward zero, which mis-buckets negatives; pmod is always
    non-negative, so x - pmod(x, w) is an exact multiple of w). The
    final division stays INTEGER (`div`), never IEEE `/`: a double
    quotient is inexact for |x| >= 2^53 (epoch nanoseconds) and would
    silently mis-bucket points/intervals at that range."""
    return F.expr(
        f"CAST((({col}) - pmod(({col}), {w})) AS BIGINT) div {w}"
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: int,
) -> DataFrame:
    """Inner-join every point row to every interval row with
    ``start_col <= point_col <= end_col`` (inclusive both ends).

    Column names must be disjoint between the two frames. NULL points,
    NULL bounds, and inverted intervals (end < start) match nothing —
    ``sequence()`` over a NULL or inverted range contributes no buckets
    and the BETWEEN filter is never NULL-true.
    """
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(f"overlapping column names: {sorted(overlap)}")
    p = points.withColumn("_ij_bucket", _floordiv(point_col, bin_width))
    iv = intervals.filter(
        F.col(start_col).isNotNull()
        & F.col(end_col).isNotNull()
        & (F.col(end_col) >= F.col(start_col))
    ).withColumn(
        "_ij_bucket",
        F.explode(
            F.sequence(_floordiv(start_col, bin_width), _floordiv(end_col, bin_width))
        ),
    )
    return (
        p.join(iv, "_ij_bucket")
        .filter(F.col(point_col).between(F.col(start_col), F.col(end_col)))
        .drop("_ij_bucket")
    )
