"""Binned interval join (ops/interval.py) — correctness vs brute force,
edge semantics, and the no-nested-loop plan guarantee."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kaspi_etl_spark.ops.interval import interval_join


def test_interval_join_basics(spark):
    pts = spark.createDataFrame(
        [(1, 5), (2, 10), (3, 16), (4, 31), (5, -3)], "pid long, x long"
    )
    ivs = spark.createDataFrame(
        [(10, 0, 10), (20, 10, 20), (30, 31, 31), (40, 50, 40), (50, None, 99)],
        "iid long, s long, e long",
    )
    got = {(r["pid"], r["iid"]) for r in
           interval_join(pts, ivs, "x", "s", "e", bin_width=7).collect()}
    # inclusive both ends; point 10 matches both adjacent intervals;
    # single-point interval works; inverted (50,40) and NULL-bound
    # intervals match nothing; negative points bucket correctly
    assert got == {(1, 10), (2, 10), (2, 20), (3, 20), (4, 30)}


def test_interval_join_exact_beyond_double_precision(spark):
    """Bucketing must use integer floor division: IEEE double division
    is inexact for |x| >= 2^53 (epoch nanoseconds), and a mis-rounded
    quotient silently drops or duplicates join candidates (r6
    advisory). 2^53 + 1 is the first integer a double cannot hold."""
    base = (1 << 53) + 1
    pts = spark.createDataFrame(
        [(1, base), (2, base + 10), (3, -base)], "pid long, x long"
    )
    ivs = spark.createDataFrame(
        [(10, base - 5, base + 5), (20, -base - 3, -base + 3)],
        "iid long, s long, e long",
    )
    got = {(r["pid"], r["iid"]) for r in
           interval_join(pts, ivs, "x", "s", "e", bin_width=7).collect()}
    assert got == {(1, 10), (3, 20)}


def test_interval_join_rejects_overlapping_columns_and_bad_width(spark):
    df = spark.createDataFrame([(1, 2)], "a long, b long")
    with pytest.raises(ValueError, match="overlapping"):
        interval_join(df, df, "a", "a", "b", 10)
    other = spark.createDataFrame([(1, 2)], "c long, d long")
    with pytest.raises(ValueError, match="bin_width"):
        interval_join(df, other, "a", "c", "d", 0)


def test_interval_join_no_nested_loop_plan(spark):
    pts = spark.range(100).select(F.col("id").alias("pid"), (F.col("id") * 3).alias("x"))
    ivs = spark.range(20).select(
        F.col("id").alias("iid"),
        (F.col("id") * 11).alias("s"),
        (F.col("id") * 11 + 25).alias("e"),
    )
    out = interval_join(pts, ivs, "x", "s", "e", bin_width=16)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # every candidate appears exactly once (a point has ONE bucket)
    assert out.count() == out.distinct().count()


@settings(max_examples=15, deadline=None)
@given(
    pts=st.lists(st.integers(min_value=-50, max_value=120), min_size=0, max_size=25),
    ivs=st.lists(
        st.tuples(
            st.integers(min_value=-50, max_value=120),
            st.integers(min_value=-20, max_value=60),
        ),
        min_size=0,
        max_size=12,
    ),
    w=st.sampled_from([1, 3, 7, 16, 100]),
)
def test_interval_join_matches_bruteforce(spark, pts, ivs, w):
    expected = {
        (pi, ii)
        for pi, x in enumerate(pts)
        for ii, (s, ln) in enumerate(ivs)
        if s <= x <= s + ln
    }
    pdf = spark.createDataFrame(
        [(i, x) for i, x in enumerate(pts)] or [(None, None)], "pid long, x long"
    ).filter(F.col("pid").isNotNull())
    idf = spark.createDataFrame(
        [(i, s, s + ln) for i, (s, ln) in enumerate(ivs)] or [(None, None, None)],
        "iid long, s long, e long",
    ).filter(F.col("iid").isNotNull())
    got = {
        (r["pid"], r["iid"])
        for r in interval_join(pdf, idf, "x", "s", "e", bin_width=w).collect()
    }
    assert got == expected
