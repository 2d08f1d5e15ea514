"""MERGE INTO (ops/merge.py) — clause semantics, NULL keys, ambiguity
guard, path-level swap + crash recovery."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kaspi_etl_spark.ops import merge


def frames(spark):
    target = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k long, s string, v long"
    )
    source = spark.createDataFrame(
        [(2, "B", 99), (4, "d", 40)], "k long, s string, v long"
    )
    return target, source


def as_map(df):
    return {r["k"]: (r["s"], r["v"]) for r in df.collect()}


def test_merge_update_insert(spark):
    t, s = frames(spark)
    out = as_map(merge.merge_frames(t, s, ["k"]))
    assert out == {1: ("a", 10), 2: ("B", 99), 3: ("c", 30), 4: ("d", 40)}


def test_merge_matched_delete(spark):
    t, s = frames(spark)
    out = as_map(merge.merge_frames(t, s, ["k"], when_matched="delete"))
    assert out == {1: ("a", 10), 3: ("c", 30), 4: ("d", 40)}


def test_merge_matched_ignore_no_insert(spark):
    t, s = frames(spark)
    out = as_map(
        merge.merge_frames(
            t, s, ["k"], when_matched="ignore", insert_unmatched=False
        )
    )
    assert out == {1: ("a", 10), 2: ("b", 20), 3: ("c", 30)}


def test_merge_full_sync_equals_source(spark):
    """update + insert + not-matched-by-source delete == the source."""
    t, s = frames(spark)
    out = as_map(
        merge.merge_frames(t, s, ["k"], delete_unmatched_target=True)
    )
    assert out == as_map(s)


def test_merge_null_keys_never_match(spark):
    """A NULL-key source row inserts (never updates anything); a
    NULL-key target row is 'unmatched' and survives or drops by the
    not-matched-by-source clause — equi-join semantics throughout."""
    t = spark.createDataFrame([(None, "t", 1), (1, "a", 10)], "k long, s string, v long")
    s = spark.createDataFrame([(None, "s", 2), (1, "A", 11)], "k long, s string, v long")
    out = merge.merge_frames(t, s, ["k"]).collect()
    vals = sorted((r["s"], r["v"]) for r in out)
    assert vals == [("A", 11), ("s", 2), ("t", 1)]
    synced = merge.merge_frames(t, s, ["k"], delete_unmatched_target=True).collect()
    assert sorted((r["s"], r["v"]) for r in synced) == [("A", 11), ("s", 2)]


def test_merge_duplicate_source_keys_raise(spark):
    t, _ = frames(spark)
    dup = spark.createDataFrame(
        [(2, "x", 1), (2, "y", 2)], "k long, s string, v long"
    )
    with pytest.raises(ValueError, match="duplicate source keys"):
        merge.merge_frames(t, dup, ["k"])


def test_merge_two_null_key_source_rows_both_insert(spark):
    """Two NULL-key source rows are two independent inserts, NOT an
    ambiguous duplicate: NULL keys never match a target row, so the
    duplicate-source-key guard must ignore them (r6 advisory — groupBy
    lumped all NULL keys into one group and raised)."""
    t = spark.createDataFrame([(1, "a", 10)], "k long, s string, v long")
    s = spark.createDataFrame(
        [(None, "x", 1), (None, "y", 2)], "k long, s string, v long"
    )
    out = sorted((r["s"], r["v"]) for r in merge.merge_frames(t, s, ["k"]).collect())
    assert out == [("a", 10), ("x", 1), ("y", 2)]
    # a real duplicate among non-NULL keys still raises even when
    # NULL-key rows are present
    dup = spark.createDataFrame(
        [(None, "x", 1), (2, "y", 2), (2, "z", 3)], "k long, s string, v long"
    )
    with pytest.raises(ValueError, match="duplicate source keys"):
        merge.merge_frames(t, dup, ["k"])


def test_merge_schema_mismatch_raises(spark):
    t, _ = frames(spark)
    with pytest.raises(ValueError, match="schema mismatch"):
        merge.merge_frames(t, t.drop("v"), ["k"])


def test_merge_into_path_bootstrap_and_recovery(spark, tmp_path):
    path = str(tmp_path / "t")
    t, s = frames(spark)
    merge.merge_into(spark, t, path, ["k"])  # bootstrap: all inserts
    assert as_map(spark.read.parquet(path)) == as_map(t)
    # crash window: table renamed away, new state never landed
    os.rename(path, path + "__old_beef")
    merge.merge_into(spark, s, path, ["k"])
    got = as_map(spark.read.parquet(path))
    assert got == {1: ("a", 10), 2: ("B", 99), 3: ("c", 30), 4: ("d", 40)}
    assert not os.path.exists(path + "__old_beef")


def test_merge_composite_keys(spark):
    t = spark.createDataFrame(
        [(1, "x", 1), (1, "y", 2)], "k long, s string, v long"
    )
    s = spark.createDataFrame(
        [(1, "x", 100), (2, "x", 3)], "k long, s string, v long"
    )
    out = merge.merge_frames(t, s, ["k", "s"])
    assert as_map_ks(out) == {(1, "x"): 100, (1, "y"): 2, (2, "x"): 3}


def as_map_ks(df):
    return {(r["k"], r["s"]): r["v"] for r in df.collect()}


def test_merge_plan_is_single_join_no_window(spark):
    t, s = frames(spark)
    plan = (
        merge.merge_frames(t, s, ["k"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Join") >= 1
    assert "Window" not in plan and "CartesianProduct" not in plan
