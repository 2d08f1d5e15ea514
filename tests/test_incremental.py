"""Incremental aggregate state (ops/incremental.py) and weighted
sampling — merge-equals-recompute properties and plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from kaspi_etl_spark.ops import incremental as inc
from kaspi_etl_spark.registry import QUERIES


def _df(spark, rows):
    return spark.createDataFrame(rows, "k string, v long")


def _by_key(state_df):
    return {
        r["k"]: (r["n_rows"], r["sum_val"], r["min_val"], r["max_val"])
        for r in state_df.collect()
    }


def test_merge_equals_full_recompute(spark):
    rows = [("a", 1), ("a", 5), ("b", 2), ("b", -7), ("c", 0), ("a", 9)]
    full = inc.partial_state(_df(spark, rows), ["k"], "v")
    merged = inc.merge_states(
        inc.partial_state(_df(spark, rows[:2]), ["k"], "v"),
        inc.partial_state(_df(spark, rows[2:]), ["k"], "v"),
        ["k"],
    )
    assert _by_key(merged) == _by_key(full)


def test_merge_is_commutative_and_handles_disjoint_keys(spark):
    a = inc.partial_state(_df(spark, [("a", 1), ("b", 2)]), ["k"], "v")
    b = inc.partial_state(_df(spark, [("b", 10), ("z", 3)]), ["k"], "v")
    ab, ba = _by_key(inc.merge_states(a, b, ["k"])), _by_key(inc.merge_states(b, a, ["k"]))
    assert ab == ba
    assert ab["z"] == (1, 3, 3, 3)  # key only in one state survives merge
    assert ab["b"] == (2, 12, 2, 10)


def test_merge_with_empty_batch_is_identity(spark):
    a = inc.partial_state(_df(spark, [("a", 4), ("a", 6)]), ["k"], "v")
    empty = inc.partial_state(_df(spark, []), ["k"], "v")
    assert _by_key(inc.merge_states(a, empty, ["k"])) == _by_key(a)


def test_finalize_avg(spark):
    a = inc.finalize(inc.partial_state(_df(spark, [("a", 4), ("a", 6)]), ["k"], "v"))
    row = a.collect()[0]
    assert row["avg_val"] == 5.0


def test_weighted_sample_is_top_k_not_global_sort(spark, sf_dir):
    df = QUERIES["docs_weighted_sample"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    rows = df.collect()
    assert len(rows) == 100
    # priorities ascending and deterministic across re-runs
    prios = [r["priority"] for r in rows]
    assert prios == sorted(prios)
    rows2 = QUERIES["docs_weighted_sample"](spark, sf_dir).collect()
    assert [r["doc_id"] for r in rows2] == [r["doc_id"] for r in rows]
