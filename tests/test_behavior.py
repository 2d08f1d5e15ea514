"""Behavioral analytics (ops/behavior.py), Gopher quality flags, and SCD2
history — unit tests on handcrafted frames plus invariants on testdata."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from kaspi_etl_spark.llm import text as text_ops
from kaspi_etl_spark.ops import behavior, purchases


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )


def ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_funnel_strict_ordering(spark):
    ev = _ev(
        spark,
        [
            # u1 completes in order
            (1, "view", ts("2024-01-01T10:00:00")),
            (1, "click", ts("2024-01-01T11:00:00")),
            (1, "purchase", ts("2024-01-01T12:00:00")),
            # u2: purchase BEFORE click -> funnel stops at click
            (2, "view", ts("2024-01-01T10:00:00")),
            (2, "purchase", ts("2024-01-01T10:30:00")),
            (2, "click", ts("2024-01-01T11:00:00")),
            # u3: click before view -> only step 1 (later click counts? no
            # click after the view exists)
            (3, "click", ts("2024-01-01T09:00:00")),
            (3, "view", ts("2024-01-01T10:00:00")),
            # u4 never views -> absent from output
            (4, "click", ts("2024-01-01T09:00:00")),
        ],
    )
    out = {r["user_id"]: r for r in behavior.funnel(ev).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["steps_completed"] == 3
    assert out[2]["steps_completed"] == 2 and out[2]["t_purchase"] is None
    assert out[3]["steps_completed"] == 1 and out[3]["t_click"] is None
    # step times strictly increase where present
    r = out[1]
    assert r["t_view"] < r["t_click"] < r["t_purchase"]


def test_funnel_same_timestamp_not_counted(spark):
    # strict ">" — a click at exactly the view time does not advance
    ev = _ev(
        spark,
        [
            (1, "view", ts("2024-01-01T10:00:00")),
            (1, "click", ts("2024-01-01T10:00:00")),
        ],
    )
    row = behavior.funnel(ev).collect()[0]
    assert row["steps_completed"] == 1


def test_retention_cohort_day_zero_covers_cohort(spark):
    ev = _ev(
        spark,
        [
            (1, "view", ts("2024-01-01T10:00:00")),
            (1, "click", ts("2024-01-02T10:00:00")),
            (2, "view", ts("2024-01-01T23:59:59")),
            (3, "view", ts("2024-01-02T00:00:00")),
        ],
    )
    rows = {(r["cohort_day"], r["day_offset"]): r["n_users"] for r in
            behavior.retention(ev).collect()}
    assert rows[(dt.date(2024, 1, 1), 0)] == 2
    assert rows[(dt.date(2024, 1, 1), 1)] == 1
    assert rows[(dt.date(2024, 1, 2), 0)] == 1
    # no negative offsets by construction
    assert all(off >= 0 for (_, off) in rows)


def test_daily_pivot_total_matches_count(spark, sf_dir):
    from kaspi_etl_spark.registry import read_events

    ev = read_events(spark, sf_dir)
    types = ["view", "click", "signup", "purchase", "error"]
    wide = behavior.daily_pivot(ev, types)
    total = wide.agg(F.sum("total").cast("long").alias("s")).collect()[0]["s"]
    assert total == ev.count()
    # per-type columns sum back to the per-type counts
    per_type = {r["event_type"]: r["n"] for r in
                ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    sums = wide.agg(*[F.sum(t).cast("long").alias(t) for t in types]).collect()[0]
    for t in types:
        assert sums[t] == per_type.get(t, 0)


def test_gopher_flags_edges(spark):
    docs = spark.createDataFrame(
        [
            (1, ""),  # empty -> everything fails, pass False
            (2, "   "),  # whitespace-only behaves like empty
            (3, "the and of to in is that for " + "word " * 40),  # passes
            # 8 symbolic words of 48 total -> ratio 0.167 > 0.1 threshold
            (4, "#### @@@@ $$$$ %%%% ^^^^ ~~~~ |||| &&&& " + "the and is that " * 10),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           text_ops.gopher_quality_flags(docs).collect()}
    assert out[1]["n_words"] == 0 and out[1]["gopher_pass"] is False
    assert out[2]["n_words"] == 0 and out[2]["gopher_pass"] is False
    assert out[3]["gopher_pass"] is True
    r4 = out[4]
    assert r4["flag_symbol_ratio"] is False and r4["gopher_pass"] is False
    # gopher_pass is exactly the conjunction of the five flags
    for r in out.values():
        flags = [r[c] for c in r.asDict() if c.startswith("flag_")]
        assert r["gopher_pass"] == all(flags)


def test_scd2_collapses_runs(spark):
    snap = spark.createDataFrame(
        [
            ("A", dt.date(2024, 1, 1), 10.0),
            ("A", dt.date(2024, 1, 2), 10.0),  # unchanged -> collapsed
            ("A", dt.date(2024, 1, 3), 12.0),  # change
            ("A", dt.date(2024, 1, 5), 10.0),  # back to 10 -> new interval
            ("B", dt.date(2024, 1, 1), 5.0),
        ],
        "sku string, d date, cost double",
    )
    hist = purchases.scd2_history(
        snap, key="sku", ts_col="d", value_cols=["cost"]
    )
    rows = sorted(
        hist.collect(), key=lambda r: (r["sku"], r["version"])
    )
    a = [r for r in rows if r["sku"] == "A"]
    assert [(r["cost"], r["effective_from"], r["effective_to"]) for r in a] == [
        (10.0, dt.date(2024, 1, 1), dt.date(2024, 1, 3)),
        (12.0, dt.date(2024, 1, 3), dt.date(2024, 1, 5)),
        (10.0, dt.date(2024, 1, 5), None),
    ]
    assert [r["version"] for r in a] == [1, 2, 3]
    assert [r["is_current"] for r in a] == [False, False, True]
    b = [r for r in rows if r["sku"] == "B"]
    assert len(b) == 1 and b[0]["is_current"] is True


def test_scd2_null_values_distinct(spark):
    # null -> value and value -> null are both changes; null == null is not
    snap = spark.createDataFrame(
        [
            ("A", dt.date(2024, 1, 1), None),
            ("A", dt.date(2024, 1, 2), None),
            ("A", dt.date(2024, 1, 3), 7.0),
            ("A", dt.date(2024, 1, 4), None),
        ],
        "sku string, d date, cost double",
    )
    hist = purchases.scd2_history(snap, "sku", "d", ["cost"]).collect()
    assert [r["cost"] for r in sorted(hist, key=lambda r: r["version"])] == [
        None,
        7.0,
        None,
    ]


def test_dq_metrics_report_single_pass_and_fail_rows(spark):
    from pyspark.sql import functions as F

    from kaspi_etl_spark.ops import quality

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "c")], "id long, v string"
    )
    rep = quality.metrics_report(
        df,
        [
            ("complete_v", quality.completeness("v"),
             lambda m: m == F.lit(1.0).cast("double")),
            ("unique_id", quality.uniqueness("id"),
             lambda m: m == F.lit(1.0).cast("double")),
            ("max_id", F.max("id"), lambda m: m <= 10),
        ],
    )
    rows = {r.constraint: r for r in rep.collect()}
    assert not rows["complete_v"].passed and abs(rows["complete_v"].metric - 2 / 3) < 1e-12
    assert not rows["unique_id"].passed  # duplicate id 2
    assert rows["max_id"].passed and rows["max_id"].metric == 2.0
    # single pass: the table is scanned exactly once no matter how many
    # constraints (distinct-agg rewrites may add exchanges, never scans)
    plan = rep._jdf.queryExecution().executedPlan().toString()
    # AQE prints the initial plan after the final one — count the final only
    final_plan = plan.split("== Initial Plan ==")[0]
    assert final_plan.count("Scan ExistingRDD") == 1


def test_dq_orphan_count(spark):
    from kaspi_etl_spark.ops import quality

    child = spark.createDataFrame([(1,), (2,), (9,)], "fk long")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    row = quality.orphan_count(child, parent, "fk", "pk", "ri").collect()[0]
    assert row.metric == 1.0 and not row.passed


def test_top_paths_orders_and_truncates(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    m = lambda k: t0 + dt.timedelta(minutes=k)  # noqa: E731
    rows = [
        # user 1 session A: view > click > purchase (within 30-min gaps)
        (1, 1, m(0), "view"), (2, 1, m(5), "click"), (3, 1, m(20), "purchase"),
        # user 1 session B after >30min gap: view alone
        (4, 1, m(60), "view"),
        # user 2: same v>c>p shape
        (5, 2, m(0), "view"), (6, 2, m(1), "click"), (7, 2, m(2), "purchase"),
        # user 3: six events -> path truncated to first 5
        *[(8 + i, 3, m(i), "view") for i in range(6)],
        # tied timestamps: event_id pins the order (10 before 11 is
        # impossible here: ids 14,15 share m(0))
        (14, 4, m(0), "view"), (15, 4, m(0), "click"),
        # NULL user: excluded entirely
        (16, None, m(0), "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got = {r["path"]: r["n_sessions"] for r in behavior.top_paths(ev).collect()}
    assert got["view>click>purchase"] == 2
    assert got["view"] == 1
    assert got["view>view>view>view>view"] == 1  # truncated at 5 steps
    assert got["view>click"] == 1  # tie broken by event_id
    assert sum(got.values()) == 5  # NULL user contributed nothing
